"""Mesh construction and sharding placement helpers."""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .partitioning import partition_specs

AXES = ("data", "seq", "model")


def auto_mesh_shape(n_devices: int, tp: Optional[int] = None,
                    sp: Optional[int] = None) -> Tuple[int, int, int]:
    """Factor ``n_devices`` into (data, seq, model) axis sizes.

    Defaults favor using every parallelism style when the device count
    allows: tp=2 and sp=2 when divisible, the rest to data parallel.
    """
    if tp is None:
        tp = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    rem = n_devices // tp
    if sp is None:
        sp = 2 if rem % 2 == 0 and rem >= 2 else 1
    dp = rem // sp
    assert dp * sp * tp == n_devices, (dp, sp, tp, n_devices)
    return dp, sp, tp


def detect_slices(devices) -> int:
    """Number of distinct ICI domains (TPU slices) among ``devices``.

    Multi-slice jobs expose ``slice_index`` per device; single-slice and
    CPU/virtual devices report 1.
    """
    return len({getattr(d, "slice_index", 0) or 0 for d in devices})


def make_mesh(n_devices: Optional[int] = None, *, dp: Optional[int] = None,
              sp: Optional[int] = None, tp: Optional[int] = None,
              slices: Optional[int] = None, devices=None) -> Mesh:
    """Build the (data, seq, model) mesh, DCN-aware across TPU slices.

    With multiple slices (detected from ``slice_index`` or forced via
    ``slices``), devices are grouped so that the seq/model axes stay WITHIN
    a slice (their collectives — all_gathers of width shards, attention-
    group psums — ride ICI every step) and only the data axis spans
    slices: its one gradient psum per step is the sole DCN traffic,
    hierarchically reduced (intra-slice first) by XLA. This is the
    framework's multi-slice scaling story; the reference has no equivalent
    (its only parallelism is single-process DataParallel, train.py:104-108).
    """
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    devices = list(devices[:n])
    if slices is None:
        slices = detect_slices(devices)
    if dp is None:
        if slices > 1:
            assert n % slices == 0, (n, slices)
            dpi, sp, tp = auto_mesh_shape(n // slices, tp=tp, sp=sp)
            dp = slices * dpi
        else:
            dp, sp, tp = auto_mesh_shape(n, tp=tp, sp=sp)
    assert dp % slices == 0, (
        f"data axis ({dp}) must be a multiple of the slice count ({slices}) "
        "— seq/model axes may not span the DCN")
    if slices > 1:
        # order devices slice-major so reshape(dp, sp, tp) puts each
        # slice's chips contiguously along (seq, model) and per-slice
        # data-parallel groups, with the slice boundary falling on the
        # OUTER data axis only
        devices = sorted(
            devices, key=lambda d: (getattr(d, "slice_index", 0) or 0,
                                    d.id))
    grid = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(grid, AXES)


def batch_specs() -> dict:
    """Batch sharding: batch over 'data', image width over 'seq' (NHWC)."""
    return {"image": P("data", None, "seq", None), "label": P("data", None, "seq")}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    specs = batch_specs()
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs.get(k, P())))
        for k, v in batch.items()
    }


def shard_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: TP specs for params/batch_stats,
    replicated step; the optimizer state is re-created under jit so Adam's
    moments inherit the param shardings from GSPMD propagation."""
    param_sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), partition_specs(state.params),
        is_leaf=lambda x: isinstance(x, P),
    )
    stats_sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), partition_specs(state.batch_stats),
        is_leaf=lambda x: isinstance(x, P),
    )
    params = jax.device_put(state.params, param_sh)
    batch_stats = jax.device_put(state.batch_stats, stats_sh)
    opt_state = jax.jit(state.tx.init)(params)
    # input-independent leaves (e.g. Adam's step count) come out of jit on a
    # single device; replicate them onto the mesh so the whole state shares
    # one device set
    replicated = NamedSharding(mesh, P())
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated)
        if getattr(getattr(x, "sharding", None), "num_devices", None) == 1
        else x,
        opt_state,
    )
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return state.replace(
        step=step, params=params, batch_stats=batch_stats, opt_state=opt_state
    )
