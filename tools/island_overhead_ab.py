"""A/B: shard_map kernel-island overhead on the REAL chip.

The multi-chip path wraps every Pallas kernel in a shard_map island over
the (data, seq, model) mesh (parallel/kernel_sharding.py). This measures
what that wrapping costs by running the EXACT bench geometry — MedT 128px
b56 fused train step — two ways on one TPU chip:

  A: the plain single-chip program (what bench.py measures), and
  B: the same program under a 1x1x1 mesh with kernel islands active —
     identical math, identical device count, so any delta is pure
     shard_map wrapping/partitioning overhead.

Prints one JSON line; the result is recorded as a BASELINE.md row
(round-4 verdict weak #5: "no measurement bounding the island overhead").
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import BATCH, IMG, MODEL, _init_on_cpu, _make_state  # noqa: E402

CALLS = 15


def _measure(step, state, batch):
    state, m = step(state, batch)
    _ = float(m["loss"])  # compile + upload complete here
    state, m = step(state, batch)
    _ = float(m["loss"])
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s = state
        for _ in range(CALLS):
            s, m = step(s, batch)
        _ = float(m["loss"])  # completion fetch (see bench.py)
        state = s
        dt = min(dt, time.perf_counter() - t0)
    return CALLS * BATCH / dt


def main():
    from medt_tpu.models import build_model
    from medt_tpu.parallel import make_mesh, shard_batch, shard_state
    from medt_tpu.parallel.kernel_sharding import set_kernel_mesh
    from medt_tpu.training import train_step
    from medt_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    model = build_model(MODEL, img_size=IMG, dtype=jnp.float32, use_fused=True)
    # host-side master copy: each arm's train step donates (deletes) its
    # state buffers, so every arm gets a fresh device_put of these
    variables_host = jax.device_get(_init_on_cpu(model, IMG))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(BATCH, IMG, IMG, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, size=(BATCH, IMG, IMG))),
    }

    # A: plain single-chip program (identical to bench.py's train section)
    state = _make_state(model, jax.device_put(variables_host))
    plain = _measure(jax.jit(train_step, donate_argnums=0), state, batch)

    # B: same program, 1x1x1 mesh, kernels as shard_map islands
    mesh = make_mesh(1, dp=1, sp=1, tp=1)
    state = _make_state(model, jax.device_put(variables_host))
    state = shard_state(state, mesh)
    sharded_batch = shard_batch(batch, mesh)
    set_kernel_mesh(mesh)
    try:
        islands = _measure(
            jax.jit(train_step, donate_argnums=0), state, sharded_batch)
    finally:
        set_kernel_mesh(None)

    print(json.dumps({
        "metric": f"island overhead A/B ({MODEL} {IMG}px b{BATCH} train)",
        "plain_imgs_per_sec": round(plain, 2),
        "islands_1x1x1_imgs_per_sec": round(islands, 2),
        "overhead_pct": round((plain / islands - 1.0) * 100, 1),
    }))


if __name__ == "__main__":
    main()
