"""Manual-sharding islands: the Pallas attention kernels under a mesh.

GSPMD auto-partitions every XLA op in the train step, but a Pallas kernel
lowers to an opaque custom call that XLA cannot partition — on a multi-chip
mesh the fused-attention program would fail to compile (or silently
all-gather its operands). The kernels are *embarrassingly parallel* over
exactly two of their axes:

* the stripe axis ``S`` (= batch x orthogonal spatial extent): every stripe
  attends independently — this is the axis SURVEY §5 prescribes sharding
  ("a simple spatial shard over the non-attended axis with no collectives
  inside the kernel");
* the group (head) axis ``g``: groups never interact inside the core.

So each core call becomes a :func:`jax.shard_map` island over the ambient
mesh with

* q/k/v/outputs sharded ``g -> "model"``, ``S -> ("data", "seq")``,
* the relative-position tables and the folded BN affine replicated
  (shard_map psums their cotangents across shards in the backward),

and every device runs the SAME kernel on its local ``(g/tp, S/(dp*sp))``
block. XLA inserts the reshard collectives *around* the island — for the
width-axis attention, whose attended axis is the seq-sharded image width,
that is the H<->W all-to-all; nothing collective runs inside the kernel.
The custom VJPs compose: sharded grads match unsharded to float noise
(tests/test_kernel_sharding.py).

Admission must see the PER-DEVICE geometry (a seq-sharded width divides the
stripe count), so dispatch divides (S, g) by the mesh factors before calling
``lanes_supported``/``flash_supported``/… — see
ops/axial_attention.py::_fused_train_attention.

The mesh is threaded as module state (:func:`set_kernel_mesh`), set by the
trainer when it shards the train state and by ``__graft_entry__``'s
multichip dryrun; Flax modules cannot otherwise see the mesh at trace time.
The reference has no counterpart — its only parallelism is single-process
``nn.DataParallel`` (reference train.py:104-108).
"""
from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

_mesh: Optional[Mesh] = None


def set_kernel_mesh(mesh: Optional[Mesh]) -> None:
    """Install (or clear, with None) the mesh used for kernel islands."""
    global _mesh
    _mesh = mesh


def kernel_mesh() -> Optional[Mesh]:
    return _mesh


@contextlib.contextmanager
def kernel_mesh_scope():
    """Snapshot the kernel mesh and restore it on exit.

    Entry points that install a mesh via :func:`set_kernel_mesh`
    (train/test/predict mains, the graft dryrun) wrap their body in this
    so in-process callers — tests, notebooks — don't inherit the run's
    mesh: leaked mesh state silently changes kernel admission (per-device
    geometry) for everything that follows in the same process.
    """
    prior = _mesh
    try:
        yield
    finally:
        set_kernel_mesh(prior)


def kernel_mesh_factors() -> Tuple[Optional[Mesh], int, int]:
    """(mesh, ds, tp): the stripe-axis divisor ``ds = data*seq`` and the
    group-axis divisor ``tp = model``; (None, 1, 1) when no mesh is active
    or the active mesh is trivial."""
    m = _mesh
    if m is None:
        return None, 1, 1
    ax = dict(zip(m.axis_names, m.devices.shape))
    ds = ax.get("data", 1) * ax.get("seq", 1)
    tp = ax.get("model", 1)
    if ds * tp == 1:
        return None, 1, 1
    return m, ds, tp


# lanes-layout cores: q/k (g, c, L, S), v (g, gp, L, S), tables (*, L, L),
# affine (g, 8) -> (sv, sve) each (g, gp, L, S)
_LANES_QKV = P("model", None, None, ("data", "seq"))
# stripe-layout core: q/k (S, g, c, L), v (S, g, gp, L)
_STRIPE_QKV = P(("data", "seq"), "model", None, None)
_TABLE = P()            # replicated; cotangents psummed by shard_map
_AFF = P("model", None)


def shard_lanes_core(core, mesh: Mesh):
    """shard_map a lanes-family core (lanes/flash/flash2) over ``mesh``.

    The cores take the FUSED (g, 2gp, L, S) qkv tensor (rows q|k|v) —
    one sharded operand whose g axis maps to ``model`` and S axis to
    ``(data, seq)``, exactly like the former separate q/k/v."""
    return jax.shard_map(
        core, mesh=mesh,
        in_specs=(_LANES_QKV,
                  _TABLE, _TABLE, _TABLE, _AFF),
        out_specs=(_LANES_QKV, _LANES_QKV),
        # the cores carry custom VJPs, which the vma checker cannot trace
        # through; replication of the table/affine cotangents is handled by
        # shard_map's transpose regardless (verified against the unsharded
        # grads in tests/test_kernel_sharding.py)
        check_vma=False,
    )


def shard_stripe_core(core, mesh: Mesh):
    """shard_map the stripe-block core (pallas_axial_train) over ``mesh``."""
    return jax.shard_map(
        core, mesh=mesh,
        in_specs=(_STRIPE_QKV, _STRIPE_QKV, _STRIPE_QKV,
                  _TABLE, _TABLE, _TABLE, _AFF),
        out_specs=(_STRIPE_QKV, _STRIPE_QKV),
        check_vma=False,
    )


def shard_moments_core(core, mesh: Mesh):
    """shard_map the one-pass moments core (pallas_moments) over ``mesh``.

    The moment sums are linear accumulations over the stripe axis, so each
    device reduces its LOCAL ``(g/tp, 2gp, L, S/(dp*sp))`` fused-qkv block
    to partial sums and the combination happens OUTSIDE the island: the island emits a
    ``(dp*sp, g, 8)`` array with each (data, seq) shard's partials in its
    own slot, and the caller sums axis 0 as a plain (GSPMD-partitioned,
    trivially differentiable) XLA reduction. No collective runs inside the
    island, and the transpose path is the same slice-back + custom-VJP
    composition as the attention islands (verified sharded-vs-unsharded in
    tests/test_kernel_sharding.py)."""
    def local(qkv, r_q, e_q, r_k, e_k):
        return core(qkv, r_q, e_q, r_k, e_k)[None]  # (1, g_local, 8)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(_LANES_QKV,
                  _TABLE, _TABLE, _TABLE, _TABLE),
        out_specs=P(("data", "seq"), "model", None),
        check_vma=False,
    )

    def call(qkv, r_q, e_q, r_k, e_k):
        import jax.numpy as jnp
        return jnp.sum(f(qkv, r_q, e_q, r_k, e_k), axis=0)  # (g, 8)

    return call


# eval-kernel (pallas_axial) operand layouts: q/k (S, g, c, L), v (S, g, gp, L)
_EVAL_QKV = P(("data", "seq"), "model", None, None)
_EVAL_SIMAFF = P("model", None)        # (g, 8)
_EVAL_OUTAFF = P("model", None, None)  # (g, 4, gp)


def shard_eval_core(core, mesh: Mesh):
    """shard_map the stripe-major eval kernel (pallas_axial
    axial_attention_fused) over ``mesh``: stripes over (data, seq), groups
    over model, tables replicated, per-group affines sharded with the group
    axis. Inference-only — no VJP involved."""
    return jax.shard_map(
        core, mesh=mesh,
        in_specs=(_EVAL_QKV, _EVAL_QKV, _EVAL_QKV,
                  _TABLE, _TABLE, _TABLE, _EVAL_SIMAFF, _EVAL_OUTAFF),
        out_specs=_EVAL_QKV,
        check_vma=False,
    )
