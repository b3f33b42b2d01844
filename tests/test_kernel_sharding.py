"""Fused kernels under sharding: shard_map islands x custom VJPs.

GSPMD cannot partition a Pallas custom call, so under a mesh every kernel
core runs as a jax.shard_map island (g -> model, S -> data x seq) with
per-device admission — parallel/kernel_sharding.py. These tests prove, on
the virtual 8-device CPU mesh (kernels in interpret mode):

* op level: every core family (lanes / flash / flash2 / stripe) produces
  the same outputs AND gradients sharded as unsharded — including the
  replicated position-table cotangents, which shard_map must psum;
* dispatch level: an active kernel mesh routes admission on per-device
  shapes and records `sharded=True` geometries;
* model level: one fused train step under the mesh matches the unfused
  (XLA) sharded step.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medt_tpu.ops import kernel_registry as kreg
from medt_tpu.parallel import make_mesh, set_kernel_mesh, shard_batch, shard_state
from medt_tpu.parallel.kernel_sharding import (
    kernel_mesh_factors,
    shard_lanes_core,
    shard_stripe_core,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(autouse=True)
def _clear_mesh():
    yield
    set_kernel_mesh(None)


def _lanes_args(rng, g, c, gp, L, S):
    assert c == gp // 2  # the fused-qkv contract fixes c = gp//2
    qkv = jnp.asarray(
        rng.normal(size=(g, 2 * gp, L, S)).astype(np.float32))
    qe = jnp.asarray(rng.normal(size=(c, L, L)).astype(np.float32))
    ke = jnp.asarray(rng.normal(size=(c, L, L)).astype(np.float32))
    ve = jnp.asarray(rng.normal(size=(gp, L, L)).astype(np.float32))
    aff = jnp.asarray(
        np.stack([np.ones((g, 4)), np.zeros((g, 4))], -1).reshape(g, 8)
        .astype(np.float32))
    return qkv, qe, ke, ve, aff


def _core_loss(core):
    def loss(qkv, qe, ke, ve, aff):
        sv, sve = core(qkv, qe, ke, ve, aff)
        return jnp.sum(sv * sv) + jnp.sum(sve * jnp.cos(sve))
    return loss


def _assert_sharded_matches(core, shard_fn, args, mesh):
    sharded = shard_fn(core, mesh)
    val_and_grads = jax.jit(jax.value_and_grad(
        _core_loss(core), argnums=tuple(range(5))))
    val_and_grads_sh = jax.jit(jax.value_and_grad(
        _core_loss(sharded), argnums=tuple(range(5))))
    l1, g1 = val_and_grads(*args)
    l2, g2 = val_and_grads_sh(*args)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for i, (a, b) in enumerate(zip(g1, g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3,
                                   err_msg=f"grad argnum {i}")


@pytest.mark.parametrize("family,span", [
    ("lanes", 8), ("flash", 32), ("flash2", 128),
])
def test_lanes_family_sharded_grads_match(family, span):
    from medt_tpu.ops.pallas_axial_lanes import (
        flash2_lanes_core,
        flash_lanes_core,
        lanes_attn_core,
    )
    core = {"lanes": lanes_attn_core, "flash": flash_lanes_core,
            "flash2": flash2_lanes_core}[family]
    mesh = make_mesh(8, dp=2, sp=2, tp=2)
    g, c, gp = 8, 2, 4
    S = 512  # 128 per (data x seq) shard — passes per-device admission
    args = _lanes_args(np.random.default_rng(3), g, c, gp, span, S)
    _assert_sharded_matches(core, shard_lanes_core, args, mesh)


def test_stripe_core_sharded_grads_match():
    # the stripe family keeps the separate-q/k/v contract (its layout is
    # stripe-major), so it gets its own 7-arg loss here
    from medt_tpu.ops.pallas_axial_train import fused_attn_core
    mesh = make_mesh(8, dp=2, sp=2, tp=2)
    g, c, gp, L, S = 8, 2, 4, 32, 32
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(S, g, c, L)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(S, g, c, L)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(S, g, gp, L)).astype(np.float32))
    qe = jnp.asarray(rng.normal(size=(c, L, L)).astype(np.float32))
    ke = jnp.asarray(rng.normal(size=(c, L, L)).astype(np.float32))
    ve = jnp.asarray(rng.normal(size=(gp, L, L)).astype(np.float32))
    aff = jnp.asarray(
        np.stack([np.ones((g, 4)), np.zeros((g, 4))], -1).reshape(g, 8)
        .astype(np.float32))
    args = (q, k, v, qe, ke, ve, aff)

    def stripe_loss(core):
        def loss(q, k, v, qe, ke, ve, aff):
            sv, sve = core(q, k, v, qe, ke, ve, aff)
            return jnp.sum(sv * sv) + jnp.sum(sve * jnp.cos(sve))
        return loss

    sharded = shard_stripe_core(fused_attn_core, mesh)
    l1, g1 = jax.jit(jax.value_and_grad(
        stripe_loss(fused_attn_core), argnums=tuple(range(7))))(*args)
    l2, g2 = jax.jit(jax.value_and_grad(
        stripe_loss(sharded), argnums=tuple(range(7))))(*args)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for i, (a, b) in enumerate(zip(g1, g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3,
                                   err_msg=f"grad argnum {i}")


def test_moments_core_sharded_matches():
    """The one-pass moments island (per-device partial sums + outside
    combine) reproduces the unsharded kernel's sums AND gradients —
    including the replicated table cotangents."""
    from medt_tpu.ops.pallas_moments import moment_sums_core
    from medt_tpu.parallel.kernel_sharding import shard_moments_core

    mesh = make_mesh(8, dp=2, sp=2, tp=2)
    g, c, gp, L, S = 8, 2, 4, 16, 512  # 128 stripes per (data x seq) shard
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(
        rng.normal(size=(g, 2 * gp, L, S)).astype(np.float32))
    r_q = jnp.asarray(rng.normal(size=(c, L)).astype(np.float32))
    e_q = jnp.asarray(rng.normal(size=(c, c, L)).astype(np.float32))
    r_k = jnp.asarray(rng.normal(size=(c, L)).astype(np.float32))
    e_k = jnp.asarray(rng.normal(size=(c, c, L)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(g, 8)).astype(np.float32))

    def make_loss(core):
        def loss(qkv, r_q, e_q, r_k, e_k):
            return jnp.sum(core(qkv, r_q, e_q, r_k, e_k) * w)
        return loss

    sharded = shard_moments_core(moment_sums_core, mesh)
    l1, g1 = jax.jit(jax.value_and_grad(
        make_loss(moment_sums_core), argnums=tuple(range(5))))(
        qkv, r_q, e_q, r_k, e_k)
    l2, g2 = jax.jit(jax.value_and_grad(
        make_loss(sharded), argnums=tuple(range(5))))(
        qkv, r_q, e_q, r_k, e_k)
    # the sums accumulate S*L*L = 131k products; loosen atol accordingly
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for i, (a, b) in enumerate(zip(g1, g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3,
                                   err_msg=f"grad argnum {i}")


def test_eval_core_sharded_matches():
    """The stripe-major eval kernel island (inference-only) reproduces the
    unsharded kernel's outputs under the mesh."""
    from medt_tpu.ops.pallas_axial import axial_attention_fused
    from medt_tpu.parallel.kernel_sharding import shard_eval_core

    mesh = make_mesh(8, dp=2, sp=2, tp=2)
    g, c, gp, L, S = 8, 2, 4, 32, 64
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.normal(size=(S, g, c, L)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(S, g, c, L)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(S, g, gp, L)).astype(np.float32))
    qe = jnp.asarray(rng.normal(size=(c, L, L)).astype(np.float32))
    ke = jnp.asarray(rng.normal(size=(c, L, L)).astype(np.float32))
    ve = jnp.asarray(rng.normal(size=(gp, L, L)).astype(np.float32))
    sim_aff = jnp.asarray(rng.normal(size=(g, 8)).astype(np.float32))
    out_aff = jnp.asarray(rng.normal(size=(g, 4, gp)).astype(np.float32))

    out1 = jax.jit(axial_attention_fused)(q, k, v, qe, ke, ve,
                                          sim_aff, out_aff)
    out2 = jax.jit(shard_eval_core(axial_attention_fused, mesh))(
        q, k, v, qe, ke, ve, sim_aff, out_aff)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=2e-5, rtol=1e-5)


def test_kernel_mesh_factors():
    assert kernel_mesh_factors() == (None, 1, 1)
    mesh = make_mesh(8, dp=2, sp=2, tp=2)
    set_kernel_mesh(mesh)
    m, ds, tp = kernel_mesh_factors()
    assert m is mesh and ds == 4 and tp == 2
    set_kernel_mesh(None)
    assert kernel_mesh_factors() == (None, 1, 1)


def _state_and_batch(model_name, img, batch, use_fused):
    from medt_tpu.models import build_model
    from medt_tpu.training import adam_l2, init_state

    model = build_model(model_name, img_size=img, use_fused=use_fused)
    state = init_state(model, adam_l2(1e-3), (batch, img, img, 3))
    rng = np.random.default_rng(0)
    data = {
        "image": jnp.asarray(
            rng.normal(size=(batch, img, img, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, size=(batch, img, img))),
    }
    return state, data


def test_dispatch_records_sharded_geometries():
    from medt_tpu.training import train_step

    mesh = make_mesh(8, dp=2, sp=2, tp=2)
    state, data = _state_and_batch("gatedaxialunet", 32, 32, use_fused=True)
    state = shard_state(state, mesh)
    data = shard_batch(data, mesh)
    set_kernel_mesh(mesh)
    geos = kreg.collect_geometries(train_step, state, data)
    sharded = {g for g in geos if g.sharded}
    assert sharded, f"no sharded geometries recorded: {sorted(geos)}"
    # per-device stripe count: batch 32 x (16-wide features) / (dp*sp=4)
    assert all(g.S == 128 and g.g == 4 for g in sharded), sorted(sharded)


@pytest.mark.slow
def test_fused_sharded_train_step_matches_xla():
    """One fused train step under the mesh == the XLA sharded step."""
    from medt_tpu.training import train_step

    mesh = make_mesh(8, dp=2, sp=2, tp=2)
    losses = {}
    stats = {}
    for fused in (False, True):
        state, data = _state_and_batch("gatedaxialunet", 32, 32,
                                       use_fused=fused)
        state = shard_state(state, mesh)
        data = shard_batch(data, mesh)
        set_kernel_mesh(mesh if fused else None)
        try:
            new_state, m = jax.jit(train_step)(state, data)
        finally:
            set_kernel_mesh(None)
        losses[fused] = float(m["loss"])
        stats[fused] = jax.device_get(new_state.batch_stats)
    np.testing.assert_allclose(losses[True], losses[False],
                               atol=1e-4, rtol=1e-4)
    flat_a = jax.tree_util.tree_leaves(stats[True])
    flat_b = jax.tree_util.tree_leaves(stats[False])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)
