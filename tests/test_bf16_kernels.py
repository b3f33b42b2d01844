"""bf16 kernel IO is EXACT vs upcasting outside the kernel.

In bf16 mode the fused kernels now take q/k/v in bf16 (halved HBM loads +
halved residual traffic) and upcast once in VMEM. bf16 -> f32 conversion is
exact, so for identical bf16 inputs the outputs must equal the old
upcast-outside path bit for bit, and the bf16 input grads must equal the
f32 grads rounded once to bf16."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medt_tpu.ops import pallas_moments as pm
from medt_tpu.ops.pallas_axial_lanes import (
    flash2_lanes_core,
    flash_lanes_core,
    lanes_attn_core,
)
from medt_tpu.ops.pallas_axial_train import pack_sim_affine

BF16 = jnp.bfloat16


def _mk(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def _attn_case(core, g, gp, L, S, seed):
    rng = np.random.default_rng(seed)
    c = gp // 2
    qkv = _mk(rng, g, 2 * gp, L, S)  # fused rows q|k|v (the core contract)
    qemb, kemb_t = _mk(rng, c, L, L), _mk(rng, c, L, L)
    vemb = _mk(rng, gp, L, L)
    aff = pack_sim_affine(
        g, jnp.abs(_mk(rng, 3, g)) * 0.2, _mk(rng, 3, g) * 0.1, "full")
    wv, we = _mk(rng, g, gp, L, S), _mk(rng, g, gp, L, S)

    def loss(qkv):
        sv, sve = core(qkv, qemb, kemb_t, vemb, aff)
        return jnp.sum(sv.astype(jnp.float32) * wv
                       + sve.astype(jnp.float32) * we)

    qkvb = qkv.astype(BF16)
    # forward: the in-kernel upcast is exact, so bf16-in matches the
    # upcast-outside program to FMA-contraction noise (two separately
    # compiled programs may fuse multiplies differently)
    out_b = core(qkvb, qemb, kemb_t, vemb, aff)
    out_f = core(qkvb.astype(jnp.float32), qemb, kemb_t, vemb, aff)
    for a, b in zip(out_b, out_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    # grads: bf16 outputs within one bf16 rounding (2^-8 relative) of the
    # f32 grads
    g_b = jax.grad(loss)(qkvb)
    g_f = jax.grad(loss)(qkvb.astype(jnp.float32))
    assert g_b.dtype == BF16
    np.testing.assert_allclose(np.asarray(g_b, np.float32), np.asarray(g_f),
                               rtol=1e-2, atol=1e-6)


def test_lanes_core_bf16_exact():
    _attn_case(lanes_attn_core, g=2, gp=4, L=8, S=256, seed=0)


def test_flash_core_bf16_exact():
    _attn_case(flash_lanes_core, g=2, gp=4, L=32, S=256, seed=1)


def test_flash2_core_bf16_exact():
    _attn_case(flash2_lanes_core, g=1, gp=4, L=128, S=128, seed=2)


def test_moments_bf16_exact():
    rng = np.random.default_rng(3)
    g, gp, L, S = 2, 4, 8, 256
    c = gp // 2
    qkv = _mk(rng, g, 2 * gp, L, S)
    qemb, kemb = _mk(rng, c, L, L), _mk(rng, c, L, L)
    wm, wv = _mk(rng, 3, g), _mk(rng, 3, g)
    qkvb = qkv.astype(BF16)

    def loss(qkv):
        m, v, _ = pm.logit_moments_lanes_fused(qkv, qemb, kemb)
        return jnp.sum(m * wm) + jnp.sum(v * wv)

    m_b = pm.logit_moments_lanes_fused(qkvb, qemb, kemb)
    m_f = pm.logit_moments_lanes_fused(
        qkvb.astype(jnp.float32), qemb, kemb)
    np.testing.assert_allclose(np.asarray(m_b[0]), np.asarray(m_f[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_b[1]), np.asarray(m_f[1]),
                               rtol=1e-6, atol=1e-6)
    g_b = jax.grad(loss)(qkvb)
    g_f = jax.grad(loss)(qkvb.astype(jnp.float32))
    assert g_b.dtype == BF16
    np.testing.assert_allclose(np.asarray(g_b, np.float32), np.asarray(g_f),
                               rtol=1e-2, atol=1e-6)


def test_bf16_train_step_routes_and_runs():
    """End to end: a bf16 MedT-like train step through the bf16 kernel IO."""
    from medt_tpu.models import build_model
    from medt_tpu.training import adam_l2, init_state, train_step

    model = build_model("gatedaxialunet", img_size=32, dtype=BF16,
                        use_fused=True)
    state = init_state(model, adam_l2(1e-3), (8, 32, 32, 3))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, size=(8, 32, 32))),
    }
    state2, metrics = jax.jit(train_step)(state, batch)
    assert np.isfinite(float(metrics["loss"]))
