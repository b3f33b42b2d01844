"""Exactness of the fused one-pass moments kernel (ops/pallas_moments.py)
against the factorized XLA einsums it replaces
(ops/pallas_axial_train.py::logit_moments_lanes / qk_moments_lanes), values
AND gradients, including multi-stripe-block accumulation.

The kernel takes the attention cores' fused (g, 2gp, L, S) qkv tensor
(rows [0:c]=q, [c:gp]=k, [gp:2gp]=v) and reads only the q/k half; the v
rows must therefore never influence the sums and must receive ZERO
cotangent."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medt_tpu.ops import pallas_moments as pm
from medt_tpu.ops.pallas_axial_train import (
    logit_moments_lanes,
    qk_moments_lanes,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def _fused(rng, q, k):
    """Stack q|k|v rows into the cores' fused layout (v rows random — the
    moments must ignore them)."""
    g, c, L, S = q.shape
    v = _rand(rng, g, 2 * c, L, S)
    return jnp.concatenate([q, k, v], axis=1)


@pytest.mark.parametrize("g,c,L,S", [(2, 2, 8, 256), (1, 4, 16, 128),
                                     (2, 1, 8, 128)])
def test_logit_moments_fused_matches(g, c, L, S):
    rng = np.random.default_rng(0)
    q, k = _rand(rng, g, c, L, S), _rand(rng, g, c, L, S)
    qemb, kemb = _rand(rng, c, L, L), _rand(rng, c, L, L)
    m_ref, v_ref, n_ref = logit_moments_lanes(q, k, qemb, kemb)
    m, v, n = pm.logit_moments_lanes_fused(_fused(rng, q, k), qemb, kemb)
    assert n == n_ref
    np.testing.assert_allclose(m, m_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(v, v_ref, rtol=1e-5, atol=1e-5)


def test_qk_moments_fused_matches():
    rng = np.random.default_rng(1)
    g, c, L, S = 2, 2, 8, 256
    q, k = _rand(rng, g, c, L, S), _rand(rng, g, c, L, S)
    m_ref, v_ref, n_ref = qk_moments_lanes(q, k)
    m, v, n = pm.qk_moments_lanes_fused(_fused(rng, q, k))
    assert n == n_ref
    np.testing.assert_allclose(m, m_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(v, v_ref, rtol=1e-5, atol=1e-5)


def test_multi_block_accumulation(monkeypatch):
    """Force several stripe blocks so the si-indexed accumulation runs."""
    monkeypatch.setattr(pm, "_VMEM_BUDGET", 1 << 16)
    rng = np.random.default_rng(2)
    g, c, L, S = 2, 2, 8, 512
    assert pm._pick_sblock(S, c, L) < S  # the patch actually forces blocks
    q, k = _rand(rng, g, c, L, S), _rand(rng, g, c, L, S)
    qemb, kemb = _rand(rng, c, L, L), _rand(rng, c, L, L)
    m_ref, v_ref, _ = logit_moments_lanes(q, k, qemb, kemb)
    m, v, _ = pm.logit_moments_lanes_fused(_fused(rng, q, k), qemb, kemb)
    np.testing.assert_allclose(m, m_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(v, v_ref, rtol=1e-5, atol=1e-5)


def _grad_pair(q, k, qemb, kemb, wm, wv, vrng):
    """Reference grads (separate q/k) vs fused grads split back out.

    Returns ((dq, dk, dqe, dke) ref, same fused, dv_fused)."""
    c = q.shape[1]

    def loss_ref(q, k, qe, ke):
        m, v, _ = logit_moments_lanes(q, k, qe, ke)
        return jnp.sum(m * wm) + jnp.sum(v * wv)

    def loss_fus(qkv, qe, ke):
        m, v, _ = pm.logit_moments_lanes_fused(qkv, qe, ke)
        return jnp.sum(m * wm) + jnp.sum(v * wv)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, qemb, kemb)
    qkv = _fused(vrng, q, k)
    dqkv, dqe, dke = jax.grad(loss_fus, argnums=(0, 1, 2))(qkv, qemb, kemb)
    g_fus = (dqkv[:, :c], dqkv[:, c:2 * c], dqe, dke)
    return g_ref, g_fus, dqkv[:, 2 * c:]


def test_gradients_match_reference():
    """Grad of a scalar mixing mean and var must match autodiff through the
    XLA reference for every input; the fused tensor's v rows get ZERO."""
    rng = np.random.default_rng(3)
    g, c, L, S = 2, 2, 8, 128
    q, k = _rand(rng, g, c, L, S), _rand(rng, g, c, L, S)
    qemb, kemb = _rand(rng, c, L, L), _rand(rng, c, L, L)
    wm, wv = _rand(rng, 3, g), _rand(rng, 3, g)
    g_ref, g_fus, dv = _grad_pair(q, k, qemb, kemb, wm, wv, rng)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dv), 0.0)


def test_gradients_match_reference_wopos():
    rng = np.random.default_rng(4)
    g, c, L, S = 2, 2, 8, 128
    q, k = _rand(rng, g, c, L, S), _rand(rng, g, c, L, S)
    wm, wv = _rand(rng, g), _rand(rng, g)

    def loss_ref(q, k):
        m, v, _ = qk_moments_lanes(q, k)
        return jnp.sum(m * wm) + jnp.sum(v * wv)

    def loss_fus(qkv):
        m, v, _ = pm.qk_moments_lanes_fused(qkv)
        return jnp.sum(m * wm) + jnp.sum(v * wv)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(q, k)
    dqkv = jax.grad(loss_fus)(_fused(rng, q, k))
    for a, b in zip(g_ref, (dqkv[:, :c], dqkv[:, c:2 * c])):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dqkv[:, 2 * c:]), 0.0)


def test_backward_kernel_multi_block(monkeypatch):
    """Small budget forces several stripe blocks in BOTH directions, so the
    backward kernel's resident table-grad accumulation runs."""
    monkeypatch.setattr(pm, "_VMEM_BUDGET", 1 << 17)
    rng = np.random.default_rng(5)
    g, c, L, S = 2, 2, 8, 512
    assert 128 <= pm._pick_sblock(S, c, L, bwd=True) < S
    q, k = _rand(rng, g, c, L, S), _rand(rng, g, c, L, S)
    qemb, kemb = _rand(rng, c, L, L), _rand(rng, c, L, L)
    wm, wv = _rand(rng, 3, g), _rand(rng, 3, g)
    g_ref, g_fus, dv = _grad_pair(q, k, qemb, kemb, wm, wv, rng)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dv), 0.0)


def test_backward_xla_fallback_matches():
    """The XLA fallback backward (used when no stripe block admits) must
    produce the same grads as the kernel."""
    rng = np.random.default_rng(6)
    g, c, L, S = 2, 2, 8, 128
    q, k = _rand(rng, g, c, L, S), _rand(rng, g, c, L, S)
    qemb, kemb = _rand(rng, c, L, L), _rand(rng, c, L, L)
    r_q = jnp.sum(qemb, axis=2)
    e_q = jnp.einsum("cij,dij->cdi", qemb, qemb)
    r_k = jnp.sum(kemb, axis=2)
    e_k = jnp.einsum("cji,dji->cdj", kemb, kemb)
    qkv = _fused(rng, q, k)
    res = (qkv, r_q, e_q, r_k, e_k)
    ct = _rand(np.random.default_rng(7), g, 8)
    out_k = pm._sums_bwd_kernel_call(*res, ct, pm._pick_sblock(S, c, L, True),
                                     interpret=True)
    out_x = pm._sums_bwd_xla(res, ct)
    for a, b in zip(out_x, out_k):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


def test_admission():
    assert pm.moments_kernel_supported(16, 4, 3584)
    assert pm.moments_kernel_supported(64, 8, 512)
    assert not pm.moments_kernel_supported(16, 4, 64)  # stripe axis too short
