"""Exactness of the fused one-pass moments kernel (ops/pallas_moments.py)
against the factorized XLA einsums it replaces
(ops/pallas_axial_train.py::logit_moments_lanes / qk_moments_lanes), values
AND gradients, including multi-stripe-block accumulation."""
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


@pytest.mark.parametrize("g,c,L,S", [(2, 2, 8, 256), (1, 4, 16, 128),
                                     (2, 1, 8, 128)])
def test_logit_moments_fused_matches(g, c, L, S):
    rng = np.random.default_rng(0)
    q, k = _rand(rng, g, c, L, S), _rand(rng, g, c, L, S)
    qemb, kemb = _rand(rng, c, L, L), _rand(rng, c, L, L)
    m_ref, v_ref, n_ref = logit_moments_lanes(q, k, qemb, kemb)
    m, v, n = pm.logit_moments_lanes_fused(q, k, qemb, kemb)
    assert n == n_ref
    np.testing.assert_allclose(m, m_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(v, v_ref, rtol=1e-5, atol=1e-5)


def test_qk_moments_fused_matches():
    rng = np.random.default_rng(1)
    g, c, L, S = 2, 2, 8, 256
    q, k = _rand(rng, g, c, L, S), _rand(rng, g, c, L, S)
    m_ref, v_ref, n_ref = qk_moments_lanes(q, k)
    m, v, n = pm.qk_moments_lanes_fused(q, k)
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
    m, v, _ = pm.logit_moments_lanes_fused(q, k, qemb, kemb)
    np.testing.assert_allclose(m, m_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(v, v_ref, rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    """Grad of a scalar mixing mean and var must match autodiff through the
    XLA reference for every input (q, k, qemb, kemb)."""
    rng = np.random.default_rng(3)
    g, c, L, S = 2, 2, 8, 128
    q, k = _rand(rng, g, c, L, S), _rand(rng, g, c, L, S)
    qemb, kemb = _rand(rng, c, L, L), _rand(rng, c, L, L)
    wm, wv = _rand(rng, 3, g), _rand(rng, 3, g)

    def loss(fn, q, k, qe, ke):
        m, v, _ = fn(q, k, qe, ke)
        return jnp.sum(m * wm) + jnp.sum(v * wv)

    args = (q, k, qemb, kemb)
    g_ref = jax.grad(lambda *a: loss(logit_moments_lanes, *a),
                     argnums=(0, 1, 2, 3))(*args)
    g_fus = jax.grad(lambda *a: loss(pm.logit_moments_lanes_fused, *a),
                     argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


def test_gradients_match_reference_wopos():
    rng = np.random.default_rng(4)
    g, c, L, S = 2, 2, 8, 128
    q, k = _rand(rng, g, c, L, S), _rand(rng, g, c, L, S)
    wm, wv = _rand(rng, g), _rand(rng, g)

    def loss(fn, q, k):
        m, v, _ = fn(q, k)
        return jnp.sum(m * wm) + jnp.sum(v * wv)

    g_ref = jax.grad(lambda *a: loss(qk_moments_lanes, *a),
                     argnums=(0, 1))(q, k)
    g_fus = jax.grad(lambda *a: loss(pm.qk_moments_lanes_fused, *a),
                     argnums=(0, 1))(q, k)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


def _grad_pair(q, k, qemb, kemb, wm, wv):
    def loss(fn, q, k, qe, ke):
        m, v, _ = fn(q, k, qe, ke)
        return jnp.sum(m * wm) + jnp.sum(v * wv)

    g_ref = jax.grad(lambda *a: loss(logit_moments_lanes, *a),
                     argnums=(0, 1, 2, 3))(q, k, qemb, kemb)
    g_fus = jax.grad(lambda *a: loss(pm.logit_moments_lanes_fused, *a),
                     argnums=(0, 1, 2, 3))(q, k, qemb, kemb)
    return g_ref, g_fus


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
    g_ref, g_fus = _grad_pair(q, k, qemb, kemb, wm, wv)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


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
    res = (q, k, r_q, e_q, r_k, e_k)
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
