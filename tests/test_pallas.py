"""Fused Pallas attention kernel vs the jnp path (interpret mode on CPU).

The kernel is the eval-mode hot path; these tests pin it numerically against
the golden-verified jnp implementation for every attention mode and for the
four layer geometries the models actually use.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medt_tpu.ops import AxialAttention

INTERPRET = jax.default_backend() == "cpu"


def _run_pair(mode, out_planes, groups, span, axis="h", n=2, m=None):
    """Same weights + drifted stats through jnp path and fused path."""
    m = m or span
    c_in = 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(n, span, m, c_in)).astype(np.float32)
        if axis == "h" else
        rng.normal(size=(n, m, span, c_in)).astype(np.float32)
    )
    op_ref = AxialAttention(in_planes=c_in, out_planes=out_planes, span=span,
                            groups=groups, axis=axis, mode=mode,
                            use_fused=False)
    variables = op_ref.init(jax.random.PRNGKey(0), x, train=True)
    # drift the running stats away from init so folding is non-trivial
    _, mut = op_ref.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": mut["batch_stats"]}

    y_ref = op_ref.apply(variables, x, train=False)

    import medt_tpu.ops.pallas_axial as pk
    orig = pk.axial_attention_fused
    calls = {}

    def wrapped(*args, **kw):
        calls["n"] = calls.get("n", 0) + 1
        kw["interpret"] = INTERPRET
        return orig(*args, **kw)

    pk.axial_attention_fused = wrapped
    try:
        op_fused = AxialAttention(in_planes=c_in, out_planes=out_planes,
                                  span=span, groups=groups, axis=axis,
                                  mode=mode, use_fused=True)
        y_fused = op_fused.apply(variables, x, train=False)
    finally:
        pk.axial_attention_fused = orig
    assert calls.get("n", 0) == 1, "fused kernel was not invoked"
    return np.asarray(y_ref), np.asarray(y_fused)


@pytest.mark.parametrize("mode", ["gated", "full", "wopos"])
def test_fused_matches_jnp(mode):
    y_ref, y_fused = _run_pair(mode, out_planes=8, groups=4, span=8)
    np.testing.assert_allclose(y_fused, y_ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("out_planes,groups,span", [
    (16, 8, 16),   # layer1 geometry (gp=2)
    (32, 8, 16),   # layer2 (gp=4)
    (64, 8, 8),    # layer3 (gp=8)
    (128, 8, 8),   # layer4 (gp=16)
])
def test_fused_layer_geometries(out_planes, groups, span):
    y_ref, y_fused = _run_pair("gated", out_planes, groups, span)
    np.testing.assert_allclose(y_fused, y_ref, atol=3e-4, rtol=3e-4)


def test_fused_width_axis_and_stride():
    y_ref, y_fused = _run_pair("gated", 8, 4, 8, axis="w")
    np.testing.assert_allclose(y_fused, y_ref, atol=2e-4, rtol=2e-4)


def test_train_mode_ignores_fused():
    """use_fused must not change training behavior (kernel is eval-only)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    op1 = AxialAttention(in_planes=6, out_planes=8, span=8, groups=4,
                         mode="gated", use_fused=False)
    op2 = AxialAttention(in_planes=6, out_planes=8, span=8, groups=4,
                         mode="gated", use_fused=True)
    v = op1.init(jax.random.PRNGKey(0), x, train=True)
    y1, _ = op1.apply(v, x, train=True, mutable=["batch_stats"])
    y2, _ = op2.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
