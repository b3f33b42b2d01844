"""Axial-attention op vs the NumPy golden re-derivation of the reference math."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medt_tpu.ops import AxialAttention, relative_logit_index
from np_golden import axial_attention_golden


def _flatten_params(params, mode):
    out = {
        "qkv_kernel": np.asarray(params["qkv"]["kernel"]),
        "bn_qkv_scale": np.asarray(params["bn_qkv_scale"]),
        "bn_qkv_bias": np.asarray(params["bn_qkv_bias"]),
        "bn_similarity_scale": np.asarray(params["bn_similarity_scale"]),
        "bn_similarity_bias": np.asarray(params["bn_similarity_bias"]),
        "bn_output_scale": np.asarray(params["bn_output_scale"]),
        "bn_output_bias": np.asarray(params["bn_output_bias"]),
    }
    if mode != "wopos":
        out["relative"] = np.asarray(params["relative"])
    return out


def _randomize_bn(params, rng):
    """Non-trivial BN affine params so the test can't pass with identity BN."""
    def walk(p):
        for k, v in p.items():
            if isinstance(v, dict):
                walk(v)
            elif k.endswith("_scale") or k == "scale":
                p[k] = jnp.asarray(rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
            elif k.endswith("_bias") or k == "bias":
                p[k] = jnp.asarray(rng.normal(0, 0.1, v.shape).astype(np.float32))
    params = jax.tree_util.tree_map(lambda x: x, params)  # copy
    walk(params)
    return params


@pytest.mark.parametrize("mode", ["full", "gated", "wopos"])
@pytest.mark.parametrize("axis,stride", [("h", 1), ("w", 1), ("w", 2)])
def test_matches_numpy_golden(mode, axis, stride):
    n, c_in, h, w = 2, 6, 8, 8
    out_planes, groups = 8, 4
    rng = np.random.default_rng(42)
    x_nchw = rng.normal(size=(n, c_in, h, w)).astype(np.float32)
    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))

    op = AxialAttention(
        in_planes=c_in, out_planes=out_planes, span=8, groups=groups,
        stride=stride, axis=axis, mode=mode,
    )
    variables = op.init(jax.random.PRNGKey(0), x_nhwc, train=True)
    params = _randomize_bn(variables["params"], rng)

    y, _ = op.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        x_nhwc, train=True, mutable=["batch_stats"],
    )
    got = np.asarray(y).transpose(0, 3, 1, 2)  # NHWC -> NCHW

    want = axial_attention_golden(
        x_nchw, _flatten_params(params, mode),
        groups=groups, out_planes=out_planes, span=8,
        width_axis=(axis == "w"), mode=mode, stride=stride,
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_relative_index_table():
    """Gather index matches the reference's flatten_index construction."""
    span = 5
    idx = relative_logit_index(span)
    assert idx.shape == (span, span)
    # query i attending key j looks up offset (i - j) centered at span-1
    assert idx[0, 0] == span - 1
    assert idx[4, 0] == 2 * span - 2
    assert idx[0, 4] == 0
    assert (idx >= 0).all() and (idx < 2 * span - 1).all()


def test_output_shapes_and_stride():
    x = jnp.zeros((2, 16, 16, 8))
    op = AxialAttention(in_planes=8, out_planes=16, span=16, groups=8,
                        stride=2, axis="w", mode="gated")
    variables = op.init(jax.random.PRNGKey(0), x, train=False)
    y = op.apply(variables, x, train=False)
    assert y.shape == (2, 8, 8, 16)


def test_eval_uses_running_stats():
    """Eval output must differ from train output once stats have drifted."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    op = AxialAttention(in_planes=6, out_planes=8, span=8, groups=4, mode="gated")
    variables = op.init(jax.random.PRNGKey(1), x, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    y_train, mut = op.apply(
        {"params": params, "batch_stats": stats}, x, train=True,
        mutable=["batch_stats"],
    )
    y_eval = op.apply(
        {"params": params, "batch_stats": mut["batch_stats"]}, x, train=False
    )
    assert not np.allclose(np.asarray(y_train), np.asarray(y_eval))


def test_gated_data_mode_runs():
    """Zoo variant: per-sample gates from a GAP->MLP head (model_codes.py:316-444)."""
    x = jnp.zeros((2, 8, 8, 8))
    op = AxialAttention(in_planes=8, out_planes=8, span=8, groups=4,
                        mode="gated_data")
    variables = op.init(jax.random.PRNGKey(0), x, train=True)
    y, _ = op.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 8, 8, 8)
