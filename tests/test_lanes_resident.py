"""Lanes-resident stages: layout-only rewrite must preserve the math.

The lanes-resident forward (models/blocks.py AxialBlock._lanes_forward,
ops/lanes_layout.py) computes every AxialBlock in the fused kernels'
(C, A, n, B) activation layout. These tests pin:

  * forward/train equivalence vs the NHWC forward under identical params
    (both on the XLA fallback and with kernel-admitted geometries),
  * an identical parameter/stat tree (checkpoints are layout-agnostic),
  * gradient equivalence through a train step.

Reference semantics under test: axialnet.py:262-302 (block math) — the
layout is ours, the math is theirs.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from medt_tpu.models import build_model
from medt_tpu.training import adam_l2, init_state, train_step


def _apply(model, v, x, train):
    if train:
        return jax.jit(lambda v, x: model.apply(
            v, x, train=True, mutable=["batch_stats"]))(v, x)
    return jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x), None


def _toggle(flag):
    os.environ["MEDT_TPU_LANES_RESIDENT"] = flag


@pytest.fixture(autouse=True)
def _restore_flag():
    yield
    os.environ.pop("MEDT_TPU_LANES_RESIDENT", None)


def test_model_matches_nhwc_and_tree_identical():
    """gatedaxialunet fwd/train parity + param-tree identity (img 32:
    exercises the jnp-fallback conversion glue — no kernel admits S=64)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    model = build_model("gatedaxialunet", img_size=32, use_fused=True)

    _toggle("0")
    v = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    y0, _ = _apply(model, v, x, train=False)
    y0t, mut0 = _apply(model, v, x, train=True)

    _toggle("1")
    v1 = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    # identical tree: same init values regardless of layout
    jax.tree_util.tree_map(np.testing.assert_array_equal, v, v1)

    y1, _ = _apply(model, v, x, train=False)
    y1t, mut1 = _apply(model, v, x, train=True)
    np.testing.assert_allclose(y0, y1, atol=2e-6)
    np.testing.assert_allclose(y0t, y1t, atol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-4), mut0, mut1)


def test_train_step_grads_match():
    """One optimizer step from identical states lands on the same params."""
    rng = np.random.default_rng(1)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, size=(2, 32, 32))),
    }
    model = build_model("gatedaxialunet", img_size=32, use_fused=True)
    _toggle("0")
    state = init_state(model, adam_l2(1e-3), (2, 32, 32, 3))
    s0, m0 = jax.jit(train_step)(state, batch)
    _toggle("1")
    s1, m1 = jax.jit(train_step)(state, batch)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(a, b, atol=5e-5)


@pytest.mark.slow
def test_kernel_admitted_geometry_matches():
    """img 64 b4: stage-1 span 32 with S=128 admits the flash family, so the
    resident path feeds kernels through the zero-copy view (interpret mode
    on CPU)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
    model = build_model("gatedaxialunet", img_size=64, use_fused=True)
    _toggle("0")
    v = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    y0t, _ = _apply(model, v, x, train=True)
    _toggle("1")
    y1t, _ = _apply(model, v, x, train=True)
    np.testing.assert_allclose(y0t, y1t, atol=2e-4)
