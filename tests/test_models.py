"""Model-level tests: shapes, registry, LoGo patch coverage, channel schedule."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medt_tpu.models import (
    MODEL_REGISTRY,
    build_model,
    space_to_batch,
    batch_to_space,
)


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_registry_has_reference_names():
    # CLI-surface parity: reference train.py:95-102
    for name in ["axialunet", "gatedaxialunet", "MedT", "logo"]:
        assert name in MODEL_REGISTRY


@pytest.mark.parametrize("name,img", [("axialunet", 32), ("gatedaxialunet", 32)])
def test_unet_output_matches_input_size(name, img):
    # img 32 exercises the same stem/stage/decoder path as 64 at a quarter
    # of the single-core CPU cost (span-32+ kernels are covered by
    # tests/test_pallas.py at the kernel level)
    model = build_model(name, img_size=img)
    x = jnp.zeros((2, img, img, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    y = jax.jit(model.apply, static_argnames="train")(variables, x, train=False)
    assert y.shape == (2, img, img, 2)


@pytest.mark.parametrize("name", ["MedT", "logo"])
def test_medt_output_and_train_mode(name):
    # img 64 with a 2x2 patch grid keeps the LoGo two-branch topology
    # (space-to-batch local branch + global branch + fusion) at a quarter
    # of the 128px single-core cost; the reference 128px/4x4 geometry runs
    # in the slow tier (test_reference_parity) and on the TPU bench
    model = build_model(name, img_size=64, patch_grid=2)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    y, mut = jax.jit(
        model.apply, static_argnames=("train", "mutable"))(
        variables, x, train=True, mutable=("batch_stats",))
    assert y.shape == (1, 64, 64, 2)
    # train mode must update running statistics
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(before, after))


def test_space_to_batch_roundtrip_and_layout():
    x = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    p = space_to_batch(jnp.asarray(x), 4)
    assert p.shape == (32, 2, 2, 3)
    # patch (i=1, j=2) of sample 0 is block index 1*4+2
    np.testing.assert_array_equal(
        np.asarray(p[6]), x[0, 2:4, 4:6, :]
    )
    back = batch_to_space(p, 4)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_grayscale_single_channel():
    model = build_model("axialunet", img_size=32)
    x = jnp.zeros((1, 32, 32, 1))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    y = jax.jit(model.apply, static_argnames="train")(variables, x, train=False)
    assert y.shape == (1, 32, 32, 2)


def test_gated_gates_are_frozen_constants():
    """Released reference freezes its gates (axialnet.py:124-127): they must
    not appear as trainable params in the default gated model."""
    model = build_model("gatedaxialunet", img_size=64)
    x = jnp.zeros((1, 64, 64, 3))
    # shape-only: the assertion is about the param TREE, not values
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert not any("f_qr" in n or "f_sv" in n for n in names)


def test_512_factories_honor_explicit_img_size():
    """An explicit img_size — even 128 — must win over the 512 default
    (regression: the factory used to silently override 128 with 512)."""
    from medt_tpu.models import build_model
    assert build_model("medt_512").img_size == 512
    assert build_model("medt_512", img_size=128).img_size == 128
    assert build_model("logo_512", img_size=256).img_size == 256
    assert build_model("MedT").img_size == 128


def test_medt_512_variant_shapes():
    """512px LoGo variant: 4x4 grid of 128px patches (model_codes.py:1894)."""
    from medt_tpu.models import build_model
    model = build_model("medt_512", img_size=512)
    x = jnp.zeros((1, 512, 512, 3))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    y = jax.eval_shape(
        lambda v: model.apply(v, x, train=False), variables)
    assert y.shape == (1, 512, 512, 2)
