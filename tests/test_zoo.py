"""Zoo, classifier, extractor, and builder-facade tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medt_tpu.builders import (
    CLASSIFIER_REGISTRY,
    build_dataloader,
    build_model,
    build_optimizer,
)
from medt_tpu.models import MODEL_REGISTRY
from medt_tpu.models import build_model as build_seg_model


@pytest.mark.parametrize("name", ["unetplusplus", "shallow", "axialunet_wopos"])
def test_zoo_segmentation_variants(name):
    model = build_seg_model(name, img_size=32)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    if name == "unetplusplus":
        logits, aux = y
        assert logits.shape == (1, 32, 32, 2)
        # one aux head per encoder stage at its native scale (the reference
        # declares inter1..4/inte1..4, model_codes.py:1134-1143)
        assert len(aux) == 4
        assert [a.shape[1] for a in aux] == [16, 8, 4, 2]
        assert all(a.shape[-1] == 2 for a in aux)
        # softmax head: rows sum to 1 (model_codes.py:1225 applies soft)
        np.testing.assert_allclose(np.asarray(logits).sum(-1), 1.0, atol=1e-5)
    else:
        assert y.shape == (1, 32, 32, 2)


def test_mix_net_gated_d_forward_and_train():
    """Dual-branch LoGo with data-gated blocks in BOTH branches
    (reference model_codes.py:2306-2308): forward shape, per-sample gate
    params exist in both branch trees, and a train step reduces."""
    from medt_tpu.training import adam_l2, init_state, train_step

    model = build_seg_model("mix_net_gated_d", img_size=64, patch_grid=2)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 64, 64, 2)
    # the GAP->MLP gate head (gate_fc1/gate_fc2) must appear in global AND
    # local branch attention params
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    paths = {jax.tree_util.keystr(p) for p, _ in flat}
    gate_paths = {p for p in paths if "gate_fc1" in p}
    assert any("_p" in p or "local" in p for p in gate_paths), sorted(gate_paths)[:5]
    assert any("_p" not in p and "local" not in p for p in gate_paths), \
        sorted(gate_paths)[:5]

    state = init_state(model, adam_l2(1e-3), (2, 64, 64, 3))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, size=(2, 64, 64))),
    }
    state, metrics = jax.jit(train_step)(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_deep_supervision_train_step():
    """The train step consumes (logits, aux) outputs via the multi-scale
    deep-supervision loss and still reduces a scalar."""
    from medt_tpu.training import adam_l2, init_state, train_step

    model = build_seg_model("unetplusplus", img_size=32)
    state = init_state(model, adam_l2(1e-3), (2, 32, 32, 3))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, size=(2, 32, 32))),
    }
    state, metrics = jax.jit(train_step)(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_autoencoder_roundtrip_shape():
    model = build_seg_model("autoencoder")
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 32, 32, 3)


@pytest.mark.parametrize("name", ["resnet18", "resnet26", "axial26s"])
def test_classifiers(name):
    class Args:
        model = name
        num_classes = 10
    model = build_model(Args)
    img = 64 if name.startswith("resnet") else 64
    x = jnp.zeros((2, img, img, 3))
    kw = {"img_size": img} if name.startswith("axial") else {}
    if kw:
        model = CLASSIFIER_REGISTRY[name](num_classes=10, **kw)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 10)


def test_extractors_output_stride():
    from medt_tpu.models.extractors import EXTRACTOR_REGISTRY

    x = jnp.zeros((1, 32, 32, 3))
    for name in ("resnet50_dilated", "squeezenet", "densenet"):
        model = EXTRACTOR_REGISTRY[name]()
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False)
        feats, shallow = jax.jit(model.apply, static_argnames="train")(
            variables, x, train=False)
        assert feats.shape[1] == 32 // 8, (name, feats.shape)  # output stride 8
        assert shallow.shape[1] >= feats.shape[1]


def test_builder_facade_dataloader_and_optimizer(tmp_path):
    from PIL import Image

    for split in ("train", "val"):
        for cls in ("a", "b"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                Image.fromarray(
                    np.random.default_rng(i).integers(
                        0, 255, size=(40, 40, 3), dtype=np.uint8
                    )
                ).save(d / f"{i}.png")

    class Args:
        train_dataset = str(tmp_path / "train")
        val_dataset = str(tmp_path / "val")
        imgsize = 32
        batch_size = 2
        workers = 0
        optimizer = "sgd"
        lr = 0.1
        momentum = 0.9
        weight_decay = 1e-4

    train_loader, val_loader = build_dataloader(Args)
    batch = next(iter(train_loader))
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["label"].shape == (2,)
    assert len(train_loader) == 3  # 6 samples / batch 2

    tx = build_optimizer(Args)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    up, _ = tx.update({"w": jnp.ones((3,))}, st, params)
    assert np.all(np.isfinite(np.asarray(up["w"])))


def test_sliding_window_inference():
    from medt_tpu.evaluation.sliding_window import sliding_window_inference

    # identity "model": logits = input channels summed -> 2 constant maps
    def apply_fn(tiles):
        s = jnp.sum(tiles, axis=-1, keepdims=True)
        return jnp.concatenate([s, -s], axis=-1)

    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(70, 90, 3)).astype(np.float32))
    out = sliding_window_inference(img, apply_fn, window=32, stride=16,
                                   batch_size=4)
    assert out.shape == (70, 90, 2)
    # a pointwise model must be blend-invariant: overlaps average identical
    # values, so output == direct application
    want = np.concatenate([np.asarray(img).sum(-1, keepdims=True),
                           -np.asarray(img).sum(-1, keepdims=True)], axis=-1)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_sliding_window_small_image_pads():
    from medt_tpu.evaluation.sliding_window import sliding_window_inference

    def apply_fn(tiles):
        return tiles[..., :2]

    img = jnp.zeros((20, 20, 3))
    out = sliding_window_inference(img, apply_fn, window=32)
    assert out.shape == (20, 20, 2)
