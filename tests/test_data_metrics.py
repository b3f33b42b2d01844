"""Data pipeline, metrics, and eval-protocol tests."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from medt_tpu.data import DataLoader, ImageToImage2D, JointTransform2D
from medt_tpu.data.synthetic import make_png_dataset
from medt_tpu.metrics import (
    binary_seg_scores,
    classwise_f1,
    classwise_iou,
    logits_to_foreground,
)
from medt_tpu.evaluation import evaluate_png_dir, sweep_checkpoint_grid


def test_png_dataset_contract(tmp_path):
    root = make_png_dataset(str(tmp_path / "ds"), n=6, img_size=32)
    tf = JointTransform2D(crop=None, p_flip=0.5, color_jitter_params=None,
                          long_mask=True)
    ds = ImageToImage2D(root, tf)
    assert len(ds) == 6
    img, mask, name = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert img.max() <= 1.0
    assert mask.shape == (32, 32) and mask.dtype == np.int32
    assert set(np.unique(mask)) <= {0, 1}
    assert name.endswith(".png")


def test_decode_cache_serves_after_first_epoch(tmp_path):
    """cache='auto' keeps decoded pairs in RAM: after a full pass, items are
    served without touching disk, and random transforms still vary."""
    root = make_png_dataset(str(tmp_path / "ds"), n=4, img_size=32)
    tf = JointTransform2D(crop=(16, 16), p_flip=0.5, color_jitter_params=None,
                          long_mask=True)
    ds = ImageToImage2D(root, tf)
    first = [ds.__getitem__(i, rng=np.random.default_rng(i))[0]
             for i in range(4)]
    assert len(ds._cache) == 4 and ds._cache_enabled
    # remove the files: a second epoch must succeed purely from the cache
    for sub in ("img", "labelcol"):
        for f in os.listdir(os.path.join(root, sub)):
            os.remove(os.path.join(root, sub, f))
    second = [ds.__getitem__(i, rng=np.random.default_rng(i))[0]
              for i in range(4)]
    for a, b in zip(first, second):  # same rng -> same transform
        np.testing.assert_array_equal(a, b)
    # different rng -> transforms still random (cache holds pre-transform)
    third = ds.__getitem__(0, rng=np.random.default_rng(999))[0]
    assert not np.array_equal(first[0], third)
    # cache='off' never stores
    ds_off = ImageToImage2D(root, tf, cache="off")
    assert ds_off._cache_enabled is False


def test_gray_mode_and_threshold_order(tmp_path):
    root = make_png_dataset(str(tmp_path / "ds"), n=2, img_size=32, gray=True)
    ds = ImageToImage2D(root, None, gray=True)
    img, mask, _ = ds[0]
    assert img.shape == (32, 32, 1)
    assert set(np.unique(mask)) <= {0, 1}


def test_loader_prefetch_and_determinism(tmp_path):
    root = make_png_dataset(str(tmp_path / "ds"), n=10, img_size=32)
    tf = JointTransform2D(crop=(16, 16), p_flip=0.5, color_jitter_params=None,
                          long_mask=True)
    ds = ImageToImage2D(root, tf)
    l1 = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=7)
    l2 = DataLoader(ds, batch_size=4, shuffle=True, num_workers=0, seed=7)
    b1 = list(l1)
    b2 = list(l2)
    assert len(b1) == len(b2) == 3  # 10 samples, batch 4, keep remainder
    for a, b in zip(b1, b2):  # threaded == synchronous, same seed
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])
        assert a["name"] == b["name"]
    assert b1[0]["image"].shape == (4, 16, 16, 3)


def test_classwise_metrics_match_reference_semantics():
    # perfect prediction -> iou/f1 == 1 for present classes
    gt = jnp.asarray(np.array([[[0, 1], [1, 0]]]))
    logits = jnp.asarray(
        np.stack([1.0 - np.array([[[0, 1], [1, 0]]]),
                  np.array([[[0, 1], [1, 0]]])], axis=-1).astype(np.float32)
    )
    iou = classwise_iou(logits, gt)
    f1 = classwise_f1(logits, gt)
    np.testing.assert_allclose(np.asarray(f1), [1.0, 1.0], atol=1e-6)
    assert iou.shape == (2,)


def test_binary_seg_scores_hand_computed():
    pred = jnp.asarray(np.array([[[1, 1], [0, 0]]]))
    gt = jnp.asarray(np.array([[[1, 0], [0, 0]]]))
    f1, iou, pa = binary_seg_scores(pred, gt)
    # tp=1 fp=1 fn=0 -> F1=2/3, IoU=1/2, PA=1/2
    np.testing.assert_allclose(float(f1[0]), 2 / 3, atol=1e-6)
    np.testing.assert_allclose(float(iou[0]), 1 / 2, atol=1e-6)
    np.testing.assert_allclose(float(pa[0]), 1 / 2, atol=1e-6)


def test_empty_prediction_policy():
    pred = jnp.zeros((1, 4, 4), jnp.int32)
    gt = jnp.ones((1, 4, 4), jnp.int32)
    f1, iou, pa = binary_seg_scores(pred, gt, empty_score_one=True)
    assert float(f1[0]) == 1.0  # MATLAB edge case (glas.m:72-76)
    f1, iou, pa = binary_seg_scores(pred, gt, empty_score_one=False)
    assert float(f1[0]) == 0.0  # corrected default


def test_logits_to_foreground_modes():
    logits = jnp.asarray(np.array([[[[2.0, 0.4], [0.0, 0.6]]]]))  # (1,1,2,2)
    thr = logits_to_foreground(logits, mode="threshold")
    am = logits_to_foreground(logits, mode="argmax")
    np.testing.assert_array_equal(np.asarray(thr)[0, 0], [0, 1])
    np.testing.assert_array_equal(np.asarray(am)[0, 0], [0, 1])


def test_eval_sweep_protocol(tmp_path):
    from PIL import Image
    # labels
    lab = tmp_path / "labelcol"
    lab.mkdir()
    gt = np.zeros((16, 16), np.uint8)
    gt[4:12, 4:12] = 255
    Image.fromarray(gt).save(lab / "a.png")
    # two epochs of predictions: epoch 10 bad, epoch 20 perfect
    for ep, shift in [(10, 6), (20, 0)]:
        d = tmp_path / "preds" / str(ep)
        d.mkdir(parents=True)
        pred = np.roll(gt, shift, axis=1)
        Image.fromarray(pred).save(d / "a.png")
    out = sweep_checkpoint_grid(str(tmp_path / "preds"), str(lab))
    assert out["best_epoch"] == 20
    assert abs(out["best"]["f1"] - 1.0) < 1e-6
    assert out["per_epoch"][10]["f1"] < 1.0


def test_uint8_transfer_path_matches_float(tmp_path):
    """output_dtype='uint8' ships bytes; the device-side /255 normalization
    must reproduce the host-side to_float01 path exactly."""
    from _shared import jit_train_step, shared_state

    root = make_png_dataset(str(tmp_path / "ds"), n=4, img_size=32)
    kw = dict(crop=None, p_flip=0, color_jitter_params=None, long_mask=True)
    ds_f32 = ImageToImage2D(root, JointTransform2D(**kw))
    ds_u8 = ImageToImage2D(root, JointTransform2D(output_dtype="uint8", **kw))
    img_f, mask_f, _ = ds_f32[0]
    img_u, mask_u, _ = ds_u8[0]
    assert img_u.dtype == np.uint8 and img_f.dtype == np.float32
    np.testing.assert_array_equal(img_f, img_u.astype(np.float32) / 255.0)

    _, state = shared_state("axialunet", 32, batch=1)
    _, m_f = jit_train_step(state, {"image": jnp.asarray(img_f)[None],
                                    "label": jnp.asarray(mask_f)[None]})
    _, m_u = jit_train_step(state, {"image": jnp.asarray(img_u)[None],
                                    "label": jnp.asarray(mask_u)[None]})
    # small drift allowed: XLA fuses the on-device /255 into neighboring
    # ops differently from the host-normalized program
    np.testing.assert_allclose(float(m_f["loss"]), float(m_u["loss"]),
                               atol=1e-5)
