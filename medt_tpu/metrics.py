"""Segmentation metrics — on-device JAX versions of the reference's Python
metrics (reference metrics.py:23-91) and of the offline MATLAB evaluation
protocol (reference performancemetrics_{glas,monuseg,ax}.m), which this
module retires.

Logits/outputs are NHWC (channel-last); labels are NHW integer maps.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

EPSILON = 1e-32


def classwise_iou(output, gt):
    """Soft IoU over raw outputs (reference metrics.py:23-35: intersection =
    output * onehot(gt), no argmax — a quirk preserved as documented)."""
    n_classes = output.shape[-1]
    onehot = jax.nn.one_hot(gt, n_classes, dtype=output.dtype)
    axes = tuple(range(output.ndim - 1))
    intersection = jnp.sum(output * onehot, axis=axes)
    union = jnp.sum(output + onehot, axis=axes) - intersection
    return (intersection + EPSILON) / (union + EPSILON)


def classwise_f1(output, gt):
    """Per-class F1 on argmax predictions (reference metrics.py:38-57)."""
    eps = 1e-20
    n_classes = output.shape[-1]
    pred = jnp.argmax(output, axis=-1)
    pred_oh = jax.nn.one_hot(pred, n_classes, dtype=jnp.float32)
    gt_oh = jax.nn.one_hot(gt, n_classes, dtype=jnp.float32)
    axes = tuple(range(pred.ndim))
    tp = jnp.sum(pred_oh * gt_oh, axis=axes)
    selected = jnp.sum(pred_oh, axis=axes)
    relevant = jnp.sum(gt_oh, axis=axes)
    precision = (tp + eps) / (selected + eps)
    recall = (tp + eps) / (relevant + eps)
    return 2 * precision * recall / (precision + recall)


def jaccard_index(output, gt, weights=None):
    """Alias kept for API parity. The reference's weighted wrapper computes
    weights then ignores them and returns classwise scores
    (reference metrics.py:60-91) — we keep the signature, return classwise."""
    del weights
    return classwise_iou(output, gt)


def f1_score(output, gt, weights=None):
    del weights
    return classwise_f1(output, gt)


def accuracy(output, target):
    """Top-1 classification accuracy (reference lib/utils.py:58-61)."""
    pred = jnp.argmax(output, axis=-1)
    return jnp.mean((pred == target).astype(jnp.float32))


# ---------------------------------------------------------------------------
# The MATLAB grading protocol (reference performancemetrics_glas.m:30-88):
# per image, binarize prediction and ground truth, accumulate pixel
# tp/fp/fn/tn of the foreground class, report F1 = 2tp/(2tp+fp+fn),
# IoU = tp/union, pixel-accuracy tp/(tp+fp); images with tp == 0 are scored
# 1.0 in the original scripts (a flattering edge case, glas.m:72-76) — off by
# default here, available behind ``empty_score_one`` for bit-parity sweeps.
# ---------------------------------------------------------------------------

def binary_seg_scores(pred_fg: jnp.ndarray, gt_fg: jnp.ndarray,
                      empty_score_one: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-image (F1, IoU, pixel-accuracy) of the foreground class.

    Args:
      pred_fg / gt_fg: (N, H, W) boolean or {0,1} maps.
    Returns three (N,) arrays.
    """
    pred = pred_fg.astype(jnp.float32)
    gt = gt_fg.astype(jnp.float32)
    axes = (1, 2)
    tp = jnp.sum(pred * gt, axis=axes)
    fp = jnp.sum(pred * (1 - gt), axis=axes)
    fn = jnp.sum((1 - pred) * gt, axis=axes)
    union = tp + fp + fn
    f1 = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-12)
    iou = tp / jnp.maximum(union, 1e-12)
    pa = tp / jnp.maximum(tp + fp, 1e-12)
    if empty_score_one:
        ones = jnp.ones_like(f1)
        f1 = jnp.where(tp == 0, ones, f1)
        iou = jnp.where(tp == 0, ones, iou)
        pa = jnp.where(tp == 0, ones, pa)
    return f1, iou, pa


def logits_to_foreground(logits: jnp.ndarray, threshold: float = 0.5,
                         mode: str = "threshold") -> jnp.ndarray:
    """Foreground map from raw logits.

    ``threshold`` mode reproduces the reference's quirk of thresholding RAW
    LOGITS of channel 1 at 0.5 (reference train.py:188-213, test.py:109-146);
    ``argmax`` is the corrected decision rule, available behind a flag.
    """
    if mode == "threshold":
        return (logits[..., 1] >= threshold).astype(jnp.int32)
    if mode == "argmax":
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    raise ValueError(mode)


class Metric:
    """Running average (reference lib/metrics.py:4-16)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def average(self):
        return self.sum / max(self.count, 1)


class MetricList:
    """Dict of accumulating metric callables (reference utils.py:264-282)."""

    def __init__(self, metrics: dict):
        self.metrics = metrics
        self.results = {k: 0.0 for k in metrics}

    def __call__(self, y_out, y_batch):
        for k, fn in self.metrics.items():
            self.results[k] += fn(y_out, y_batch)

    def reset(self):
        self.results = {k: 0.0 for k in self.metrics}

    def get_results(self, normalize=False):
        if not normalize:
            return dict(self.results)
        return {k: v / normalize for k, v in self.results.items()}
