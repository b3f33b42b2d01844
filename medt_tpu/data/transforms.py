"""Joint image/mask augmentation.

NumPy re-design of the reference's PIL-based ``JointTransform2D``
(reference utils.py:43-98): random crop, horizontal flip, optional color
jitter (image only), optional random affine, and long-mask label encoding.
All transforms are pure host-side array ops driven by an explicit
``np.random.Generator`` — no global RNG state, reproducible per worker.

Images are converted to float32 in [0, 1] channel-last (the torchvision
``to_tensor`` scaling without the CHW transpose — the models are NHWC).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


def to_float01(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 HWC in [0,1] (torchvision to_tensor scaling)."""
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def _rand_crop_params(rng, h, w, ch, cw):
    i = int(rng.integers(0, h - ch + 1)) if h > ch else 0
    j = int(rng.integers(0, w - cw + 1)) if w > cw else 0
    return i, j


def _adjust_brightness(img, factor):
    return np.clip(img * factor, 0.0, 1.0)


def _adjust_contrast(img, factor):
    mean = img.mean()
    return np.clip((img - mean) * factor + mean, 0.0, 1.0)


def _adjust_saturation(img, factor):
    gray = img.mean(axis=-1, keepdims=True)
    return np.clip((img - gray) * factor + gray, 0.0, 1.0)


@dataclass
class JointTransform2D:
    """Applies the same geometric transform to image and mask.

    Args mirror the reference (utils.py:60-68): ``crop`` (size tuple or
    None), ``p_flip``, ``color_jitter_params`` (brightness, contrast,
    saturation, hue — hue is ignored, documented), ``p_random_affine``
    (unused by the live scripts; 90-degree-rotation approximation),
    ``long_mask`` (int labels instead of float mask).
    """

    crop: Optional[Tuple[int, int]] = (32, 32)
    p_flip: float = 0.5
    color_jitter_params: Optional[Tuple[float, float, float, float]] = (
        0.1, 0.1, 0.1, 0.1)
    p_random_affine: float = 0.0
    long_mask: bool = False

    def __call__(self, image: np.ndarray, mask: np.ndarray, rng=None):
        rng = rng if rng is not None else np.random.default_rng()
        image = to_float01(image)
        if image.ndim == 2:
            image = image[..., None]
        if mask.ndim == 3:
            mask = mask[..., 0]

        if self.crop:
            ch, cw = self.crop
            i, j = _rand_crop_params(rng, image.shape[0], image.shape[1], ch, cw)
            image = image[i:i + ch, j:j + cw]
            mask = mask[i:i + ch, j:j + cw]

        if rng.random() < self.p_flip:
            image = image[:, ::-1]
            mask = mask[:, ::-1]

        if self.color_jitter_params:
            b, c, s, _h = self.color_jitter_params
            image = _adjust_brightness(image, 1.0 + rng.uniform(-b, b))
            image = _adjust_contrast(image, 1.0 + rng.uniform(-c, c))
            if image.shape[-1] == 3:
                image = _adjust_saturation(image, 1.0 + rng.uniform(-s, s))

        if self.p_random_affine and rng.random() < self.p_random_affine:
            k = int(rng.integers(0, 4))
            image = np.rot90(image, k, axes=(0, 1))
            mask = np.rot90(mask, k, axes=(0, 1))

        image = np.ascontiguousarray(image, np.float32)
        if self.long_mask:
            mask = np.ascontiguousarray(mask, np.int32)
        else:
            mask = np.ascontiguousarray(to_float01(mask), np.float32)
        return image, mask
