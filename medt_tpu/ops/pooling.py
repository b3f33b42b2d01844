"""Pooling and resampling ops (NHWC).

Equivalents of the reference's ``nn.AvgPool2d(stride)`` downsample inside
axial attention (reference axialnet.py:47-48, 89-90) and the decoder's
``F.interpolate(scale_factor=2, mode='bilinear')`` upsample
(reference axialnet.py:493-501). Both lower to pure XLA ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def avg_pool_2x(x, stride: int):
    """Average pool with window == stride (torch AvgPool2d(stride, stride))."""
    window = (1, stride, stride, 1)
    summed = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add, window, window, "VALID"
    )
    return (summed / float(stride * stride)).astype(x.dtype)


def upsample_bilinear_2x(x):
    """Bilinear 2x upsample with half-pixel centers (align_corners=False).

    Matches torch ``F.interpolate(scale_factor=(2,2), mode='bilinear')`` with
    its default ``align_corners=False``, which is the same sampling grid as
    ``jax.image.resize(method='bilinear')``.
    """
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")
