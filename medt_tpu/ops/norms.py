"""Batch normalization with exact torch semantics.

The reference leans on ``nn.BatchNorm1d/2d`` in three unusual places inside
axial attention (reference axialnet.py:36-39, 62, 75, 82), and SURVEY.md ranks
"BatchNorm semantics everywhere" as the #1 parity risk, so we implement BN
ourselves instead of using ``flax.linen.BatchNorm``:

* torch normalizes with the **biased** batch variance but pushes the
  **unbiased** variance into the running estimate; flax uses biased for both.
* torch's ``momentum=0.1`` means ``running = 0.9*running + 0.1*batch``
  (flax's momentum is the complement).
* the attention BNs normalize over *stacked/grouped* feature layouts, which we
  express directly with multi-axis features instead of reshape gymnastics.

Statistics are always accumulated in float32 regardless of compute dtype.
Under `jit` over a sharded mesh the reductions are global-batch (GSPMD inserts
the collectives), i.e. BN is cross-replica-synced by construction — a
documented improvement over the reference's unsynced ``nn.DataParallel``
replicas (reference train.py:104-108).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

Axes = Union[int, Sequence[int]]


def _canonical_axes(rank: int, axes: Axes) -> Tuple[int, ...]:
    if isinstance(axes, int):
        axes = (axes,)
    return tuple(sorted(a % rank for a in axes))


def _bshape(x, feature_axes):
    shape = [1] * x.ndim
    for a in feature_axes:
        shape[a] = x.shape[a]
    return shape


def batch_norm_train(x, scale, bias, feature_axes: Axes, epsilon: float = 1e-5):
    """Functional train-mode BN (torch semantics).

    Returns (y, batch_mean, batch_var_unbiased) — the caller owns the
    running-stat update. Statistics accumulate in float32.
    """
    feature_axes = _canonical_axes(x.ndim, feature_axes)
    reduction_axes = tuple(a for a in range(x.ndim) if a not in feature_axes)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=reduction_axes)
    var = jnp.mean(jnp.square(xf), axis=reduction_axes) - jnp.square(mean)
    var = jnp.maximum(var, 0.0)
    shape = _bshape(x, feature_axes)
    inv = lax.rsqrt(var.reshape(shape) + epsilon)
    y = (xf - mean.reshape(shape)) * inv
    y = y * scale.astype(jnp.float32).reshape(shape) \
        + bias.astype(jnp.float32).reshape(shape)
    n = float(np.prod([x.shape[a] for a in reduction_axes]))
    var_unbiased = var * (n / max(n - 1.0, 1.0))
    return y.astype(x.dtype), mean, var_unbiased


def batch_norm_eval(x, scale, bias, mean, var, feature_axes: Axes,
                    epsilon: float = 1e-5):
    """Functional eval-mode BN using running statistics."""
    feature_axes = _canonical_axes(x.ndim, feature_axes)
    shape = _bshape(x, feature_axes)
    inv = lax.rsqrt(var.astype(jnp.float32).reshape(shape) + epsilon)
    y = (x.astype(jnp.float32) - mean.astype(jnp.float32).reshape(shape)) * inv
    y = y * scale.astype(jnp.float32).reshape(shape) \
        + bias.astype(jnp.float32).reshape(shape)
    return y.astype(x.dtype)


class BatchNorm(nn.Module):
    """Torch-semantics batch norm over all axes except ``feature_axes``.

    Attributes:
      feature_axes: axis (or axes) holding per-channel parameters. Multi-axis
        features support the attention's stacked-similarity BN, where the
        feature layout is (3, groups).
      momentum: torch convention — weight of the *new* batch statistic.
      use_running_average: eval mode; may be overridden per-call.
    """

    feature_axes: Axes = -1
    momentum: float = 0.1
    epsilon: float = 1e-5
    use_running_average: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _canonical_axes(x.ndim, self.feature_axes)
        feature_shape = tuple(x.shape[a] for a in feature_axes)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(feature_shape, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(feature_shape, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, feature_shape, self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, feature_shape, self.param_dtype)

        if use_running_average:
            y = batch_norm_eval(x, scale, bias, ra_mean.value, ra_var.value,
                                feature_axes, self.epsilon)
        else:
            y, mean, var_unbiased = batch_norm_train(
                x, scale, bias, feature_axes, self.epsilon
            )
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * var_unbiased
        return y.astype(self.dtype or x.dtype)
