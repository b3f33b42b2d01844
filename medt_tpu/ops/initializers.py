"""Parameter initializers matching the reference's PyTorch defaults.

The reference relies on torch's default layer initialization plus two custom
rules (reference axialnet.py:94-97):

* ``qkv_transform.weight ~ N(0, 1/in_planes)``  (std = sqrt(1/in_planes))
* ``relative ~ N(0, 1/group_planes)``           (std = sqrt(1/group_planes))

Torch's default ``nn.Conv2d``/``nn.Conv1d`` init is kaiming_uniform(a=sqrt(5))
which collapses to ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` with
``fan_in = in_channels * prod(kernel_size)``; the bias uses the same bound.
We reproduce those distributions natively so a fresh model here is drawn from
the same initialization law as a fresh reference model (exact per-draw equality
is impossible across RNGs and is not a goal).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import random


def _conv_fan_in(shape):
    """Fan-in of a flax conv kernel shaped (*window, in_features, out_features)."""
    if len(shape) < 2:
        raise ValueError(f"conv kernel must have rank >= 2, got {shape}")
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return shape[-2] * receptive


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-b, b) with b = 1/sqrt(fan_in): torch Conv default (kaiming_uniform a=sqrt(5))."""
    bound = 1.0 / np.sqrt(_conv_fan_in(shape))
    return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_conv_bias_init(fan_in):
    """Bias init bound to a given fan-in (torch computes it from the weight shape)."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def normal_by_fan(fan):
    """N(0, sqrt(1/fan)) — the reference's custom qkv / relative-embedding init."""
    std = float(np.sqrt(1.0 / fan))

    def init(key, shape, dtype=jnp.float32):
        return std * random.normal(key, shape, dtype)

    return init
