"""Convolution wrappers (NHWC) with torch-default initialization.

Thin helpers over ``flax.linen.Conv`` so every conv in the model zoo draws its
parameters from the same distribution as the reference's ``nn.Conv2d``
defaults (kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
bias likewise — see ops/initializers.py).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from .initializers import torch_conv_kernel_init, torch_conv_bias_init


def conv2d(
    features: int,
    kernel_size: int,
    stride: int = 1,
    padding: Optional[int] = None,
    use_bias: bool = True,
    name: Optional[str] = None,
    in_features: Optional[int] = None,
    dtype=None,
    dilation: int = 1,
):
    """torch-style Conv2d: explicit symmetric padding, torch default init.

    ``padding`` defaults to ``kernel_size // 2`` ("same" for odd kernels at
    stride 1, and torch's floor-division output size at stride 2 — e.g. the
    reference's 7x7/s2/p3 stem and 3x3/s2/p1 decoder1).
    ``in_features`` is only needed when ``use_bias`` (torch scales the bias
    bound by the weight's fan-in).
    """
    if padding is None:
        padding = (kernel_size // 2) * dilation
    bias_init = nn.initializers.zeros
    if use_bias:
        assert in_features is not None, "bias init needs fan_in; pass in_features"
        bias_init = torch_conv_bias_init(in_features * kernel_size * kernel_size)
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        kernel_init=torch_conv_kernel_init,
        bias_init=bias_init,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def conv1x1(features: int, stride: int = 1, name: Optional[str] = None, dtype=None):
    """1x1 conv, no bias (reference axialnet.py:14-16)."""
    return conv2d(features, 1, stride=stride, padding=0, use_bias=False,
                  name=name, dtype=dtype)
