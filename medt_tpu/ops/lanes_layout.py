"""Lanes-resident activation layout for axial stages.

The fused axial-attention kernels (ops/pallas_axial_lanes.py) compute in a
``(g, ch, L, S)`` layout — features major, the attended axis on sublanes,
the S = batch x other-axis stripe dimension on lanes. The NHWC model glue
originally converted to that layout and back around EVERY attention call:
two qkv/sv-sized relayout copies each way, mirrored again in the backward.
An XPlane trace of the gatedaxialunet train step showed those copies plus
the NHWC BN/1x1-conv fusions at ~19 of 62 ms/step (30%).

An AxialBlock is nothing but 1x1 convs, BNs, ReLUs and the attention pair
(reference axialnet.py:262-302) — none of which care about the physical
layout. So a whole stage can stay RESIDENT in the kernels' layout:

    lanes activation == (C, A, S)   with  S = n * B

``C`` the feature axis (major), ``A`` the axis about to be attended, and
``S`` the flattened (batch, other-spatial-axis) stripe dimension with the
batch major — kernels consume it as ``(g, ch, A, S)`` via a reshape that
splits only the MAJOR feature axis, i.e. a true zero-cost view.

Why 3-D and not the earlier (C, A, n, B): TPU physical layouts tile the two
MINOR dims as (8 sublanes, 128 lanes). A 4-D (C, A, n, B) activation tiles
(n, B) — so the kernels' (·, ·, A, S) layout, which tiles (A, S), required
a full retile copy of qkv at EVERY attention entry (profiled at ~3.7 ms of
the 66 ms gatedaxialunet b56 step), and at B = 64 (every 128px model stage)
the 128-lane tiles were HALF padding, doubling the HBM traffic of every
lanes-resident op (1x1 convs, BNs, ReLUs). The merged S = n*B lane axis is
dense at any geometry and physically identical to the kernel operand
layout.

The only per-block layout work is one (C, H, n*W) <-> (C, W, n*H) re-
orientation between the height and width attentions and one back at the
block end — everything else (1x1 projections as feature-axis einsums that
keep S on lanes for the MXU, BNs over the leading feature axis,
pooling/striding fused into the orientation swaps) computes in place. NHWC
conversion happens once per stage boundary (models/blocks.py AxialStage).

Ops that must split S back into (n, B) — the orientation swap, pooling,
strided subsampling, NHWC conversion — take the static batch ``n``
explicitly.

The module mirrors ``nn.Conv``/``nn.Dense`` param trees exactly (same
names, shapes, and initializers), so a model checkpoint is layout-agnostic:
lanes-resident and NHWC forwards load the same params.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax.numpy as jnp
import flax.linen as nn

from .initializers import torch_conv_kernel_init


def lanes_resident_enabled() -> bool:
    """Env kill-switch (MEDT_TPU_LANES_RESIDENT=0) for A/B and debugging."""
    return os.environ.get("MEDT_TPU_LANES_RESIDENT", "1") != "0"


def to_lanes(x):
    """NHWC (n, H, W, C) -> lanes (C, H, n*W), height-oriented."""
    n, h, w, c = x.shape
    return jnp.transpose(x, (3, 1, 0, 2)).reshape(c, h, n * w)


def from_lanes(xl, n: int):
    """Lanes (C, A, S) -> NHWC (n, A, B, C)."""
    c, a, s = xl.shape
    return jnp.transpose(xl.reshape(c, a, n, s // n), (2, 1, 3, 0))


def swap_lanes(xl, n: int):
    """(C, A, n*B) -> (C, B, n*A): re-orient for the other spatial axis."""
    c, a, s = xl.shape
    b = s // n
    x = jnp.transpose(xl.reshape(c, a, n, b), (0, 3, 2, 1))  # (C, B, n, A)
    return x.reshape(c, b, n * a)


def avg_pool_2x_lanes(xl, stride: int, n: int):
    """AvgPool2d(stride, stride) on (C, A, n*B) — returns RE-ORIENTED
    (C, B/s, n*(A/s)).

    The lane (minor) axis must never be split by a pooling reshape — doing
    so forces a retiling copy of the whole activation (measured ~2.7 ms per
    strided block each way on v5e). Instead both pools run on the cheap
    sublane axis, with the caller's orientation swap fused in between:
    pool A (sublanes) -> re-orient -> pool the former B (now on sublanes).
    Strided blocks therefore get their h/w re-orientation for free and skip
    the separate block-end swap (models/blocks.py)."""
    c, a, s = xl.shape
    b = s // n
    # the NHWC avg_pool_2x uses VALID reduce_window (odd extents truncate);
    # the reshape windows here require exact divisibility — make the
    # divergence explicit rather than failing with a reshape error
    assert a % stride == 0 and b % stride == 0, (
        f"avg_pool_2x_lanes needs extents divisible by stride, got "
        f"({a}, {b}) % {stride}; use the NHWC path for odd extents")
    x = xl.astype(jnp.float32)
    x = x.reshape(c, a // stride, stride, s).mean(axis=2)      # pool A
    x = x.reshape(c, a // stride, n, b)
    x = jnp.transpose(x, (0, 3, 2, 1))                          # (C,B,n,A/s)
    x = x.reshape(c, b // stride, stride, n * (a // stride)).mean(axis=2)
    return x.astype(xl.dtype)


def _feature_dot(xl, kernel_cf, dtype):
    """(C, L, S) x (C, F) -> (F, L, S) with the feature dim on the dot's
    LHS: the MXU output (F, L*S) is then natively lanes-major — an einsum
    with F on the RHS ("cls,cf->fls") makes XLA compute the NHWC-style
    (ls, f) product and physically relayout the result, which reintroduces
    exactly the per-op copies this layout exists to avoid."""
    dt = dtype or xl.dtype
    return jnp.einsum("fc,cls->fls", kernel_cf.T.astype(dt), xl.astype(dt))


class Conv1x1Lanes(nn.Module):
    """1x1 conv on a lanes activation; param tree identical to ``conv1x1``.

    The kernel keeps ``nn.Conv``'s (1, 1, C_in, F) shape and torch init so
    checkpoints transfer between the NHWC and lanes-resident forwards. A
    stride subsamples both spatial axes first (torch stride-2 1x1 conv ==
    every-other-pixel then matmul); that path needs the static batch ``n``
    to split S back into (n, B).
    """

    features: int
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xl, n: Optional[int] = None):
        kernel = self.param(
            "kernel", torch_conv_kernel_init,
            (1, 1, xl.shape[0], self.features), jnp.float32,
        )
        if self.stride > 1:
            assert n is not None, "strided Conv1x1Lanes needs the batch n"
            c, a, s = xl.shape
            xl = xl.reshape(c, a, n, s // n)[:, ::self.stride, :,
                                             ::self.stride]
            xl = xl.reshape(c, xl.shape[1], n * xl.shape[3])
        return _feature_dot(xl, kernel[0, 0], self.dtype)


class DenseLanes(nn.Module):
    """Feature-axis dense on a lanes activation; mirrors ``nn.Dense``
    (kernel (C_in, F), no bias) so the qkv projection's param tree is
    unchanged."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xl):
        kernel = self.param("kernel", self.kernel_init,
                            (xl.shape[0], self.features), jnp.float32)
        return _feature_dot(xl, kernel, self.dtype)
