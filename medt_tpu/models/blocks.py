"""Axial bottleneck blocks.

One block class parameterized by attention mode replaces the reference's three
near-identical classes (``AxialBlock`` reference axialnet.py:262-302,
``AxialBlock_dynamic`` :304-344, ``AxialBlock_wopos`` :346-391). Shape flow
(expansion=2): conv1x1 down to ``width`` -> BN -> ReLU -> height attention ->
width attention (carries the stride) -> ReLU -> conv1x1 up to ``planes*2`` ->
BN -> residual add (optionally through a strided 1x1+BN downsample) -> ReLU.

(The reference's wopos block also constructs an extra ``conv1`` layer that its
forward never uses, axialnet.py:358 — dead weight we do not reproduce.)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops import AxialAttention, BatchNorm, conv1x1
from ..ops.lanes_layout import (
    Conv1x1Lanes,
    lanes_resident_enabled,
    from_lanes,
    swap_lanes,
    to_lanes,
)


class AxialBlock(nn.Module):
    """Residual bottleneck around a (height, width) axial-attention pair.

    With ``lanes_resident`` the block computes entirely in the fused
    kernels' (C, A, n, B) activation layout (ops/lanes_layout.py): the 1x1
    convs become feature-axis einsums, the BNs normalize over the leading
    feature axis, and the attention pair is entered with zero relayout
    copies — only one (C,H,n,W)<->(C,W,n,H) swap between the two
    attentions and one back at the block end. Param tree is identical to
    the NHWC forward.
    """

    expansion = 2

    inplanes: int
    planes: int
    span: int
    stride: int = 1
    groups: int = 8
    base_width: int = 64
    attention_mode: str = "full"   # full | gated | wopos | gated_sig | gated_data
    gate_init: Tuple[float, float, float, float] = (0.1, 0.1, 0.1, 1.0)
    trainable_gates: bool = False
    use_attention: bool = True     # False = pure-conv ablation (zoo AxialBlockmod)
    use_fused: bool = False        # fused Pallas kernel on the eval path
    lanes_resident: bool = False   # x in/out are lanes activations (C,H,n*W)
    lanes_batch: int = 0           # static batch n for the lanes layout's
    #                                (n, B) splits (set by AxialStage)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.lanes_resident:
            return self._lanes_forward(x, train)
        width = int(self.planes * (self.base_width / 64.0))
        out_planes = self.planes * self.expansion
        needs_downsample = self.stride != 1 or self.inplanes != out_planes

        identity = x
        out = conv1x1(width, name="conv_down", dtype=self.dtype)(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)

        if self.use_attention:
            out = AxialAttention(
                in_planes=width, out_planes=width, span=self.span,
                groups=self.groups, axis="h", mode=self.attention_mode,
                gate_init=self.gate_init,
                trainable_gates=self.trainable_gates, use_fused=self.use_fused,
                dtype=self.dtype, name="attn_h",
            )(out, train=train)
            out = AxialAttention(
                in_planes=width, out_planes=width, span=self.span,
                groups=self.groups, axis="w", stride=self.stride,
                mode=self.attention_mode, gate_init=self.gate_init,
                trainable_gates=self.trainable_gates,
                use_fused=self.use_fused, dtype=self.dtype, name="attn_w",
            )(out, train=train)
        else:
            # attention-disabled ablation (zoo AxialBlockmod,
            # reference lib/models/model_codes.py:661-716): 3x3 conv instead,
            # strided to keep the downsample schedule identical.
            from ..ops import conv2d
            out = conv2d(width, 3, stride=self.stride, use_bias=False,
                         name="conv_mid", dtype=self.dtype)(out)
        out = nn.relu(out)

        out = conv1x1(out_planes, name="conv_up", dtype=self.dtype)(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)

        if needs_downsample:
            identity = conv1x1(out_planes, stride=self.stride,
                               name="downsample_conv", dtype=self.dtype)(x)
            identity = BatchNorm(name="downsample_bn")(
                identity, use_running_average=not train
            )

        return nn.relu(out + identity)

    def _lanes_forward(self, x, train: bool):
        """Lanes-resident forward: x is (C_in, H, n*W), h-oriented; the
        return is (C_out, H', n*W') h-oriented for the next block. Same
        math, params, and running stats as the NHWC forward above."""
        width = int(self.planes * (self.base_width / 64.0))
        out_planes = self.planes * self.expansion
        needs_downsample = self.stride != 1 or self.inplanes != out_planes
        n = self.lanes_batch
        assert n > 0, "lanes_resident blocks need lanes_batch"

        out = Conv1x1Lanes(width, name="conv_down", dtype=self.dtype)(x)
        out = BatchNorm(name="bn1", feature_axes=0)(
            out, use_running_average=not train)
        out = nn.relu(out)

        out = AxialAttention(
            in_planes=width, out_planes=width, span=self.span,
            groups=self.groups, axis="h", mode=self.attention_mode,
            gate_init=self.gate_init,
            trainable_gates=self.trainable_gates, use_fused=self.use_fused,
            lanes_io=True, lanes_batch=n, dtype=self.dtype, name="attn_h",
        )(out, train=train)
        out = swap_lanes(out, n)  # -> (width, W, n*H) for the width attention
        out = AxialAttention(
            in_planes=width, out_planes=width, span=self.span,
            groups=self.groups, axis="w", stride=self.stride,
            mode=self.attention_mode, gate_init=self.gate_init,
            trainable_gates=self.trainable_gates,
            use_fused=self.use_fused, lanes_io=True, lanes_batch=n,
            dtype=self.dtype, name="attn_w",
        )(out, train=train)
        out = nn.relu(out)

        out = Conv1x1Lanes(out_planes, name="conv_up", dtype=self.dtype)(out)
        out = BatchNorm(name="bn2", feature_axes=0)(
            out, use_running_average=not train)
        if self.stride == 1:
            out = swap_lanes(out, n)  # back to (C, H, n*W) h-orientation
        # (strided blocks come back h-oriented already: the attention's
        # lanes pool fuses the re-orientation — see avg_pool_2x_lanes)

        identity = x
        if needs_downsample:
            identity = Conv1x1Lanes(out_planes, stride=self.stride,
                                    name="downsample_conv",
                                    dtype=self.dtype)(x, n=n)
            identity = BatchNorm(name="downsample_bn", feature_axes=0)(
                identity, use_running_average=not train)

        return nn.relu(out + identity)


class AxialStage(nn.Module):
    """A stack of AxialBlocks — the reference's ``_make_layer``
    (axialnet.py:443-469): first block carries stride + downsample; the span
    halves after a strided block; later blocks keep inplanes = planes*2.
    """

    inplanes: int
    planes: int
    blocks: int
    span: int
    stride: int = 1
    groups: int = 8
    base_width: int = 64
    attention_mode: str = "full"
    gate_init: Tuple[float, float, float, float] = (0.1, 0.1, 0.1, 1.0)
    trainable_gates: bool = False
    use_attention: bool = True
    use_fused: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        span = self.span
        inplanes = self.inplanes
        # stage-level lanes residency: enter the fused kernels' layout once,
        # run every block in it, convert back once at the stage boundary
        # (the pure-conv ablation's 3x3 conv needs NHWC, so it opts out)
        resident = (self.use_fused and self.use_attention
                    and lanes_resident_enabled())
        n = x.shape[0]
        if resident:
            x = to_lanes(x)
        for i in range(self.blocks):
            stride = self.stride if i == 0 else 1
            x = AxialBlock(
                inplanes=inplanes, planes=self.planes, span=span,
                stride=stride, groups=self.groups, base_width=self.base_width,
                attention_mode=self.attention_mode,
                gate_init=self.gate_init,
                trainable_gates=self.trainable_gates,
                use_attention=self.use_attention,
                use_fused=self.use_fused,
                lanes_resident=resident,
                lanes_batch=n if resident else 0,
                dtype=self.dtype, name=f"block{i}",
            )(x, train=train)
            inplanes = self.planes * AxialBlock.expansion
            if i == 0 and self.stride != 1:
                span = span // 2
        if resident:
            x = from_lanes(x, n)
        return x

    @property
    def out_planes(self):
        return self.planes * AxialBlock.expansion
