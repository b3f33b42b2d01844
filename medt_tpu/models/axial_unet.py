"""ResAxialAttentionUNet — the single-branch axial-attention U-Net.

TPU-native rebuild of the reference architecture (reference axialnet.py:397-507):
3-conv stem (7x7/s2 -> 3x3 -> 3x3), four axial stages with [1,2,4,1] blocks and
widths int({128,256,512,1024}*s), a light conv decoder with bilinear x2
upsampling and *add* (not concat) skip fusion, and a 1x1 head emitting raw
logits (the reference defines a softmax it never applies, axialnet.py:440).

Per-stage attention spans follow the reference schedule: kernel_size =
img_size // {2, 2, 4, 8}, halved again inside a stage after its strided block
(axialnet.py:425-431, 461-462) — so the span always equals the live spatial
extent. decoder1's stride-2 conv cancels its own x2 upsample, landing the
output back at the input resolution (axialnet.py:434, 493).

Layout is NHWC end to end; all compute lowers to XLA convs/matmuls.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops import BatchNorm, conv2d, upsample_bilinear_2x
from .blocks import AxialBlock, AxialStage


class ConvStem(nn.Module):
    """imgchan -> inplanes -> 128 -> inplanes, first conv 7x7 stride 2."""

    inplanes: int
    mid: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = conv2d(self.inplanes, 7, stride=2, use_bias=False, name="conv1",
                   dtype=self.dtype)(x)
        x = BatchNorm(name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = conv2d(self.mid, 3, use_bias=False, name="conv2", dtype=self.dtype)(x)
        x = BatchNorm(name="bn2")(x, use_running_average=not train)
        x = nn.relu(x)
        x = conv2d(self.inplanes, 3, use_bias=False, name="conv3", dtype=self.dtype)(x)
        x = BatchNorm(name="bn3")(x, use_running_average=not train)
        return nn.relu(x)


def _up_block(x, features, in_features, name, dtype):
    """decoder conv (3x3, bias) -> bilinear x2 -> relu."""
    y = conv2d(features, 3, use_bias=True, in_features=in_features,
               name=name, dtype=dtype)(x)
    return nn.relu(upsample_bilinear_2x(y))


class ResAxialAttentionUNet(nn.Module):
    """Encoder/decoder axial-attention U-Net emitting raw NHWC logits."""

    layers: Sequence[int] = (1, 2, 4, 1)
    num_classes: int = 2
    groups: int = 8
    base_width: int = 64
    s: float = 0.125
    img_size: int = 128
    attention_mode: str = "full"     # "full" -> axialunet, "gated" -> gatedaxialunet
    gate_init: Tuple[float, float, float, float] = (0.1, 0.1, 0.1, 1.0)
    trainable_gates: bool = False
    use_attention: bool = True
    use_fused: bool = False          # fused Pallas attention on the eval path
    stem_mode: str = "triple"        # "single" = zoo unetplus stem (one 7x7 conv)
    final_softmax: bool = False      # zoo unetplus applies softmax at the head
    num_stages: int = 4              # 2 = zoo shallow variant (model_codes.py:2097)
    deep_supervision: bool = False   # aux logits per decoder stage (unetplus heads)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        s = self.s
        inplanes = int(64 * s)
        stage_planes = [int(128 * s), int(256 * s), int(512 * s), int(1024 * s)]
        stage_spans = [
            self.img_size // 2, self.img_size // 2,
            self.img_size // 4, self.img_size // 8,
        ]
        stage_strides = [1, 2, 2, 2]

        if self.stem_mode == "triple":
            x = ConvStem(inplanes=inplanes, dtype=self.dtype, name="stem")(
                x, train=train)
        else:
            # zoo unetplus stem: one 7x7/s2 conv (model_codes.py:1112-1115)
            x = conv2d(inplanes, 7, stride=2, use_bias=False, name="stem_conv",
                       dtype=self.dtype)(x)
            x = BatchNorm(name="stem_bn")(x, use_running_average=not train)
            x = nn.relu(x)

        if self.num_stages == 2:
            return self._shallow_tail(x, inplanes, stage_planes, stage_spans,
                                      train)

        skips = []
        for i in range(4):
            stage = AxialStage(
                inplanes=inplanes, planes=stage_planes[i], blocks=self.layers[i],
                span=stage_spans[i], stride=stage_strides[i], groups=self.groups,
                base_width=self.base_width, attention_mode=self.attention_mode,
                gate_init=self.gate_init,
            trainable_gates=self.trainable_gates,
                use_attention=self.use_attention,
                use_fused=self.use_fused,
                dtype=self.dtype, name=f"layer{i + 1}",
            )
            x = stage(x, train=train)
            inplanes = stage.out_planes
            skips.append(x)
        x1, x2, x3, x4 = skips

        # decoder1: stride-2 conv + x2 upsample cancel out; fuse at x4's scale
        d = conv2d(int(1024 * 2 * s), 3, stride=2, use_bias=True,
                   in_features=int(1024 * 2 * s), name="decoder1",
                   dtype=self.dtype)(x4)
        d = nn.relu(upsample_bilinear_2x(d)) + x4
        d = _up_block(d, int(1024 * s), int(1024 * 2 * s), "decoder2", self.dtype) + x3
        d = _up_block(d, int(512 * s), int(1024 * s), "decoder3", self.dtype) + x2
        d = _up_block(d, int(256 * s), int(512 * s), "decoder4", self.dtype) + x1
        d = _up_block(d, int(128 * s), int(256 * s), "decoder5", self.dtype)

        logits = conv2d(self.num_classes, 1, padding=0, use_bias=True,
                        in_features=int(128 * s), name="adjust",
                        dtype=self.dtype)(nn.relu(d))
        if self.deep_supervision:
            # multi-scale deep-supervision heads, one per encoder stage: the
            # reference's unetplus declares a 3x3 refine (inter1..4, channels
            # 32/64/128/256 == the four stage outputs at s=0.125) and a 1x1
            # num_classes head (inte1..4) per scale that its forward never
            # calls (model_codes.py:1134-1143) — made real here, emitting
            # aux logits at each stage's native resolution
            aux = []
            for i, skip in enumerate(skips):
                ch = skip.shape[-1]
                h = conv2d(ch, 3, use_bias=True, in_features=ch,
                           name=f"inter{i + 1}", dtype=self.dtype)(skip)
                h = conv2d(self.num_classes, 1, padding=0, use_bias=True,
                           in_features=ch, name=f"inte{i + 1}",
                           dtype=self.dtype)(nn.relu(h))
                aux.append(nn.softmax(h, axis=-1) if self.final_softmax else h)
            if self.final_softmax:
                return nn.softmax(logits, axis=-1), tuple(aux)
            return logits, tuple(aux)
        if self.final_softmax:
            return nn.softmax(logits, axis=-1)
        return logits

    def _shallow_tail(self, x, inplanes, stage_planes, stage_spans, train):
        """2-stage encoder + 2-stage decoder (zoo ResAxialAttentionUNetshallow,
        reference model_codes.py:2097-2222)."""
        s = self.s
        stage1 = AxialStage(
            inplanes=inplanes, planes=stage_planes[0], blocks=self.layers[0],
            span=stage_spans[0], groups=self.groups,
            base_width=self.base_width, attention_mode=self.attention_mode,
            gate_init=self.gate_init,
            trainable_gates=self.trainable_gates,
            use_attention=self.use_attention, use_fused=self.use_fused,
            dtype=self.dtype, name="layer1",
        )
        x1 = stage1(x, train=train)
        stage2 = AxialStage(
            inplanes=stage1.out_planes, planes=stage_planes[1],
            blocks=self.layers[1], span=stage_spans[1], stride=2,
            groups=self.groups, base_width=self.base_width,
            attention_mode=self.attention_mode,
            gate_init=self.gate_init,
            trainable_gates=self.trainable_gates,
            use_attention=self.use_attention, use_fused=self.use_fused,
            dtype=self.dtype, name="layer2",
        )
        x2 = stage2(x1, train=train)
        d = _up_block(x2, int(256 * s), int(512 * s), "decoder4", self.dtype) + x1
        d = _up_block(d, int(128 * s), int(256 * s), "decoder5", self.dtype)
        logits = conv2d(self.num_classes, 1, padding=0, use_bias=True,
                        in_features=int(128 * s), name="adjust",
                        dtype=self.dtype)(nn.relu(d))
        return nn.softmax(logits, axis=-1) if self.final_softmax else logits
