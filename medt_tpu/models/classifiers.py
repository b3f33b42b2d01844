"""Axial-attention ImageNet classifiers and a conv autoencoder.

``AxialAttentionNet`` rebuilds the zoo's classification backbone
(reference lib/models/model_codes.py:834-937): 7x7/s2 conv stem + 3x3/s2
maxpool, four axial stages at widths int({128,256,512,1024}*s) with spans
56/56/28/14 (for 224px inputs), GAP + FC. Factories axial26s / axial50s /
axial50m / axial50l follow model_codes.py:2259-2277.

``ConvAutoencoder`` is the zoo's small conv autoencoder
(model_codes.py:2224-2256): a 3-level stride-2 conv encoder and mirrored
bilinear-upsample decoder.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..ops import BatchNorm, conv2d, upsample_bilinear_2x
from .blocks import AxialStage


class AxialAttentionNet(nn.Module):
    layers: Sequence[int] = (1, 2, 4, 1)
    num_classes: int = 1000
    groups: int = 8
    base_width: int = 64
    s: float = 0.5
    img_size: int = 224
    attention_mode: str = "full"
    use_fused: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        s = self.s
        inplanes = int(64 * s)
        x = conv2d(inplanes, 7, stride=2, use_bias=False, name="conv1",
                   dtype=self.dtype)(x)
        x = BatchNorm(name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # span schedule scaled off the post-stem extent (56 at 224px input)
        base = self.img_size // 4
        stage_cfg = [
            (int(128 * s), 1, base),
            (int(256 * s), 2, base),
            (int(512 * s), 2, base // 2),
            (int(1024 * s), 2, base // 4),
        ]
        for i, ((planes, stride, span), blocks) in enumerate(
                zip(stage_cfg, self.layers)):
            stage = AxialStage(
                inplanes=inplanes, planes=planes, blocks=blocks, span=span,
                stride=stride, groups=self.groups, base_width=self.base_width,
                attention_mode=self.attention_mode, use_fused=self.use_fused,
                dtype=self.dtype, name=f"layer{i + 1}",
            )
            x = stage(x, train=train)
            inplanes = stage.out_planes

        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc", dtype=self.dtype,
                        param_dtype=jnp.float32)(x)


def axial26s(**kw):
    kw.setdefault("s", 0.5)
    return AxialAttentionNet(layers=(1, 2, 4, 1), **kw)


def axial50s(**kw):
    kw.setdefault("s", 0.5)
    return AxialAttentionNet(layers=(3, 4, 6, 3), **kw)


def axial50m(**kw):
    kw.setdefault("s", 0.75)
    return AxialAttentionNet(layers=(3, 4, 6, 3), **kw)


def axial50l(**kw):
    kw.setdefault("s", 1.0)
    return AxialAttentionNet(layers=(3, 4, 6, 3), **kw)


class ConvAutoencoder(nn.Module):
    """Small conv autoencoder (zoo, reference model_codes.py:2224-2256)."""

    widths: Sequence[int] = (16, 32, 64)
    out_channels: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i, w in enumerate(self.widths):
            x = conv2d(w, 3, stride=2, use_bias=False, name=f"enc{i}",
                       dtype=self.dtype)(x)
            x = BatchNorm(name=f"enc_bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)
        for i, w in enumerate(reversed(self.widths[:-1])):
            x = conv2d(w, 3, use_bias=False, name=f"dec{i}", dtype=self.dtype)(x)
            x = BatchNorm(name=f"dec_bn{i}")(x, use_running_average=not train)
            x = nn.relu(upsample_bilinear_2x(x))
        x = conv2d(self.out_channels, 3, use_bias=True,
                   in_features=self.widths[0], name="dec_out",
                   dtype=self.dtype)(x)
        return upsample_bilinear_2x(x)
