"""Classification ResNet family (NHWC, flax).

Equivalent of the reference's torchvision-style classification backbone
(reference lib/models/resnet.py:1-287): BasicBlock / Bottleneck residual
stages, 7x7/s2 stem + 3x3/s2 maxpool, GAP + FC head. Includes the
nonstandard ``resnet26`` ([1,2,4,1] bottleneck, reference resnet.py:252-254).

The reference's latent bug — ``pretrained=True`` raising NameError on a
missing import (resnet.py:224) — does not apply: there is no pretrained-URL
path; checkpoints load through the framework's Orbax utilities.
"""
from __future__ import annotations

from typing import Optional, Sequence, Type

import jax.numpy as jnp
import flax.linen as nn

from ..ops import BatchNorm, conv1x1, conv2d


class BasicBlock(nn.Module):
    expansion = 1

    inplanes: int
    planes: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        identity = x
        out = conv2d(self.planes, 3, stride=self.stride, use_bias=False,
                     name="conv1", dtype=self.dtype)(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, use_bias=False, name="conv2",
                     dtype=self.dtype)(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        if self.stride != 1 or self.inplanes != self.planes * self.expansion:
            identity = conv1x1(self.planes * self.expansion, stride=self.stride,
                               name="downsample_conv", dtype=self.dtype)(x)
            identity = BatchNorm(name="downsample_bn")(
                identity, use_running_average=not train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    inplanes: int
    planes: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        identity = x
        out = conv1x1(self.planes, name="conv1", dtype=self.dtype)(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, stride=self.stride, use_bias=False,
                     name="conv2", dtype=self.dtype)(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv1x1(self.planes * self.expansion, name="conv3",
                      dtype=self.dtype)(out)
        out = BatchNorm(name="bn3")(out, use_running_average=not train)
        if self.stride != 1 or self.inplanes != self.planes * self.expansion:
            identity = conv1x1(self.planes * self.expansion, stride=self.stride,
                               name="downsample_conv", dtype=self.dtype)(x)
            identity = BatchNorm(name="downsample_bn")(
                identity, use_running_average=not train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    block: Type[nn.Module]
    layers: Sequence[int]
    num_classes: int = 1000
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = conv2d(64, 7, stride=2, use_bias=False, name="conv1",
                   dtype=self.dtype)(x)
        x = BatchNorm(name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for i, (planes, blocks) in enumerate(zip((64, 128, 256, 512),
                                                 self.layers)):
            stride = 1 if i == 0 else 2
            for b in range(blocks):
                x = self.block(
                    inplanes=inplanes, planes=planes,
                    stride=stride if b == 0 else 1,
                    dtype=self.dtype, name=f"layer{i + 1}_block{b}",
                )(x, train=train)
                inplanes = planes * self.block.expansion

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return nn.Dense(self.num_classes, name="fc", dtype=self.dtype,
                        param_dtype=jnp.float32)(x)


def resnet18(**kw):
    return ResNet(BasicBlock, (2, 2, 2, 2), **kw)


def resnet34(**kw):
    return ResNet(BasicBlock, (3, 4, 6, 3), **kw)


def resnet26(**kw):
    """Nonstandard [1,2,4,1] bottleneck net (reference resnet.py:252-254)."""
    return ResNet(Bottleneck, (1, 2, 4, 1), **kw)


def resnet50(**kw):
    return ResNet(Bottleneck, (3, 4, 6, 3), **kw)


def resnet101(**kw):
    return ResNet(Bottleneck, (3, 4, 23, 3), **kw)


def resnet152(**kw):
    return ResNet(Bottleneck, (3, 8, 36, 3), **kw)
