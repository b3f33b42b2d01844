"""Dense-prediction feature extractors.

Equivalents of the reference's PSPNet-style backbones
(reference extractors.py:1-373, dead code there but inventoried): a dilated
ResNet that keeps 1/8 output stride by converting the last two stages'
strides into dilation, a SqueezeNet (Fire modules), and a DenseNet. All
return (features, shallow_features) pairs for segmentation heads.

The reference's ``load_weights_sequential`` torchvision-weight loader has no
equivalent here — checkpoints load via Orbax.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..ops import BatchNorm, conv1x1, conv2d


class DilatedBottleneck(nn.Module):
    expansion = 4

    inplanes: int
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        identity = x
        out = conv1x1(self.planes, name="conv1", dtype=self.dtype)(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, stride=self.stride, use_bias=False,
                     dilation=self.dilation, name="conv2", dtype=self.dtype)(out)
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


class DilatedResNet(nn.Module):
    """ResNet backbone with output stride 8: stages 3/4 trade stride for
    dilation 2/4 (the reference extractors.py ResNet pattern)."""

    layers: Sequence[int] = (3, 4, 23, 3)  # resnet101 by default
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = conv2d(64, 7, stride=2, use_bias=False, name="conv1",
                   dtype=self.dtype)(x)
        x = BatchNorm(name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        shallow = None
        cfg = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        for i, ((planes, stride, dilation), blocks) in enumerate(
                zip(cfg, self.layers)):
            for b in range(blocks):
                x = DilatedBottleneck(
                    inplanes=inplanes, planes=planes,
                    stride=stride if b == 0 else 1, dilation=dilation,
                    dtype=self.dtype, name=f"layer{i + 1}_block{b}",
                )(x, train=train)
                inplanes = planes * DilatedBottleneck.expansion
            if i == 0:
                shallow = x
        return x, shallow


class Fire(nn.Module):
    """SqueezeNet Fire module (reference extractors.py SqueezeNet)."""

    squeeze: int
    expand: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = nn.relu(conv2d(self.squeeze, 1, padding=0, use_bias=True,
                           in_features=x.shape[-1], name="squeeze",
                           dtype=self.dtype)(x))
        e1 = conv2d(self.expand, 1, padding=0, use_bias=True,
                    in_features=self.squeeze, name="expand1x1",
                    dtype=self.dtype)(s)
        e3 = conv2d(self.expand, 3, use_bias=True, in_features=self.squeeze,
                    name="expand3x3", dtype=self.dtype)(s)
        return nn.relu(jnp.concatenate([e1, e3], axis=-1))


class SqueezeNetExtractor(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        del train
        x = nn.relu(conv2d(64, 3, stride=2, use_bias=True,
                           in_features=x.shape[-1], name="conv1",
                           dtype=self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = Fire(16, 64, name="fire2", dtype=self.dtype)(x)
        x = Fire(16, 64, name="fire3", dtype=self.dtype)(x)
        shallow = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = Fire(32, 128, name="fire4", dtype=self.dtype)(x)
        x = Fire(32, 128, name="fire5", dtype=self.dtype)(x)
        x = Fire(48, 192, name="fire6", dtype=self.dtype)(x)
        x = Fire(48, 192, name="fire7", dtype=self.dtype)(x)
        x = Fire(64, 256, name="fire8", dtype=self.dtype)(x)
        x = Fire(64, 256, name="fire9", dtype=self.dtype)(x)
        return x, shallow


class DenseLayer(nn.Module):
    growth: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = BatchNorm(name="bn1")(x, use_running_average=not train)
        y = conv1x1(4 * self.growth, name="conv1", dtype=self.dtype)(nn.relu(y))
        y = BatchNorm(name="bn2")(y, use_running_average=not train)
        y = conv2d(self.growth, 3, use_bias=False, name="conv2",
                   dtype=self.dtype)(nn.relu(y))
        return jnp.concatenate([x, y], axis=-1)


class DenseNetExtractor(nn.Module):
    """DenseNet-121-shaped feature extractor (reference extractors.py)."""

    block_config: Sequence[int] = (6, 12, 24, 16)
    growth: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = conv2d(64, 7, stride=2, use_bias=False, name="conv0",
                   dtype=self.dtype)(x)
        x = BatchNorm(name="bn0")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        shallow = None
        for i, n_layers in enumerate(self.block_config):
            for j in range(n_layers):
                x = DenseLayer(self.growth, name=f"block{i}_layer{j}",
                               dtype=self.dtype)(x, train=train)
            if i == 0:
                shallow = x
            if i != len(self.block_config) - 1:
                x = BatchNorm(name=f"trans{i}_bn")(x, use_running_average=not train)
                x = conv1x1(x.shape[-1] // 2, name=f"trans{i}_conv",
                            dtype=self.dtype)(nn.relu(x))
                # keep output stride 8: only the first transition pools
                if i == 0:
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x, shallow


EXTRACTOR_REGISTRY = {
    "resnet101_dilated": lambda **kw: DilatedResNet(layers=(3, 4, 23, 3), **kw),
    "resnet50_dilated": lambda **kw: DilatedResNet(layers=(3, 4, 6, 3), **kw),
    "squeezenet": SqueezeNetExtractor,
    "densenet": DenseNetExtractor,
}
