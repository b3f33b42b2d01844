"""TPU-native op library: axial attention, norms, convs, pooling, kernels."""
from .axial_attention import (
    AxialAttention,
    MODE_FULL,
    MODE_GATED,
    MODE_GATED_DATA,
    MODE_GATED_SIG,
    MODE_WOPOS,
    relative_logit_index,
)
from .convs import conv1x1, conv2d
from .norms import BatchNorm
from .pooling import avg_pool_2x, upsample_bilinear_2x

__all__ = [
    "AxialAttention",
    "BatchNorm",
    "MODE_FULL",
    "MODE_GATED",
    "MODE_GATED_DATA",
    "MODE_GATED_SIG",
    "MODE_WOPOS",
    "avg_pool_2x",
    "conv1x1",
    "conv2d",
    "relative_logit_index",
    "upsample_bilinear_2x",
]
