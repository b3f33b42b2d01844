"""Host-side data pipeline: datasets, joint transforms, prefetching loader."""
from .dataset import Image2D, ImageToImage2D
from .loader import DataLoader, collate
from .transforms import JointTransform2D, to_float01

__all__ = [
    "DataLoader",
    "Image2D",
    "ImageToImage2D",
    "JointTransform2D",
    "collate",
    "to_float01",
]
