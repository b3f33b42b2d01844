"""Synthetic datasets for tests and benchmarks.

Writes tiny PNG datasets matching the on-disk contract (``img/`` +
``labelcol/``), and provides an in-memory dataset for loader-free benchmarks.
"""
from __future__ import annotations

import os

import numpy as np


def make_png_dataset(root: str, n: int = 8, img_size: int = 64,
                     gray: bool = False, seed: int = 0) -> str:
    """Create a blob-segmentation PNG dataset under ``root``."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "img")
    lab_dir = os.path.join(root, "labelcol")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)

    yy, xx = np.mgrid[0:img_size, 0:img_size]
    for i in range(n):
        cx, cy = rng.integers(8, img_size - 8, size=2)
        r = int(rng.integers(4, img_size // 4))
        mask = ((xx - cx) ** 2 + (yy - cy) ** 2 < r * r)
        noise = rng.integers(0, 80, size=(img_size, img_size), dtype=np.uint8)
        img = np.where(mask, 200, 60).astype(np.uint8) + noise // 4
        if not gray:
            img = np.stack([img, img // 2, 255 - img], axis=-1)
        Image.fromarray(img).save(os.path.join(img_dir, f"{i:03d}.png"))
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(lab_dir, f"{i:03d}.png")
        )
    return root


class InMemoryDataset:
    """Pre-generated arrays with the (image, mask, name) protocol."""

    def __init__(self, n: int = 8, img_size: int = 64, chans: int = 3,
                 seed: int = 0):
        rng = np.random.default_rng(seed)
        self.images = rng.normal(size=(n, img_size, img_size, chans)).astype(
            np.float32
        )
        self.masks = rng.integers(0, 2, size=(n, img_size, img_size)).astype(
            np.int32
        )

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx, rng=None):
        return self.images[idx], self.masks[idx], f"{idx:03d}.png"
