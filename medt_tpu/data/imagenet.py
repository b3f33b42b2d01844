"""Folder-per-class classification dataset (ImageNet-style).

Equivalent of the reference's classification pipeline
(reference lib/datasets/imagenet1k.py:6-56): ImageFolder layout,
RandomResizedCrop(224)/hflip train transform, Resize(256)+CenterCrop(224)
eval transform, per-channel normalization. The reference's
``DistributedSampler`` hooks (imagenet1k.py:31-34,48-51) — its only
distributed-training seam — map to ``shard`` here: each host reads only its
``process_index``-th slice, the multi-host JAX data-loading idiom.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _resize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_LINEAR)
    except ImportError:
        from PIL import Image

        return np.asarray(Image.fromarray(img).resize((size[1], size[0])))


def random_resized_crop(img, size: int, rng, scale=(0.08, 1.0),
                        ratio=(3 / 4, 4 / 3)):
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        ar = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            i = int(rng.integers(0, h - ch + 1))
            j = int(rng.integers(0, w - cw + 1))
            return _resize(img[i:i + ch, j:j + cw], (size, size))
    # fallback: center crop
    m = min(h, w)
    i, j = (h - m) // 2, (w - m) // 2
    return _resize(img[i:i + m, j:j + m], (size, size))


def center_crop(img, size: int):
    img = _resize(img, (256 * size // 224, 256 * size // 224))
    h, w = img.shape[:2]
    i, j = (h - size) // 2, (w - size) // 2
    return img[i:i + size, j:j + size]


class ImageFolderDataset:
    """<root>/<class_name>/*.png|jpg -> (image, class_index, filename)."""

    def __init__(self, root: str, img_size: int = 224, train: bool = True,
                 shard: Optional[Tuple[int, int]] = None):
        self.root = root
        self.img_size = img_size
        self.train = train
        self.classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples = [
            (os.path.join(root, c, f), self.class_to_idx[c])
            for c in self.classes
            for f in sorted(os.listdir(os.path.join(root, c)))
        ]
        if shard is not None:
            index, count = shard
            self.samples = self.samples[index::count]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int, rng=None):
        rng = rng if rng is not None else np.random.default_rng()
        path, label = self.samples[idx]
        try:
            import cv2

            img = cv2.imread(path, 1)[..., ::-1]  # BGR -> RGB
        except ImportError:
            from PIL import Image

            img = np.asarray(Image.open(path).convert("RGB"))
        if self.train:
            img = random_resized_crop(img, self.img_size, rng)
            if rng.random() < 0.5:
                img = img[:, ::-1]
        else:
            img = center_crop(img, self.img_size)
        img = img.astype(np.float32) / 255.0
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        return np.ascontiguousarray(img), np.int32(label), os.path.basename(path)
