"""Measure the PyTorch reference's ACTUAL training throughput on this host.

bench.py's ``vs_baseline`` denominator has so far been an estimate (the
reference repo never measured throughput — its per-batch timer is commented
out, reference train.py:183-186, and its README only names the GPU,
README.md:130). This tool runs the reference's own ``train.py`` — the real
script, unmodified on disk — on host CPU torch against a synthetic dataset,
times the epochs from its own per-epoch prints, and reports measured
imgs/sec. The number is labeled host-CPU-not-Quadro; it is a *measured
floor* for the reference, complementing the clearly-marked GPU estimate.

Shims (the reference hardcodes CUDA and imports packages absent here; the
script text is executed verbatim, only the environment is adapted):
  * ``torch.device("cuda")`` / ``Tensor.to(device='cuda')`` -> cpu
    (train.py:93,134-135)
  * ``torchvision`` stub: only ``F.to_pil_image/hflip/to_tensor`` and the
    (unused at crop=None, jitter=None — train.py:85-86) crop/jitter/affine
    entry points, re-derived over PIL
  * ``skimage`` stub (imported by utils.py:5, unused by the exercised path)

Usage: python tools/measure_reference.py [--modelname MedT] [--imgsize 128]
           [--batch 4] [--epochs 4] [--n_imgs 32] [--out report.json]
"""
from __future__ import annotations

import argparse
import builtins
import json
import os
import sys
import tempfile
import time
import types

import numpy as np

REF = os.environ.get("MEDT_REFERENCE", "/root/reference")


def install_torchvision_stub():
    """Minimal torchvision over PIL — just what utils.JointTransform2D
    (reference utils.py:43-98) touches at train.py's crop=None/jitter=None."""
    import torch
    from PIL import Image

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    utils_mod = types.ModuleType("torchvision.utils")

    def to_pil_image(x):
        if isinstance(x, Image.Image):
            return x
        arr = np.asarray(x)
        if arr.ndim == 3 and arr.shape[2] == 1:
            arr = arr[:, :, 0]
        return Image.fromarray(arr)

    def hflip(img):
        return img.transpose(Image.FLIP_LEFT_RIGHT)

    def crop(img, i, j, h, w):
        return img.crop((j, i, j + w, i + h))

    def to_tensor(img):
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[None]
        else:
            arr = arr.transpose(2, 0, 1)
        return torch.from_numpy(arr.copy())

    def affine(img, angle, translate, scale, shear, **kw):
        return img.rotate(-angle, translate=tuple(translate))

    functional.to_pil_image = to_pil_image
    functional.hflip = hflip
    functional.crop = crop
    functional.to_tensor = to_tensor
    functional.affine = affine

    class ToTensor:
        def __call__(self, x):
            return to_tensor(to_pil_image(x))

    class ColorJitter:
        def __init__(self, *a, **kw):
            pass

        def __call__(self, img):
            return img

    class RandomCrop:
        @staticmethod
        def get_params(img, size):
            w, h = img.size
            th, tw = size
            i = np.random.randint(0, max(h - th, 0) + 1)
            j = np.random.randint(0, max(w - tw, 0) + 1)
            return i, j, th, tw

    class RandomAffine:
        def __init__(self, *a, **kw):
            pass

        @staticmethod
        def get_params(degrees, translate, scale_ranges, shears, img_size):
            return 0.0, (0, 0), 1.0, (0.0, 0.0)

    transforms.functional = functional
    transforms.ToTensor = ToTensor
    transforms.ColorJitter = ColorJitter
    transforms.RandomCrop = RandomCrop
    transforms.RandomAffine = RandomAffine
    utils_mod.save_image = lambda *a, **kw: None  # imported, never called

    tv.transforms = transforms
    tv.utils = utils_mod
    # the reference's lib package imports these for its dead ImageNet
    # pipeline (lib/datasets/imagenet1k.py:3); never called on this path
    tv.datasets = types.ModuleType("torchvision.datasets")
    tv.models = types.ModuleType("torchvision.models")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional
    sys.modules["torchvision.utils"] = utils_mod
    sys.modules["torchvision.datasets"] = tv.datasets
    sys.modules["torchvision.models"] = tv.models


def install_skimage_stub():
    sk = types.ModuleType("skimage")
    sk.io = types.ModuleType("skimage.io")
    sk.color = types.ModuleType("skimage.color")
    sys.modules["skimage"] = sk
    sys.modules["skimage.io"] = sk.io
    sys.modules["skimage.color"] = sk.color


def install_cpu_shim():
    """Route the reference's hardcoded CUDA targets to the CPU."""
    import torch

    # torch._dynamo evaluates `str | torch.device` annotations at import
    # time; import it with the real type before torch.device becomes a
    # plain function below.
    try:
        import torch._dynamo  # noqa: F401
    except Exception:
        pass

    _orig_device = torch.device

    def device(*a, **kw):
        if a and isinstance(a[0], str) and a[0].startswith("cuda"):
            return _orig_device("cpu")
        return _orig_device(*a, **kw)

    torch.device = device

    _orig_to = torch.Tensor.to

    def tensor_to(self, *a, **kw):
        if kw.get("device") in ("cuda", "cuda:0"):
            kw = dict(kw, device="cpu")
        a = tuple("cpu" if (isinstance(x, str) and x.startswith("cuda"))
                  else x for x in a)
        return _orig_to(self, *a, **kw)

    torch.Tensor.to = tensor_to


def make_synthetic_dataset(root: str, n: int, img: int, seed: int = 0):
    """The reference's dataset contract: <root>/img/*.png RGB images +
    <root>/labelcol/<stem>.png masks (reference utils.py:130-131,154)."""
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    os.makedirs(os.path.join(root, "labelcol"), exist_ok=True)
    for i in range(n):
        im = rng.integers(0, 256, size=(img, img, 3), dtype=np.uint8)
        mask = np.zeros((img, img), np.uint8)
        cy, cx, r = rng.integers(16, img - 16, 2).tolist() + [img // 6]
        yy, xx = np.mgrid[:img, :img]
        mask[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = 255
        cv2.imwrite(os.path.join(root, "img", f"im{i:03d}.png"), im)
        cv2.imwrite(os.path.join(root, "labelcol", f"im{i:03d}.png"), mask)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modelname", default="MedT")
    ap.add_argument("--imgsize", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--n_imgs", type=int, default=32)
    ap.add_argument("--out", default="reference_cpu_throughput.json")
    args = ap.parse_args()

    install_skimage_stub()
    install_torchvision_stub()
    install_cpu_shim()

    tmp = tempfile.mkdtemp(prefix="refbench_")
    train_dir = os.path.join(tmp, "train")
    val_dir = os.path.join(tmp, "val")
    make_synthetic_dataset(train_dir, args.n_imgs, args.imgsize)
    make_synthetic_dataset(val_dir, 2, args.imgsize, seed=1)

    # timestamp the reference's own per-epoch prints (train.py:165-166)
    epoch_times = []
    _orig_print = builtins.print

    def print_hook(*a, **kw):
        text = " ".join(str(x) for x in a)
        if text.startswith("epoch ["):
            epoch_times.append(time.time())
        return _orig_print(*a, **kw)

    builtins.print = print_hook

    sys.argv = [
        "train.py",
        "--train_dataset", train_dir,
        "--val_dataset", val_dir,
        "--direc", os.path.join(tmp, "out"),
        "--modelname", args.modelname,
        "--imgsize", str(args.imgsize),
        "--batch_size", str(args.batch),
        "--epochs", str(args.epochs),
        "--save_freq", str(10 * args.epochs),  # epoch 0 still validates
        "--learning_rate", "1e-3",
    ]
    sys.path.insert(0, REF)
    os.chdir(REF)
    t0 = time.time()
    src = open(os.path.join(REF, "train.py")).read()
    g = {"__name__": "__main__", "__file__": os.path.join(REF, "train.py")}
    try:
        exec(compile(src, "train.py", "exec"), g)
    finally:
        builtins.print = _orig_print

    steps_per_epoch = (args.n_imgs + args.batch - 1) // args.batch
    # epoch 0 carries jit-less torch warmup + the save_freq-0 validation pass;
    # rate from the later epochs only
    assert len(epoch_times) >= 3, f"need >=3 epochs timed, got {len(epoch_times)}"
    spans = np.diff(epoch_times[1:])
    sec_per_epoch = float(np.mean(spans))
    imgs_per_sec = args.n_imgs / sec_per_epoch
    report = {
        "what": "reference train.py measured on host CPU torch "
                "(NOT the paper's Quadro RTX 8000)",
        "modelname": args.modelname,
        "imgsize": args.imgsize,
        "batch_size": args.batch,
        "n_imgs": args.n_imgs,
        "epochs_timed": len(spans),
        "steps_per_epoch": steps_per_epoch,
        "sec_per_epoch": round(sec_per_epoch, 3),
        "sec_per_step": round(sec_per_epoch / steps_per_epoch, 3),
        "imgs_per_sec_measured_cpu": round(imgs_per_sec, 3),
        "total_wall_s": round(time.time() - t0, 1),
        "torch_threads": __import__("torch").get_num_threads(),
    }
    out = os.path.abspath(args.out)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    _orig_print(json.dumps(report, indent=1))
    _orig_print(f"wrote {out}")


if __name__ == "__main__":
    main()
