"""ctypes bindings for the native data-plane (native/medt_io.cpp).

Loads ``libmedt_io.so``, AUTO-BUILDING it on first use when a C++
toolchain is present (``make -C native`` — seconds, and cached on disk
for every later process); everything degrades gracefully to the cv2/PIL
path when the library can't be built or loaded. No pybind11 — plain C ABI
through ctypes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_LIB_PATHS = [
    os.path.join(_NATIVE_DIR, "libmedt_io.so"),
    "libmedt_io.so",
]

_lib = None
_build_attempted = False


def _try_build() -> None:
    """Build libmedt_io.so in-tree, once per process, never raising.

    A flock on the Makefile serializes concurrent builders (e.g. pytest-xdist
    or multiple dataloader hosts on one box); losers of the race simply find
    the finished .so. Environments without make/g++/libpng fall through to
    the Python decode path exactly as before.
    """
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    makefile = os.path.join(_NATIVE_DIR, "Makefile")
    if not os.path.isfile(makefile) or not os.access(_NATIVE_DIR, os.W_OK):
        return
    try:
        import fcntl

        with open(makefile) as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            try:
                if not os.path.exists(_LIB_PATHS[0]):
                    subprocess.run(
                        ["make", "-C", _NATIVE_DIR],
                        check=True, capture_output=True, timeout=120)
            finally:
                fcntl.flock(lockf, fcntl.LOCK_UN)
    except Exception:
        pass  # toolchain/libpng absent — the cv2/PIL fallback handles it


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATHS[0]):
        _try_build()
    for path in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(path)
                              if os.path.sep in path else path)
            lib.medt_decode_image.restype = ctypes.c_int
            lib.medt_decode_batch.restype = ctypes.c_int
            lib.medt_io_version.restype = ctypes.c_int
            if lib.medt_io_version() >= 2:
                lib.medt_color_jitter.restype = ctypes.c_int
                lib.medt_color_jitter.argtypes = [
                    ctypes.POINTER(ctypes.c_float)] + [ctypes.c_int] * 3 \
                    + [ctypes.c_float] * 4
            _lib = lib
            return lib
        except OSError:
            continue
    return None


def available() -> bool:
    return load_library() is not None


def jitter_available() -> bool:
    lib = load_library()
    return lib is not None and lib.medt_io_version() >= 2


def color_jitter(img: np.ndarray, fb: float, fc: float, fs: float,
                 fh: float) -> np.ndarray:
    """Fused brightness/contrast/saturation/hue jitter, IN PLACE.

    ``img`` must be contiguous float32 HWC in [0, 1] with 1 or 3 channels;
    same order and formulas as the Python chain in data/transforms.py
    (~100x faster — the numpy HSV round trip alone is ~5 ms per 128px
    image)."""
    lib = load_library()
    if lib is None or lib.medt_io_version() < 2:
        raise RuntimeError("libmedt_io.so v2+ not built (run: make -C native)")
    assert img.dtype == np.float32 and img.flags.c_contiguous and img.ndim == 3
    rc = lib.medt_color_jitter(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.shape[0], img.shape[1], img.shape[2],
        float(fb), float(fc), float(fs), float(fh))
    if rc != 0:
        raise ValueError(f"native color_jitter failed ({rc})")
    return img


def decode_image(path: str, gray: bool = False,
                 max_hw: int = 4096) -> np.ndarray:
    """Decode one PNG natively. Returns HWC uint8 (BGR for color)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("libmedt_io.so not built (run: make -C native)")
    c = 1 if gray else 3
    buf = np.empty((max_hw, max_hw, c), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    cc = ctypes.c_int()
    rc = lib.medt_decode_image(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_hw, max_hw, c, ctypes.byref(h), ctypes.byref(w), ctypes.byref(cc),
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    # rows are written densely packed at the image's own width
    img = buf.ravel()[: h.value * w.value * c].reshape(h.value, w.value, c).copy()
    return img[..., 0] if gray else img


def decode_batch(paths: List[str], height: int, width: int,
                 gray: bool = False, binarize_thresh: int = -1,
                 ge_semantics: bool = False,
                 threads: int = 4) -> np.ndarray:
    """Decode same-sized PNGs into one (n, H, W, C) uint8 batch, threaded.

    ``binarize_thresh >= 0`` fuses the reference's mask binarization into the
    decode (>thresh by default; >=thresh when ``ge_semantics``)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("libmedt_io.so not built (run: make -C native)")
    c = 1 if gray else 3
    n = len(paths)
    out = np.empty((n, height, width, c), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.medt_decode_batch(
        arr, n, height, width, c, binarize_thresh, int(ge_semantics),
        threads, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if failures:
        raise IOError(f"native batch decode: {failures}/{n} images failed")
    return out
