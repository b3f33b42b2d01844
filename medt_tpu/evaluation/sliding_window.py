"""Batched sliding-window inference for large images.

BASELINE.md config #5: "batched 512x512 sliding-window inference". A model
trained at ``window`` resolution segments arbitrarily large images: windows
are extracted with one vectorized gather (no per-tile Python slicing),
folded into the batch axis, run in fixed-shape batches, and blended back
with a single scatter-add over precomputed flat indices — O(1) XLA ops
regardless of the tile count, so the same code path scales to
gigapixel-grade tile grids.
"""
from __future__ import annotations

from typing import Callable

import numpy as np
import jax.numpy as jnp


def window_grid(size: int, window: int, stride: int) -> np.ndarray:
    """Start offsets covering [0, size) with the last window right-aligned."""
    if size <= window:
        return np.array([0])
    starts = list(range(0, size - window + 1, stride))
    if starts[-1] != size - window:
        starts.append(size - window)
    return np.array(starts)


def sliding_window_inference(
    image: jnp.ndarray,
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    window: int,
    stride: int = None,
    batch_size: int = 16,
) -> jnp.ndarray:
    """Segment one (H, W, C) image with a model over (window, window) tiles.

    Args:
      apply_fn: maps (B, window, window, C) -> (B, window, window, K) logits.
      stride: defaults to window (non-overlapping; the reference's MoNuSeg
        512px protocol resizes instead of tiling — tiling is the
        production-scale upgrade).
    Returns: (H, W, K) blended logits.
    """
    stride = stride or window
    h0, w0, c = image.shape
    ph = max(window - h0, 0)
    pw = max(window - w0, 0)
    if ph or pw:
        image = jnp.pad(image, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    h, w, _ = image.shape

    ys = window_grid(h, window, stride)
    xs = window_grid(w, window, stride)
    d = np.arange(window)
    rows = ys[:, None] + d[None, :]                 # (Ty, window)
    cols = xs[:, None] + d[None, :]                 # (Tx, window)

    # one gather: (Ty, window, W, C) -> (Ty, window, Tx, window, C)
    tiles = image[jnp.asarray(rows)][:, :, jnp.asarray(cols)]
    tiles = tiles.transpose(0, 2, 1, 3, 4).reshape(-1, window, window, c)
    T = tiles.shape[0]

    outs = []
    for i in range(0, T, batch_size):
        chunk = tiles[i:i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:  # keep a single compiled batch shape
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
            )
        out = apply_fn(chunk)
        outs.append(out[: batch_size - pad] if pad else out)
    logits_tiles = jnp.concatenate(outs)            # (T, window, window, K)

    # flat target index per tile pixel: (ys[t]+di)*w + (xs[t]+dj), built once
    # host-side -> ONE scatter-add regardless of the number of tiles
    k = logits_tiles.shape[-1]
    tile_rows = rows[:, None, :, None]              # (Ty, 1, window, 1)
    tile_cols = cols[None, :, None, :]              # (1, Tx, 1, window)
    flat_idx = (tile_rows * w + tile_cols).reshape(T, window, window)
    flat_idx = jnp.asarray(flat_idx.reshape(-1))

    acc = jnp.zeros((h * w, k), jnp.float32).at[flat_idx].add(
        logits_tiles.reshape(-1, k))
    cnt = jnp.zeros((h * w, 1), jnp.float32).at[flat_idx].add(1.0)
    blended = (acc / cnt).reshape(h, w, k)
    return blended[:h0, :w0]
