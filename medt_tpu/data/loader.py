"""Prefetching batch loader.

Replaces the reference's single-worker ``torch.utils.data.DataLoader``
(reference train.py:90-91 — note it parses ``--workers`` but never wires it
in, train.py:31). At TPU throughput the host-side PNG decode is the
bottleneck (SURVEY.md §7 hard-part #5), so this loader:

* decodes + augments samples in a thread pool (cv2/PIL release the GIL),
* collates into dense NHWC numpy batches,
* keeps a bounded queue of batches ready so device steps never wait on IO,
* is seeded deterministically per (epoch, index) — reproducible regardless
  of worker scheduling.

When the optional native C++ decoder (``native/``) is built, the dataset's
decode path uses it transparently.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


def prefetch_to_device(iterable, convert, size: int = 3):
    """Keep ``size`` converted batches in flight ahead of the consumer.

    ``convert`` maps a host batch to device arrays (``jnp.asarray`` /
    ``jax.device_put`` are async — the H2D copy overlaps the device step that
    is still executing). This is the double-buffering seam the reference's
    per-step ``.cuda()`` copies lack (reference train.py:134-135).
    """
    from collections import deque

    buf = deque()
    for item in iterable:
        buf.append(convert(item))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def collate(samples):
    """Stack (image, mask, name) samples into a batch dict."""
    images = np.stack([s[0] for s in samples])
    masks = np.stack([s[1] for s in samples])
    names = [s[2] for s in samples]
    return {"image": images, "label": masks, "name": names}


class DataLoader:
    """Iterable over shuffled, prefetched batches.

    Args:
      dataset: object with ``__len__`` and ``__getitem__(idx, rng=...)``.
      batch_size: samples per batch (drop_last=False, like the reference).
      shuffle: reshuffle each epoch.
      num_workers: decode threads (0 = synchronous).
      seed: base seed; per-sample rng = seed + epoch * len + idx.
      prefetch: max batches queued ahead.
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 3000, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        # detect rng support once up front: a per-fetch try/except TypeError
        # would also swallow genuine TypeErrors raised inside transforms
        try:
            import inspect

            sig = inspect.signature(dataset.__getitem__)
            self._rng_kwarg = "rng" in sig.parameters or any(
                p.kind is inspect.Parameter.VAR_KEYWORD
                for p in sig.parameters.values()
            )
        except (TypeError, ValueError):
            self._rng_kwarg = False

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def _fetch(self, idx: int) -> tuple:
        if not self._rng_kwarg:
            return self.dataset[idx]
        rng = np.random.default_rng(
            self.seed + self.epoch * len(self.dataset) + idx
        )
        return self.dataset.__getitem__(idx, rng=rng)

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, n, self.batch_size)]

        if self.num_workers <= 0:
            for b in batches:
                yield collate([self._fetch(int(i)) for i in b])
            self.epoch += 1
            return

        out: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self._fetch, [int(i) for i in b]))
                    while not stop.is_set():  # don't deadlock if consumer quits
                        try:
                            out.put(collate(samples), timeout=0.5)
                            break
                        except queue.Full:
                            continue
            out.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
        self.epoch += 1
