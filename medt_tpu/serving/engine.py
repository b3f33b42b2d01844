"""Batched inference engine — the serving counterpart of the train loop.

The reference repo has no serving story at all (its ``predict_dataset`` is
instantiated and never consumed, reference train.py:89); production
deployment needs one. This engine wraps the fused-kernel eval path
(ops/pallas_axial.py + the lanes kernels) behind a fixed-shape jitted
forward and adds the two things a TPU serving path must have:

* STATIC batching: XLA compiles one (B, S, S, C) program; requests are
  padded to the batch size, so every dispatch hits the same executable —
  no recompiles, no shape polymorphism.
* DYNAMIC micro-batching: concurrent callers submit single images; a
  worker thread coalesces the queue into full batches (bounded by
  ``max_wait_ms`` so a lone request is never stuck waiting for peers),
  amortizing the per-dispatch latency that dominates small-batch TPU
  serving.
* REQUEST PRIORITIES: ``submit(img, priority=p)`` — lower ``p`` is
  served first (0 = default/interactive, larger = batch/background).
  The coalescer always drains the queue in (priority, arrival) order,
  so a backlog of bulk requests cannot starve an interactive one: it
  rides the very next batch. Same-priority requests stay FIFO.

Images at the training resolution run directly; larger images route
through the vectorized sliding-window tiler (evaluation/sliding_window.py)
using the same fixed-batch forward for the tiles.

MULTI-CHIP serving: pass ``mesh`` (a 1D+ ``jax.sharding.Mesh``) and the
compiled batch is sharded over the mesh's first axis — params replicated,
per-device sub-batches, XLA inserts nothing on the forward (pure data
parallel) so serving scales linearly over ICI. The sliding-window path
shards its tile batches the same way via a sharding constraint inside the
jitted tiler. ``batch_size`` must divide by the axis size.

uint8 inputs ship to the device as bytes and normalize on-chip (f32/255,
the training pipeline's convention — training/state.py::_normalize).
"""
from __future__ import annotations

import itertools
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..metrics import logits_to_foreground
from ..evaluation.sliding_window import sliding_window_inference


class QueueFullError(RuntimeError):
    """submit() backpressure signal: the bounded request queue is at
    capacity. HTTP callers map this to 503 + Retry-After."""


class InferenceEngine:
    """Fixed-shape batched segmentation inference with dynamic batching.

    Args:
      modelname: any factory name from medt_tpu.models.
      imgsize: training resolution (compiled tile/batch shape).
      loaddirec: checkpoint dir to restore (mutually optional with
        ``variables`` — tests inject freshly-initialized variables).
      batch_size: compiled batch; requests are padded up to it.
      decision: "threshold" (reference quirk) or "argmax" mask rule.
      window_stride: stride for the sliding-window path (defaults to
        imgsize, i.e. non-overlapping tiles).
      max_wait_ms: dynamic-batching coalescing window.
    """

    def __init__(self, modelname: str, imgsize: int,
                 loaddirec: Optional[str] = None, variables=None,
                 batch_size: int = 16, gray: bool = False,
                 use_fused: bool = True, decision: str = "threshold",
                 window_stride: Optional[int] = None,
                 max_wait_ms: float = 5.0, dtype=jnp.float32,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 max_queue: int = 1024):
        from ..models import build_model

        self.imgsize = int(imgsize)
        self.batch_size = int(batch_size)
        self.mesh = mesh
        if mesh is not None:
            axis = mesh.axis_names[0]
            if self.batch_size % mesh.shape[axis]:
                raise ValueError(
                    f"batch_size {self.batch_size} must divide by the mesh "
                    f"'{axis}' axis ({mesh.shape[axis]})")
        self.channels = 1 if gray else 3
        self.decision = decision
        self.window_stride = int(window_stride or imgsize)
        self.max_wait_ms = float(max_wait_ms)
        self.max_queue = int(max_queue)

        self.model = build_model(modelname, img_size=self.imgsize,
                                 imgchan=self.channels, dtype=dtype,
                                 use_fused=use_fused)
        if variables is None:
            if loaddirec is None:
                raise ValueError("need loaddirec or variables")
            variables = _restore_variables(self, loaddirec)
        self._variables = {"params": variables["params"],
                           "batch_stats": variables["batch_stats"]}

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            batch_sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            replicated = NamedSharding(mesh, PartitionSpec())
            jit_batched = lambda f: jax.jit(  # noqa: E731
                f, in_shardings=(replicated, batch_sh),
                out_shardings=batch_sh)
            shard_tiles = lambda xb: jax.lax.with_sharding_constraint(  # noqa: E731
                xb, batch_sh)
        else:
            jit_batched = jax.jit
            shard_tiles = lambda xb: xb  # noqa: E731

        def forward(v, x):
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
            out = self.model.apply(v, x, train=False)
            if isinstance(out, tuple):  # deep-supervision heads at train only
                out = out[0]
            return out

        @jit_batched
        def forward_mask(v, x):
            # decode INSIDE the jitted program: eager post-ops would each
            # pay a remote compile on a tunneled device, and a uint8 mask
            # is 8x less transfer than f32 logits
            fg = logits_to_foreground(forward(v, x), mode=self.decision)
            return fg.astype(jnp.uint8)

        @jax.jit
        def window_mask(v, img):
            # whole tiler jitted: one program per input shape (the window
            # grid is static given the shape), zero eager ops per request;
            # tile batches carry the mesh sharding constraint so the tiler
            # scales over the mesh like the batch path
            if img.dtype == jnp.uint8:
                img = img.astype(jnp.float32) / 255.0
            logits = sliding_window_inference(
                img, lambda xb: forward(v, shard_tiles(xb)),
                window=self.imgsize, stride=self.window_stride,
                batch_size=self.batch_size)
            fg = logits_to_foreground(logits[None], mode=self.decision)[0]
            return fg.astype(jnp.uint8)

        self._forward = jax.jit(forward)
        self._forward_mask = forward_mask
        self._window_mask = window_mask
        # (priority, seq, image, future): heap order = priority, then FIFO
        self._queue: "queue.PriorityQueue" = queue.PriorityQueue()
        self._seq = itertools.count()
        self._worker: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self.batches_run = 0
        self.images_run = 0
        # last-N request latencies (enqueue -> result), seconds; bounded so
        # a long-lived server never grows
        self._latencies: deque = deque(maxlen=1024)

    # ---- synchronous API ---------------------------------------------------

    def warmup(self):
        """Compile the batch program ahead of the first request."""
        x = np.zeros((self.batch_size, self.imgsize, self.imgsize,
                      self.channels), np.uint8)
        out = self._forward_mask(self._variables, jnp.asarray(x))
        _ = np.asarray(out)  # fetch = real completion on tunneled devices

    def predict_batch(self, images: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Segment a list of (S, S, C) images at the training resolution.

        Pads to the compiled batch size in fixed-shape chunks; returns one
        (S, S) uint8 {0,1} mask per image.
        """
        masks: List[np.ndarray] = []
        B = self.batch_size
        for i in range(0, len(images), B):
            chunk = [self._check(im) for im in images[i:i + B]]
            n = len(chunk)
            if n < B:
                chunk = chunk + [chunk[-1]] * (B - n)
            x = jnp.asarray(np.stack(chunk))
            fg = np.asarray(self._forward_mask(self._variables, x))
            masks.extend(fg[:n])
            with self._lock:
                self.batches_run += 1
                self.images_run += n
        return masks

    def predict(self, image: np.ndarray) -> np.ndarray:
        """Segment one (H, W, C) image of ANY size >= the training
        resolution (sliding-window tiling for larger inputs)."""
        if image.ndim == 2:
            image = image[..., None]
        h, w = image.shape[:2]
        if (h, w) == (self.imgsize, self.imgsize):
            return self.predict_batch([image])[0]
        fg = self._window_mask(self._variables, jnp.asarray(image))
        with self._lock:
            self.images_run += 1
        return np.asarray(fg[:h, :w])

    # ---- dynamic micro-batching --------------------------------------------

    def start(self):
        """Start the coalescing worker for ``submit``."""
        if self._worker is not None:
            return
        self._stop.clear()
        self._worker = threading.Thread(target=self._serve_loop, daemon=True)
        self._worker.start()

    def stop(self):
        if self._worker is None:
            return
        self._stop.set()
        # sentinel sorts ahead of every real entry so stop is prompt even
        # under a deep low-priority backlog
        self._queue.put((float("-inf"), -1, None, None))
        self._worker.join()
        self._worker = None

    def submit(self, image: np.ndarray,
               priority: int = 0) -> "Future[np.ndarray]":
        """Enqueue one image; the worker coalesces concurrent submissions
        into full batches, draining in (priority, arrival) order — lower
        ``priority`` first. Returns a Future resolving to the mask."""
        if self._worker is None:
            raise RuntimeError("engine not started; call start()")
        # backpressure: a bounded queue keeps a request flood from growing
        # host memory without limit; callers map this to 503/retry-later
        if self._queue.qsize() >= self.max_queue:
            raise QueueFullError(
                f"serving queue at capacity ({self.max_queue})")
        fut: "Future[np.ndarray]" = Future()
        t0 = time.perf_counter()
        fut.add_done_callback(
            lambda f: self._latencies.append(time.perf_counter() - t0))
        self._queue.put((priority, next(self._seq), self._check(image), fut))
        return fut

    def stats(self) -> dict:
        """Counters plus request-latency percentiles (enqueue -> result,
        last 1024 submit() requests) for /healthz."""
        out = {
            "batches_run": self.batches_run,
            "images_run": self.images_run,
            "batch_size": self.batch_size,
            "imgsize": self.imgsize,
        }
        lat = sorted(self._latencies)
        if lat:
            def pct(p):
                return round(lat[min(len(lat) - 1,
                                     int(p / 100.0 * len(lat)))] * 1e3, 2)
            out["latency_ms"] = {"count": len(lat), "p50": pct(50),
                                 "p90": pct(90), "p99": pct(99)}
        return out

    def _serve_loop(self):
        while not self._stop.is_set():
            item = self._queue.get()
            if item[2] is None:
                continue
            batch = [item]
            # coalesce whatever arrives within the wait window, up to B;
            # each get() pulls the highest-priority pending request
            deadline = self.max_wait_ms / 1e3
            while len(batch) < self.batch_size:
                try:
                    nxt = self._queue.get(timeout=deadline)
                except queue.Empty:
                    break
                if nxt[2] is None:
                    break
                batch.append(nxt)
            images = [b[2] for b in batch]
            futures = [b[3] for b in batch]
            try:
                masks = self.predict_batch(images)
                for f, m in zip(futures, masks):
                    f.set_result(m)
            except Exception as e:  # surface failures to every caller
                for f in futures:
                    f.set_exception(e)

    # ---- helpers -------------------------------------------------------------

    def _check(self, image: np.ndarray) -> np.ndarray:
        if image.ndim == 2:
            image = image[..., None]
        s = self.imgsize
        if image.shape != (s, s, self.channels):
            raise ValueError(
                f"predict_batch takes ({s}, {s}, {self.channels}) images; "
                f"got {image.shape} — use predict() for other sizes")
        return image


def _restore_variables(engine: InferenceEngine, loaddirec: str):
    """Restore {params, batch_stats} from a training checkpoint dir."""
    import optax

    from ..training.checkpointing import restore_checkpoint
    from ..training.state import init_state

    state = init_state(
        engine.model, optax.sgd(0.0),
        (engine.batch_size, engine.imgsize, engine.imgsize, engine.channels))
    state = restore_checkpoint(loaddirec, state, with_optimizer=False)
    return {"params": state.params, "batch_stats": state.batch_stats}
