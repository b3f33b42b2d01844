"""Persistent XLA compilation cache shared by every entry point.

A cold MedT compile takes minutes over the remote-TPU tunnel (one XLA
program plus ~a dozen per-geometry Mosaic kernels); the on-disk cache makes
every repeat run — CLIs, bench.py, the driver's entry checks, tests — skip
straight to execution. Safe to call multiple times; a cache miss simply
compiles as before.
"""
from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        if jax.config.jax_compilation_cache_dir:
            return  # already configured (e.g. conftest.py)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is an optimization, never a failure
