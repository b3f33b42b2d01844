"""Shared, memoized test fixtures: models, train states, and jitted steps.

The suite runs on a single-core CI box where every ``jax.jit(train_step)``
call pays its own trace + compile-cache deserialize (~5-10 s warm). Sharing
ONE jitted wrapper lets jax's in-memory executable cache hit across tests:
flax Modules compare by field equality, so two ``build_model("axialunet",
img_size=32)`` instances produce equal static args — but only if the
``TrainState`` also carries the SAME optax transformation instance
(closures never compare equal), which is what :func:`shared_state`
guarantees by memoizing on the build arguments.

Tests never mutate these states (train_step is functional), so sharing the
initial state is safe.

CAVEAT — env-flag-sensitive tests must NOT use the shared jits: the model
forward branches on flags read at TRACE time (e.g. MEDT_TPU_LANES_RESIDENT
via lanes_resident_enabled), and TrainState.apply_fn compares equal across
flag values, so a test that toggles the env var and reuses ``jit_train_step``
on previously-seen shapes silently gets the stale layout's cached
executable. Build a fresh ``jax.jit(train_step)`` per flag value instead
(as tests/test_lanes_resident.py does).
"""
from functools import lru_cache

import jax

from medt_tpu.models import build_model
from medt_tpu.training import adam_l2, eval_step, init_state, train_step

# one jitted wrapper per program class, shared by every test in the session
jit_train_step = jax.jit(train_step)
jit_eval_step = jax.jit(eval_step)


@lru_cache(maxsize=None)
def shared_model(name="axialunet", img=32, **kw):
    return build_model(name, img_size=img, **kw)


@lru_cache(maxsize=None)
def shared_state(name="axialunet", img=32, batch=2, channels=3, lr=1e-3,
                 **kw):
    """Memoized (model, TrainState) for a config; reuse freely, never mutate."""
    model = shared_model(name, img, **kw)
    return model, init_state(model, adam_l2(lr), (batch, img, img, channels))
