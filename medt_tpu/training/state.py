"""Train state and the jitted train/eval steps.

Functional replacement for the reference's monolithic epoch loop body
(reference train.py:126-162): one ``train_step`` fuses forward, loss,
backward, Adam update, and BN running-stat updates into a single XLA program.
Metrics stay on device — the reference's per-step ``.cpu().numpy()``
round-trip (train.py:142-149, whose result is even unused) is exactly the
host-sync throughput bug a TPU design must not reproduce.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import deep_supervision_loss, log_nll_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            apply_fn=apply_fn,
            tx=tx,
        )


def init_state(model, tx, input_shape, rng=None):
    """Initialize params/batch_stats for ``model`` and wrap in a TrainState."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x = jnp.zeros(input_shape, jnp.float32)
    # jit the init: eager per-layer dispatch is pathologically slow through a
    # remote-device transport (hundreds of tiny op round-trips)
    variables = jax.jit(model.init, static_argnames="train")(rng, x, train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def _normalize(image):
    """uint8 batches are normalized ON DEVICE (f32/255, identical to the
    host-side ``to_float01``): shipping bytes instead of floats cuts the
    host->device payload 4x, which matters on a tunneled device link."""
    if image.dtype == jnp.uint8:
        return image.astype(jnp.float32) / 255.0
    return image


def train_step(state: TrainState, batch, *, remat: bool = False):
    """One optimization step. batch = {'image': NHWC float or uint8,
    'label': NHW int}.

    ``remat=True`` rematerializes the forward pass in backward — trades FLOPs
    for HBM (jax.checkpoint), enabling much larger batches per chip.
    """

    def forward(params, image):
        return state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            image,
            train=True,
            mutable=["batch_stats"],
        )

    if remat:
        forward = jax.checkpoint(forward)

    def loss_fn(params):
        logits, mut = forward(params, _normalize(batch["image"]))
        if isinstance(logits, tuple):
            # deep-supervision models emit (logits, per-scale aux heads)
            loss = deep_supervision_loss(logits, batch["label"])
            logits = logits[0]
        else:
            loss = log_nll_loss(logits, batch["label"])
        return loss, (logits, mut["batch_stats"])

    (loss, (logits, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
    )
    metrics = {"loss": loss}
    return new_state, metrics


def eval_step(state: TrainState, batch):
    """Forward pass with running BN statistics; returns raw logits."""
    return state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        _normalize(batch["image"]),
        train=False,
    )
