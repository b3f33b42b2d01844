"""Training-step tests: loss decreases, optimizer parity, schedules."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from medt_tpu.losses import log_nll_loss
from medt_tpu.models import build_model
from medt_tpu.training import adam_l2, init_state, train_step, eval_step
from medt_tpu.training.schedules import warmup_cosine


def _synthetic_batch(rng, n=4, img=64, chans=3):
    x = rng.normal(size=(n, img, img, chans)).astype(np.float32)
    # learnable structure: label = left/right half
    y = np.zeros((n, img, img), np.int64)
    y[:, :, img // 2:] = 1
    x[..., 0] += y * 2.0
    return {"image": jnp.asarray(x), "label": jnp.asarray(y)}


def test_log_nll_matches_torch_cross_entropy():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(2, 4, 4))
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels),
    ).item()
    got = float(log_nll_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - want) < 1e-5


def test_adam_l2_matches_torch_adam():
    """Our optax chain == torch.optim.Adam(lr, weight_decay) over 5 steps."""
    rng = np.random.default_rng(1)
    w0 = rng.normal(size=(7, 5)).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=1e-2, weight_decay=1e-5)

    tx = adam_l2(1e-2, weight_decay=1e-5)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)

    for i in range(5):
        g = rng.normal(size=w0.shape).astype(np.float32)
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6, rtol=1e-5
    )


def test_train_step_decreases_loss():
    from _shared import jit_eval_step, jit_train_step, shared_state

    _, state = shared_state("axialunet", 32, batch=4)
    batch = _synthetic_batch(np.random.default_rng(0), img=32)
    losses = []
    for _ in range(8):
        state, metrics = jit_train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # eval produces logits at input resolution
    logits = jit_eval_step(state, batch)
    assert logits.shape == (4, 32, 32, 2)


def test_warmup_cosine_schedule():
    sched = warmup_cosine(1.0, steps_per_epoch=10, total_epochs=10,
                          warmup_epochs=2)
    assert float(sched(0)) < 0.1          # early warmup
    assert abs(float(sched(20)) - 1.0) < 1e-6   # warmup done
    assert float(sched(99)) < 0.01        # decayed


def test_checkpoint_without_optimizer_roundtrip(tmp_path):
    """save_checkpoint(with_optimizer=False) must be restorable (regression:
    the restore template used to always demand an opt_state subtree)."""
    from medt_tpu.training.checkpointing import (restore_checkpoint,
                                                 save_checkpoint)

    model = build_model("axialunet", img_size=32)
    state = init_state(model, adam_l2(1e-3), (1, 32, 32, 3))
    save_checkpoint(str(tmp_path), "0", state, with_optimizer=False,
                    also_final=False)
    blank = init_state(model, adam_l2(1e-3), (1, 32, 32, 3),
                       rng=jax.random.PRNGKey(7))
    restored = restore_checkpoint(str(tmp_path / "0"), blank,
                                  with_optimizer=False)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_restore_into_different_optimizer_state(tmp_path):
    """Inference must be able to restore params/stats from a checkpoint
    SAVED WITH an optimizer into a state built with a different one
    (regression: the with_optimizer=False template still carried the
    caller's opt_state, so an sgd-built state could not read an adam
    checkpoint — caught by driving cli/serve.py against a real run)."""
    import optax

    from medt_tpu.training.checkpointing import (restore_checkpoint,
                                                 save_checkpoint)

    model = build_model("axialunet", img_size=32)
    state = init_state(model, adam_l2(1e-3), (1, 32, 32, 3))
    save_checkpoint(str(tmp_path), "0", state, also_final=False)  # has adam
    blank = init_state(model, optax.sgd(0.0), (1, 32, 32, 3),
                       rng=jax.random.PRNGKey(7))
    restored = restore_checkpoint(str(tmp_path / "0"), blank,
                                  with_optimizer=False)
    for x, y in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
