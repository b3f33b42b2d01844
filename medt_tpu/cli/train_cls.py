"""Classification training driver.

The reference ships a registry-style classification API (``lib.build_*``)
whose driver script is missing from the repo (SURVEY.md §1: "a registry-style
API for an ImageNet classification harness whose driver script is not in the
repo"). This is that driver, TPU-native: cross-entropy (optionally
label-smoothed, reference lib/utils.py:33-55), SGD + warmup-cosine/staircase
LR (lib/utils.py:7-30), top-1 accuracy (lib/utils.py:58-61), rank-0
checkpoints.

    python -m medt_tpu.cli.train_cls --model resnet26 \
        --train_dataset <imagefolder> --val_dataset <imagefolder> \
        --epochs 90 --batch_size 256 --lr 0.1
"""
from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import builders
from ..losses import cross_entropy_with_label_smoothing
from ..metrics import Metric, accuracy
from ..training.checkpointing import save_checkpoint
from ..training.schedules import SCHEDULE_REGISTRY
from ..training.state import TrainState
from ..utils import Logger


def make_steps(model, label_smoothing: float):
    def train_step(state, batch):
        def loss_fn(params):
            logits, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
            )
            if label_smoothing > 0:
                loss = cross_entropy_with_label_smoothing(
                    logits, batch["label"], eta=label_smoothing)
            else:
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch["label"]).mean()
            return loss, (logits, mut["batch_stats"])

        (loss, (logits, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        acc = accuracy(logits, batch["label"])
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=stats, opt_state=opt_state), \
            {"loss": loss, "acc": acc}

    def eval_step(state, batch):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False,
        )
        return accuracy(logits, batch["label"])

    return jax.jit(train_step, donate_argnums=0), jax.jit(eval_step)


def main(argv=None):
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="medt_tpu classification train")
    p.add_argument("--model", default="resnet26")
    p.add_argument("--train_dataset", required=True)
    p.add_argument("--val_dataset", required=True)
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--imgsize", type=int, default=224)
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--warmup_epochs", type=int, default=0)
    p.add_argument("--batch_size", "-b", type=int, default=256)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--lr_schedule", default="cosine",
                   choices=["cosine", "linear", "constant"])
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", "--wd", type=float, default=1e-4)
    p.add_argument("--optimizer", default="sgd")
    p.add_argument("--label_smoothing", type=float, default=0.0)
    p.add_argument("--workers", "-j", type=int, default=8)
    p.add_argument("--work_dirs", default="./cls_run")
    p.add_argument("--save_freq", type=int, default=10)
    p.add_argument("--distributed", action="store_true")
    args = p.parse_args(argv)

    train_loader, val_loader = builders.build_dataloader(args)
    model = builders.build_model(args)

    steps_per_epoch = max(len(train_loader), 1)
    if args.lr_schedule != "constant":
        args.lr = SCHEDULE_REGISTRY[args.lr_schedule](
            args.lr, steps_per_epoch, args.epochs, args.warmup_epochs)
    tx = builders.build_optimizer(args)

    x0 = jnp.zeros((args.batch_size, args.imgsize, args.imgsize, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}),
                              tx=tx)

    train_step, eval_step = make_steps(model, args.label_smoothing)
    logger = Logger(verbose=True)
    for epoch in range(args.epochs):
        loss_m, acc_m = Metric(), Metric()
        for batch in train_loader:
            b = {"image": jnp.asarray(batch["image"]),
                 "label": jnp.asarray(batch["label"], jnp.int32)}
            state, m = train_step(state, b)
            loss_m.update(m["loss"], len(batch["name"]))
            acc_m.update(m["acc"], len(batch["name"]))
        entry = {"epoch": epoch, "loss": loss_m.average, "acc": acc_m.average}
        if epoch % args.save_freq == 0 or epoch == args.epochs - 1:
            val_m = Metric()
            for batch in val_loader:
                b = {"image": jnp.asarray(batch["image"]),
                     "label": jnp.asarray(batch["label"], jnp.int32)}
                val_m.update(eval_step(state, b), len(batch["name"]))
            entry["val_acc"] = val_m.average
            save_checkpoint(args.work_dirs, epoch, state)
        logger.log(entry)


if __name__ == "__main__":
    main()
