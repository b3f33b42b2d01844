"""The training loop.

Functional equivalent of the reference's flat script loop
(reference train.py:126-217), redesigned for TPU throughput:

* one jitted ``train_step`` per batch — no per-step host syncs (the
  reference thresholds logits on the CPU every step and drops the result,
  train.py:142-149),
* prefetching host data pipeline (``--workers`` actually honored),
* on-device validation metrics (the reference imports its F1/IoU and never
  calls them, train.py:23) plus the reference's PNG mask dumps
  (``<direc>/<epoch>/<name>.png``, foreground channel, train.py:205-213),
* Orbax checkpoints per ``save_freq`` epochs + rolling final
  (train.py:216-217), resume support,
* optional mesh sharding (data/seq/model) when multiple devices exist.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..parallel.distributed import initialize_multihost
from ..data import DataLoader, ImageToImage2D, JointTransform2D
from ..data.loader import prefetch_to_device
from ..metrics import binary_seg_scores, logits_to_foreground
from ..models import build_model
from ..utils import Logger, ThroughputMeter, chk_mkdir, profiler_trace
from .checkpointing import (
    is_coordinator,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from .optimizers import adam_l2, sgd
from .schedules import SCHEDULE_REGISTRY
from .state import TrainState, eval_step, init_state, train_step


def _write_mask_png(path: str, mask01: np.ndarray) -> None:
    arr = (mask01.astype(np.uint8)) * 255
    try:
        import cv2

        cv2.imwrite(path, arr)
    except Exception:
        from PIL import Image

        Image.fromarray(arr).save(path)


def build_tx(cfg: Config, steps_per_epoch: int):
    if cfg.lr_schedule == "constant":
        lr = cfg.learning_rate
    else:
        lr = SCHEDULE_REGISTRY[cfg.lr_schedule](
            cfg.learning_rate, steps_per_epoch, cfg.epochs, cfg.warmup_epochs
        )
    if cfg.optimizer == "adam":
        return adam_l2(lr, weight_decay=cfg.weight_decay)
    return sgd(lr, momentum=cfg.momentum, weight_decay=cfg.weight_decay)


def setup_state(cfg: Config, steps_per_epoch: int) -> TrainState:
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
    extra = {}
    if cfg.trainable_gates == "yes":
        extra["trainable_gates"] = True
    model = build_model(cfg.modelname, img_size=cfg.imgsize, dtype=dtype,
                        use_fused=cfg.use_pallas == "yes", **extra)
    tx = build_tx(cfg, steps_per_epoch)
    state = init_state(
        model, tx, (cfg.batch_size, cfg.imgsize, cfg.imgsize, cfg.imgchan),
        rng=jax.random.PRNGKey(cfg.seed),
    )
    if len(jax.devices()) > 1:
        from ..parallel import make_mesh, set_kernel_mesh, shard_state

        mesh = make_mesh(dp=cfg.dp, sp=cfg.sp, tp=cfg.tp,
                         slices=cfg.num_slices)
        state = shard_state(state, mesh)
        # fused kernels become shard_map islands over this mesh (admission
        # then sees per-device shapes — parallel/kernel_sharding.py)
        set_kernel_mesh(mesh)
    return state


def _device_batch(batch: dict) -> dict:
    # uint8 images AND labels ship as bytes; the jitted step normalizes /
    # widens on device (state.py::_normalize, losses.py) — 4x less
    # host->device traffic than f32/int32, which is the binding constraint
    # on a tunneled device link (~70 MB/s measured)
    img, lbl = batch["image"], batch["label"]
    return {
        "image": jnp.asarray(img) if img.dtype == np.uint8
        else jnp.asarray(img, jnp.float32),
        "label": jnp.asarray(lbl) if lbl.dtype == np.uint8
        else jnp.asarray(lbl, jnp.int32),
    }


def validate(cfg: Config, state: TrainState, val_loader: DataLoader,
             epoch: int, eval_fn) -> dict:
    """Validation pass: PNG dumps + on-device F1/IoU of the foreground."""
    fulldir = os.path.join(cfg.direc, str(epoch))
    if is_coordinator():
        chk_mkdir(fulldir)
    f1s, ious = [], []
    for batch in val_loader:
        dev_batch = _device_batch(batch)
        logits = eval_fn(state, dev_batch)
        fg = logits_to_foreground(logits, mode=cfg.pred_mode)
        gt = dev_batch["label"] > 0
        f1, iou, _pa = binary_seg_scores(fg, gt)
        f1s.append(np.asarray(f1))
        ious.append(np.asarray(iou))
        if is_coordinator():
            fg_np = np.asarray(fg)
            for i, name in enumerate(batch["name"]):
                _write_mask_png(os.path.join(fulldir, name), fg_np[i])
    return {
        "val_f1": float(np.concatenate(f1s).mean()),
        "val_iou": float(np.concatenate(ious).mean()),
    }


def run_training(cfg: Config, state: Optional[TrainState] = None,
                 train_loader: Optional[DataLoader] = None,
                 val_loader: Optional[DataLoader] = None) -> TrainState:
    # setup_state installs the kernel mesh as module state; restore the
    # caller's value on exit so in-process callers (tests, notebooks
    # invoking cli.train.main) don't inherit this run's mesh — leaked mesh
    # state silently changes kernel admission for everything that follows
    from ..parallel import kernel_mesh_scope
    with kernel_mesh_scope():
        return _run_training(cfg, state, train_loader, val_loader)


def _run_training(cfg: Config, state: Optional[TrainState],
                  train_loader: Optional[DataLoader],
                  val_loader: Optional[DataLoader]) -> TrainState:
    initialize_multihost()  # no-op on single-host jobs
    np.random.seed(cfg.seed)  # reference seeds numpy/torch to 3000

    if train_loader is None:
        tf_train = JointTransform2D(crop=cfg.crop_tuple, p_flip=0.5,
                                    color_jitter_params=None, long_mask=True,
                                    output_dtype="uint8")
        train_ds = ImageToImage2D(cfg.train_dataset, tf_train,
                                  gray=cfg.gray == "yes")
        train_loader = DataLoader(train_ds, cfg.batch_size, shuffle=True,
                                  num_workers=cfg.workers, seed=cfg.seed)
    if val_loader is None and cfg.val_dataset:
        tf_val = JointTransform2D(crop=cfg.crop_tuple, p_flip=0,
                                  color_jitter_params=None, long_mask=True,
                                  output_dtype="uint8")
        val_ds = ImageToImage2D(cfg.val_dataset, tf_val,
                                gray=cfg.gray == "yes")
        val_loader = DataLoader(val_ds, 1, shuffle=False,
                                num_workers=cfg.workers, seed=cfg.seed)

    steps_per_epoch = max(len(train_loader), 1)
    if state is None:
        state = setup_state(cfg, steps_per_epoch)

    start_epoch = cfg.start_epoch
    if cfg.resume:
        newest = latest_checkpoint(cfg.direc)
        if newest is not None:
            state = restore_checkpoint(newest, state)
            start_epoch = int(os.path.basename(newest)) + 1 \
                if os.path.basename(newest).isdigit() else start_epoch
            print(f"resumed from {newest} at epoch {start_epoch}")

    import functools

    def make_step_fn():
        # a fresh partial per (re)build: kernel admission happens at trace
        # time, so after a family is disabled the new function identity
        # forces a retrace onto the XLA fallback
        return jax.jit(functools.partial(train_step, remat=cfg.remat),
                       donate_argnums=0)

    step_fn = make_step_fn()
    eval_fn = jax.jit(eval_step)
    logger = Logger(verbose=True,
                    jsonl_path=os.path.join(cfg.direc, "train_log.jsonl")
                    if is_coordinator() else None)

    with profiler_trace(cfg.profile_dir):
        for epoch in range(start_epoch, cfg.epochs):
            meter = ThroughputMeter()
            # accumulate the loss ON DEVICE: a float() here would force a
            # host sync every step — the reference's per-step .cpu() bug
            # class (reference train.py:142-149) — and stall dispatch
            epoch_loss, n_batches = jnp.zeros((), jnp.float32), 0
            for n_imgs, dev_batch in prefetch_to_device(
                    train_loader,
                    lambda b: (len(b["name"]), _device_batch(b))):
                if epoch == start_epoch and n_batches == 0:
                    # first step == first compile: if a Pallas kernel fails
                    # Mosaic lowering on this chip, probe-bisect the guilty
                    # family, disable it (XLA fallback), and re-jit instead
                    # of dying (see ops/kernel_registry.py)
                    try:
                        state, metrics = step_fn(state, dev_batch)
                    except Exception as ex:  # noqa: BLE001
                        if "osaic" not in str(ex):
                            raise
                        from ..ops import kernel_registry as kreg

                        report = kreg.preflight_fn(
                            functools.partial(train_step, remat=cfg.remat),
                            state, dev_batch,
                            warn_prefix="train step compile failed; ")
                        if not any(not ok for ok, _ in report.values()):
                            raise  # not a known kernel family — surface it
                        step_fn = make_step_fn()
                        state, metrics = step_fn(state, dev_batch)
                else:
                    state, metrics = step_fn(state, dev_batch)
                epoch_loss = epoch_loss + metrics["loss"]
                n_batches += 1
                meter.update(n_imgs)
            entry = {
                "epoch": epoch,
                "loss": float(epoch_loss) / max(n_batches, 1),
                "imgs_per_sec": round(meter.imgs_per_sec, 2),
            }
            if epoch % cfg.save_freq == 0:
                if val_loader is not None:
                    entry.update(validate(cfg, state, val_loader, epoch, eval_fn))
                save_checkpoint(cfg.direc, epoch, state)
            logger.log(entry)
    if is_coordinator():
        logger.to_csv(os.path.join(cfg.direc, "train_log.csv"))
    return state
