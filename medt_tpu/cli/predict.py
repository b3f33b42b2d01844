"""Prediction CLI — label-free inference over an image directory.

Covers the reference's ``Image2D`` dataset (reference utils.py:179-231,
instantiated as ``predict_dataset`` in train.py:89 but never consumed).
Supports native-resolution inference and sliding-window tiling for images
larger than the training resolution.

    python -m medt_tpu.cli.predict --val_dataset <dir> --modelname MedT \
        --imgsize 128 --loaddirec ./results/final_model --direc ./preds \
        [--window 128 --stride 96]
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..config import parse_config
from ..data import Image2D
from ..metrics import logits_to_foreground
from ..training.checkpointing import restore_checkpoint
from ..training.trainer import _write_mask_png, setup_state
from ..utils import chk_mkdir


def main(argv=None):
    # setup_state installs the kernel mesh; don't leak it to in-process
    # callers (see parallel.kernel_mesh_scope)
    from ..parallel import kernel_mesh_scope
    with kernel_mesh_scope():
        return _main(argv)


def _main(argv=None):
    cfg = parse_config(argv, description="medt_tpu predict")
    if not cfg.val_dataset or not cfg.loaddirec:
        raise SystemExit("--val_dataset and --loaddirec are required")

    ds = Image2D(cfg.val_dataset, gray=cfg.gray == "yes")
    state = setup_state(cfg, steps_per_epoch=1)
    state = restore_checkpoint(cfg.loaddirec, state, with_optimizer=False)

    @jax.jit
    def forward(batch):
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False,
        )

    chk_mkdir(cfg.direc)
    for i in range(len(ds)):
        image, name = ds[i]
        x = jnp.asarray(image, jnp.float32)
        if x.ndim == 2:
            x = x[..., None]
        if x.shape[0] == cfg.imgsize and x.shape[1] == cfg.imgsize:
            logits = forward(x[None])[0]
        else:
            from ..evaluation.sliding_window import sliding_window_inference

            logits = sliding_window_inference(
                x, forward, window=cfg.imgsize,
                stride=max(cfg.imgsize // 2, 1),
            )
        fg = np.asarray(logits_to_foreground(logits[None], mode=cfg.pred_mode))[0]
        _write_mask_png(os.path.join(cfg.direc, name), fg)
    print(f"wrote {len(ds)} masks to {cfg.direc}")


if __name__ == "__main__":
    main()
