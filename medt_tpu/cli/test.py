"""Inference CLI.

Equivalent of the reference's test script (reference test.py) with its two
defects fixed: the undefined ``args.aug`` read (test.py:62) and metrics that
were computed but discarded — here per-image F1/IoU are computed on device
and printed/saved.

    python -m medt_tpu.cli.test --val_dataset <dir> --modelname MedT \
        --imgsize 128 --loaddirec ./results/final_model --direc ./preds
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax

from ..config import parse_config
from ..data import DataLoader, ImageToImage2D, JointTransform2D
from ..metrics import binary_seg_scores, logits_to_foreground
from ..training.checkpointing import restore_checkpoint
from ..training.state import eval_step
from ..training.trainer import _device_batch, _write_mask_png, setup_state
from ..utils import chk_mkdir


def main(argv=None):
    # setup_state installs the kernel mesh; don't leak it to in-process
    # callers (see parallel.kernel_mesh_scope)
    from ..parallel import kernel_mesh_scope
    with kernel_mesh_scope():
        return _main(argv)


def _main(argv=None):
    cfg = parse_config(argv, description="medt_tpu test")
    if not cfg.val_dataset or not cfg.loaddirec:
        raise SystemExit("--val_dataset and --loaddirec are required")

    tf_val = JointTransform2D(crop=cfg.crop_tuple, p_flip=0,
                              color_jitter_params=None, long_mask=True)
    ds = ImageToImage2D(cfg.val_dataset, tf_val, gray=cfg.gray == "yes")
    loader = DataLoader(ds, 1, shuffle=False, num_workers=cfg.workers,
                        seed=cfg.seed)

    state = setup_state(cfg, steps_per_epoch=1)
    state = restore_checkpoint(cfg.loaddirec, state, with_optimizer=False)
    eval_fn = jax.jit(eval_step)

    chk_mkdir(cfg.direc)
    f1s, ious = [], []
    for batch in loader:
        logits = eval_fn(state, _device_batch(batch))
        fg = logits_to_foreground(logits, mode=cfg.pred_mode)
        gt = np.asarray(batch["label"]) > 0
        f1, iou, _ = binary_seg_scores(fg, gt)
        f1s.extend(np.asarray(f1).tolist())
        ious.extend(np.asarray(iou).tolist())
        fg_np = np.asarray(fg)
        for i, name in enumerate(batch["name"]):
            _write_mask_png(os.path.join(cfg.direc, name), fg_np[i])

    summary = {"mean_f1": float(np.mean(f1s)), "mean_iou": float(np.mean(ious)),
               "images": len(f1s)}
    print(json.dumps(summary))
    with open(os.path.join(cfg.direc, "metrics.json"), "w") as f:
        json.dump({"per_image_f1": f1s, "per_image_iou": ious, **summary}, f)


if __name__ == "__main__":
    main()
