"""Best-checkpoint grid evaluation — the MATLAB protocol, on device.

Replaces ``performancemetrics_{glas,monuseg,ax}.m``: for each saved epoch
directory of predicted masks, compute per-image foreground F1 / mIoU /
pixel-accuracy against the ground-truth label directory, and report the epoch
with the best mean F1 (reference performancemetrics_glas.m:15-88).

Protocol details preserved:
* predictions binarized at >130 (glas) / >127 (monuseg) — ``pred_thresh``;
* ground truth binarized at ~130/127 — ``gt_thresh``;
* the original scripts score empty-prediction images (tp == 0) as 1.0 and
  exclude all-1.0 epochs from "best" tracking (glas.m:72-76, 82-88). That
  flattering edge case is off by default and available as
  ``empty_score_one=True`` for bit-parity comparisons.

Usage:
    python -m medt_tpu.evaluation.sweep --pred_root <results_dir> \
        --label_dir <dataset>/labelcol [--empty_score_one]
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..metrics import binary_seg_scores


def _read_gray(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path, 0)
        if img is None:
            raise FileNotFoundError(path)
        return img
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("L"))


def evaluate_png_dir(pred_dir: str, label_dir: str, *,
                     pred_thresh: int = 127, gt_thresh: int = 127,
                     empty_score_one: bool = False) -> Dict[str, float]:
    """Mean per-image F1/mIoU/PA of ``pred_dir`` masks vs ``label_dir``."""
    names = sorted(
        n for n in os.listdir(pred_dir)
        if n.lower().endswith(".png") and os.path.exists(os.path.join(label_dir, n))
    )
    if not names:
        return {"f1": float("nan"), "miou": float("nan"), "pa": float("nan"),
                "images": 0}
    preds, gts = [], []
    for n in names:
        preds.append(_read_gray(os.path.join(pred_dir, n)) > pred_thresh)
        gts.append(_read_gray(os.path.join(label_dir, n)) > gt_thresh)
    pred = jnp.asarray(np.stack(preds))
    gt = jnp.asarray(np.stack(gts))
    f1, iou, pa = binary_seg_scores(pred, gt, empty_score_one=empty_score_one)
    return {
        "f1": float(jnp.mean(f1)),
        "miou": float(jnp.mean(iou)),
        "pa": float(jnp.mean(pa)),
        "images": len(names),
    }


def sweep_checkpoint_grid(pred_root: str, label_dir: str,
                          epochs: Optional[List[int]] = None,
                          **kwargs) -> Dict:
    """Evaluate every numeric epoch dir under ``pred_root``; report the best."""
    if epochs is None:
        epochs = sorted(
            int(d) for d in os.listdir(pred_root)
            if d.isdigit() and os.path.isdir(os.path.join(pred_root, d))
        )
    results = {}
    best = None
    for ep in epochs:
        scores = evaluate_png_dir(os.path.join(pred_root, str(ep)), label_dir,
                                  **kwargs)
        results[ep] = scores
        if scores["images"] and (best is None
                                 or scores["f1"] > results[best]["f1"]):
            best = ep
    return {"per_epoch": results, "best_epoch": best,
            "best": results.get(best)}


def main(argv=None):
    p = argparse.ArgumentParser(description="best-checkpoint F1/mIoU sweep")
    p.add_argument("--pred_root", required=True)
    p.add_argument("--label_dir", required=True)
    p.add_argument("--pred_thresh", type=int, default=127)
    p.add_argument("--gt_thresh", type=int, default=127)
    p.add_argument("--empty_score_one", action="store_true")
    args = p.parse_args(argv)
    out = sweep_checkpoint_grid(
        args.pred_root, args.label_dir, pred_thresh=args.pred_thresh,
        gt_thresh=args.gt_thresh, empty_score_one=args.empty_score_one,
    )
    print(json.dumps(out, indent=2, default=str))


if __name__ == "__main__":
    main()
