"""bf16-vs-f32 convergence study on synthetic blob segmentation.

The fused train path runs +12% faster with bfloat16 activations
(BASELINE.md), but bf16 stays opt-in until accuracy is validated. This
tool trains the flagship MedT twice — identical data, seeds, schedule —
once per compute dtype, then runs the best-checkpoint sweep protocol
(evaluation/sweep.py, mirroring the reference's MATLAB grid) on each and
prints the side-by-side val F1 / mIoU trajectory.

    python tools/bf16_convergence.py --epochs 50 --n_train 16 --imgsize 128

Params and optimizer state stay fp32 in both arms (the dtype flag only
switches activation/einsum compute), matching mixed-precision practice.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_arm(dtype: str, train_dir: str, val_dir: str, out_root: str,
            args) -> dict:
    from medt_tpu.cli.train import main as train_main
    from medt_tpu.evaluation import sweep_checkpoint_grid

    out = os.path.join(out_root, dtype)
    train_main([
        "--train_dataset", train_dir, "--val_dataset", val_dir,
        "--modelname", args.modelname, "--imgsize", str(args.imgsize),
        "--batch_size", str(args.batch_size),
        "--epochs", str(args.epochs), "--save_freq", str(args.save_freq),
        "--learning_rate", str(args.learning_rate),
        "--direc", out, "--workers", "0", "--dtype", dtype,
    ])
    sweep = sweep_checkpoint_grid(out, os.path.join(val_dir, "labelcol"))
    # per-epoch val metrics from the training log for the trajectory
    traj = []
    with open(os.path.join(out, "train_log.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "val_f1" in rec:
                traj.append((rec.get("epoch"), rec["val_f1"],
                             rec.get("val_iou")))
    return {"dtype": dtype, "sweep": sweep, "trajectory": traj}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--modelname", default="MedT")
    p.add_argument("--imgsize", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--save_freq", type=int, default=5)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--n_train", type=int, default=16)
    p.add_argument("--n_val", type=int, default=8)
    p.add_argument("--outdir", default="")
    p.add_argument("--data_seed", type=int, default=0,
                   help="offset for the synthetic dataset seeds (study replicas)")
    args = p.parse_args(argv)

    from medt_tpu.data.synthetic import make_png_dataset
    from medt_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    root = args.outdir or tempfile.mkdtemp(prefix="bf16_study_")
    train_dir = make_png_dataset(os.path.join(root, "train"),
                                 n=args.n_train, img_size=args.imgsize,
                                 seed=args.data_seed)
    val_dir = make_png_dataset(os.path.join(root, "val"), n=args.n_val,
                               img_size=args.imgsize, seed=args.data_seed + 1)

    results = [run_arm(d, train_dir, val_dir, root, args)
               for d in ("float32", "bfloat16")]

    print("\n=== bf16 vs f32 convergence (synthetic blobs, "
          f"{args.modelname} {args.imgsize}px, {args.epochs} epochs) ===")
    for r in results:
        s = r["sweep"]
        print(f"{r['dtype']:>9}: best epoch {s['best_epoch']} "
              f"F1={s['best']['f1']:.4f} mIoU={s['best']['miou']:.4f}")
    f32, bf16 = results
    print(f"delta: F1 "
          f"{bf16['sweep']['best']['f1'] - f32['sweep']['best']['f1']:+.4f} "
          f"mIoU "
          f"{bf16['sweep']['best']['miou'] - f32['sweep']['best']['miou']:+.4f}")
    print(json.dumps({
        r["dtype"]: {"best_epoch": r["sweep"]["best_epoch"],
                     **r["sweep"]["best"]} for r in results}))
    return results


if __name__ == "__main__":
    main()
