"""Frozen-vs-trained gates convergence study on synthetic blob segmentation.

The released reference creates its attention gates with
``requires_grad=False`` — frozen constants (reference axialnet.py:124-127) —
while the paper describes *learned* gates. The framework supports both
(``AxialAttention.trainable_gates``); this tool trains the flagship model
once per setting on identical data/seeds/schedule, runs the best-checkpoint
sweep protocol on each, and prints the side-by-side val F1 / mIoU
trajectory, plus the final learned gate values of the trained arm.

    python tools/gates_convergence.py --epochs 50 --n_train 16 --imgsize 128

Mirrors tools/bf16_convergence.py (same data generator and protocol) so the
two studies are comparable.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_arm(trainable: bool, train_dir: str, val_dir: str, out_root: str,
            args) -> dict:
    from medt_tpu.cli.train import main as train_main
    from medt_tpu.evaluation import sweep_checkpoint_grid

    tag = "trained" if trainable else "frozen"
    out = os.path.join(out_root, tag)
    train_main([
        "--train_dataset", train_dir, "--val_dataset", val_dir,
        "--modelname", args.modelname, "--imgsize", str(args.imgsize),
        "--batch_size", str(args.batch_size),
        "--epochs", str(args.epochs), "--save_freq", str(args.save_freq),
        "--learning_rate", str(args.learning_rate),
        "--direc", out, "--workers", "0",
        "--trainable_gates", "yes" if trainable else "no",
    ])
    sweep = sweep_checkpoint_grid(out, os.path.join(val_dir, "labelcol"))
    traj = []
    with open(os.path.join(out, "train_log.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "val_f1" in rec:
                traj.append((rec.get("epoch"), rec["val_f1"],
                             rec.get("val_iou")))
    gates = None
    if trainable:
        gates = _collect_gates(out, args)
    return {"arm": tag, "sweep": sweep, "trajectory": traj, "gates": gates}


def _collect_gates(direc: str, args) -> dict:
    """Read the final checkpoint's learned gate parameters."""
    import jax.numpy as jnp
    import optax

    from medt_tpu.models import build_model
    from medt_tpu.training.checkpointing import restore_checkpoint
    from medt_tpu.training.state import init_state

    model = build_model(args.modelname, img_size=args.imgsize,
                        trainable_gates=True)
    state = init_state(model, optax.sgd(0.0),
                       (1, args.imgsize, args.imgsize, 3))
    state = restore_checkpoint(os.path.join(direc, "final_model"), state,
                               with_optimizer=False)

    out = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        elif path and path[-1] in ("f_qr", "f_kr", "f_sve", "f_sv"):
            out["/".join(path)] = float(jnp.asarray(tree))

    walk(state.params, ())
    return out


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
    p.add_argument("--data_seed", type=int, default=0)
    p.add_argument("--outdir", default="")
    p.add_argument("--platform", default="",
                   help="pin a jax platform (e.g. cpu); the env preimports "
                        "jax on the axon TPU plugin, so JAX_PLATFORMS=cpu in "
                        "the shell is too late — this uses jax.config.update "
                        "before any backend init (same as tests/conftest.py)")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from medt_tpu.data.synthetic import make_png_dataset

    root = args.outdir or tempfile.mkdtemp(prefix="gates_study_")
    train_dir = make_png_dataset(os.path.join(root, "train"),
                                 n=args.n_train, img_size=args.imgsize,
                                 seed=args.data_seed)
    val_dir = make_png_dataset(os.path.join(root, "val"), n=args.n_val,
                               img_size=args.imgsize,
                               seed=args.data_seed + 1000)

    results = [run_arm(False, train_dir, val_dir, root, args),
               run_arm(True, train_dir, val_dir, root, args)]

    print("\n=== gates study ===")
    for r in results:
        best = r["sweep"].get("best", {})
        print(f"{r['arm']:8s} best-epoch sweep: {best}")
        for e, f1, iou in r["trajectory"]:
            print(f"  epoch {e}: F1 {f1:.4f}  IoU {iou:.4f}")
    g = results[1]["gates"]
    if g:
        print("learned gate values (init f_qr/f_kr/f_sve=0.1, f_sv=1.0):")
        for k in sorted(g):
            print(f"  {k} = {g[k]:+.4f}")
    with open(os.path.join(root, "gates_study.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("written:", os.path.join(root, "gates_study.json"))


if __name__ == "__main__":
    main()
