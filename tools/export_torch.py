"""Export an Orbax checkpoint to a reference-format PyTorch state dict.

Weights trained in this framework become loadable by the reference's own
scripts (``model.load_state_dict(torch.load(...), strict=False)``,
reference test.py:105) — the reverse direction of the checkpoint import
the parity tests use.

    python tools/export_torch.py --ckpt <direc>/final_model \
        --modelname MedT --imgsize 128 --out medt.pth

Writes ``torch.save``-format when torch is importable, ``.npz`` (keys =
state-dict keys) otherwise.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="checkpoint dir (.../final_model or an epoch dir)")
    p.add_argument("--modelname", default="MedT")
    p.add_argument("--imgsize", type=int, default=128)
    p.add_argument("--imgchan", type=int, default=3)
    p.add_argument("--out", required=True, help=".pth or .npz output path")
    p.add_argument("--platform", default="",
                   help="pin a jax platform (e.g. cpu) before backend init")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import optax

    from medt_tpu.models import build_model
    from medt_tpu.training.checkpointing import restore_checkpoint
    from medt_tpu.training.state import init_state
    from medt_tpu.utils.torch_import import export_for_model

    model = build_model(args.modelname, img_size=args.imgsize,
                        imgchan=args.imgchan)
    state = init_state(model, optax.sgd(0.0),
                       (1, args.imgsize, args.imgsize, args.imgchan))
    state = restore_checkpoint(args.ckpt, state, with_optimizer=False)
    sd = export_for_model(args.modelname, state.params, state.batch_stats)

    if args.out.endswith(".npz"):
        import numpy as np
        np.savez(args.out, **sd)
    else:
        try:
            import torch
        except ImportError:
            raise SystemExit(
                "torch not importable — use an .npz output path instead")
        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                   args.out)
    print(f"wrote {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
