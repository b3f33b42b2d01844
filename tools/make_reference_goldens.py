"""Generate full-model parity goldens from the PyTorch reference.

Runs the *actual reference implementation* (expected at /root/reference or
$MEDT_REFERENCE) on CPU torch, and saves, per model: the torch state_dict,
a fixed random input, the eval-mode output, the train-mode output, and the
post-forward running statistics of one probe BN. The test suite
(tests/test_reference_parity.py) imports those weights through
medt_tpu.utils.torch_import and requires output agreement — the strongest
available evidence that this framework computes the same function.

Usage:  python tools/make_reference_goldens.py [out_dir]
"""
from __future__ import annotations

import os
import sys

import numpy as np

REF = os.environ.get("MEDT_REFERENCE", "/root/reference")
_pos = [a for a in sys.argv[1:] if not a.startswith("-")]
OUT = _pos[0] if _pos else os.path.join(
    os.path.dirname(__file__), "..", "tests", "goldens")

CONFIGS = [
    # (name, factory, img_size, imgchan, batch)
    ("axialunet", "axialunet", 64, 3, 2),
    ("gatedaxialunet", "gated", 64, 3, 2),
    ("MedT", "MedT", 128, 3, 1),
]

# classification backbones (reference lib/models/resnet.py; exported via
# lib/models/__init__.py:1) — eval goldens for the torch-import path.
# NOT written to tests/goldens by default: a full-width ResNet state dict is
# ~40 MB compressed; the parity test generates it on the fly from the
# reference instead (tests/test_reference_parity.py). Pass --cls to emit.
CLS_CONFIGS = [
    ("resnet26", 64, 2),
    ("resnet18", 64, 2),
]


def main():
    sys.path.insert(0, REF)
    import torch

    # the reference package imports torchvision at package-import time for
    # its (dead) ImageNet pipeline; stub it if absent — the model code never
    # touches it
    try:
        import torchvision  # noqa
    except ModuleNotFoundError:
        import types

        tv = types.ModuleType("torchvision")
        for sub in ("transforms", "datasets", "models"):
            mod = types.ModuleType(f"torchvision.{sub}")
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        sys.modules["torchvision"] = tv

    import lib  # noqa: the reference package

    os.makedirs(OUT, exist_ok=True)
    for name, factory, img, chan, batch in CONFIGS:
        torch.manual_seed(3000)  # the reference's pinned seed (train.py:118)
        model = getattr(lib.models.axialnet, factory)(
            img_size=img, imgchan=chan)
        rng = np.random.default_rng(7)
        x = rng.normal(size=(batch, chan, img, img)).astype(np.float32)
        xt = torch.from_numpy(x)

        # snapshot the fresh state dict before any forward mutates BN stats
        sd = {k: v.detach().clone().numpy()
              for k, v in model.state_dict().items()}

        model.eval()
        with torch.no_grad():
            out_eval = model(xt).numpy()

        # train-mode forward: batch-stat normalization + running-stat update.
        # For MedT the golden captures the reference's 16 sequential
        # per-patch local-branch passes (axialnet.py:661-700), which
        # MedTNet(sequential_bn_parity=True) reproduces exactly. The eval
        # forward above does not mutate running stats, so this train
        # forward starts from the freshly-initialized stats in `sd`.
        model.train()
        with torch.no_grad():
            out_train = model(xt).numpy()

        blob = {
            "__input__": x,
            "__out_eval__": out_eval,
            "__out_train__": out_train,
        }
        # post-train-forward running statistics of EVERY BN — the direct
        # evidence for the sequential-EMA parity mode
        sd_after = model.state_dict()
        for k, v in sd_after.items():
            if k.endswith(("running_mean", "running_var")):
                blob["__stats_after__." + k] = v.numpy()

        for k, v in sd.items():
            blob["sd." + k] = v
        path = os.path.join(OUT, f"{name}.npz")
        np.savez_compressed(path, **blob)
        print(f"{name}: wrote {path} ({os.path.getsize(path)/1e6:.1f} MB), "
              f"out_eval mean {out_eval.mean():.6f}")

    import lib.models.resnet as ref_resnet

    if "--cls" not in sys.argv:
        return  # ~40 MB each; the parity test generates these on the fly
    for name, img, batch in CLS_CONFIGS:
        torch.manual_seed(3000)
        model = getattr(ref_resnet, name)(num_classes=10)
        rng = np.random.default_rng(11)
        x = rng.normal(size=(batch, 3, img, img)).astype(np.float32)
        sd = {k: v.detach().clone().numpy()
              for k, v in model.state_dict().items()}
        model.eval()
        with torch.no_grad():
            out_eval = model(torch.from_numpy(x)).numpy()
        blob = {"__input__": x, "__out_eval__": out_eval}
        for k, v in sd.items():
            blob["sd." + k] = v
        path = os.path.join(OUT, f"{name}.npz")
        np.savez_compressed(path, **blob)
        print(f"{name}: wrote {path} ({os.path.getsize(path)/1e6:.1f} MB), "
              f"out_eval mean {out_eval.mean():.6f}")


if __name__ == "__main__":
    main()
