"""Trajectory-equivalence study: N optimizer steps, torch reference vs here.

Single-step parity (tests/test_reference_parity.py: eval outputs to 2e-4,
train-mode outputs + BN running stats to 5e-4) proves "same math at one
point". This tool proves "same training run": it imports one identical
initialization into BOTH frameworks, feeds byte-identical seed-pinned
synthetic batches, runs N ``torch.optim.Adam`` steps through the reference
implementation (CPU) and N ``adam_l2`` steps here, then compares the
per-step loss curves and the final weights key by key. This is the
strongest accuracy-parity evidence obtainable without the GLaS/MoNuSeg
datasets.

Reference loop semantics being matched: the epoch body at reference
train.py:126-161 (forward -> ``LogNLLLoss`` == ``F.cross_entropy`` on raw
logits, metrics.py:9-20 -> ``Adam(lr, weight_decay=1e-5)``, train.py:111-112,
with the decay L2-coupled into the gradient, not AdamW).

Expected behavior: the two trajectories are NOT bit-identical — f32
reduction orders differ between XLA and torch CPU kernels — so per-step
loss deltas grow slowly with step count. The study quantifies that drift;
"equivalent" means the loss curves track within noise and the final weights
agree to a tolerance far below a single optimizer step's own movement.

Usage:
  python tools/trajectory_equivalence.py [--model gatedaxialunet] [--img 64]
      [--batch 2] [--steps 200] [--lr 1e-3] [--out trajectory_report.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REF = os.environ.get("MEDT_REFERENCE", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the reference factory name for each registry name here
_REF_FACTORY = {"axialunet": "axialunet", "gatedaxialunet": "gated",
                "MedT": "MedT", "logo": "logo"}


def _stub_torchvision():
    """The reference package imports torchvision at import time for its dead
    ImageNet pipeline; the model code never touches it."""
    try:
        import torchvision  # noqa: F401
        return
    except ModuleNotFoundError:
        import types

        tv = types.ModuleType("torchvision")
        for sub in ("transforms", "datasets", "models"):
            mod = types.ModuleType(f"torchvision.{sub}")
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        sys.modules["torchvision"] = tv


def make_batches(steps: int, batch: int, img: int, chan: int, classes: int,
                 seed: int = 123):
    """One fixed pool of synthetic batches both loops consume in order."""
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=(steps, batch, chan, img, img)).astype(np.float32)
    ys = rng.integers(0, classes, size=(steps, batch, img, img)).astype(np.int64)
    return xs, ys


def run_torch(model_name: str, img: int, chan: int, xs, ys, lr: float,
              wd: float, log_every: int, perturb: float = 0.0):
    sys.path.insert(0, REF)
    _stub_torchvision()
    import torch
    import torch.nn.functional as F
    import lib  # noqa: the reference package

    torch.manual_seed(3000)  # the reference's pinned seed (train.py:118)
    factory = getattr(lib.models.axialnet, _REF_FACTORY[model_name])
    model = factory(img_size=img, imgchan=chan)
    if perturb:
        # chaos probe: nudge every trainable weight by a relative epsilon and
        # rerun the SAME torch loop — the resulting trajectory divergence is
        # the yardstick separating float-noise chaos from semantic mismatch
        with torch.no_grad():
            for p in model.parameters():
                if p.requires_grad:
                    p.add_(perturb * p.abs().clamp(min=1e-3)
                           * torch.sign(torch.randn_like(p)))
    sd0 = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}

    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=wd)
    model.train()
    losses = []
    t0 = time.time()
    for i in range(xs.shape[0]):
        x = torch.from_numpy(xs[i])
        y = torch.from_numpy(ys[i])
        logits = model(x)
        loss = F.cross_entropy(logits, y)  # == reference LogNLLLoss
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        if (i + 1) % log_every == 0:
            print(f"  torch step {i + 1}: loss {losses[-1]:.6f} "
                  f"({(time.time() - t0) / (i + 1):.2f}s/step)")
    sd_final = {k: v.detach().clone().numpy()
                for k, v in model.state_dict().items()}
    return sd0, losses, sd_final


def run_jax(model_name: str, img: int, chan: int, sd0, xs, ys, lr: float,
            wd: float, log_every: int):
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp
    from medt_tpu.models import build_model
    from medt_tpu.training.optimizers import adam_l2
    from medt_tpu.training.state import TrainState, train_step
    from medt_tpu.utils.torch_import import export_state_dict, import_state_dict

    model = build_model(model_name, img_size=img)
    x0 = jnp.asarray(xs[0].transpose(0, 2, 3, 1))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False)
    params, stats = import_state_dict(sd0, variables["params"],
                                      variables["batch_stats"])
    state = TrainState.create(apply_fn=model.apply, params=params,
                              batch_stats=stats, tx=adam_l2(lr, weight_decay=wd))
    step = jax.jit(train_step)
    losses = []
    t0 = time.time()
    for i in range(xs.shape[0]):
        batch = {"image": jnp.asarray(xs[i].transpose(0, 2, 3, 1)),
                 "label": jnp.asarray(ys[i])}
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        if (i + 1) % log_every == 0:
            print(f"  jax step {i + 1}: loss {losses[-1]:.6f} "
                  f"({(time.time() - t0) / (i + 1):.2f}s/step)")
    sd_final = export_state_dict(state.params, state.batch_stats)
    return losses, sd_final


def run_jax_only(model_name: str, img: int, chan: int, xs, ys, lr: float,
                 wd: float, log_every: int, dtype: str = "float32",
                 perturb: float = 0.0, init_params=None, init_stats=None,
                 seed: int = 0):
    """One jax training leg without any torch involvement — the engine of
    the DTYPE study (bf16-vs-f32 vs the float-chaos envelope, all three
    legs this framework, run on whatever backend JAX provides — the real
    TPU chip when available, where bf16 behavior is the production one).

    Returns (init_params, init_stats, losses, final_params) so the first
    leg's init can seed the others (identical-init protocol, mirroring the
    torch study).
    """
    import jax
    import jax.numpy as jnp
    from medt_tpu.models import build_model
    from medt_tpu.training.optimizers import adam_l2
    from medt_tpu.training.state import TrainState, train_step

    dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
    model = build_model(model_name, img_size=img, dtype=dt, use_fused=True)
    if init_params is None:
        x0 = jnp.asarray(xs[0].transpose(0, 2, 3, 1))
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(seed), x0, train=False)
        init_params = variables["params"]
        init_stats = variables["batch_stats"]
    params = init_params
    if perturb:
        # the same relative nudge as the torch chaos probe (run_torch)
        prng = np.random.default_rng(77)

        def _nudge(p):
            p = np.asarray(p, np.float32)
            return jnp.asarray(
                p + perturb * np.maximum(np.abs(p), 1e-3)
                * np.sign(prng.normal(size=p.shape)).astype(np.float32))
        params = jax.tree_util.tree_map(_nudge, params)
    state = TrainState.create(apply_fn=model.apply, params=params,
                              batch_stats=init_stats,
                              tx=adam_l2(lr, weight_decay=wd))
    step = jax.jit(train_step)
    losses = []
    t0 = time.time()
    for i in range(xs.shape[0]):
        batch = {"image": jnp.asarray(xs[i].transpose(0, 2, 3, 1)),
                 "label": jnp.asarray(ys[i])}
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        if (i + 1) % log_every == 0:
            print(f"  jax[{dtype}{'+chaos' if perturb else ''}] step "
                  f"{i + 1}: loss {losses[-1]:.6f} "
                  f"({(time.time() - t0) / (i + 1):.2f}s/step)")
    return init_params, init_stats, losses, state.params


_GATE_LEAF = (".f_qr", ".f_kr", ".f_sve", ".f_sv")


def compare_state_dicts(sd_a, sd_b):
    """Per-key diffs between two reference-format state dicts.

    Trainable params and BN running statistics are reported separately:
    running stats are momentum accumulators of *batch moments*, so they
    integrate trajectory drift at a different rate than the Adam-updated
    weights and deserve their own headline. Frozen gates (requires_grad=False
    in the reference, compile-time constants here, so absent from the export)
    are equal by construction and skipped.
    """
    diffs = []
    n_gates = 0
    missing = []
    for k, av in sd_a.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith(_GATE_LEAF):
            n_gates += 1
            continue
        if k not in sd_b:
            missing.append(k)
            continue
        bv = np.asarray(sd_b[k], np.float32)
        av = np.asarray(av, np.float32)
        a = float(np.max(np.abs(av - bv))) if av.size else 0.0
        scale = float(np.mean(np.abs(av))) + 1e-12
        is_stat = k.endswith(("running_mean", "running_var"))
        diffs.append((k, a, a / scale, is_stat))

    def _head(rows):
        if not rows:
            return {"n": 0, "max_abs": 0.0, "max_rel": 0.0, "top": []}
        by_abs = sorted(rows, key=lambda r: -r[1])
        return {
            "n": len(rows),
            "max_abs": by_abs[0][1],
            "max_rel": max(r[2] for r in rows),
            "top": [{"key": k, "abs": round(a, 8), "rel": round(r, 6)}
                    for k, a, r, _ in by_abs[:10]],
        }

    return {
        "params": _head([d for d in diffs if not d[3]]),
        "running_stats": _head([d for d in diffs if d[3]]),
        "frozen_gates_skipped": n_gates,
        "keys_missing": missing,
    }


def _compare_pytrees(tree_a, tree_b):
    """max-abs / max-rel param drift between two pytrees of equal structure."""
    import jax
    leaves_a = jax.tree_util.tree_leaves(tree_a)
    leaves_b = jax.tree_util.tree_leaves(tree_b)
    max_abs = max_rel = 0.0
    for a, b in zip(leaves_a, leaves_b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if not a.size:
            continue
        d = float(np.max(np.abs(a - b)))
        max_abs = max(max_abs, d)
        max_rel = max(max_rel, d / (float(np.mean(np.abs(a))) + 1e-12))
    return {"max_abs": max_abs, "max_rel": max_rel}


def run_dtype_study(args, loss_stats):
    """bf16-vs-f32 trajectory study (BASELINE.md round-3 open question):
    three legs of THIS framework from one identical init — f32, bf16, and
    f32 with a 1e-6-relative perturbed init (the chaos envelope). If the
    bf16 divergence sits inside the chaos envelope, bf16 changes nothing a
    float-noise-sized nudge would not."""
    xs, ys = make_batches(args.steps, args.batch, args.img, args.chan, 2)
    print(f"[1/4] jax f32: {args.model} img{args.img} b{args.batch} x "
          f"{args.steps} steps")
    p0, s0, loss_f32, pf_f32 = run_jax_only(
        args.model, args.img, args.chan, xs, ys, args.lr, args.wd,
        args.log_every, dtype="float32")
    print("[2/4] jax bf16: identical init + batches")
    _, _, loss_bf16, pf_bf16 = run_jax_only(
        args.model, args.img, args.chan, xs, ys, args.lr, args.wd,
        args.log_every, dtype="bfloat16", init_params=p0, init_stats=s0)
    print(f"[3/4] jax f32 chaos probe: init perturbed by {args.chaos:g} rel")
    _, _, loss_chaos, pf_chaos = run_jax_only(
        args.model, args.img, args.chan, xs, ys, args.lr, args.wd,
        args.log_every, dtype="float32", perturb=args.chaos,
        init_params=p0, init_stats=s0)
    print("[4/4] comparing trajectories")
    lt = np.asarray(loss_f32)
    report = {
        "study": "dtype", "model": args.model, "img": args.img,
        "batch": args.batch, "steps": args.steps, "lr": args.lr,
        "wd": args.wd,
        "f32_mean_step_move": (float(np.mean(np.abs(np.diff(lt))))
                               if len(lt) > 1 else 0.0),
        "bf16_vs_f32": {"loss": loss_stats(loss_f32, loss_bf16),
                        "params_final": _compare_pytrees(pf_f32, pf_bf16)},
        "chaos_envelope": {"loss": loss_stats(loss_f32, loss_chaos),
                           "params_final": _compare_pytrees(pf_f32, pf_chaos)},
        "curves": {"f32": [round(v, 6) for v in loss_f32],
                   "bf16": [round(v, 6) for v in loss_bf16],
                   "f32_perturbed": [round(v, 6) for v in loss_chaos]},
    }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gatedaxialunet",
                    choices=sorted(_REF_FACTORY))
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--chan", type=int, default=3)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-3)  # README.md:113 config
    ap.add_argument("--wd", type=float, default=1e-5)  # train.py:111 hardcode
    ap.add_argument("--log_every", type=int, default=25)
    ap.add_argument("--chaos", type=float, default=1e-6,
                    help="relative init perturbation for the torch-vs-torch "
                         "chaos probe (0 disables the probe)")
    ap.add_argument("--study", default="torch", choices=("torch", "dtype"),
                    help="'torch': jax-vs-torch reference equivalence; "
                         "'dtype': bf16-vs-f32 within this framework vs the "
                         "chaos envelope (run on the TPU for production "
                         "bf16 semantics)")
    ap.add_argument("--out", default="trajectory_report.json")
    args = ap.parse_args()

    def _loss_stats_outer(la, lb):
        la, lb = np.asarray(la), np.asarray(lb)
        d = np.abs(la - lb)
        return {
            "first": [float(la[0]), float(lb[0])],
            "final": [float(la[-1]), float(lb[-1])],
            "max_abs_diff": float(d.max()),
            "max_abs_diff_step": int(d.argmax()),
            "mean_abs_diff": float(d.mean()),
            "first10_max_diff": float(d[:10].max()),
            "corr": float(np.corrcoef(la, lb)[0, 1]),
        }

    if args.study == "torch":
        # the equivalence study compares f32 CPU math on both sides; this
        # sandbox preimports jax with JAX_PLATFORMS=axon and scrubs the env
        # var, so pin the platform in-process (works until backend init)
        import jax as _jax
        try:
            _jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    if args.study == "dtype":
        sys.path.insert(0, REPO)
        report = run_dtype_study(args, _loss_stats_outer)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps({k: v for k, v in report.items() if k != "curves"},
                         indent=1))
        print(f"wrote {args.out}")
        return

    n_phases = 3 + (1 if args.chaos else 0)
    xs, ys = make_batches(args.steps, args.batch, args.img, args.chan, 2)
    print(f"[1/{n_phases}] torch reference: {args.model} img{args.img} "
          f"b{args.batch} x {args.steps} Adam steps (lr {args.lr}, "
          f"wd {args.wd})")
    sd0, loss_t, sd_t = run_torch(args.model, args.img, args.chan, xs, ys,
                                  args.lr, args.wd, args.log_every)
    print(f"[2/{n_phases}] medt_tpu: identical init + batches, "
          f"{args.steps} steps")
    loss_j, sd_j = run_jax(args.model, args.img, args.chan, sd0, xs, ys,
                           args.lr, args.wd, args.log_every)
    loss_c = sd_c = None
    if args.chaos:
        print(f"[3/{n_phases}] chaos probe: torch again, init perturbed "
              f"by {args.chaos:g} rel")
        _, loss_c, sd_c = run_torch(args.model, args.img, args.chan, xs, ys,
                                    args.lr, args.wd, args.log_every,
                                    perturb=args.chaos)

    def _loss_stats(la, lb):
        la, lb = np.asarray(la), np.asarray(lb)
        d = np.abs(la - lb)
        return {
            "first": [float(la[0]), float(lb[0])],
            "final": [float(la[-1]), float(lb[-1])],
            "max_abs_diff": float(d.max()),
            "max_abs_diff_step": int(d.argmax()),
            "mean_abs_diff": float(d.mean()),
            "first10_max_diff": float(d[:10].max()),
            "corr": float(np.corrcoef(la, lb)[0, 1]),
        }

    print(f"[{n_phases}/{n_phases}] comparing trajectories")
    lt = np.asarray(loss_t)
    step_move = float(np.mean(np.abs(np.diff(lt)))) if len(lt) > 1 else 0.0
    report = {
        "model": args.model, "img": args.img, "batch": args.batch,
        "steps": args.steps, "lr": args.lr, "wd": args.wd,
        "torch_mean_step_move": step_move,
        "loss": _loss_stats(loss_t, loss_j),
        "weights_final": compare_state_dicts(sd_t, sd_j),
        "curves": {"torch": [round(v, 6) for v in loss_t],
                   "jax": [round(v, 6) for v in loss_j]},
    }
    if loss_c is not None:
        report["chaos_probe"] = {
            "perturb_rel": args.chaos,
            "loss": _loss_stats(loss_t, loss_c),
            "weights_final": compare_state_dicts(sd_t, sd_c),
        }
        report["curves"]["torch_perturbed"] = [round(v, 6) for v in loss_c]
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "curves"},
                     indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
