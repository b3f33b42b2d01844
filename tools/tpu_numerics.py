"""On-chip numerics validation (VERDICT round-1 weak #5).

The CPU test suite proves parity in f32 with the Pallas kernels in interpret
mode. This tool reruns the same checks on the REAL TPU — bf16 MXU passes for
f32 einsums, genuine Mosaic lowerings for the kernels — and prints a
markdown table of achieved max-abs differences for BASELINE.md.

Checks:
  1. torch-golden eval outputs (axialunet/gatedaxialunet/MedT) on TPU.
  2. fused eval kernel (real Mosaic) vs the jnp path, same device,
     per attention geometry incl. the span gate boundary (64/128).
  3. fused TRAIN kernel fwd + custom-VJP grads vs the XLA path on TPU.

Usage: python tools/tpu_numerics.py [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")

results = []


def record(check, maxdiff, note="", ref_scale=None):
    rel = float(maxdiff) / float(ref_scale) if ref_scale else None
    results.append({"check": check, "max_abs_diff": float(maxdiff),
                    "rel_to_max_ref": rel, "note": note})
    reltxt = f" (rel {rel:.1e})" if rel is not None else ""
    print(f"  {check}: max|diff| = {maxdiff:.3e}{reltxt} {note}", flush=True)


def golden_eval_checks():
    from medt_tpu.models import build_model
    from medt_tpu.utils.torch_import import import_state_dict

    for name, img in [("axialunet", 64), ("gatedaxialunet", 64),
                      ("MedT", 128)]:
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        if not os.path.exists(path):
            continue
        blob = np.load(path)
        sd = {k[3:]: blob[k] for k in blob.files if k.startswith("sd.")}
        x = jnp.asarray(blob["__input__"].transpose(0, 2, 3, 1))
        model = build_model(name, img_size=img)
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False)
        params, stats = import_state_dict(sd, variables["params"],
                                          variables["batch_stats"])
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            {"params": params, "batch_stats": stats}, x)
        got = np.asarray(out).transpose(0, 3, 1, 2)
        diff = np.abs(got - blob["__out_eval__"]).max()
        record(f"torch-golden eval {name}@{img}", diff,
               "(f32 weights, bf16 MXU)",
               ref_scale=np.abs(blob["__out_eval__"]).max())


def fused_eval_checks():
    from medt_tpu.ops import AxialAttention

    for mode, out_planes, groups, span in [
        ("gated", 16, 8, 64), ("gated", 32, 8, 64), ("gated", 64, 8, 128),
        ("wopos", 64, 8, 32), ("full", 32, 8, 64),
    ]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, span, span, 6)).astype(np.float32))
        kw = dict(in_planes=6, out_planes=out_planes, span=span,
                  groups=groups, mode=mode)
        op_ref = AxialAttention(use_fused=False, **kw)
        variables = jax.jit(op_ref.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=True)
        _, mut = jax.jit(
            lambda v, x: op_ref.apply(v, x, train=True,
                                      mutable=["batch_stats"]))(variables, x)
        variables = {"params": variables["params"],
                     "batch_stats": mut["batch_stats"]}
        y_ref = jax.jit(lambda v, x: op_ref.apply(v, x, train=False))(
            variables, x)
        op_fus = AxialAttention(use_fused=True, **kw)
        y_fus = jax.jit(lambda v, x: op_fus.apply(v, x, train=False))(
            variables, x)
        diff = float(jnp.abs(y_ref - y_fus).max())
        record(f"fused eval kernel {mode} gp={out_planes//groups} "
               f"span={span}", diff, "(Mosaic vs XLA, same chip)",
               ref_scale=float(jnp.abs(y_ref).max()))


def fused_train_checks():
    from medt_tpu.ops import AxialAttention

    # n chosen so the lanes kernels' stripe admission (>=128) is exercised:
    # span 64/32 route through the key-streamed flash kernels, span 16
    # through the plain stripe-lane kernels, spans 128/256 through the
    # query+key streamed flash2 kernels (the 512px models' global branch)
    for mode, span, n in [("gated", 64, 2), ("wopos", 32, 4),
                          ("gated", 16, 8), ("gated", 128, 1),
                          ("wopos", 256, 1)]:
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(n, span, span, 6)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(n, span, span, 16)).astype(np.float32))
        kw = dict(in_planes=6, out_planes=16, span=span, groups=8, mode=mode)
        op_ref = AxialAttention(use_fused=False, **kw)
        op_fus = AxialAttention(use_fused=True, **kw)
        variables = jax.jit(op_ref.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=True)
        params, stats = variables["params"], variables["batch_stats"]

        def make(op):
            def f(params, x):
                out, mut = op.apply({"params": params, "batch_stats": stats},
                                    x, train=True, mutable=["batch_stats"])
                return jnp.mean((out - tgt) ** 2), out
            return jax.jit(jax.value_and_grad(f, has_aux=True))

        (l1, o1), g1 = make(op_ref)(params, x)
        (l2, o2), g2 = make(op_fus)(params, x)
        odiff = float(jnp.abs(o1 - o2).max())
        gdiff = max(float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)))
        record(f"fused train fwd {mode} span={span}", odiff,
               ref_scale=float(jnp.abs(o1).max()))
        gscale = max(float(jnp.abs(a).max()) for a in
                     jax.tree_util.tree_leaves(g1))
        record(f"fused train grads {mode} span={span}", gdiff,
               "(custom VJP vs XLA autodiff)", ref_scale=gscale)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--json", default=None)
    args = p.parse_args(argv)
    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind})", flush=True)
    golden_eval_checks()
    fused_eval_checks()
    fused_train_checks()
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"device": jax.devices()[0].device_kind,
                       "results": results}, f, indent=1)
    print("\n| check | max abs diff | rel (vs max ref) | note |")
    print("|---|---|---|---|")
    for r in results:
        rel = f"{r['rel_to_max_ref']:.1e}" if r['rel_to_max_ref'] else "-"
        print(f"| {r['check']} | {r['max_abs_diff']:.3e} | {rel} "
              f"| {r['note']} |")


if __name__ == "__main__":
    main()
