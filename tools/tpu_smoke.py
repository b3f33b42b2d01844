"""TPU kernel compile-smoke gate: lower-and-compile every admitted Pallas
kernel geometry the live models use, on the current backend, in seconds.

Round 2 shipped a kernel that passed all interpret-mode parity tests but
failed Mosaic lowering on the real chip, killing the driver bench at HEAD
(VERDICT round 2). This script is the gate that prevents a recurrence: run
it against the TPU before every snapshot.

For each model x (train, eval) it shape-traces the step with
``kernel_registry.recording`` (no compute, no device memory) to collect the
exact kernel geometries that step would instantiate, then compile-probes
each geometry (forward + custom-VJP backward for train) WITHOUT executing.
A failure prints the Mosaic error and exits nonzero; ``--disable-failures``
additionally demonstrates graceful degradation by re-tracing with the
failing family disabled and confirming the step admits an XLA fallback.

Usage:
    python tools/tpu_smoke.py                 # the four live 128px models
    python tools/tpu_smoke.py --models MedT gatedaxialunet medt_512
    python tools/tpu_smoke.py --batch 56 --json /tmp/smoke.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


DEFAULT_MODELS = ["axialunet", "gatedaxialunet", "MedT", "logo"]
IMG_FOR = {"medt_512": 512, "logo_512": 512}


def collect_for_model(name: str, batch: int, img: int, dtype):
    """Shape-trace train + eval steps; return the union of geometries."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from medt_tpu.models import build_model
    from medt_tpu.ops import kernel_registry as kreg
    from medt_tpu.training import adam_l2, init_state, train_step

    model = build_model(name, img_size=img, dtype=dtype, use_fused=True)

    # shape-only state: init_state allocates, so build abstract state via
    # eval_shape of init, then eval_shape the steps over it
    x_shape = jax.ShapeDtypeStruct((batch, img, img, 3), jnp.float32)
    batch_shapes = {
        "image": x_shape,
        "label": jax.ShapeDtypeStruct((batch, img, img), jnp.int32),
    }

    geos = set()
    with kreg.recording() as rec:
        state_shape = jax.eval_shape(
            lambda: init_state(model, adam_l2(1e-3), (batch, img, img, 3),
                               rng=jax.random.PRNGKey(0)))
        rec.clear()  # init-time traces are not a runtime surface
        jax.eval_shape(train_step, state_shape, batch_shapes)
        geos |= set(rec)
        rec.clear()
        variables = jax.eval_shape(
            lambda r, x: model.init(r, x, train=False),
            jax.random.PRNGKey(0), x_shape)
        rec.clear()
        jax.eval_shape(
            lambda v, x: model.apply(v, x, train=False), variables, x_shape)
        geos |= set(rec)
    return geos


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--models", nargs="+", default=DEFAULT_MODELS)
    ap.add_argument("--batch", type=int, default=56,
                    help="flagship batch size (driver bench uses 56)")
    ap.add_argument("--batch_512", type=int, default=8,
                    help="batch for the 512px models")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--json", default=None, help="write a JSON report here")
    ap.add_argument("--disable-failures", action="store_true",
                    help="after a failure, disable the family and confirm "
                         "the step re-traces onto the XLA fallback")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from medt_tpu.ops import kernel_registry as kreg
    from medt_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dtype = jnp.dtype(args.dtype)
    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0].device_kind})",
          file=sys.stderr)

    all_geos = {}
    for name in args.models:
        img = IMG_FOR.get(name, 128)
        b = args.batch_512 if img == 512 else args.batch
        geos = collect_for_model(name, b, img, dtype)
        all_geos[name] = geos
        print(f"{name}: {len(geos)} kernel geometries", file=sys.stderr)

    union = sorted(set().union(*all_geos.values()) if all_geos else [])
    results = []
    n_fail = 0
    for geo in union:
        t0 = time.perf_counter()
        ok, err = kreg.probe(geo)
        dt = time.perf_counter() - t0
        status = "ok" if ok else "FAIL"
        print(f"[{status}] {geo.family:8s} span={geo.span:4d} g={geo.g} "
              f"gp={geo.gp} S={geo.S:6d} train={int(geo.train)} "
              f"pos={int(geo.has_pos)} {geo.dtype:9s} ({dt:.1f}s)"
              + (f"\n        {err[:300]}" if err else ""),
              file=sys.stderr)
        results.append({**geo._asdict(), "ok": ok, "error": err,
                        "compile_s": round(dt, 2)})
        if not ok:
            n_fail += 1
            if args.disable_failures:
                kreg.disable(geo.family, err[:200])

    if args.disable_failures and n_fail:
        # degradation check: with failing families disabled, the flagship
        # model must re-trace without recording any disabled family
        for name in args.models:
            img = IMG_FOR.get(name, 128)
            b = args.batch_512 if img == 512 else args.batch
            geos = collect_for_model(name, b, img, dtype)
            bad = [g for g in geos if not kreg.family_enabled(g.family)]
            assert not bad, f"{name} still routes to disabled families: {bad}"
        print("degradation check: all models re-trace onto enabled "
              "families/XLA", file=sys.stderr)

    report = {
        "backend": backend,
        "device_kind": jax.devices()[0].device_kind,
        "models": {m: len(g) for m, g in all_geos.items()},
        "geometries": results,
        "failures": n_fail,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps({"smoke": "tpu-kernels", "geometries": len(union),
                      "failures": n_fail, "backend": backend}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
