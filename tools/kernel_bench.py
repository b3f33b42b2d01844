"""Per-geometry standalone timing of the fused attention kernels on TPU.

For every attention-kernel geometry a model's train/eval step instantiates
(enumerated the same way as tools/tpu_smoke.py), time the core's forward
and forward+backward standalone and report achieved "VPU ops/s" against an
analytic per-position op count — the axial-attention cores are elementwise/
broadcast VPU work (contraction depths 1-16 keep the MXU out of reach, see
BASELINE.md "MFU"), so the VPU roofline is the speed-of-light that matters.

    python tools/kernel_bench.py --modelname gatedaxialunet --batch_size 56
    python tools/kernel_bench.py --family flash --span 64 --gp 2 --S 3584

Prints one line per (geometry, direction): ms/call, model-GOPs, achieved
GOP/s. The per-position op model (fwd): c qk-muls + 2c pos-muls + ~4
softmax/affine + 2*gp sv/sve FMAs, all over L*L*S positions; bwd ~2.5x.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# tools/ itself, so main() can import tpu_smoke even when this module was
# imported (python -m / from another script) rather than run as a file
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp


def _mk_args(g, c, gp, L, S, has_pos=True, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1,
                           dtype=dtype)
    q, k = arr(g, c, L, S), arr(g, c, L, S)
    v = arr(g, gp, L, S)
    if has_pos:
        qemb, kemb_t, vemb = arr(c, L, L), arr(c, L, L), arr(gp, L, L)
    else:
        z = jnp.zeros((0, L, L), jnp.float32)
        qemb = kemb_t = vemb = z
    aff = jnp.tile(jnp.asarray([[1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 0.0]],
                               jnp.float32), (g, 1))
    return q, k, v, qemb, kemb_t, vemb, aff


def _core_of(family):
    from medt_tpu.ops import pallas_axial_lanes as lk
    from medt_tpu.ops import pallas_axial_train as tk
    if family == "flash":
        return lk.flash_lanes_core, "lanes"
    if family == "flash2":
        return lk.flash2_lanes_core, "lanes"
    if family == "lanes":
        return lk.lanes_attn_core, "lanes"
    if family == "stripe":
        return tk.fused_attn_core, "stripe"
    raise SystemExit(f"unknown family {family}")


def _fetch(x):
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def _time(f, args, n):
    out = f(*args)          # compile
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / n


def bench_geometry(family, span, g, gp, S, has_pos=True,
                   dtype=jnp.float32, n=20):
    core, layout = _core_of(family)
    c = max(gp // 2, 1)
    L = span
    q, k, v, qe, ke, ve, aff = _mk_args(g, c, gp, L, S, has_pos, dtype)
    if layout == "stripe":  # (S, g, c, L) layout
        args = (jnp.transpose(q, (3, 0, 1, 2)), jnp.transpose(k, (3, 0, 1, 2)),
                jnp.transpose(v, (3, 0, 1, 2)), qe, jnp.swapaxes(ke, 1, 2),
                ve, aff)
    else:
        # lanes-family cores take the projection's own fused qkv
        # (g, 2gp, L, S): rows [0:c]=q, [c:gp]=k, [gp:2gp]=v
        qkv = jnp.concatenate([q, k, v], axis=1)
        args = (qkv, qe, jnp.swapaxes(ke, 1, 2), ve, aff)

    fwd = jax.jit(lambda *a: core(*a))

    def loss(*a):
        sv, sve = core(*a)
        return jnp.sum(sv) + jnp.sum(sve)

    train = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    pos_ops = 2 * c + 2 if has_pos else 0
    fwd_ops = g * L * L * S * (2 * c + pos_ops + 4 + 2 * gp * (2 if has_pos else 1))
    rows = []
    for name, f, ops in (("fwd", fwd, fwd_ops),
                         ("fwd+bwd", train, int(3.5 * fwd_ops))):
        try:
            dt = _time(f, args, n)
            rows.append((name, dt * 1e3, ops / 1e9, ops / dt / 1e9))
        except Exception as ex:  # noqa: BLE001 — report, keep going
            rows.append((name, float("nan"), ops / 1e9,
                         f"{type(ex).__name__}: {str(ex)[:80]}"))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--modelname", default=None)
    p.add_argument("--batch_size", type=int, default=56)
    p.add_argument("--imgsize", type=int, default=128)
    p.add_argument("--family", default=None)
    p.add_argument("--span", type=int, default=64)
    p.add_argument("--g", type=int, default=8)
    p.add_argument("--gp", type=int, default=2)
    p.add_argument("--S", type=int, default=3584)
    p.add_argument("--n", type=int, default=20)
    args = p.parse_args(argv)

    geos = []
    if args.modelname:
        from tpu_smoke import collect_for_model
        for ge in sorted(collect_for_model(args.modelname, args.batch_size,
                                           args.imgsize, jnp.float32)):
            if ge.family in ("flash", "flash2", "lanes", "stripe") and ge.train:
                geos.append((ge.family, ge.span, ge.g, ge.gp, ge.S,
                             ge.has_pos))
    else:
        geos.append((args.family or "flash", args.span, args.g, args.gp,
                     args.S, True))

    print(f"{'family':8} {'span':>4} {'g':>2} {'gp':>3} {'S':>6} "
          f"{'dir':8} {'ms':>8} {'GOPs':>8} {'GOP/s':>9}")
    for fam, span, g, gp, S, has_pos in geos:
        for name, ms, gops, rate in bench_geometry(fam, span, g, gp, S,
                                                   has_pos, n=args.n):
            rate_s = f"{rate:9.0f}" if isinstance(rate, float) else rate
            print(f"{fam:8} {span:4d} {g:2d} {gp:3d} {S:6d} "
                  f"{name:8} {ms:8.3f} {gops:8.1f} {rate_s}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(__file__))
    main()
