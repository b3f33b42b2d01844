"""Throughput benchmark: training imgs/sec/chip at 128x128 (the north-star
metric, BASELINE.json) with honest performance accounting.

Runs the flagship MedT training step (the reference's headline model,
reference cmd.txt trains `logo`/`MedT` at imgsize 128 batch 4) on whatever
device JAX provides — the real TPU chip under the driver — and reports:

* imgs/sec/chip (train; eval / 512px-train / bf16-train / 512px-eval as
  nested records),
* FLOPs/img from XLA's own cost model
  (``jit(step).lower(...).compile().cost_analysis()``),
* derived model FLOPs utilization (MFU) against the chip's bf16 peak,
* the matmul precision in effect (f32 params are multiplied at JAX's
  default bf16 matmul precision on TPU; accumulation is f32).

``vs_baseline``: the reference repo measures no throughput anywhere (its
per-batch timer is commented out, reference train.py:183-186), so the
baseline is a clearly-labeled ESTIMATE of the reference setup — MedT,
batch 4, 128x128 on the README's Quadro RTX 8000 (reference README.md:130),
~8 imgs/sec, dominated by the 16 sequential local-branch U-Net passes
(reference axialnet.py:661-700). The ``baseline`` record in the JSON line
carries the estimate flag so nobody mistakes it for a measurement.

Budget discipline (the round-4 driver run spent 1,094 s compiling the train
section cold and skipped everything after it): sections now run CHEAPEST
COMPILE FIRST (eval -> 512px-train -> train -> bf16-train -> 512px-eval),
every section takes an explicit deadline and degrades its measurement
(fewer windows / fewer calls) rather than blowing it, and the XLA
persistent compile cache under ``.jax_cache/`` is COMMITTED for exactly the
programs this file runs (tools/prune_jax_cache.py) so a driver-cold process
skips straight to execution.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

REFERENCE_IMGS_PER_SEC = 8.0  # pinned ESTIMATE; see module docstring
REFERENCE_MEASURED_CPU = 0.391  # MEASURED: reference train.py on this host's
# CPU torch (tools/measure_reference.py, gatedaxialunet b4 128px, 1 core)
MODEL = "MedT"
IMG = 128
BATCH = 56  # saturate the chip (64+ crashes the axon remote compiler); ref uses 4
WARMUP_CALLS = 3
MEASURE_CALLS = 30  # a window is ~7s device time at the corrected (completion-
# fetch) timing; dispatch overhead ~3ms/call stays <2% of the window

import os as _os

BENCH_DEADLINE_S = float(_os.environ.get("MEDT_BENCH_DEADLINE", 540.0))
# 540 s leaves headroom under the driver's timeout; MEDT_BENCH_DEADLINE
# overrides for cache-population runs (tools/prune_jax_cache.py) where
# skipping a section would leave its program out of the committed cache

# bf16 peak matmul throughput per chip, by jax device_kind prefix
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}

_T0 = time.perf_counter()


def _left() -> float:
    return BENCH_DEADLINE_S - (time.perf_counter() - _T0)


def _peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind
    for prefix, peak in PEAK_BF16_FLOPS.items():
        if kind.startswith(prefix):
            return peak
    return None


def _flops_of(compiled) -> float | None:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _flops_cpu(fn, *args) -> float | None:
    """Model-FLOPs denominator from a LOCAL CPU lowering.

    XLA's flops metric counts the optimized computation, which is
    essentially backend-independent for this model; compiling the unfused
    denominator program over the remote-TPU tunnel costs minutes, locally
    it is seconds. Falls back to None (callers then compile on-device or
    omit MFU) if the CPU platform is unavailable.
    """
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            return _flops_of(jax.jit(fn).lower(*args).compile())
    except Exception:
        return None


_FLOPS_CACHE_PATH = __file__.replace("bench.py", "flops_cache.json")


def _flops_cached(key: str, compute) -> float | None:
    """FLOPs denominators from a COMMITTED cache file.

    The denominator is a property of the model's math, not the run — but
    producing it means compiling the whole unfused model on this box's
    single CPU core (minutes for MedT), which is what starved the eval
    section out of the round-3 driver bench. Cache hits make the
    denominators free; a miss recomputes and refreshes the file.
    """
    import os
    cache = {}
    try:
        with open(_FLOPS_CACHE_PATH) as f:
            cache = json.load(f)
    except Exception:
        pass
    if key in cache:
        return cache[key]
    val = compute()
    if val is not None:
        cache[key] = val
        try:
            tmp = _FLOPS_CACHE_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(cache, f, indent=1, sort_keys=True)
            os.replace(tmp, _FLOPS_CACHE_PATH)
        except Exception:
            pass
    return val


def _init_on_cpu(model, img):
    """Initialize variables on the LOCAL CPU at batch 1 and ship to device.

    Params/stats are batch-size-independent, and a local b1 init compile is
    seconds where the remote-tunnel init compile is minutes — the single
    biggest reason the round-3 driver bench never reached its eval section.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x = jnp.zeros((1, img, img, 3), jnp.float32)
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False)
    return jax.device_put(variables, jax.devices()[0])


def _make_state(model, variables, lr=1e-3):
    from medt_tpu.training import adam_l2
    from medt_tpu.training.state import TrainState

    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=adam_l2(lr),
    )


def _measure_windows(run_window, calls_full: int, min_reserve: float):
    """Best-of-2 windows, degrading to 1 window / fewer calls near deadline.

    ``run_window(n_calls) -> dt`` must end with a VALUE FETCH (see callers);
    ``min_reserve`` is the budget the caller wants left for later sections.
    Returns (total_dt, n_calls) of the best window.
    """
    # pick a call count the remaining budget can afford: assume a window
    # costs roughly (left - reserve) and scale down if needed after window 1
    calls = calls_full if _left() - min_reserve > 60 else max(5, calls_full // 3)
    dt = run_window(calls)
    if _left() - min_reserve > dt + 10:  # a second window fits
        dt = min(dt, run_window(calls))
    return dt, calls


def bench_train(peak, variables=None, dtype=jnp.float32, reserve=60.0,
                model_name=MODEL, batch=BATCH, img=IMG):
    from medt_tpu.models import build_model
    from medt_tpu.training import adam_l2, init_state, train_step

    # use_fused engages the fused attention kernels wherever they apply
    model = build_model(model_name, img_size=img, dtype=dtype, use_fused=True)
    if variables is None:
        variables = _init_on_cpu(model, img)
    state = _make_state(model, variables)

    rng = np.random.default_rng(0)
    batch_d = {
        "image": jnp.asarray(rng.normal(size=(batch, img, img, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, size=(batch, img, img))),
    }

    # FLOPs of ONE optimization step, from XLA's cost model — lowered from
    # the UNFUSED model so the denominator is the full reference computation
    # (Pallas custom calls report zero FLOPs to the cost model, which would
    # understate MFU for the fused program). Served from the committed
    # flops_cache.json; a miss recompiles on the local CPU as before.
    def _compute_train_flops():
        ref_model = build_model(model_name, img_size=img, dtype=jnp.float32,
                                use_fused=False)
        cpu_batch = jax.device_get(batch_d)
        with jax.default_device(jax.devices("cpu")[0]):
            ref_state = init_state(ref_model, adam_l2(1e-3),
                                   (batch, img, img, 3))
            return _flops_of(
                jax.jit(train_step).lower(ref_state, cpu_batch).compile())

    flops_step = _flops_cached(f"{model_name}-{img}-{batch}-train",
                               _compute_train_flops)

    step = jax.jit(train_step, donate_argnums=0)
    state, metrics = step(state, batch_d)
    _ = float(metrics["loss"])  # completion fetch: compile + upload done here

    warmups = WARMUP_CALLS - 1 if _left() - reserve > 30 else 1
    for _ in range(warmups):
        state, metrics = step(state, batch_d)
    _ = float(metrics["loss"])

    # IMPORTANT: end each window with a VALUE FETCH — over this remote-device
    # transport block_until_ready returns at dispatch-accept, not device
    # completion, which inflates throughput by orders of magnitude (measured:
    # a pure matmul "achieved" 300x peak without the fetch); pulling one
    # scalar forces the real completion wait
    def run_window(n):
        nonlocal state
        t0 = time.perf_counter()
        s, m = state, None
        for _ in range(n):
            s, m = step(s, batch_d)
        _ = float(m["loss"])
        state = s
        return time.perf_counter() - t0

    dt, calls = _measure_windows(run_window, MEASURE_CALLS, reserve)

    imgs_per_sec = calls * batch / dt
    flops_per_img = flops_step / batch if flops_step else None
    achieved = imgs_per_sec * flops_per_img if flops_per_img else None
    return {
        "imgs_per_sec": round(imgs_per_sec, 2),
        "flops_per_img": round(flops_per_img) if flops_per_img else None,
        "achieved_tflops": round(achieved / 1e12, 2) if achieved else None,
        "mfu": round(achieved / peak, 4) if achieved and peak else None,
    }


def bench_eval(peak, variables=None, reserve=60.0):
    from medt_tpu.models import build_model

    model = build_model(MODEL, img_size=IMG, dtype=jnp.float32, use_fused=True)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(BATCH, IMG, IMG, 3)).astype(np.float32))
    if variables is None:
        variables = _init_on_cpu(model, IMG)

    # chain each call's input on the previous output (zero-scaled, so the
    # values never change): identical independent dispatches can be served
    # from a result cache by the remote executor, inflating throughput past
    # hardware peak — the data dependency forces real execution
    def fwd_chained(v, x):
        out = model.apply(v, x, train=False)
        return out, x + 0.0 * out[..., :1]

    fwd = jax.jit(fwd_chained)
    # FLOPs denominator from the unfused model, lowered on the local CPU on
    # a flops_cache.json miss (see _flops_cached)
    ref_model = build_model(MODEL, img_size=IMG, dtype=jnp.float32,
                            use_fused=False)
    flops_step = _flops_cached(
        f"{MODEL}-{IMG}-{BATCH}-eval",
        lambda: _flops_cpu(
            lambda v, x: ref_model.apply(v, x, train=False),
            jax.device_get(variables), jax.device_get(x)))
    out, x = fwd(variables, x)
    _ = float(out[0, 0, 0, 0])

    def run_window(n):
        nonlocal x
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out, x = fwd(variables, x)
        _ = float(out[0, 0, 0, 0])  # value fetch == real completion wait
        return time.perf_counter() - t0

    dt, calls = _measure_windows(run_window, MEASURE_CALLS, reserve)

    imgs_per_sec = calls * BATCH / dt
    flops_per_img = flops_step / BATCH if flops_step else None
    achieved = imgs_per_sec * flops_per_img if flops_per_img else None
    return {
        "imgs_per_sec": round(imgs_per_sec, 2),
        "flops_per_img": round(flops_per_img) if flops_per_img else None,
        "achieved_tflops": round(achieved / 1e12, 2) if achieved else None,
        "mfu": round(achieved / peak, 4) if achieved and peak else None,
    }, variables


M512_MODEL = "medt_512"  # reference mix_512 (model_codes.py:1894-2096)
M512_BATCH = 4
M512_CALLS = 5  # ~0.5 s/step at the measured 8.7 imgs/s; 5 calls suffice


def bench_512():
    """MoNuSeg-geometry (512px) training throughput — the flash2
    (query+key-streamed, span 256) kernel path, driver-visible so a
    regression there ships loudly (VERDICT r3 weak #7). Returns the record
    plus the initialized variables for reuse by the 512px eval section."""
    from medt_tpu.models import build_model
    from medt_tpu.training import train_step

    model = build_model(M512_MODEL, dtype=jnp.float32, use_fused=True)
    variables = _init_on_cpu(model, 512)
    # the donated train step below deletes the state's buffers — hand the
    # eval512 section its own copy of the initial variables
    variables_out = jax.device_put(jax.device_get(variables))
    state = _make_state(model, variables)
    rng = np.random.default_rng(2)
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(M512_BATCH, 512, 512, 3)).astype(np.float32)),
        "label": jnp.asarray(
            rng.integers(0, 2, size=(M512_BATCH, 512, 512))),
    }
    step = jax.jit(train_step, donate_argnums=0)
    # TWO synced warmup calls: over the axon tunnel the first post-compile
    # dispatch pays a one-time ~60s executable upload (measured — a single
    # warmup left it inside the window, reading 0.32 imgs/s where steady
    # state is ~11)
    for _ in range(2):
        state, metrics = step(state, batch)
        _ = float(metrics["loss"])

    t0 = time.perf_counter()
    m = None
    for _ in range(M512_CALLS):
        state, m = step(state, batch)
    _ = float(m["loss"])  # value fetch == real completion wait
    dt = time.perf_counter() - t0
    return {
        "metric": f"train imgs/sec/chip ({M512_MODEL} 512x512 b{M512_BATCH})",
        "imgs_per_sec": round(M512_CALLS * M512_BATCH / dt, 2),
    }, variables_out


EVAL512_CALLS = 8


def bench_eval_512(variables):
    """512px fused-kernel eval — the MoNuSeg protocol geometry
    (performancemetrics_monuseg.m:35 evaluates at the native 512 resolution;
    reference model_codes.py:1894-2096). Exercises the flash2/stripe eval
    admission at span 256 on the real chip."""
    from medt_tpu.models import build_model

    model = build_model(M512_MODEL, dtype=jnp.float32, use_fused=True)
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(M512_BATCH, 512, 512, 3)).astype(np.float32))

    def fwd_chained(v, x):
        out = model.apply(v, x, train=False)
        return out, x + 0.0 * out[..., :1]

    fwd = jax.jit(fwd_chained)
    out, x = fwd(variables, x)
    _ = float(out[0, 0, 0, 0])
    out, x = fwd(variables, x)  # second warmup: executable-upload tail
    _ = float(out[0, 0, 0, 0])

    t0 = time.perf_counter()
    for _ in range(EVAL512_CALLS):
        out, x = fwd(variables, x)
    _ = float(out[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    return {
        "metric": f"eval imgs/sec/chip ({M512_MODEL} 512x512 b{M512_BATCH}, fused kernel)",
        "imgs_per_sec": round(EVAL512_CALLS * M512_BATCH / dt, 2),
    }


def _section(name, need_s, fn, out, errors):
    """Run one bench section if ``need_s`` seconds remain; record, never raise."""
    if _left() < need_s:
        errors[name] = f"skipped: {round(_left())}s left < {need_s}s needed"
        return None
    try:
        res = fn()
        out[name] = res
        return res
    except Exception as ex:  # noqa: BLE001 — recorded, not swallowed
        errors[name] = f"{type(ex).__name__}: {str(ex)[:300]}"
        return None


def main():
    import os

    from medt_tpu.utils.compile_cache import enable_compile_cache

    # register the CPU platform alongside the TPU one so the FLOPs
    # denominators can compile locally (must precede backend init)
    try:
        plats = os.environ.get("JAX_PLATFORMS", "")
        if plats and "cpu" not in plats:
            jax.config.update("jax_platforms", plats + ",cpu")
    except Exception:
        pass
    enable_compile_cache()
    peak = _peak_flops()
    out, errors, sec = {}, {}, {}

    def mark(name, fn, need_s):
        t = time.perf_counter()
        r = _section(name, need_s, fn, out, errors)
        sec[name] = round(time.perf_counter() - t)
        return r

    # CHEAPEST COMPILES FIRST (round-4 verdict #1): the headline train
    # section cold-compiled for 1,094 s under the round-4 driver and starved
    # eval + m512 for the third round running. eval is one forward compile,
    # m512 one small train compile; both land their records before the big
    # train compile is even attempted, and every section degrades its
    # measurement loop rather than overshooting the deadline.
    evv = mark("eval", lambda: bench_eval(peak, reserve=240.0), 60)
    variables = None
    if evv is not None:
        out["eval"], variables = evv  # unpack (record, variables) tuple
    m512v = mark("m512", bench_512, 90)
    v512 = None
    if m512v is not None:
        out["m512"], v512 = m512v  # unpack (record, variables) tuple
    train = mark(
        "train",
        lambda: bench_train(peak, variables=variables, reserve=45.0), 60)
    # optional records, budget permitting: bf16-activation train (round-4
    # trajectory study proved bf16 inside the f32 chaos envelope) and the
    # 512px fused eval (MoNuSeg protocol geometry)
    mark("train_bf16",
         lambda: bench_train(peak, dtype=jnp.bfloat16, reserve=30.0), 90)
    if v512 is not None:
        mark("eval512", lambda: bench_eval_512(v512), 45)

    train = out.get("train") or {}
    ips = train.get("imgs_per_sec")
    print(json.dumps({
        "metric": f"train imgs/sec/chip ({MODEL} {IMG}x{IMG} b{BATCH})",
        "value": ips,
        "unit": "imgs/sec/chip",
        "vs_baseline": round(ips / REFERENCE_IMGS_PER_SEC, 2) if ips else None,
        "flops_per_img": train.get("flops_per_img"),
        "achieved_tflops": train.get("achieved_tflops"),
        "mfu": train.get("mfu"),
        "precision": "f32 params, bf16 matmul (jax TPU default), f32 accum",
        "device_kind": jax.devices()[0].device_kind,
        "peak_bf16_tflops": round(peak / 1e12) if peak else None,
        "eval": out.get("eval") or {"error": errors.get("eval", "not run")},
        "m512": out.get("m512") or {"error": errors.get("m512", "not run")},
        "train_bf16": out.get("train_bf16")
        or {"error": errors.get("train_bf16", "not run")},
        "eval512": out.get("eval512")
        or {"error": errors.get("eval512", "not run")},
        "train_error": errors.get("train"),
        "section_seconds": sec,
        "baseline": {
            "imgs_per_sec": REFERENCE_IMGS_PER_SEC,
            "estimated": True,
            "note": "reference repo measures no throughput; estimate for "
                    "MedT b4 128px on Quadro RTX 8000 (README.md:130)",
            # the one MEASURED reference point: reference train.py run
            # verbatim on this host's CPU torch (tools/measure_reference.py,
            # gatedaxialunet b4 128px, single core) — a floor, not the GPU
            "measured_cpu_imgs_per_sec": REFERENCE_MEASURED_CPU,
        },
    }))


if __name__ == "__main__":
    main()
