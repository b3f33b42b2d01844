"""Throughput benchmark: training imgs/sec/chip at 128x128 (the north-star
metric, BASELINE.json).

Runs the flagship MedT training step (the reference's headline model,
reference cmd.txt trains `logo`/`MedT` at imgsize 128 batch 4) on whatever
device JAX provides — the real TPU chip under the driver.

The reference repo measures no throughput anywhere (its per-batch timer is
commented out, reference train.py:183-186), so ``vs_baseline`` is computed
against a pinned estimate of the reference setup: MedT, batch 4, 128x128 on
the README's Quadro RTX 8000 (reference README.md:130). Public training logs
for this codebase put that at roughly ~8 imgs/sec (dominated by the 16
sequential local-branch U-Net passes, reference axialnet.py:661-700);
revise when the real number is measured on GPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

REFERENCE_IMGS_PER_SEC = 8.0  # pinned estimate; see module docstring
MODEL = "MedT"
IMG = 128
BATCH = 32  # saturate the chip; reference uses 4 but TPU batches should be fat
UNROLL = 2  # steps fused per dispatch: amortizes host->device dispatch latency
WARMUP_CALLS = 2
MEASURE_CALLS = 20


def main():
    from medt_tpu.models import build_model
    from medt_tpu.training import adam_l2, init_state, train_step

    model = build_model(MODEL, img_size=IMG, dtype=jnp.float32)
    state = init_state(model, adam_l2(1e-3), (BATCH, IMG, IMG, 3))

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(BATCH, IMG, IMG, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, size=(BATCH, IMG, IMG))),
    }

    def make_step(unroll):
        def multi_step(state, batch):
            for _ in range(unroll):
                state, metrics = train_step(state, batch)
            return state, metrics
        return jax.jit(multi_step, donate_argnums=0)

    # the remote compile service occasionally rejects larger programs; fall
    # back to smaller unrolls rather than failing the benchmark run
    unroll = UNROLL
    while True:
        try:
            step = make_step(unroll)
            state, metrics = step(state, batch)
            jax.block_until_ready(state.params)
            break
        except Exception:
            if unroll <= 1:
                raise
            unroll //= 2

    for _ in range(WARMUP_CALLS - 1):
        state, metrics = step(state, batch)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(MEASURE_CALLS):
        state, metrics = step(state, batch)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    imgs_per_sec = MEASURE_CALLS * unroll * BATCH / dt
    print(json.dumps({
        "metric": f"train imgs/sec/chip ({MODEL} {IMG}x{IMG} b{BATCH})",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / REFERENCE_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
