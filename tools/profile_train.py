"""Capture a jax.profiler trace of the training step.

The reference has no profiling story (its per-batch timer is commented out,
reference train.py:183-186). This tool compiles the train step for any
registered model and records an XPlane trace viewable in TensorBoard /
Perfetto, plus a wall-clock breakdown of forward vs forward+backward vs the
full optimizer step.

    python tools/profile_train.py --modelname MedT --imgsize 128 \
        --batch_size 32 --steps 10 --logdir /tmp/medt_trace
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--modelname", default="MedT")
    p.add_argument("--imgsize", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--logdir", default="/tmp/medt_tpu_trace")
    p.add_argument("--use_pallas", default="yes")
    p.add_argument("--dtype", default="float32",
                   help="activation compute dtype (float32 | bfloat16)")
    p.add_argument("--no_trace", action="store_true",
                   help="skip the XPlane capture (timings only)")
    args = p.parse_args(argv)

    from medt_tpu.models import build_model
    from medt_tpu.training import adam_l2, init_state, train_step
    import medt_tpu.losses as L

    B, S = args.batch_size, args.imgsize
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, size=(B, S, S))),
    }
    model = build_model(args.modelname, img_size=S,
                        dtype=jnp.dtype(args.dtype),
                        use_fused=args.use_pallas == "yes")
    state = init_state(model, adam_l2(1e-3), (B, S, S, 3))

    def fetch(out):
        # end every window with a VALUE FETCH: on the remote-TPU tunnel
        # block_until_ready returns at dispatch-accept (BASELINE.md
        # "Timing correction"), which void the measurement
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).ravel()[0])

    def timeit(f, *a, n=args.steps):
        out = f(*a)
        fetch(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*a)
        fetch(out)
        return (time.perf_counter() - t0) / n

    fwd = jax.jit(lambda p, x: state.apply_fn(
        {"params": p, "batch_stats": state.batch_stats}, x,
        train=True, mutable=["batch_stats"])[0])

    def grads(p, batch):
        def loss(pp):
            logits, _ = state.apply_fn(
                {"params": pp, "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"])
            return L.log_nll_loss(logits, batch["label"])
        return jax.grad(loss)(p)

    t_fwd = timeit(fwd, state.params, batch["image"])
    t_bwd = timeit(jax.jit(grads), state.params, batch)
    step = jax.jit(train_step, donate_argnums=0)
    st, m = step(state, batch)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        st, m = step(st, batch)
    _ = float(m["loss"])
    t_full = (time.perf_counter() - t0) / args.steps

    print(f"forward (train mode): {t_fwd * 1e3:8.2f} ms")
    print(f"forward + backward:   {t_bwd * 1e3:8.2f} ms")
    print(f"full optimizer step:  {t_full * 1e3:8.2f} ms "
          f"({B / t_full:.0f} imgs/s)")

    if not args.no_trace:
        jax.profiler.start_trace(args.logdir)
        for _ in range(3):
            st, m = step(st, batch)
        _ = float(m["loss"])
        jax.profiler.stop_trace()
        print(f"trace written to {args.logdir}")


if __name__ == "__main__":
    main()
