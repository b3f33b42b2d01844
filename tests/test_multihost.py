"""Multi-process bootstrap test for parallel/distributed.py.

The reference's distributed hooks are vestigial (DistributedSampler with no
init_process_group, reference lib/datasets/imagenet1k.py:31-34); this
framework's real path is ``initialize_multihost`` ->
``jax.distributed.initialize``. Here two ACTUAL processes connect over a
localhost coordinator on the CPU backend, and each asserts:

* the bootstrap triggers from the JAX_* environment (the no-op guard
  returns True),
* the global device view spans both processes (4 = 2 procs x 2 local),
* ``host_shard()`` reports the right (process_index, process_count), and
* a psum across the full global mesh produces the cross-process total.

Single-process no-op behavior is asserted in-process.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from medt_tpu.parallel.distributed import initialize_multihost, host_shard

assert initialize_multihost(), "env-driven bootstrap did not trigger"
pid, nproc = host_shard()
assert nproc == 2, nproc
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
# each process contributes its local shard; the psum must see all 4 devices
local = jnp.arange(2, dtype=jnp.float32) + 10.0 * pid  # worth 2 per device

def total(x):
    return jax.lax.psum(jnp.sum(x), "data")

arr = jax.make_array_from_single_device_arrays(
    (4,), NamedSharding(mesh, P("data")),
    [jax.device_put(local[i:i + 1], d)
     for i, d in enumerate(jax.local_devices())])
out = jax.jit(jax.shard_map(total, mesh=mesh, in_specs=P("data"),
                            out_specs=P()))(arr)
expected = (0.0 + 1.0) + (10.0 + 11.0)  # both processes' contributions
assert abs(float(out) - expected) < 1e-6, float(out)
print("WORKER_OK", pid)
"""


@pytest.mark.slow
def test_two_process_bootstrap(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": REPO})
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(("JAX_", "XLA_"))}
    procs = []
    for pid in range(2):
        env = dict(env_base,
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out


def test_single_process_noop(monkeypatch):
    from medt_tpu.parallel.distributed import initialize_multihost
    for k in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)
    assert initialize_multihost() is False
