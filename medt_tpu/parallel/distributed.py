"""Multi-host (multi-slice) initialization.

The reference's distributed story is vestigial: DistributedSampler hooks
(reference lib/datasets/imagenet1k.py:31-34) and a rank-gated saver
(reference lib/utils.py:79-93) with no ``init_process_group`` anywhere. The
TPU-native equivalent is a one-call bootstrap: ``jax.distributed.initialize``
connects the hosts of a slice (or multiple slices over DCN), after which
``jax.devices()`` spans the whole job, the (data, seq, model) mesh covers
every chip, per-host data loading shards by ``process_index`` (see
data/imagenet.py and builders.build_dataloader), and Orbax coordinates
checkpoint writes across processes.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX if this looks like a multi-host job.

    No-ops (returns False) for single-host runs so every CLI can call it
    unconditionally. TPU pod environments auto-populate the arguments; on
    other clusters pass them explicitly or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    in_tpu_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES", "")) and \
        "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if not (coordinator_address or in_tpu_pod):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or (int(env_np) if env_np else None),
        process_id=process_id or (int(env_pid) if env_pid else None),
    )
    return True


def host_shard() -> tuple:
    """(process_index, process_count) for per-host dataset sharding."""
    return jax.process_index(), jax.process_count()
