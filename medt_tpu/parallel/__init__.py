"""Mesh-first parallelism.

The reference's only live parallelism is single-process 2-GPU
``nn.DataParallel`` (reference train.py:104-108) plus vestigial
DistributedSampler hooks (reference lib/datasets/imagenet1k.py:31-34).
The TPU-native replacement is GSPMD over a named `jax.sharding.Mesh`:

* **data** — batch dimension (DP). Gradients/BN stats are reduced globally by
  XLA-inserted collectives; BN is therefore cross-replica-synced by
  construction (documented divergence from DataParallel's unsynced replicas).
* **seq** — the image width axis (sequence/spatial parallelism). Axial
  attention along H is embarrassingly parallel over W stripes, so the W shard
  needs no collectives in the H-attention; convs get XLA halo exchanges, and
  W-attention is resharded automatically.
* **model** — tensor parallelism over attention groups (heads): qkv
  projections, similarity BNs, and attention einsums all shard over the
  group axis.

No hand-written communication backend exists or is needed — XLA emits
psum/all-gather/halo collectives over ICI. Multi-host slices connect via
``jax.distributed.initialize`` (see ``training/checkpointing`` for the rank-0
save policy mirroring reference lib/utils.py:79-93).
"""
from .kernel_sharding import kernel_mesh, kernel_mesh_scope, set_kernel_mesh
from .mesh import auto_mesh_shape, make_mesh, shard_batch, shard_state
from .partitioning import partition_specs

__all__ = [
    "auto_mesh_shape",
    "kernel_mesh",
    "kernel_mesh_scope",
    "make_mesh",
    "partition_specs",
    "set_kernel_mesh",
    "shard_batch",
    "shard_state",
]
