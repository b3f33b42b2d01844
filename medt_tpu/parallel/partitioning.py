"""Parameter partitioning rules for tensor parallelism.

Shards the attention-group (head) axis of every axial-attention layer over
the mesh's ``model`` axis. Channel layouts are group-major throughout the op
(see ops/axial_attention.py), so:

* ``qkv/kernel``   (C_in, 2*out)    -> shard output channels   P(None, "model")
* ``bn_qkv``       (2*out,)         -> shard channels           P("model")
* ``bn_similarity``(3, g) or (g,)   -> shard the group axis
* ``bn_output``    (g, gp, 2)/(g,gp)-> shard the group axis     P("model", ...)
* ``relative``     (2*gp, 2*span-1) -> replicated (shared across groups)

Everything else (convs, decoder, stems) is replicated — at s=0.125 widths the
conv weights are tiny; batch and width sharding carry those layers.
"""
from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import PartitionSpec as P


def _spec_for(path: str, ndim: int) -> P:
    if "/qkv/kernel" in path:
        return P(None, "model")
    if "/bn_qkv_" in path:
        return P("model")
    if "/bn_similarity_" in path:
        return P(*([None] * (ndim - 1) + ["model"])) if ndim >= 2 else P("model")
    if "/bn_output_" in path:
        return P(*(["model"] + [None] * (ndim - 1)))
    return P()  # replicated


def partition_specs(tree: Any) -> Any:
    """PartitionSpec pytree for a params or batch_stats tree."""

    def to_spec(path, leaf):
        name = "/" + "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return _spec_for(name, getattr(leaf, "ndim", 0))

    return jax.tree_util.tree_map_with_path(to_spec, tree)


def strip_model_axis(spec_tree: Any) -> Any:
    """Replace 'model' with None everywhere (for meshes without TP)."""

    def strip(spec):
        return P(*(None if a == "model" else a for a in spec))

    return jax.tree_util.tree_map(
        strip, spec_tree, is_leaf=lambda x: isinstance(x, P)
    )
