"""Import PyTorch reference checkpoints into medt_tpu models.

Users of the reference train with ``torch.save(model.state_dict())``
(reference train.py:216-217); this module maps such a state dict onto this
framework's param/batch_stats trees so existing checkpoints keep working —
including stripping the ``module.`` DataParallel prefix, the capability of
the reference's ``convert_model`` (reference lib/utils.py:163-167).

Layout translation (reference -> here):
  * conv weights OIHW -> HWIO
  * qkv conv1d (2*out, in, 1) -> dense kernel (in, 2*out)
  * BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var;
    the attention BNs reshape to their structured feature layouts:
    bn_similarity (3g,) -> (3, g); bn_output (2*out,) -> (g, gp, 2)
    (the reference interleaves sv/sve per channel — row-major reshape is
    exactly that interleave)
  * hight_block/width_block -> attn_h/attn_w; downsample.{0,1} ->
    downsample_{conv,bn}; conv{1,2,3}[_p]/bn{1,2,3}[_p] -> stem[_p]/*
  * torch Linear (out, in) -> dense kernel (in, out)

Works with plain numpy arrays — no torch dependency at import time.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

_LEAF_PARAM = {"kernel": "weight", "bias": "bias", "scale": "weight"}
_LEAF_STATS = {"mean": "running_mean", "var": "running_var"}
_ATTN_FLAT = re.compile(r"^(bn_qkv|bn_similarity|bn_output)_(scale|bias|mean|var)$")


def strip_data_parallel(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove the 'module.' prefix DataParallel adds (lib/utils.py:163-167)."""
    if all(k.startswith("module.") for k in state_dict):
        return {k[len("module."):]: v for k, v in state_dict.items()}
    return state_dict


def _translate(path: Tuple[str, ...]) -> str:
    """My tree path -> reference state_dict key."""
    parts = list(path)
    leaf = parts.pop()

    # attention-level flat BN names: bn_qkv_scale etc.
    m = _ATTN_FLAT.match(leaf)
    if m:
        bn, kind = m.groups()
        torch_leaf = _LEAF_PARAM.get(kind) or _LEAF_STATS[kind]
        leaf_key = f"{bn}.{torch_leaf}"
    elif leaf in _LEAF_PARAM:
        leaf_key = _LEAF_PARAM[leaf]
    elif leaf in _LEAF_STATS:
        leaf_key = _LEAF_STATS[leaf]
    else:
        leaf_key = leaf  # relative, f_qr, ...

    out = []
    for p in parts:
        if p.startswith("stem"):
            # stem/conv1 -> conv1 ; stem_p/bn2 -> bn2_p  (handled below)
            suffix = "_p" if p == "stem_p" else ""
            out.append(("STEM", suffix))
        elif re.match(r"layer\d(_p)?$", p):
            out.append((p, None))
        elif re.match(r"layer\d+_block\d+$", p):
            # classification ResNet stage (reference lib/models/resnet.py):
            # layer2_block1 -> layer2.1
            stage, blk = p.split("_block")
            out.append((f"{stage}.{blk}", None))
        elif re.match(r"block\d+$", p):
            out.append((p[5:], None))
        elif p == "attn_h":
            out.append(("hight_block", None))
        elif p == "attn_w":
            out.append(("width_block", None))
        elif p == "downsample_conv":
            out.append(("downsample.0", None))
        elif p == "downsample_bn":
            out.append(("downsample.1", None))
        elif p == "qkv":
            out.append(("qkv_transform", None))
        else:
            out.append((p, None))

    names = []
    for item, suffix in out:
        if item == "STEM":
            continue  # the stem flattens into the top level
        names.append(item)
    key = ".".join(names + [leaf_key])

    # stem children get the _p suffix attached to their own name
    if parts and parts[0].startswith("stem"):
        suffix = "_p" if parts[0] == "stem_p" else ""
        child = parts[1]  # conv1 / bn1 / ...
        key = f"{child}{suffix}.{leaf_key}"
    return key


def _transform(ref: np.ndarray, target_shape, path: Tuple[str, ...]) -> np.ndarray:
    ref = np.asarray(ref)
    leaf = path[-1]
    if leaf == "kernel":
        if ref.ndim == 4:      # conv OIHW -> HWIO
            ref = ref.transpose(2, 3, 1, 0)
        elif ref.ndim == 3:    # qkv conv1d (O, I, 1) -> (I, O)
            ref = ref[:, :, 0].T
        elif ref.ndim == 2 and ref.shape != tuple(target_shape):
            ref = ref.T        # linear (O, I) -> (I, O)
    if ref.shape != tuple(target_shape):
        ref = ref.reshape(target_shape)
    return ref


def import_state_dict(state_dict: Dict[str, np.ndarray], params, batch_stats):
    """Return (params, batch_stats) filled from a reference state dict.

    Raises KeyError listing any unmatched framework parameters.
    """
    state_dict = strip_data_parallel(
        {k: np.asarray(v) for k, v in state_dict.items()}
    )
    missing = []

    def fill(tree):
        def visit(path, leaf):
            parts = tuple(
                p.key if hasattr(p, "key") else str(p) for p in path
            )
            key = _translate(parts)
            if key not in state_dict:
                missing.append((".".join(parts), key))
                return leaf
            return jnp.asarray(
                _transform(state_dict[key], leaf.shape, parts), leaf.dtype
            )

        return jax.tree_util.tree_map_with_path(visit, tree)

    new_params = fill(params)
    new_stats = fill(batch_stats)
    if missing:
        raise KeyError(
            f"{len(missing)} parameters had no reference entry, e.g. "
            + "; ".join(f"{a} -> {b}" for a, b in missing[:5])
        )
    return new_params, new_stats
