"""Import/export PyTorch reference checkpoints for medt_tpu models.

Users of the reference train with ``torch.save(model.state_dict())``
(reference train.py:216-217); this module maps such a state dict onto this
framework's param/batch_stats trees so existing checkpoints keep working —
including stripping the ``module.`` DataParallel prefix, the capability of
the reference's ``convert_model`` (reference lib/utils.py:163-167).
``export_state_dict`` is the exact inverse: weights trained here round-trip
back into the reference's tooling (``torch.save(export_state_dict(...))``
loads via ``model.load_state_dict`` there, reference test.py:105).

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


def _untransform(val: np.ndarray, path: Tuple[str, ...]) -> np.ndarray:
    """Inverse of ``_transform``: framework leaf -> reference tensor."""
    val = np.asarray(val)
    leaf = path[-1]
    if leaf == "kernel":
        if val.ndim == 4:                 # conv HWIO -> OIHW
            return val.transpose(3, 2, 0, 1)
        if "qkv" in path:                 # dense (I, O) -> conv1d (O, I, 1)
            return val.T[:, :, None]
        if val.ndim == 2:                 # linear (I, O) -> (O, I)
            return val.T
    # structured BN features (bn_similarity (3,g), bn_output (g,gp,2)) ->
    # the reference's flat channel vectors; everything else (e.g. the 2-D
    # `relative` position table) keeps its shape
    if val.ndim > 1 and (leaf in ("scale", "bias", "mean", "var")
                         or _ATTN_FLAT.match(leaf)):
        return val.reshape(-1)
    return val


def export_state_dict(params, batch_stats) -> Dict[str, np.ndarray]:
    """Framework param/batch_stats trees -> reference-format state dict.

    Exact inverse of ``import_state_dict`` (round-trip tested): the result
    feeds ``torch.save`` / ``model.load_state_dict`` in the reference.
    Not emitted (load with ``strict=False`` there): BatchNorm
    ``num_batches_tracked`` counters, and the reference's DEAD parameters
    this framework doesn't carry — ``medt_net.adjust_p`` and the wopos
    blocks' never-called ``conv1`` (reference axialnet.py:358) — none of
    which affect any computation.
    """
    out: Dict[str, np.ndarray] = {}

    def visit(path, leaf):
        parts = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        key = _translate(parts)
        if key in out:
            raise KeyError(f"duplicate export key {key} from {parts}")
        out[key] = _untransform(leaf, parts)
        if parts[-1] == "relative":
            # the reference registers the derived gather index as a buffer
            # (axialnet.py:42-46: (key - query + span - 1).view(-1)); emit
            # it so strict load_state_dict succeeds
            span = (np.asarray(leaf).shape[1] + 1) // 2
            r = np.arange(span, dtype=np.int64)
            idx = (r[:, None] - r[None, :] + span - 1).reshape(-1)
            out[key.rsplit(".", 1)[0] + ".flatten_index"] = idx

    jax.tree_util.tree_map_with_path(visit, params)
    jax.tree_util.tree_map_with_path(visit, batch_stats)
    return out


# frozen gate constants per gated factory (reference axialnet.py:124-127
# creates them requires_grad=False; gated_sig uses f_sv=5.0,
# model_codes.py:241-244). Only needed when gates are NOT in the param tree
# (trainable_gates=False — the released reference's setting).
_FROZEN_GATES = {
    "gatedaxialunet": (0.1, 0.1, 0.1, 1.0),
    "gated": (0.1, 0.1, 0.1, 1.0),
    "MedT": (0.1, 0.1, 0.1, 1.0),
    "medt_512": (0.1, 0.1, 0.1, 1.0),
    "gated_sig": (0.1, 0.1, 0.1, 5.0),
}


def export_for_model(modelname: str, params, batch_stats
                     ) -> Dict[str, np.ndarray]:
    """``export_state_dict`` plus the frozen gate parameters the named
    reference factory expects.

    Gated factories store f_qr/f_kr/f_sve/f_sv as (frozen) Parameters in
    their state dicts. When gates were trained here (trainable_gates=True)
    they are already in ``params`` and export naturally; otherwise this
    injects the factory's constants next to every gated attention module.
    In all gated factories the gated modules are exactly the
    position-bearing ones (MedT's local branch is wopos — no `relative`,
    no gates), so the `relative`-table prefixes identify them.
    """
    out = export_state_dict(params, batch_stats)
    gates = _FROZEN_GATES.get(modelname)
    if gates is None:
        return out
    names = ("f_qr", "f_kr", "f_sve", "f_sv")
    for key in [k for k in out if k.endswith(".relative")]:
        prefix = key.rsplit(".", 1)[0]
        for name, val in zip(names, gates):
            out.setdefault(f"{prefix}.{name}", np.asarray(val, np.float32))
    return out
