"""Checkpointing with Orbax.

Capability parity with the reference's save/restore surface:

* per-``save_freq``-epoch saves into ``<direc>/<epoch>/`` plus a rolling
  ``final_model`` (reference train.py:216-217),
* strict restore for inference (reference test.py:105-106),
* resume-newest with optimizer state and epoch counter
  (``resume_model``, reference lib/utils.py:128-160),
* rank-0-only writes on multihost (``dist_save_model``,
  reference lib/utils.py:79-93) — Orbax coordinates multihost saves natively,
  and sharding metadata makes checkpoints parallelism-agnostic (the TPU
  equivalent of ``convert_model`` stripping DataParallel prefixes,
  reference lib/utils.py:163-167).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

FINAL_NAME = "final_model"


def _ckpt_tree(state, with_optimizer: bool = True) -> dict:
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "step": state.step}
    if with_optimizer:
        tree["opt_state"] = state.opt_state
    return tree


def save_checkpoint(direc: str, name: Any, state, *,
                    with_optimizer: bool = True, also_final: bool = True):
    """Save under ``<direc>/<name>/ckpt`` (+ rolling ``<direc>/final_model``)."""
    direc = os.path.abspath(direc)
    tree = _ckpt_tree(state, with_optimizer)
    with ocp.StandardCheckpointer() as ckptr:
        path = os.path.join(direc, str(name), "ckpt")
        ckptr.save(path, tree, force=True)
        if also_final:
            ckptr.save(os.path.join(direc, FINAL_NAME, "ckpt"), tree, force=True)


def restore_checkpoint(path: str, state, *, with_optimizer: bool = True):
    """Restore a TrainState from ``path`` (a ``.../ckpt`` dir or its parent)."""
    path = os.path.abspath(path)
    if os.path.isdir(os.path.join(path, "ckpt")):
        path = os.path.join(path, "ckpt")
    # the checkpoint may have been written without optimizer state
    # (save_checkpoint(with_optimizer=False)); probe its item tree so the
    # restore template matches what is actually on disk
    try:
        with ocp.PyTreeCheckpointer() as probe:
            saved_keys = set(probe.metadata(path).item_metadata.tree.keys())
    except Exception:
        saved_keys = {"params", "batch_stats", "step", "opt_state"}
    # opt_state goes in the template only when the caller wants it AND the
    # checkpoint has it; when the checkpoint has one the caller does NOT
    # want, restore partially — inference callers must be able to restore
    # into a state built with a different optimizer than training used
    want_opt = with_optimizer and "opt_state" in saved_keys
    template = _ckpt_tree(state, with_optimizer=want_opt)
    if not want_opt and "opt_state" in saved_keys:
        # the checkpoint carries an opt_state the caller does not want —
        # restore only the template's subtrees (PyTreeRestore with empty
        # transforms drops unmatched checkpoint keys), so inference can
        # restore into a state built with a DIFFERENT optimizer than
        # training used
        restore_args = jax.tree_util.tree_map(
            lambda t: ocp.ArrayRestoreArgs(sharding=t.sharding)
            if hasattr(t, "sharding") else ocp.RestoreArgs(),
            template)
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(
                    item=template, transforms={},
                    restore_args=restore_args))
    else:
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(path, template)
    # re-place restored arrays on the live state's shardings (restore may
    # land everything on one device while the state is mesh-sharded)
    restored = jax.tree_util.tree_map(
        lambda r, t: jax.device_put(r, t.sharding)
        if hasattr(t, "sharding") else r,
        restored, template,
    )
    new = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        step=restored["step"],
    )
    if with_optimizer and "opt_state" in restored:
        new = new.replace(opt_state=restored["opt_state"])
    return new


def latest_checkpoint(direc: str) -> Optional[str]:
    """Newest numeric epoch checkpoint under ``direc`` (resume_model logic,
    reference lib/utils.py:133-141)."""
    if not os.path.isdir(direc):
        return None
    epochs = [d for d in os.listdir(direc) if d.isdigit()
              and os.path.isdir(os.path.join(direc, d, "ckpt"))]
    if not epochs:
        final = os.path.join(direc, FINAL_NAME, "ckpt")
        return os.path.join(direc, FINAL_NAME) if os.path.isdir(final) else None
    return os.path.join(direc, max(epochs, key=int))


def is_coordinator() -> bool:
    """True on the process that writes non-checkpoint artifacts (logs, PNGs)."""
    return jax.process_index() == 0
