"""Checkpointing: orbax save/restore with true resume + shape-tolerant warm start.

The reference only saves model state_dicts (best/per-epoch/final,
/root/reference/src/models/trainer.py:1309-1322) and "resumes" by
shape-matched partial weight loading (/root/reference/src/utils/weights.py:
19-116). Here checkpoints carry params + batch_stats + optimizer state + step
(real resume, SURVEY.md §5), and `load_pretrained_safely` keeps the
reference's tolerant semantics: leaves with matching path+shape are restored,
everything else is kept from the fresh init and reported.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: dict) -> None:
    """Save a pytree checkpoint (params/batch_stats/opt_state/step)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: dict | None = None) -> dict:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def load_pretrained_safely(init_variables: dict, ckpt_path: str | None):
    """Warm-start: copy leaves whose path and shape match; skip the rest.

    Returns (variables, report) where report lists loaded/skipped keys —
    mirroring the reference's report dict (utils/weights.py:19-116).
    """
    report = {"ok": False, "loaded": [], "skipped": [], "missing": []}
    if not ckpt_path:
        return init_variables, report
    if not os.path.exists(ckpt_path):
        report["error"] = f"checkpoint not found: {ckpt_path}"
        return init_variables, report
    try:
        restored = restore_checkpoint(ckpt_path)
    except Exception as e:  # noqa: BLE001 — tolerant loader by design
        report["error"] = f"failed to restore: {e}"
        return init_variables, report

    src = restored.get("variables", restored)

    flat_init = dict(jax.tree_util.tree_flatten_with_path(init_variables)[0])
    flat_src = {jax.tree_util.keystr(p): v for p, v
                in jax.tree_util.tree_flatten_with_path(src)[0]}

    merged = {}
    for path, leaf in flat_init.items():
        key = jax.tree_util.keystr(path)
        cand = flat_src.get(key)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            merged[path] = jax.numpy.asarray(cand, leaf.dtype)
            report["loaded"].append(key)
        else:
            merged[path] = leaf
            (report["skipped"] if cand is not None
             else report["missing"]).append(key)
    report["ok"] = len(report["loaded"]) > 0
    treedef = jax.tree_util.tree_structure(init_variables)
    leaves = [merged[p] for p, _ in
              jax.tree_util.tree_flatten_with_path(init_variables)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves), report
