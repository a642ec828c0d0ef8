"""Checkpoint / resume for scene parameters and optimizer state.

The reference has no persistence beyond the accumulation image and PPM
output (SURVEY.md section 5); inverse rendering needs real checkpoints.
Pytrees are saved as npz (leaf arrays + a JSON treedef) — dependency-free
and multi-host-safe (each host writes only on process 0).
``save_async`` overlaps the disk write with training: the device->host
copy is taken synchronously (cheap), the npz write runs on a background
thread — the same overlap an orbax async checkpointer provides, without
the directory-format dependency.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

_async_executor = None


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


def save_async(path: str, tree: Any, extra: Optional[dict] = None):
    """Non-blocking ``save``: snapshots the tree to host memory now and
    writes on a background thread.  Returns a future (``.result()`` to
    join, e.g. before exiting); safe to fire-and-forget between steps —
    writes to the same path serialize on the single worker thread."""
    import concurrent.futures

    global _async_executor
    leaves, treedef = _flatten(tree)
    host_tree = jax.tree_util.tree_unflatten(
        treedef, [np.asarray(x) for x in leaves])
    if _async_executor is None:
        _async_executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="srt-ckpt")
    return _async_executor.submit(save, path, host_tree, extra)


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


# ---------------------------------------------------------------------------
# Orbax backend (optional): the ecosystem-standard checkpoint format, for
# interop with other JAX training stacks.  Same pytree in/out contract as
# the npz path; orbax's async machinery replaces save_async.
# ---------------------------------------------------------------------------

def have_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401
        return True
    except Exception:
        return False


def save_orbax(path: str, tree: Any) -> None:
    """Save a pytree with orbax (directory format) at ``path``."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ck:
        ck.save(os.path.abspath(path), tree, force=True)


def load_orbax(path: str, template: Any):
    """Restore a pytree saved by ``save_orbax``; None if missing.

    Uses the args-based restore API (the ``item=`` kwarg is deprecated
    on orbax >= 0.11 and slated for removal — r4 advisor)."""
    import orbax.checkpoint as ocp

    if not os.path.exists(path):
        return None
    with ocp.PyTreeCheckpointer() as ck:
        return ck.restore(os.path.abspath(path),
                          args=ocp.args.PyTreeRestore(item=template))


def save_train_state(path: str, params, opt_state, step: int) -> None:
    save(path, (params, opt_state), extra={"step": int(step)})


def restore_train_state(restored, params_template, opt_state_template):
    """-> (params, opt_state, step) with the templates' structure."""
    leaves, extra = restored
    params, opt_state = restore_into(
        (params_template, opt_state_template), leaves
    )
    return params, opt_state, int(extra.get("step", 0))
