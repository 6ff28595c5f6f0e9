"""Checkpoint / restore.

The reference only *saves* (best-eval ``th.save`` of the state dict,
`sage_dgl_partition.py:385-394`); true restore is a framework expectation
the rebuild adds (SURVEY.md §5.4): full state = model params (TT cores +
GNN weights + cache rows), mutable collections (LFU counters, id table,
batch stats), optimizer state, and step counter — saved atomically via
orbax, restorable mid-training.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(ckpt_dir: str, step: int, variables: Dict[str, Any],
                    opt_state: Any, extra: Optional[Dict[str, Any]] = None) -> str:
    """Atomic save of the full training state; returns the path."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    state = {"variables": variables, "opt_state": opt_state,
             "extra": extra or {}}
    if _HAVE_ORBAX:
        path = os.path.join(ckpt_dir, f"step_{step}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        return path
    # numpy fallback (flat pickle-free npz of leaves + treedef repr)
    import pickle
    path = os.path.join(ckpt_dir, f"step_{step}.pkl")
    host_state = jax.tree.map(np.asarray, state)
    with open(path + ".tmp", "wb") as f:
        pickle.dump(host_state, f)
    os.replace(path + ".tmp", path)
    return path


def restore_checkpoint(path: str, target: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure of ``target`` (an abstract/concrete state
    pytree with matching shapes)."""
    if _HAVE_ORBAX and os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
            if not isinstance(x, (int, float, str, bool, bytes)) else x,
            target)
        return ckptr.restore(path, abstract)
    import pickle
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = []
    for name in os.listdir(ckpt_dir):
        # skip in-flight '.tmp' leftovers from a crashed save — the atomic
        # os.replace never ran, so their contents are untrusted
        if name.startswith("step_") and not name.endswith(".tmp"):
            try:
                step = int(name.split("_")[1].split(".")[0])
                cands.append((step, os.path.join(ckpt_dir, name)))
            except ValueError:
                continue
    return max(cands)[1] if cands else None
