"""Device-mesh helpers.

The TPU-native replacement for the reference's NCCL/DDP process topology
(`sage_dgl_partition.py:198-255`, SURVEY.md §2.4): no process groups, no
rendezvous — a ``jax.sharding.Mesh`` plus ``NamedSharding`` annotations;
XLA inserts the collectives (grad psum over ICI, all-gathers for
replicated params).  The same code runs 1-chip, 1-host-N-chip, and
multi-host (DCN-spanning mesh) unchanged.

Axes:
  data  — batch sharding (the DDP analog; the only axis the reference has)
  node  — node/embedding-space sharding for papers100M-scale tables and
          the hot-row cache (the reference's missing scale-out axis)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_node: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_node
    use = devices[: n_data * n_node]
    arr = np.array(use).reshape(n_data, n_node)
    return Mesh(arr, axis_names=("data", "node"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def node_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharded tables (dense embedding / cache rows) over 'node'."""
    return NamedSharding(mesh, P("node"))


def shard_batch(mesh: Mesh, *arrays):
    """device_put each array with its leading dim sharded over 'data'."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
