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


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None,
                   logger=None) -> int:
    """Multi-host bootstrap: ``jax.distributed.initialize`` (the TPU-native
    replacement for the reference's
    ``dist.init_process_group('nccl', tcp://...)``,
    `sage_dgl_partition.py:203-206`).  On Cloud TPU pods the arguments are
    discovered from the environment; explicit values support manual
    clusters (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID env vars are
    honored as fallbacks).  Returns the global process count.  Safe no-op
    when already initialized or single-process."""
    import os
    kwargs = {}
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator:
        np_ = num_processes or os.environ.get("NUM_PROCESSES")
        pid = process_id if process_id is not None \
            else os.environ.get("PROCESS_ID")
        if np_ is None or pid is None:
            # defaulting these would make every host "succeed" as an
            # independent 1-process job — fail fast instead
            raise ValueError(
                "COORDINATOR_ADDRESS is set but NUM_PROCESSES/PROCESS_ID "
                "are not: a manual cluster must specify both (on Cloud TPU "
                "pods leave all three unset for auto-discovery)")
        kwargs["coordinator_address"] = coordinator
        kwargs["num_processes"] = int(np_)
        kwargs["process_id"] = int(pid)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:  # already initialized / 1-proc
        if logger:
            logger.info(f"multihost init skipped: {e}")
    n = jax.process_count()
    if logger:
        logger.info(f"multihost: process {jax.process_index()}/{n}, "
                    f"{jax.device_count()} global devices")
    return n


def make_global_mesh(n_node: int = 1) -> Mesh:
    """DCN-aware global mesh: hosts stacked on the 'data' (DCN) axis, the
    per-host chips split data×node so 'node' collectives (ring SpMM
    ppermute, cache all-to-all) ride ICI only — the scaling-book recipe of
    keeping the fast axis innermost.  Falls back to :func:`make_mesh` on a
    single process."""
    if jax.process_count() == 1:
        return make_mesh(n_node=n_node)
    from jax.experimental import mesh_utils
    per_host = jax.local_device_count()
    if per_host % n_node != 0:
        raise ValueError(f"n_node={n_node} must divide chips/host={per_host}")
    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_host // n_node, n_node),
        dcn_mesh_shape=(jax.process_count(), 1),
    )
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
