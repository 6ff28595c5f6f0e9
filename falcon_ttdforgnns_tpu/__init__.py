"""falcon_ttdforgnns_tpu — a TPU-native GNN training framework with
Tensor-Train compressed node-embedding tables.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
FALCON-TTDforGNNs (reference at /root/reference): TT-embedding lookup as
gather + batched MXU matmul chains with group de-duplication, a
software-managed hot-row cache, graph-topology-aware node reordering,
static-shape neighbor-sampled GraphSAGE / full-graph GCN-GAT training,
layer-wise full-neighbor inference, and data-parallel scaling over a
``jax.sharding.Mesh``.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: remote TPU AOT compiles in this environment
# take minutes; caching them across processes is a 10-100x iteration win.
# Opt out with FALCON_NO_COMPILE_CACHE=1.
if not _os.environ.get("FALCON_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get("FALCON_COMPILE_CACHE", "/tmp/jax_cache")
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .ops.tt_shapes import TTShapes, make_tt_shapes, suggested_tt_shapes
from .ops.tt_lookup import (
    tt_digits,
    tt_to_full,
    tt_lookup,
    tt_lookup_gather,
    tt_lookup_grouped,
    tt_lookup_grouped_sorted,
    tt_embedding_bag,
    tt_core_grads,
)

__version__ = "0.1.0"
