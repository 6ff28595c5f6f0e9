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

from .ops.tt_shapes import TTShapes, make_tt_shapes, suggested_tt_shapes
from .ops.tt_lookup import (
    tt_digits,
    tt_to_full,
    tt_lookup,
    tt_lookup_gather,
    tt_lookup_grouped,
    tt_embedding_bag,
    tt_core_grads,
)

__version__ = "0.1.0"
