"""Segment-sum / SpMM primitives for COO message passing.

The XLA-native replacement for DGL's SpMM inside SAGEConv/GraphConv
(SURVEY.md §7): gather source rows over the edge list, ``segment_sum``
into destination rows.  Deterministic by construction (vs CUDA atomics).

Edge-chunked variants bound peak memory: a naive gather materializes
(E, D) messages — at products scale (123M directed edges × 256 features)
that is ~126 GB, far beyond HBM.  ``lax.scan`` over static edge chunks
keeps the working set at (chunk, D) while the (N, D) accumulator stays
resident.  This is the TPU analog of the reference's ``batch_count``
chunking knob (`FBTT/tt_embeddings_cuda.cu:1027`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def spmm_sum(h: jax.Array, src: jax.Array, dst: jax.Array, num_nodes: int,
             edge_weight: Optional[jax.Array] = None,
             sorted_dst: bool = False) -> jax.Array:
    """out[v] = sum_{(u->v)} w_e * h[u] — one-shot (small graphs).

    ``sorted_dst=True`` is a contract, not a hint (XLA may produce garbage
    for unsorted indices under ``indices_are_sorted``): pass it only when
    dst is non-decreasing (the CSRGraph.to_coo guarantee).  Defaults to
    False so an unsorted caller degrades to correct-but-slower."""
    msgs = jnp.take(h, src, axis=0)
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    return jax.ops.segment_sum(msgs, dst, num_segments=num_nodes,
                               indices_are_sorted=sorted_dst)


def spmm_sum_chunked(h: jax.Array, src: jax.Array, dst: jax.Array, num_nodes: int,
                     edge_weight: Optional[jax.Array] = None,
                     chunk: int = 1 << 22,
                     sorted_dst: bool = False) -> jax.Array:
    """Edge-chunked SpMM: scan over fixed-size edge chunks, scatter-add into
    a resident (N, D) accumulator.  Edges are padded with (0, 0) edges and
    zero weight, so padding contributes nothing.  ``sorted_dst`` contract as
    in :func:`spmm_sum` (padding dst with the max id keeps chunks sorted)."""
    E = src.shape[0]
    if E <= chunk:
        return spmm_sum(h, src, dst, num_nodes, edge_weight, sorted_dst)
    n_chunks = -(-E // chunk)
    pad = n_chunks * chunk - E
    w = edge_weight if edge_weight is not None else jnp.ones((E,), h.dtype)
    src_p = jnp.pad(src, (0, pad)).reshape(n_chunks, chunk)
    dst_p = jnp.pad(dst, (0, pad), constant_values=num_nodes - 1
                    ).reshape(n_chunks, chunk)
    w_p = jnp.pad(w, (0, pad)).reshape(n_chunks, chunk)  # zero pad weight

    def body(acc, args):
        s, d, we = args
        msgs = jnp.take(h, s, axis=0) * we[:, None]
        return acc.at[d].add(msgs, indices_are_sorted=sorted_dst), None

    acc0 = jnp.zeros((num_nodes, h.shape[1]), dtype=h.dtype)
    acc, _ = jax.lax.scan(body, acc0, (src_p, dst_p, w_p))
    return acc


def spmm_mean(h: jax.Array, src: jax.Array, dst: jax.Array, num_nodes: int,
              in_deg: Optional[jax.Array] = None, chunk: int = 1 << 22,
              sorted_dst: bool = False) -> jax.Array:
    """Mean aggregation: sum / in-degree (degree computed from dst if not
    given)."""
    s = spmm_sum_chunked(h, src, dst, num_nodes, chunk=chunk,
                         sorted_dst=sorted_dst)
    if in_deg is None:
        in_deg = jax.ops.segment_sum(jnp.ones_like(dst, dtype=h.dtype), dst,
                                     num_segments=num_nodes)
    return s / jnp.maximum(in_deg.astype(h.dtype), 1.0)[:, None]


def gcn_norm_spmm(h: jax.Array, src: jax.Array, dst: jax.Array, num_nodes: int,
                  in_deg: jax.Array, chunk: int = 1 << 22,
                  sorted_dst: bool = False) -> jax.Array:
    """Symmetric-normalized SpMM: D^{-1/2} A D^{-1/2} h."""
    norm = jax.lax.rsqrt(jnp.maximum(in_deg.astype(h.dtype), 1.0))
    out = spmm_sum_chunked(h * norm[:, None], src, dst, num_nodes, chunk=chunk,
                           sorted_dst=sorted_dst)
    return out * norm[:, None]
