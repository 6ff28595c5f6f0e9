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

import functools
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


def _headed_scatter(feat: jax.Array, w: jax.Array, src: jax.Array,
                    dst: jax.Array, num_out: int, chunk: int) -> jax.Array:
    """out[dst_e] += w[e, :, None] * feat[src_e]  —  feat (N, H, D),
    w (E, H) → (num_out, H, D), edge-chunked.

    ``lax.scan`` over chunks (O(1) program size): at products scale the
    default chunk gives ~240 chunks, and this runs three times per train
    step (fwd, d_feat, d_w) — a Python-unrolled loop would emit ~700
    scatter stages into one XLA program."""
    E = src.shape[0]
    H, D = feat.shape[1], feat.shape[2]
    n_chunks = max(1, -(-E // chunk))
    pad = n_chunks * chunk - E
    if pad:
        src = jnp.pad(src, (0, pad))
        dst = jnp.pad(dst, (0, pad))
        w = jnp.pad(w, ((0, pad), (0, 0)))  # zero weight: pad edges inert
    acc0 = jnp.zeros((num_out, H, D), feat.dtype)
    if n_chunks == 1:
        return acc0.at[dst].add(jnp.take(feat, src, axis=0) * w[:, :, None])

    def body(acc, args):
        s, d, we = args
        return acc.at[d].add(jnp.take(feat, s, axis=0) * we[:, :, None]), None

    acc, _ = jax.lax.scan(body, acc0, (src.reshape(n_chunks, chunk),
                                       dst.reshape(n_chunks, chunk),
                                       w.reshape(n_chunks, chunk, H)))
    return acc


def _headed_edge_dot(feat: jax.Array, g: jax.Array, src: jax.Array,
                     dst: jax.Array, chunk: int) -> jax.Array:
    """dw[e, h] = <feat[src_e, h, :], g[dst_e, h, :]> — edge-chunked
    (``lax.scan``; see :func:`_headed_scatter` on why not unrolled)."""
    E = src.shape[0]
    n_chunks = max(1, -(-E // chunk))
    pad = n_chunks * chunk - E
    if pad:
        src = jnp.pad(src, (0, pad))
        dst = jnp.pad(dst, (0, pad))
    if n_chunks == 1:
        return jnp.sum(jnp.take(feat, src, axis=0) * jnp.take(g, dst, axis=0),
                       axis=-1)[:E]

    def body(_, args):
        s, d = args
        return None, jnp.sum(jnp.take(feat, s, axis=0)
                             * jnp.take(g, d, axis=0), axis=-1)

    _, outs = jax.lax.scan(body, None, (src.reshape(n_chunks, chunk),
                                        dst.reshape(n_chunks, chunk)))
    return outs.reshape(n_chunks * chunk, -1)[:E]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def headed_spmm(feat: jax.Array, w: jax.Array, src: jax.Array, dst: jax.Array,
                num_nodes: int, chunk: int = 1 << 19) -> jax.Array:
    """Per-head weighted aggregation: out[v,h] = Σ_{e:dst_e=v} w[e,h]·feat[src_e,h].

    The memory-critical op of GAT (`gnn_model.py:318-441` does it as DGL
    ``u_mul_e`` + SpMM): a naive gather materializes (E, H, D) messages —
    7.3 GB at arxiv scale with the reference-default 3×256 heads, which
    OOMs a 16 GB chip twice over once autodiff keeps it as a residual.

    Custom VJP keeps peak memory at one (chunk, H, D) slab:
      d_feat = the same chunked scatter with src/dst swapped
               (d_feat[u] = Σ_{e:src_e=u} w[e]·g[dst_e]),
      d_w    = chunked per-edge row dot  <feat[src_e], g[dst_e]>.
    """
    return _headed_scatter(feat, w, src, dst, num_nodes, chunk)


def _headed_spmm_fwd(feat, w, src, dst, num_nodes, chunk):
    # fwd takes the primal signature; bwd gets the nondiff args prepended
    out = headed_spmm(feat, w, src, dst, num_nodes, chunk)
    return out, (feat, w, src, dst)


def _headed_spmm_bwd(num_nodes, chunk, res, g):
    feat, w, src, dst = res
    d_feat = _headed_scatter(g, w, dst, src, feat.shape[0], chunk)
    d_w = _headed_edge_dot(feat, g, src, dst, chunk)
    return d_feat.astype(feat.dtype), d_w.astype(w.dtype), None, None


headed_spmm.defvjp(_headed_spmm_fwd, _headed_spmm_bwd)


def gcn_norm_spmm(h: jax.Array, src: jax.Array, dst: jax.Array, num_nodes: int,
                  in_deg: jax.Array, chunk: int = 1 << 22,
                  sorted_dst: bool = False) -> jax.Array:
    """Symmetric-normalized SpMM: D^{-1/2} A D^{-1/2} h."""
    norm = jax.lax.rsqrt(jnp.maximum(in_deg.astype(h.dtype), 1.0))
    out = spmm_sum_chunked(h * norm[:, None], src, dst, num_nodes, chunk=chunk,
                           sorted_dst=sorted_dst)
    return out * norm[:, None]
