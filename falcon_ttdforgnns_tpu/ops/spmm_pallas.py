"""Edge-tiled Pallas SpMM: one-hot segment-MATMUL aggregation.

Replaces the scatter/segment half of COO SpMM (DGL's SpMM inside
SAGEConv, `/root/reference/gnn_model.py:206-217`) with an MXU
formulation.  Measured on v5e, XLA's sorted segment-sum processes ~68M
rows/s (sequential row adds); here each edge tile of E_t dst-sorted
edges becomes ONE matmul:

    out_block (NR, D) += A (NR, E_t) @ msgs (E_t, D)

where A[r, e] = w_e * [dst_e == block_row r] is built in-VMEM from an
iota comparison (the same one-hot-MXU trick as the TT kernels).  The
per-edge cost is 2*NR*D MXU FLOPs — at NR=128, D=256 that is 65K
FLOPs/edge, i.e. ~9 TFLOP for a products-scale layer: tens of ms on the
MXU vs ~1.8 s for the XLA segment path.

Host tiling (`build_spmm_tiles`): dst-sorted edges are cut into tiles of
at most E_t edges whose dst rows stay inside ONE aligned NR-row block;
every block gets >= 1 tile (empty blocks get an all-padding tile so the
output is fully defined).  Tiles are block-sorted, so tiles sharing a
block are consecutive grid steps and accumulate in VMEM (Pallas output
revisiting); `first` flags mark block entry for init-vs-accumulate.
Scalar-prefetched block ids drive the output index map.

The gather half (msgs = h[src]) stays XLA — measured at 143 GB/s it is
within ~2x of any per-row DMA scheme, and fusing it here would not beat
that (probe data in docs/PERFORMANCE.md).  Chunking keeps the gathered
msgs bounded: tiles are grouped into chunks cut at block boundaries, so
chunk outputs are disjoint row ranges (no cross-chunk accumulation).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclass
class SpmmTiles:
    """Host-precomputed tiling of a dst-sorted COO edge list (one-time
    per graph, cache alongside the reorder permutation)."""

    src: np.ndarray      # (T*E_t,) int32 gather ids (0 for padding)
    dstl: np.ndarray     # (T*E_t,) int32 dst row within the tile's block
    w: np.ndarray        # (T*E_t,) f32 edge weight, 0 for padding
    blk: np.ndarray      # (T,) int32 out block id per tile
    first: np.ndarray    # (T,) int32 1 = first tile of its block
    chunks: List[Tuple[int, int, int, int]]  # (t0, t1, blk0, n_blocks)
    num_blocks: int
    block_rows: int      # NR
    tile_edges: int      # E_t


def build_spmm_tiles(src: np.ndarray, dst: np.ndarray, num_nodes: int,
                     edge_weight: Optional[np.ndarray] = None,
                     block_rows: int = 128, tile_edges: int = 2048,
                     max_chunk_tiles: int = 8192) -> SpmmTiles:
    """Tile dst-SORTED edges.  ``max_chunk_tiles`` bounds the gathered
    msgs working set per chunk (tiles * E_t * D floats)."""
    NR, E_t = block_rows, tile_edges
    E = len(src)
    assert len(dst) == E
    nb = -(-num_nodes // NR)
    w = (edge_weight if edge_weight is not None
         else np.ones(E, np.float32)).astype(np.float32)

    eblk = dst // NR                      # block of each edge (sorted)
    counts = np.bincount(eblk, minlength=nb)
    tiles_per_block = np.maximum(1, -(-counts // E_t))
    T = int(tiles_per_block.sum())

    src_p = np.zeros(T * E_t, np.int32)
    dstl_p = np.zeros(T * E_t, np.int32)
    w_p = np.zeros(T * E_t, np.float32)
    blk = np.zeros(T, np.int32)
    first = np.zeros(T, np.int32)

    estart = np.zeros(nb + 1, np.int64)
    np.cumsum(counts, out=estart[1:])
    t = 0
    for b in range(nb):
        e0, e1 = estart[b], estart[b + 1]
        n_t = tiles_per_block[b]
        for k in range(n_t):
            lo = e0 + k * E_t
            hi = min(e1, lo + E_t)
            m = hi - lo
            o = t * E_t
            if m > 0:
                src_p[o:o + m] = src[lo:hi]
                dstl_p[o:o + m] = dst[lo:hi] - b * NR
                w_p[o:o + m] = w[lo:hi]
            blk[t] = b
            first[t] = 1 if k == 0 else 0
            t += 1
    assert t == T

    # chunk cuts at block boundaries (never split a block's tile run)
    chunks: List[Tuple[int, int, int, int]] = []
    t0 = 0
    while t0 < T:
        t1 = min(T, t0 + max_chunk_tiles)
        # extend t1 forward to the end of its block's tile run
        while t1 < T and first[t1] == 0:
            t1 += 1
        blk0 = int(blk[t0])
        nblk = int(blk[t1 - 1]) - blk0 + 1
        chunks.append((t0, t1, blk0, nblk))
        t0 = t1
    return SpmmTiles(src=src_p, dstl=dstl_p, w=w_p, blk=blk, first=first,
                     chunks=chunks, num_blocks=nb, block_rows=NR,
                     tile_edges=E_t)


def _seg_mm_kernel(NR: int, E_t: int, compute_dtype,
                   blk_ref, first_ref, dstl_ref, w_ref, msgs_ref, out_ref):
    t = pl.program_id(0)
    dstl = dstl_ref[:]
    w = w_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (NR, E_t), 0)
    A = jnp.where(rows == dstl[None, :], w[None, :], 0.0).astype(compute_dtype)
    acc = jnp.dot(A, msgs_ref[:, :].astype(compute_dtype),
                  preferred_element_type=jnp.float32)

    @pl.when(first_ref[t] == 1)
    def _init():
        out_ref[:, :] = acc

    @pl.when(first_ref[t] == 0)
    def _accum():
        out_ref[:, :] += acc


def _seg_mm_chunk(NR: int, E_t: int, D: int, n_tiles: int, n_blocks: int,
                  compute_dtype, interpret,
                  blk_local: jax.Array, first: jax.Array, dstl: jax.Array,
                  w: jax.Array, msgs: jax.Array) -> jax.Array:
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((E_t,), lambda t, blk, first: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E_t,), lambda t, blk, first: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E_t, D), lambda t, blk, first: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NR, D), lambda t, blk, first: (blk[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_seg_mm_kernel, NR, E_t, compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * NR, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * NR * E_t * D,
            bytes_accessed=n_tiles * E_t * (D * 4 + 8) + n_blocks * NR * D * 4,
            transcendentals=0),
        interpret=interpret,
    )(blk_local, first, dstl, w, msgs)


def _tile_mm_kernel(NR: int, E_t: int, compute_dtype,
                    dstl_ref, w_ref, msgs_ref, out_ref):
    """Per-tile partial: out_tile (NR, D) = onehot(dstl)*w @ msgs.
    Static t->t output map — no scalar prefetch, no revisiting, no
    data-dependent index maps (all Mosaic features that proved fragile
    through the remote compiler)."""
    dstl = dstl_ref[:]
    w = w_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (NR, E_t), 0)
    A = jnp.where(rows == dstl[None, :], w[None, :], 0.0).astype(compute_dtype)
    out_ref[:, :] = jnp.dot(A, msgs_ref[:, :].astype(compute_dtype),
                            preferred_element_type=jnp.float32)


def spmm_sum_tile_partials(h: jax.Array, src: jax.Array, dstl: jax.Array,
                           w: jax.Array, blk: jax.Array, num_blocks: int,
                           block_rows: int, tile_edges: int, num_nodes: int,
                           compute_dtype=None,
                           interpret: Optional[bool] = None) -> jax.Array:
    """Tiled SpMM, two stages: (1) Pallas grid computes one (NR, D)
    partial per tile via the one-hot MXU matmul; (2) XLA segment-sums the
    per-tile partials over their block ids (T rows of NR*D — tiny next to
    the edge stream).  Array args are the FLAT SpmmTiles fields passed as
    traced jit arguments."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compute_dtype is None:
        compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    NR, E_t, D = block_rows, tile_edges, h.shape[1]
    T = blk.shape[0]
    gather_dtype = jnp.float32 if interpret else jnp.bfloat16

    msgs = jnp.take(h.astype(gather_dtype), src, axis=0)
    partials = pl.pallas_call(
        functools.partial(_tile_mm_kernel, NR, E_t, compute_dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((E_t,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E_t,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E_t, D), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NR, D), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T * NR, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * NR * E_t * D,
            bytes_accessed=T * E_t * (D * 4 + 8) + T * NR * D * 4,
            transcendentals=0),
        interpret=interpret,
    )(dstl, w, msgs)
    # combine tiles per block: (T, NR*D) rows, sorted segment ids
    per_block = jax.ops.segment_sum(
        partials.reshape(T, NR * D), blk, num_segments=num_blocks,
        indices_are_sorted=True)
    return per_block.reshape(num_blocks * NR, D)[:num_nodes]


def auto_tile_edges(num_edges: int, num_nodes: int,
                    block_rows: int = 128) -> int:
    """Pick E_t near the average edges-per-block so low-degree graphs
    don't drown in span-bound padding tiles.  Clamped to {1024, 2048}:
    Mosaic requires 1-D stream block shapes to match XLA's (1024)-element
    tiling of the flat tile arrays."""
    avg = num_edges / max(1, -(-num_nodes // block_rows))
    return 2048 if avg > 1536 else 1024


def spmm_sum_tiled_arrays(h: jax.Array, src: jax.Array, dstl: jax.Array,
                          w: jax.Array, blk: jax.Array, first: jax.Array,
                          chunks, num_blocks: int, block_rows: int,
                          tile_edges: int, num_nodes: int,
                          compute_dtype=None,
                          interpret: Optional[bool] = None) -> jax.Array:
    """jit-friendly core: the tile arrays are TRACED ARGUMENTS (passing
    numpy through a closure would bake GBs of constants into the program
    — fatal through a remote-attached TPU); ``chunks`` is a static tuple
    of (t0, t1, blk0, n_blocks)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compute_dtype is None:
        compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    NR, E_t, D = block_rows, tile_edges, h.shape[1]
    gather_dtype = jnp.float32 if interpret else jnp.bfloat16

    out = jnp.zeros((num_blocks * NR, D), jnp.float32)
    h_g = h.astype(gather_dtype)
    for (t0, t1, blk0, nblk) in chunks:
        n_tiles = t1 - t0
        msgs = jnp.take(h_g, src[t0 * E_t:t1 * E_t], axis=0)
        part = _seg_mm_chunk(
            NR, E_t, D, n_tiles, nblk, compute_dtype, interpret,
            blk[t0:t1] - blk0,
            first[t0:t1],
            dstl[t0 * E_t:t1 * E_t],
            w[t0 * E_t:t1 * E_t],
            msgs)
        out = jax.lax.dynamic_update_slice(out, part, (blk0 * NR, 0))
    return out[:num_nodes]


@dataclass
class SpmmTilesU:
    """Uniform-chunk tiling: every chunk has exactly TC tiles and defines
    exactly NBC output blocks (pad tiles with first=1, w=0 zero-define the
    missing blocks), so ONE Pallas kernel shape serves the whole edge
    stream via ``lax.scan`` — a varying-shape chunk list costs one Mosaic
    compile PER CHUNK (minutes each through a remote-attached TPU)."""

    src: np.ndarray      # (C, TC*E_t) int32
    dstl: np.ndarray     # (C, TC*E_t) int32
    w: np.ndarray        # (C, TC*E_t) f32
    blkl: np.ndarray     # (C, TC) int32 chunk-local block ids
    first: np.ndarray    # (C, TC) int32
    blk0: np.ndarray     # (C,) int32 first global block of the chunk
    num_blocks_padded: int
    blocks_per_chunk: int   # NBC
    block_rows: int         # NR
    tile_edges: int         # E_t


def build_spmm_tiles_uniform(src: np.ndarray, dst: np.ndarray,
                             num_nodes: int,
                             edge_weight: Optional[np.ndarray] = None,
                             block_rows: int = 128, tile_edges: int = 2048,
                             tiles_per_chunk: int = 1024) -> SpmmTilesU:
    """Uniform-chunk tiler over dst-SORTED edges (see SpmmTilesU)."""
    flat = build_spmm_tiles(src, dst, num_nodes, edge_weight,
                            block_rows, tile_edges,
                            max_chunk_tiles=tiles_per_chunk)
    NR, E_t = block_rows, tile_edges
    chunks = flat.chunks
    C = len(chunks)
    NBC = max(nblk for (_, _, _, nblk) in chunks)
    TC = max((t1 - t0) + (NBC - nblk) for (t0, t1, _, nblk) in chunks)

    src_u = np.zeros((C, TC * E_t), np.int32)
    dstl_u = np.zeros((C, TC * E_t), np.int32)
    w_u = np.zeros((C, TC * E_t), np.float32)
    blkl_u = np.zeros((C, TC), np.int32)
    first_u = np.zeros((C, TC), np.int32)
    blk0_u = np.zeros(C, np.int32)
    for c, (t0, t1, blk0, nblk) in enumerate(chunks):
        nt = t1 - t0
        src_u[c, :nt * E_t] = flat.src[t0 * E_t:t1 * E_t]
        dstl_u[c, :nt * E_t] = flat.dstl[t0 * E_t:t1 * E_t]
        w_u[c, :nt * E_t] = flat.w[t0 * E_t:t1 * E_t]
        blkl_u[c, :nt] = flat.blk[t0:t1] - blk0
        first_u[c, :nt] = flat.first[t0:t1]
        blk0_u[c] = blk0
        # pad tiles: zero-define blocks [nblk, NBC) (overwritten by the
        # next chunk's rows, or left as zero padding after the last)
        for j in range(NBC - nblk):
            blkl_u[c, nt + j] = nblk + j
            first_u[c, nt + j] = 1
        # remaining pad tiles revisit the last defined block with w=0
        for j in range(nt + (NBC - nblk), TC):
            blkl_u[c, j] = NBC - 1
    nbp = int(blk0_u[-1]) + NBC
    return SpmmTilesU(src=src_u, dstl=dstl_u, w=w_u, blkl=blkl_u,
                      first=first_u, blk0=blk0_u, num_blocks_padded=nbp,
                      blocks_per_chunk=NBC, block_rows=NR, tile_edges=E_t)


def spmm_sum_tiled_uniform(h: jax.Array, src: jax.Array, dstl: jax.Array,
                           w: jax.Array, blkl: jax.Array, first: jax.Array,
                           blk0: jax.Array, num_blocks_padded: int,
                           blocks_per_chunk: int, block_rows: int,
                           tile_edges: int, num_nodes: int,
                           compute_dtype=None,
                           interpret: Optional[bool] = None) -> jax.Array:
    """Uniform-chunk SpMM: lax.scan over chunks, one kernel shape.
    Array args are (C, ...) stacked chunk arrays from SpmmTilesU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compute_dtype is None:
        compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    NR, E_t, NBC = block_rows, tile_edges, blocks_per_chunk
    D = h.shape[1]
    TC = blkl.shape[1]
    gather_dtype = jnp.float32 if interpret else jnp.bfloat16
    h_g = h.astype(gather_dtype)

    def body(out, xs):
        s, dl, ww, bl, fi, b0 = xs
        msgs = jnp.take(h_g, s, axis=0)
        part = _seg_mm_chunk(NR, E_t, D, TC, NBC, compute_dtype, interpret,
                             bl, fi, dl, ww, msgs)
        return jax.lax.dynamic_update_slice(out, part, (b0 * NR, 0)), None

    out0 = jnp.zeros((num_blocks_padded * NR, D), jnp.float32)
    out, _ = jax.lax.scan(body, out0, (src, dstl, w, blkl, first, blk0))
    return out[:num_nodes]


def spmm_sum_tiled(h: jax.Array, tiles: SpmmTiles, num_nodes: int,
                   compute_dtype=None,
                   interpret: Optional[bool] = None) -> jax.Array:
    """out[v] = sum_{u->v} w * h[u] via the tiled segment-matmul kernel.
    Matches :func:`falcon_ttdforgnns_tpu.ops.segment.spmm_sum` on the
    edges the tiles were built from (parity tests in
    tests/test_spmm_pallas.py)."""
    return spmm_sum_tiled_arrays(
        h, jnp.asarray(tiles.src), jnp.asarray(tiles.dstl),
        jnp.asarray(tiles.w), jnp.asarray(tiles.blk),
        jnp.asarray(tiles.first), tuple(tiles.chunks), tiles.num_blocks,
        tiles.block_rows, tiles.tile_edges, num_nodes, compute_dtype,
        interpret)
