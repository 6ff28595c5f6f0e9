"""Window-blocked SpMM: VMEM-local message gather (Pallas) + segment-sum.

The measured wall of every full-graph SpMM formulation on TPU is the HBM
row gather ``h[src]`` over the edge list (~25 GB/s effective at products
scale — latency-bound 1 KB row reads; docs/PERFORMANCE.md "the gather is
the wall").  This kernel removes it by *blocking over source windows*:

  - host groups edges (sorted by ``(dst_bucket, src)``) into tiles of
    ``T`` edges whose sources all live in ONE ``T``-row window of ``h``;
  - the kernel DMAs each window into VMEM once (sequential HBM read —
    every ``h`` row is read ~``ceil(out_deg·T/E_window)`` times instead
    of once per edge) and gathers the tile's messages VMEM-locally with
    a same-shape ``take_along_axis`` (Mosaic dynamic gather);
  - messages land in (coarsely dst-sorted) tile order; a chunked XLA
    scatter-add reduces them into the (N, D) accumulator.

Windows are addressed at half-window granularity through a scalar-
prefetched block index (``PrefetchScalarGridSpec``), so a tile's window
never needs alignment stronger than ``T/2``.

This was built as a candidate replacement for the reference hot loop's
DGL SpMM (`gnn_model.py:206-217`) on the full-graph/eval path.  **Chip
measurement killed it** (docs/PERFORMANCE.md "window-blocked SpMM:
measured dead end"):

  1. Mosaic cannot lower the window gather: ``tpu.dynamic_gather`` only
     supports a source that fits ONE vreg along the gather dimension
     (8 sublanes / 128 lanes); a 4096-row window spans 512 vregs.
  2. Even with a expressible gather (a transposed 128-lane-window
     variant verified to compile), the design cannot win: it trades the
     baseline's sorted-dst segment-sum (sequential reduction) for a
     random row scatter-add, and that scatter ALONE measures 3.2 s/pass
     at products scale — more than the entire 2.5 s chunked-XLA SpMM it
     was meant to beat.  The random-row access wall is symmetric; moving
     it from the gather side to the scatter side buys nothing.

The module stays for the measurement record and CPU (interpret-mode)
wiring-parity tests; :func:`check_blocked_supported` turns the cryptic
Mosaic compile error into an actionable one on real TPUs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class WindowTiles(NamedTuple):
    """Static tiling of an edge list into src-window tiles.

    win:  (n_tiles,) int32  — half-window index w; the tile's window is
                              rows [w*T/2, w*T/2 + T) of the padded h
    idx:  (n_tiles, T) int32 — window-local src of each edge slot
    dst:  (n_tiles, T) int32 — global dst (pad slots -> num_nodes - 1)
    w:    (n_tiles, T) f32   — edge weight; 0.0 for pad slots
    tile: int                — T (edges per tile == window rows)
    num_nodes: int
    n_real_edges: int
    """

    win: np.ndarray
    idx: np.ndarray
    dst: np.ndarray
    w: np.ndarray
    tile: int
    num_nodes: int
    n_real_edges: int


def build_window_tiles(src: np.ndarray, dst: np.ndarray, num_nodes: int,
                       edge_weight: Optional[np.ndarray] = None,
                       tile: int = 4096, dst_buckets: int = 16,
                       chunk_tiles: int = 512) -> WindowTiles:
    """Greedy host tiling: edges sorted by ``(dst_bucket, src)``, packed
    into tiles of ≤ ``tile`` edges whose src span fits one ``tile``-row
    window aligned to ``tile/2``.

    ``dst_buckets`` trades pass-B scatter locality (messages come out
    coarsely sorted by dst range) against tile fragmentation — each
    bucket restarts the window walk.  Fragmentation stays ~1x as long as
    ``dst_buckets * num_nodes / tile`` ≲ ``num_edges / tile``.
    """
    assert tile % 2 == 0
    half = tile // 2
    E = len(src)
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = (np.asarray(edge_weight, np.float32) if edge_weight is not None
         else np.ones(E, np.float32))

    rb = -(-num_nodes // max(1, dst_buckets))
    key = (dst // rb) * (num_nodes + 1) + src
    # unstable sort: duplicate (bucket, src) pairs are interchangeable,
    # and introsort is ~2x the stable mergesort on 60M+ random keys
    order = np.argsort(key)
    # int32 takes: node ids fit, and the fancy-index pass is bandwidth-bound
    src_s = src.astype(np.int32)[order]
    dst_s = dst.astype(np.int32)[order]
    w_s = w[order]
    bucket_s = dst_s // np.int32(rb)

    # bucket segment boundaries restart the walk
    bnd = np.flatnonzero(np.diff(bucket_s)) + 1
    bounds = np.concatenate([[0], bnd, [E]])

    wins, slices = [], []
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        i = int(b0)
        while i < b1:
            astart = (int(src_s[i]) // half) * half
            # edges fit while src < astart + tile and count < tile
            j_row = int(np.searchsorted(src_s[i:b1], astart + tile, "left"))
            j = min(i + tile, i + j_row, int(b1))
            wins.append(astart // half)
            slices.append((i, j))
            i = j

    n_tiles = len(wins)
    n_pad = -(-max(1, n_tiles) // chunk_tiles) * chunk_tiles
    win = np.zeros(n_pad, np.int32)
    idx = np.zeros((n_pad, tile), np.int32)
    dstt = np.full((n_pad, tile), num_nodes - 1, np.int32)
    wt = np.zeros((n_pad, tile), np.float32)
    for t, ((i, j), wn) in enumerate(zip(slices, wins)):
        n = j - i
        win[t] = wn
        idx[t, :n] = src_s[i:j] - wn * half
        dstt[t, :n] = dst_s[i:j]
        wt[t, :n] = w_s[i:j]
    return WindowTiles(win=win, idx=idx, dst=dstt, w=wt, tile=tile,
                       num_nodes=num_nodes, n_real_edges=E)


def _gather_kernel(win_ref, hlo_ref, hhi_ref, idx_ref, w_ref, o_ref):
    del win_ref  # consumed by the index maps
    hw = jnp.concatenate([hlo_ref[:, :], hhi_ref[:, :]], axis=0)  # (T, D)
    idx2d = jnp.broadcast_to(idx_ref[:][:, None], hw.shape)
    rows = jnp.take_along_axis(hw, idx2d, axis=0)
    o_ref[:, :] = rows * w_ref[:][:, None].astype(rows.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _gather_msgs(h_pad: jax.Array, win: jax.Array, idx: jax.Array,
                 w: jax.Array, tile: int, interpret: bool) -> jax.Array:
    """(n_half*T/2, D) padded h + one tile-chunk's metadata -> (nt*T, D)
    weighted messages in tile order."""
    nt = win.shape[0]
    D = h_pad.shape[1]
    half = tile // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((half, D), lambda t, wn: (wn[t], 0)),
            pl.BlockSpec((half, D), lambda t, wn: (wn[t] + 1, 0)),
            # flat 1-D metadata blocks (the (1, T) form trips the
            # 8x128 block-tiling rule)
            pl.BlockSpec((tile,), lambda t, wn: (t,)),
            pl.BlockSpec((tile,), lambda t, wn: (t,)),
        ],
        out_specs=pl.BlockSpec((tile, D), lambda t, wn: (t, 0)),
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * tile, D), h_pad.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(win, h_pad, h_pad, idx.reshape(-1), w.reshape(-1))


def check_blocked_supported(backend: Optional[str] = None) -> None:
    """Raise early (with the measured explanation) instead of letting
    Mosaic fail with "Multiple source vregs along gather dimension" at
    compile time on a real chip."""
    if backend is None:
        backend = jax.default_backend()
    if backend == "tpu":
        raise ValueError(
            "--spmm blocked cannot run on TPU hardware: Mosaic's "
            "dynamic_gather is limited to single-vreg sources, and the "
            "design loses regardless — its random scatter-add alone "
            "measures 3.2 s/pass at products scale vs 2.5 s for the whole "
            "default chunked-XLA SpMM (docs/PERFORMANCE.md 'window-blocked "
            "SpMM: measured dead end').  Use --spmm xla (default).")


def default_blocked_tiling():
    """(tile, chunk_tiles) — measured-default sizes on TPU, tiny sizes in
    interpret mode (one place to retune once chip measurements land)."""
    on_tpu = jax.default_backend() == "tpu"
    return (4096 if on_tpu else 256), (512 if on_tpu else 8)


def chunk_tiles_host(tiles: WindowTiles, chunk_tiles: int = 512):
    """Reshape tile metadata into scan-ready chunk stacks:
    (n_chunks, CT), (n_chunks, CT*T) x3."""
    nt = tiles.win.shape[0]
    if nt % chunk_tiles:
        raise ValueError(f"n_tiles={nt} must be a multiple of "
                         f"chunk_tiles={chunk_tiles} (build_window_tiles "
                         f"pads to its chunk_tiles argument)")
    nc = nt // chunk_tiles
    T = tiles.tile
    return (tiles.win.reshape(nc, chunk_tiles),
            tiles.idx.reshape(nc, chunk_tiles * T),
            tiles.dst.reshape(nc, chunk_tiles * T),
            tiles.w.reshape(nc, chunk_tiles * T))


def spmm_sum_blocked_dev(h: jax.Array, win2: jax.Array, idx2: jax.Array,
                         dst2: jax.Array, w2: jax.Array, tile: int,
                         num_nodes: int,
                         interpret: bool = False) -> jax.Array:
    """Traceable core: scan over chunk stacks (one Pallas program, O(1)
    XLA size; the (E', D) message intermediate never materializes — each
    chunk slab scatter-adds into the resident (N, D) accumulator)."""
    half = tile // 2
    D = h.shape[1]
    n_half = -(-h.shape[0] // half) + 1  # +1: win+1 always addressable
    h_pad = jnp.pad(h, ((0, n_half * half - h.shape[0]), (0, 0)))

    def body(acc, args):
        wn, ix, dd, ww = args
        msgs = _gather_msgs(h_pad, wn, ix, ww, tile, interpret)
        return acc.at[dd].add(msgs), None

    acc0 = jnp.zeros((num_nodes, D), h.dtype)
    acc, _ = jax.lax.scan(body, acc0, (win2, idx2, dst2, w2))
    return acc


def spmm_sum_blocked(h: jax.Array, tiles: WindowTiles,
                     chunk_tiles: int = 512,
                     interpret: Optional[bool] = None) -> jax.Array:
    """out[v] = Σ_{(u→v)} w_e · h[u] via the window-blocked gather."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    win2, idx2, dst2, w2 = map(jnp.asarray, chunk_tiles_host(tiles,
                                                             chunk_tiles))
    return spmm_sum_blocked_dev(h, win2, idx2, dst2, w2, tiles.tile,
                                tiles.num_nodes, interpret)


class BlockedSpmm(NamedTuple):
    """Differentiable window-blocked SpMM operator for a FIXED graph:
    ``fwd`` tiles A, ``bwd`` tiles Aᵀ (d_h = Aᵀ g — the backward pass is
    the same kernel with src/dst roles swapped).  Build once per graph
    with :func:`build_blocked_spmm`; apply with :func:`apply_blocked_spmm`
    inside any jitted, differentiated computation (full-graph GCN/GAT
    training)."""

    fwd: tuple  # (win2, idx2, dst2, w2) device arrays
    bwd: tuple
    tile: int
    num_nodes: int


def build_blocked_spmm(src: np.ndarray, dst: np.ndarray, num_nodes: int,
                       edge_weight: Optional[np.ndarray] = None,
                       tile: int = 4096, dst_buckets: int = 16,
                       chunk_tiles: int = 512) -> BlockedSpmm:
    f = build_window_tiles(src, dst, num_nodes, edge_weight, tile,
                           dst_buckets, chunk_tiles)
    b = build_window_tiles(dst, src, num_nodes, edge_weight, tile,
                           dst_buckets, chunk_tiles)
    dev = lambda ts: tuple(jnp.asarray(a)
                           for a in chunk_tiles_host(ts, chunk_tiles))
    return BlockedSpmm(fwd=dev(f), bwd=dev(b), tile=tile,
                       num_nodes=num_nodes)


def apply_blocked_spmm(h: jax.Array, op: BlockedSpmm) -> jax.Array:
    return _apply_op(op.tile, op.num_nodes, h, op.fwd, op.bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _apply_op(tile, num_nodes, h, fwd, bwd):
    interpret = jax.default_backend() != "tpu"
    return spmm_sum_blocked_dev(h, *fwd, tile, num_nodes, interpret)


def _apply_op_fwd(tile, num_nodes, h, fwd, bwd):
    return _apply_op(tile, num_nodes, h, fwd, bwd), bwd


def _apply_op_bwd(tile, num_nodes, bwd, g):
    interpret = jax.default_backend() != "tpu"
    d_h = spmm_sum_blocked_dev(g, *bwd, tile, num_nodes, interpret)
    return d_h, None, None


_apply_op.defvjp(_apply_op_fwd, _apply_op_bwd)
