"""Tiled segment-matmul SpMM kernel vs the XLA segment path (interpret
mode on CPU; the same kernel compiles via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from falcon_ttdforgnns_tpu.ops.segment import spmm_sum
from falcon_ttdforgnns_tpu.ops.spmm_pallas import (SpmmTiles,
                                                   build_spmm_tiles,
                                                   spmm_sum_tiled)


def make_case(n, e, seed=0, weights=False, isolate_some=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    if isolate_some:  # leave some rows with no in-edges (empty blocks)
        dst = np.where(dst % 17 == 0, (dst + 1) % n, dst).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    w = rng.normal(size=e).astype(np.float32) if weights else None
    h = rng.normal(size=(n, 32)).astype(np.float32)
    return h, src, dst, w


@pytest.mark.parametrize("n,e", [(500, 4000), (1000, 500), (64, 64)])
def test_matches_segment_sum(n, e):
    h, src, dst, _ = make_case(n, e, seed=n + e)
    tiles = build_spmm_tiles(src, dst, n, block_rows=32, tile_edges=64)
    ref = spmm_sum(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), n,
                   sorted_dst=True)
    out = spmm_sum_tiled(jnp.asarray(h), tiles, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_weighted_edges():
    h, src, dst, w = make_case(300, 2500, seed=3, weights=True)
    tiles = build_spmm_tiles(src, dst, 300, edge_weight=w, block_rows=32,
                             tile_edges=128)
    ref = spmm_sum(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), 300,
                   edge_weight=jnp.asarray(w), sorted_dst=True)
    out = spmm_sum_tiled(jnp.asarray(h), tiles, 300)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_multi_chunk():
    """Chunk cuts at block boundaries: outputs are disjoint row ranges."""
    h, src, dst, _ = make_case(800, 6000, seed=7)
    tiles = build_spmm_tiles(src, dst, 800, block_rows=32, tile_edges=64,
                             max_chunk_tiles=8)
    assert len(tiles.chunks) > 3
    ref = spmm_sum(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), 800,
                   sorted_dst=True)
    out = spmm_sum_tiled(jnp.asarray(h), tiles, 800)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_hub_rows_accumulate():
    """A row with degree >> tile_edges spans many tiles of one block —
    VMEM revisiting accumulation must sum them all."""
    n = 64
    e = 5000
    rng = np.random.default_rng(11)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.full(e, 40, np.int32)       # every edge hits row 40
    h = rng.normal(size=(n, 16)).astype(np.float32)
    tiles = build_spmm_tiles(src, dst, n, block_rows=16, tile_edges=32)
    ref = np.zeros((n, 16), np.float32)
    np.add.at(ref, dst, h[src])
    out = spmm_sum_tiled(jnp.asarray(h), tiles, n)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_real_graph_shape():
    from falcon_ttdforgnns_tpu.graph import synthetic_dataset
    ds = synthetic_dataset(num_nodes=2000, avg_degree=8, num_classes=4,
                           feat_dim=16, seed=0)
    src, dst = ds.graph.to_coo()
    h = np.random.default_rng(0).normal(size=(2000, 16)).astype(np.float32)
    tiles = build_spmm_tiles(src.astype(np.int32), dst, 2000,
                             block_rows=64, tile_edges=256)
    ref = spmm_sum(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), 2000,
                   sorted_dst=True)
    out = spmm_sum_tiled(jnp.asarray(h), tiles, 2000)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def _run_uniform(h, tiles_u, n):
    from falcon_ttdforgnns_tpu.ops.spmm_pallas import spmm_sum_tiled_uniform
    return spmm_sum_tiled_uniform(
        jnp.asarray(h), jnp.asarray(tiles_u.src), jnp.asarray(tiles_u.dstl),
        jnp.asarray(tiles_u.w), jnp.asarray(tiles_u.blkl),
        jnp.asarray(tiles_u.first), jnp.asarray(tiles_u.blk0),
        tiles_u.num_blocks_padded, tiles_u.blocks_per_chunk,
        tiles_u.block_rows, tiles_u.tile_edges, n)


@pytest.mark.parametrize("n,e,tpc", [(500, 4000, 8), (1000, 500, 4),
                                     (800, 6000, 16)])
def test_uniform_chunks_match_segment_sum(n, e, tpc):
    """One-kernel-shape scan variant == XLA segment path (incl. the
    pad-tile block zero-definition + cross-chunk overwrite ordering)."""
    from falcon_ttdforgnns_tpu.ops.spmm_pallas import build_spmm_tiles_uniform
    h, src, dst, _ = make_case(n, e, seed=n + e + 1)
    tiles_u = build_spmm_tiles_uniform(src, dst, n, block_rows=32,
                                       tile_edges=64, tiles_per_chunk=tpc)
    ref = spmm_sum(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), n,
                   sorted_dst=True)
    out = _run_uniform(h, tiles_u, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_uniform_weighted_and_hub():
    from falcon_ttdforgnns_tpu.ops.spmm_pallas import build_spmm_tiles_uniform
    n, e = 128, 4000
    rng = np.random.default_rng(21)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.sort(np.where(rng.random(e) < 0.5, 77,
                           rng.integers(0, n, e)).astype(np.int32))
    w = rng.normal(size=e).astype(np.float32)
    h = rng.normal(size=(n, 32)).astype(np.float32)
    tiles_u = build_spmm_tiles_uniform(src, dst, n, edge_weight=w,
                                       block_rows=16, tile_edges=64,
                                       tiles_per_chunk=8)
    ref = spmm_sum(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), n,
                   edge_weight=jnp.asarray(w), sorted_dst=True)
    out = _run_uniform(h, tiles_u, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("n,e", [(500, 4000), (1000, 500)])
def test_tile_partials_match_segment_sum(n, e):
    """Static-map two-stage variant (per-tile partials + XLA block
    reduce) == XLA segment path."""
    from falcon_ttdforgnns_tpu.ops.spmm_pallas import (
        build_spmm_tiles, spmm_sum_tile_partials)
    h, src, dst, _ = make_case(n, e, seed=n * 3 + e)
    tiles = build_spmm_tiles(src, dst, n, block_rows=32, tile_edges=64)
    ref = spmm_sum(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst), n,
                   sorted_dst=True)
    out = spmm_sum_tile_partials(
        jnp.asarray(h), jnp.asarray(tiles.src), jnp.asarray(tiles.dstl),
        jnp.asarray(tiles.w), jnp.asarray(tiles.blk), tiles.num_blocks,
        tiles.block_rows, tiles.tile_edges, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
