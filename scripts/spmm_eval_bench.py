"""Products-scale full-graph SpMM pass comparison on the real TPU.

Variants:
  chunked-f32   spmm_sum_chunked, f32 h (round-1 eval path)
  chunked-bf16  bf16 gather, f32 accumulate
  tiled-uniform one-hot MXU Pallas kernel (spmm_sum_tiled_uniform)
each measured on the raw edge order AND after RCM reorder (gather-locality
effect — the reorder thesis, SURVEY §2.2).

Timing: K data-dependent iterations inside one jitted fori_loop (the axon
relay returns from block_until_ready early; see docs/PERFORMANCE.md).
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np

import jax
import jax.numpy as jnp

from falcon_ttdforgnns_tpu.graph import synthetic_dataset
from falcon_ttdforgnns_tpu.graph.reorder import rcmk_reorder
from falcon_ttdforgnns_tpu.ops.segment import spmm_sum_chunked

N = int(os.environ.get("PROBE_N", "2449029"))
D = int(os.environ.get("PROBE_D", "256"))
DEG = int(os.environ.get("PROBE_DEG", "25"))
K = int(os.environ.get("PROBE_K", "4"))


def timed(name, fn, *args):
    # float() forces a host readback — the relay's block_until_ready can
    # return before execution finishes (docs/PERFORMANCE.md methodology)
    t0 = time.time()
    chk = float(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    chk = float(fn(*args))
    per = (time.time() - t0) / K
    print(f"{name}: {per*1e3:.0f} ms/pass (compile+1st {compile_s:.0f}s, "
          f"chk {chk:.3e})", flush=True)


def run_chunked(src, dst, h, tag, dtype):
    hh = h.astype(dtype)

    @jax.jit
    def loop(h, src, dst):
        def body(i, carry):
            s, off = carry
            out = spmm_sum_chunked(h, (src + off) % N, dst, N,
                                   chunk=1 << 22, sorted_dst=True)
            return (s + out.sum().astype(jnp.float32), off + 1)
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), jnp.int32(0)))
        return s

    timed(f"chunked-{dtype.__name__}-{tag}", loop, hh, src, dst)


def run_tiled(src_np, dst_np, h, tag):
    from falcon_ttdforgnns_tpu.ops.spmm_pallas import (
        auto_tile_edges, build_spmm_tiles_uniform, spmm_sum_tiled_uniform)
    e_t = auto_tile_edges(len(src_np), N)
    tpc = max(256, (1 << 30) // (e_t * 256 * 2))
    t0 = time.time()
    tu = build_spmm_tiles_uniform(src_np, dst_np, N, tile_edges=e_t,
                                  tiles_per_chunk=tpc)
    print(f"tiled-{tag}: host tiling {time.time()-t0:.0f}s E_t={e_t} "
          f"C={tu.src.shape[0]} TC={tu.blkl.shape[1]}", flush=True)
    args = tuple(jnp.asarray(a) for a in
                 (tu.src, tu.dstl, tu.w, tu.blkl, tu.first, tu.blk0))

    @jax.jit
    def loop(h, src, dstl, w, blkl, first, blk0):
        def body(i, carry):
            s, off = carry
            out = spmm_sum_tiled_uniform(
                h, (src + off) % N, dstl, w, blkl, first, blk0,
                tu.num_blocks_padded, tu.blocks_per_chunk,
                tu.block_rows, tu.tile_edges, N)
            return (s + out.sum(), off + 1)
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), jnp.int32(0)))
        return s

    timed(f"tiled-uniform-{tag}", loop, h, *args)


def run_blocked(src_np, dst_np, h, tag, dtypes=(jnp.float32, jnp.bfloat16)):
    # HISTORICAL: dies in Mosaic on real TPUs ("Multiple source vregs
    # along gather dimension") — the run that established the negative
    # result (docs/PERFORMANCE.md "window-blocked SpMM: measured dead
    # end").  Runnable off-TPU in interpret mode only.
    from falcon_ttdforgnns_tpu.ops.spmm_blocked import (
        build_window_tiles, check_blocked_supported, chunk_tiles_host,
        spmm_sum_blocked_dev)
    try:
        check_blocked_supported()
    except Exception as e:  # degrade gracefully instead of dying in Mosaic
        print(f"blocked-{tag}: SKIPPED ({e})", flush=True)
        return
    T, CT = 4096, 512
    t0 = time.time()
    ts = build_window_tiles(src_np.astype(np.int64), dst_np.astype(np.int64),
                            N, tile=T, dst_buckets=16, chunk_tiles=CT)
    print(f"blocked-{tag}: host tiling {time.time()-t0:.0f}s "
          f"tiles={ts.win.shape[0]} "
          f"pad={ts.win.shape[0]*T/len(src_np):.2f}x", flush=True)
    win2, idx2, dst2, w2 = (jnp.asarray(a) for a in chunk_tiles_host(ts, CT))

    @jax.jit
    def loop(h, win2, idx2, dst2, w2):
        def body(i, carry):
            s, hcur = carry
            out = spmm_sum_blocked_dev(hcur, win2, idx2, dst2, w2, T, N)
            # data dependence: next pass's h depends on this pass's sum
            return (s + out.sum().astype(jnp.float32),
                    hcur + (s * 1e-30).astype(hcur.dtype))
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), h))
        return s

    for dtype in dtypes:  # one tiling serves every dtype
        timed(f"blocked-{dtype.__name__}-{tag}", loop, h.astype(dtype),
              win2, idx2, dst2, w2)


def main():
    print("backend:", jax.default_backend(), flush=True)
    ds = synthetic_dataset(num_nodes=N, avg_degree=DEG, num_classes=47,
                           feat_dim=100, seed=0)
    g = ds.graph
    deg = np.diff(g.indptr)
    dst_np = np.repeat(np.arange(N, dtype=np.int32), deg)
    src_np = g.indices.astype(np.int32)
    print(f"E={len(src_np)}", flush=True)

    only = os.environ.get("ONLY", "chunked,blocked,tiled").split(",")
    if "chunked" in only or "tiled" in only:  # RCM costs minutes at 2.45M nodes
        perm = rcmk_reorder(g)
        order = np.argsort(perm[dst_np], kind="stable")
        src_r = perm[src_np][order].astype(np.int32)
        dst_r = perm[dst_np][order].astype(np.int32)

    key = jax.random.PRNGKey(0)
    h = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.float32))(key)
    h = jax.block_until_ready(h)

    # ONLY=blocked (or chunked/tiled, comma-separated) focuses the run —
    # the chunked/tiled numbers were measured pre-outage (PERFORMANCE.md);
    # the window-blocked kernel is the unmeasured one.
    if "chunked" in only:
        for tag, (s_np, d_np) in (("raw", (src_np, dst_np)),
                                  ("rcm", (src_r, dst_r))):
            s, d = jnp.asarray(s_np), jnp.asarray(d_np)
            run_chunked(s, d, h, tag, jnp.float32)
            run_chunked(s, d, h, tag, jnp.bfloat16)
            del s, d
    elif "anchor" in only:  # one chunked-f32 pass as the comparison anchor
        s, d = jnp.asarray(src_np), jnp.asarray(dst_np)
        run_chunked(s, d, h, "raw", jnp.float32)
        del s, d
    if "blocked" in only:
        run_blocked(src_np, dst_np, h, "raw")
    if "tiled" in only:
        run_tiled(src_np, dst_np, h, "raw")
        run_tiled(src_r, dst_r, h, "rcm")


if __name__ == "__main__":
    main()
