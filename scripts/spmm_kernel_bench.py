"""Tiled segment-matmul SpMM kernel vs XLA paths on the real chip.
E=4M dst-sorted edges, N=2.45M, D=256 (products full-graph shapes)."""

import os, sys, time
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import numpy as np
import jax
import jax.numpy as jnp

from falcon_ttdforgnns_tpu.ops.spmm_pallas import build_spmm_tiles, spmm_sum_tiled

N, D = 409_600, 256   # avg degree ~20: products-like block density
E = 8_000_000
K = int(os.environ.get("PROBE_K", "8"))


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E).astype(np.int32)
    dst = np.sort(rng.integers(0, N, E).astype(np.int32))

    for NR, E_t in ((128, 1024), (128, 2048), (256, 2048)):
        t0 = time.time()
        tiles = build_spmm_tiles(src, dst, N, block_rows=NR, tile_edges=E_t,
                                 max_chunk_tiles=2048)
        T = len(tiles.blk)
        print(f"NR={NR} E_t={E_t}: T={T} tiles, pad factor "
              f"{T*E_t/E:.2f}, host tiling {time.time()-t0:.1f}s",
              flush=True)

        @jax.jit
        def gen(key):
            return jax.random.normal(key, (N, D), jnp.float32)
        h = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

        from falcon_ttdforgnns_tpu.ops.spmm_pallas import spmm_sum_tile_partials
        nb = tiles.num_blocks

        @jax.jit
        def loop(off0, h, srcj, dstlj, wj, blkj, firstj):
            def body(i, carry):
                s, off = carry
                out = spmm_sum_tile_partials(
                    h, (srcj + off) % N, dstlj, wj, blkj, nb, NR, E_t, N,
                    interpret=False)
                return (s + out.sum(), off + 1)
            s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), off0))
            return s

        args = (h, jnp.asarray(tiles.src), jnp.asarray(tiles.dstl),
                jnp.asarray(tiles.w), jnp.asarray(tiles.blk),
                jnp.asarray(tiles.first))
        float(loop(jnp.int32(0), *args))
        t0 = time.perf_counter()
        float(loop(jnp.int32(1), *args))
        dt = (time.perf_counter() - t0) / K
        print(f"  gather+tiled-mm: {dt*1e3:.2f} ms  "
              f"({E/dt/1e6:.0f} M edges/s)", flush=True)

    # XLA reference at the same shapes
    @jax.jit
    def xla_loop(off0, h, srcj, dstj):
        def body(i, carry):
            s, off = carry
            out = jax.ops.segment_sum(
                jnp.take(h, (srcj + off) % N, axis=0), dstj,
                num_segments=N, indices_are_sorted=True)
            return (s + out.sum(), off + 1)
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), off0))
        return s

    h = jax.block_until_ready(jax.jit(
        lambda k: jax.random.normal(k, (N, D), jnp.float32))(
            jax.random.PRNGKey(0)))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    float(xla_loop(jnp.int32(0), h, srcj, dstj))
    t0 = time.perf_counter()
    float(xla_loop(jnp.int32(1), h, srcj, dstj))
    dt = (time.perf_counter() - t0) / K
    print(f"XLA gather+segsum: {dt*1e3:.2f} ms ({E/dt/1e6:.0f} M edges/s)",
          flush=True)


if __name__ == "__main__":
    main()
