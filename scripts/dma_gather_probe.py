"""Manual-DMA random gather probe (the last SpMM lever not ruled out).

The round-2 SpMM study measured every formulation paying the same HBM row
gather; this probe asks what the hardware's random-read speed-of-light
actually is, and whether XLA's gather already achieves it.

Hardware constraint discovered on the way: Mosaic DMA slices must align
to the layout tile — (8,128) for 2-D f32 (a 1-row slice is rejected:
"must be aligned to tiling (8)"), (1024,) for flat 1-D f32.  So the
smallest manually-DMA-able random unit is a 4 KB aligned segment; the
probe therefore measures:

  xla take 1KB     — the app's actual access (D=256 f32 rows)
  xla take 4KB     — XLA gather at the hardware granularity
  DMA 4KB (K=...)  — manual async-copy pipeline, K outstanding copies

Env knobs: PROBE_N, PROBE_D, PROBE_R (1KB rows per pass), PROBE_K
(chained passes), OUT_KS (comma list of outstanding-DMA depths),
PROBE_C (segments per grid step).

Methodology: chained fori_loop with a data-dependent index rotation per
pass (the axon relay returns from block_until_ready early).
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("PROBE_N", "2449029"))
D = int(os.environ.get("PROBE_D", "256"))
R = int(os.environ.get("PROBE_R", str(1 << 21)))
K = int(os.environ.get("PROBE_K", "4"))
OUT_KS = tuple(int(x) for x in os.environ.get("OUT_KS", "8,32").split(","))
C = int(os.environ.get("PROBE_C", "2048"))
SEG = 1024  # fp32 elements per DMA = one 1-D layout tile = 4 KB


def make_gather(n_seg, r_seg, out_k):
    """Gather r_seg random SEG-float segments from a flat (n_seg*SEG,)
    HBM buffer via a pipeline of out_k outstanding async copies."""
    assert r_seg % C == 0 and C >= out_k

    def kern(idx_ref, h_ref, o_ref, sems):
        # idx_ref is a per-grid-step (C,) SMEM block (prefetching the whole
        # index array overflows the 1 MB SMEM at products scale)

        def dma(i):
            # descriptor for the copy of output slot i (also used to
            # reconstruct the wait — sizes are identical across slots)
            return pltpu.make_async_copy(
                h_ref.at[pl.ds(idx_ref[i] * SEG, SEG)],
                o_ref.at[pl.ds(i * SEG, SEG)],
                sems.at[jax.lax.rem(i, out_k)])

        def body(i, _):
            @pl.when(i >= out_k)
            def _():
                dma(i - out_k).wait()
            dma(i).start()
            return 0

        jax.lax.fori_loop(0, C, body, 0)

        def drain(i, _):
            dma(C - out_k + i).wait()
            return 0

        jax.lax.fori_loop(0, out_k, drain, 0)

    return pl.pallas_call(
        kern,
        grid=(r_seg // C,),
        in_specs=[
            pl.BlockSpec((C,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((C * SEG,), lambda c: (c,)),
        out_shape=jax.ShapeDtypeStruct((r_seg * SEG,), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((out_k,))],
        interpret=jax.default_backend() != "tpu",
    )


def chain(fn, n_idx):
    @jax.jit
    def loop(h, idx):
        def body(i, carry):
            s, off = carry
            out = fn(h, (idx + off) % n_idx)
            # Reduce a strided sample spanning the whole output so XLA's
            # simplifier can't fold slice-of-gather into a 1-element gather
            # and DCE the measured work (a single [0] element would allow
            # exactly that).
            chk = out.reshape(-1)[::4096].astype(jnp.float32).sum()
            return (s + chk, off + 1)
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), jnp.int32(0)))
        return s
    return loop


def timed(name, loop, gb, *args):
    t0 = time.time()
    chk = float(loop(*args))
    comp = time.time() - t0
    t0 = time.time()
    chk = float(loop(*args))
    per = (time.time() - t0) / K
    print(f"{name:16s} {per*1e3:7.1f} ms/pass = {gb/per:6.1f} GB/s "
          f"(compile+1st {comp:.0f}s, chk {chk:.3e})", flush=True)


def main():
    n_seg = N * D // SEG
    r_seg = R * D // SEG          # same bytes per pass as the 1KB run
    gb = R * D * 4 / 1e9
    print(f"backend={jax.default_backend()} N={N} D={D} R={R} "
          f"segments={r_seg}x4KB C={C}", flush=True)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=R), jnp.int32)
    sidx = jnp.asarray(rng.integers(0, n_seg, size=r_seg), jnp.int32)
    key = jax.random.PRNGKey(0)
    h = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.float32))(key)
    # reshapes OUTSIDE the timed region (relayout copies); N*D need not
    # divide SEG — drop the tail
    h1d = jax.block_until_ready(jax.jit(lambda x: x.reshape(-1))(h))
    h4k = jax.block_until_ready(
        jax.jit(lambda x: x[:n_seg * SEG].reshape(n_seg, SEG))(h1d))

    timed("xla take 1KB", chain(lambda h_, i: jnp.take(h_, i, axis=0), N),
          gb, h, idx)
    timed("xla take 4KB",
          chain(lambda h_, i: jnp.take(h_, i, axis=0), n_seg), gb, h4k, sidx)
    for out_k in OUT_KS:
        g = make_gather(n_seg, r_seg, out_k)
        timed(f"DMA 4KB (K={out_k})",
              chain(lambda h_, i, g=g: g(i, h_), n_seg), gb, h1d, sidx)


if __name__ == "__main__":
    main()
