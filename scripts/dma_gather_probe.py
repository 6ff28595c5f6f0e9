"""Manual-DMA random row gather probe (the last SpMM lever not ruled out).

The round-2 SpMM study measured every formulation paying the same
latency-bound HBM row gather (~25 GB/s effective at 1 KB rows,
docs/PERFORMANCE.md "the gather is the wall").  This probe asks whether a
Pallas kernel issuing K outstanding single-row async copies (HBM -> the
VMEM output block, `pltpu.make_async_copy`) beats XLA's gather at the
same access pattern — i.e. whether the wall is DMA *concurrency* (fixable
in-kernel) or descriptor issue rate / DRAM row latency (not fixable).

Env knobs: PROBE_N, PROBE_D, PROBE_R (rows gathered/pass), PROBE_K
(chained passes), OUT_K (outstanding DMAs), PROBE_C (rows per grid step).

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
OUT_K = int(os.environ.get("OUT_K", "8"))
C = int(os.environ.get("PROBE_C", "2048"))


def make_gather(n_rows):
    assert R % C == 0 and C >= OUT_K

    def kern(idx_ref, h_ref, o_ref, sems):
        c = pl.program_id(0)
        base = c * C

        def dma(i):
            # descriptor for the copy of output slot i (also used to
            # reconstruct the wait — sizes are identical across slots)
            return pltpu.make_async_copy(
                h_ref.at[pl.ds(idx_ref[base + i], 1), :],
                o_ref.at[pl.ds(i, 1), :],
                sems.at[jax.lax.rem(i, OUT_K)])

        def body(i, _):
            @pl.when(i >= OUT_K)
            def _():
                dma(i - OUT_K).wait()
            dma(i).start()
            return 0

        jax.lax.fori_loop(0, C, body, 0)

        def drain(i, _):
            dma(C - OUT_K + i).wait()
            return 0

        jax.lax.fori_loop(0, OUT_K, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // C,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((C, D), lambda c, idx: (c, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((OUT_K,))],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )


def main():
    print(f"backend={jax.default_backend()} N={N} D={D} R={R} "
          f"outstanding={OUT_K} C={C}", flush=True)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=R), jnp.int32)
    key = jax.random.PRNGKey(0)
    h = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.float32))(key)

    gather = make_gather(N)
    gb = R * D * 4 / 1e9

    def chain(fn):
        @jax.jit
        def loop(h, idx):
            def body(i, carry):
                s, off = carry
                out = fn(h, (idx + off) % N)
                return (s + out[0, 0].astype(jnp.float32), off + 1)
            s, _ = jax.lax.fori_loop(0, K, body,
                                     (jnp.float32(0), jnp.int32(0)))
            return s
        return loop

    for name, fn in (("xla take", lambda h, i: jnp.take(h, i, axis=0)),
                     ("manual DMA", lambda h, i: gather(i, h))):
        loop = chain(fn)
        t0 = time.time()
        chk = float(loop(h, idx))
        comp = time.time() - t0
        t0 = time.time()
        chk = float(loop(h, idx))
        per = (time.time() - t0) / K
        print(f"{name:12s} {per*1e3:7.1f} ms/pass = {gb/per:6.1f} GB/s "
              f"(compile+1st {comp:.0f}s, chk {chk:.3e})", flush=True)


if __name__ == "__main__":
    main()
