"""SpMM probe 3: which in-VMEM gather forms does Mosaic accept, and how
fast are they?  Informs the Pallas SpMM kernel design."""

import os, sys, time
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 256
S = 4096          # VMEM-resident source tile rows


def try_kernel(name, make_call, check):
    try:
        out = make_call()
        ok = check(np.asarray(out))
        print(f"{name}: COMPILES correct={ok}", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAILS ({type(e).__name__}: {str(e)[:160]})",
              flush=True)
        return False


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32))
    idx_full = jnp.asarray(rng.integers(0, S, S).astype(np.int32))
    T = 2048
    idx_small = jnp.asarray(rng.integers(0, S, T).astype(np.int32))
    href = np.asarray(h)

    # A: take_along_axis with (S, D) broadcast indices
    def a():
        def kernel(idx_ref, h_ref, out_ref):
            m = jnp.broadcast_to(idx_ref[:][:, None], (S, D))
            out_ref[:, :] = jnp.take_along_axis(h_ref[:, :], m, axis=0)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, D), jnp.float32),
        )(idx_full, h)
    try_kernel("A take_along_axis (S,D)", a,
               lambda o: np.allclose(o, href[np.asarray(idx_full)]))

    # B: take_along_axis with (T, D) indices, T < S
    def b():
        def kernel(idx_ref, h_ref, out_ref):
            m = jnp.broadcast_to(idx_ref[:][:, None], (T, D))
            out_ref[:, :] = jnp.take_along_axis(h_ref[:, :], m, axis=0)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
        )(idx_small, h)
    try_kernel("B take_along_axis (T,D) T<S", b,
               lambda o: np.allclose(o, href[np.asarray(idx_small)]))

    # C: fori_loop per-row dynamic-slice gather
    def c():
        def kernel(idx_ref, h_ref, out_ref):
            def body(i, _):
                out_ref[i, :] = h_ref[idx_ref[i], :]
                return 0
            jax.lax.fori_loop(0, T, body, 0)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
        )(idx_small, h)
    try_kernel("C fori_loop row gather", c,
               lambda o: np.allclose(o, href[np.asarray(idx_small)]))

    # timing for whichever compiled: A at scale (grid of G tiles)
    G = 128

    def kernel_a(idx_ref, h_ref, out_ref):
        m = jnp.broadcast_to(idx_ref[:][:, None], (S, D))
        out_ref[:, :] = jnp.take_along_axis(h_ref[:, :], m, axis=0)

    idx_big = jnp.asarray(rng.integers(0, S, (G * S,)).astype(np.int32))

    @jax.jit
    def run_a(off, idx_big, h):
        return pl.pallas_call(
            kernel_a,
            grid=(G,),
            in_specs=[pl.BlockSpec((S,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((S, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G * S, D), jnp.float32),
        )((idx_big + off) % S, h).sum()

    try:
        float(run_a(jnp.int32(0), idx_big, h))
        t0 = time.perf_counter()
        float(run_a(jnp.int32(1), idx_big, h))
        dt = time.perf_counter() - t0
        rows = G * S
        print(f"A rate: {rows/dt/1e6:.0f} M rows/s "
              f"({rows*D*4/dt/1e9:.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"A timing failed: {str(e)[:120]}", flush=True)

    # XLA reference rate at the same shape (gather from a 4096-row table)
    @jax.jit
    def run_x(off, idx_big, h):
        return jnp.take(h, (idx_big + off) % S, axis=0).sum()
    float(run_x(jnp.int32(0), idx_big, h))
    t0 = time.perf_counter()
    float(run_x(jnp.int32(1), idx_big, h))
    dt = time.perf_counter() - t0
    rows = G * S
    print(f"XLA small-table gather rate: {rows/dt/1e6:.0f} M rows/s "
          f"({rows*D*4/dt/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
