"""SpMM probe round 2: (a) can Mosaic gather rows from VMEM dynamically?
(b) products-scale (123.7M edge) full-layer aggregation cost with the
current chunked path vs variants.  Run alone on the chip."""

import os, sys, time
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D = 2_449_029, 256


def t_read(name, loop, *args):
    float(loop(jnp.int32(0), *args))
    t0 = time.perf_counter()
    float(loop(jnp.int32(1), *args))
    dt = time.perf_counter() - t0
    print(f"{name:34s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def test_vmem_gather():
    """Pallas kernel: gather 2048 rows from a VMEM-resident (4096, 256)
    tile by dynamic indices."""
    S, T = 4096, 2048

    def kernel(idx_ref, h_ref, out_ref):
        out_ref[:, :] = jnp.take(h_ref[:, :], idx_ref[:], axis=0)

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, S, T).astype(np.int32))
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
        )(idx, h)
        ref = np.asarray(h)[np.asarray(idx)]
        ok = np.allclose(np.asarray(out), ref)
        print(f"vmem dynamic gather: COMPILES, correct={ok}", flush=True)
        # time it at scale: grid over many tiles
        G = 64

        def kernel_g(idx_ref, h_ref, out_ref):
            out_ref[:, :] = jnp.take(h_ref[:, :], idx_ref[:], axis=0)

        idx_big = jnp.asarray(rng.integers(0, S, (G * T,)).astype(np.int32))

        @jax.jit
        def run(off, idx_big, h):
            return pl.pallas_call(
                kernel_g,
                grid=(G,),
                in_specs=[pl.BlockSpec((T,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((T, D), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((G * T, D), jnp.float32),
            )((idx_big + off) % S, h).sum()

        float(run(jnp.int32(0), idx_big, h))
        t0 = time.perf_counter()
        float(run(jnp.int32(1), idx_big, h))
        dt = time.perf_counter() - t0
        rows = G * T
        print(f"vmem gather rate: {rows/dt/1e6:.0f} M rows/s "
              f"({rows*D*4/dt/1e9:.0f} GB/s)", flush=True)
        return True
    except Exception as e:
        print(f"vmem dynamic gather: FAILS ({type(e).__name__}: "
              f"{str(e)[:200]})", flush=True)
        return False


def test_products_layer():
    """One full aggregation pass at products scale with the current
    chunked path, for two chunk sizes."""
    from falcon_ttdforgnns_tpu.ops.segment import spmm_sum_chunked
    E = 123_718_280

    @jax.jit
    def gen(key):
        k1, k2, k3 = jax.random.split(key, 3)
        h = jax.random.normal(k1, (N, D), jnp.float32)
        src = jax.random.randint(k2, (E,), 0, N, jnp.int32)
        dst = jnp.sort(jax.random.randint(k3, (E,), 0, N, jnp.int32))
        return h, src, dst
    h, src, dst = jax.block_until_ready(gen(jax.random.PRNGKey(0)))
    print("products-scale data generated", flush=True)

    for chunk in (1 << 22, 1 << 23):
        @jax.jit
        def run(off, h, src, dst, chunk=chunk):
            return spmm_sum_chunked(h, (src + off) % N, dst, N,
                                    chunk=chunk, sorted_dst=True).sum()
        t_read(f"spmm_sum_chunked chunk={chunk>>20}M", run, h, src, dst)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    test_vmem_gather()
    test_products_layer()
