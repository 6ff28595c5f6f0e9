"""TT Pallas kernel micro-bench at products training shapes (918K ids =
one batch-1024 fanout-(5,10,15) step's lookup traffic).

Methodology: K data-dependent iterations in one jitted fori_loop, arrays
passed as jit arguments (closures would bake GBs of constants), indices
rotated per iteration.  Run on the real chip; nothing else may hold it.
"""

import os, sys, time
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import numpy as np
import jax
import jax.numpy as jnp

from falcon_ttdforgnns_tpu.ops import make_tt_shapes, tt_init
from falcon_ttdforgnns_tpu.ops.tt_pallas import (tt_lookup_pallas,
                                                 tt_grads_pallas,
                                                 tt_fused_sgd_pallas,
                                                 tt_fused_adagrad_pallas,
                                                 tt_fused_adam_pallas)

K = int(os.environ.get("PROBE_K", "32"))
B = int(os.environ.get("PROBE_B", str(918_528)))  # multiple of block
BLK = int(os.environ.get("PROBE_BLOCK", "1024"))
# products (default) | papers (111M ids, p=400/500/600, q=4,4,8 — the
# run_script.sh final-papers config) | aligned (MXU-128-aligned p-shapes)
CFG = os.environ.get("PROBE_CFG", "products")
SHAPES = {
    "products": (2_449_029, 100, (16, 16), (125, 140, 140), (5, 5, 4)),
    "papers": (111_059_956, 128, (16, 16), (400, 500, 600), (4, 4, 8)),
    "aligned": (2_449_029, 100, (16, 16), (128, 128, 150), (4, 5, 5))  # aligned study kept as measured,
}[CFG]


def timed(name, loop, *args):
    float(loop(jnp.int32(0), *args))  # compile + warm; float() forces the
    # host readback — the relay's block_until_ready can return early
    t0 = time.perf_counter()
    float(loop(jnp.int32(1), *args))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:24s} {dt*1e3:9.3f} ms / {B} ids", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()} B={B} K={K} block={BLK} cfg={CFG}",
          flush=True)
    shapes = make_tt_shapes(*SHAPES)
    cores = tuple(jnp.asarray(c) for c in
                  tt_init.init_tt_cores(shapes, "normal", seed=0))
    Nn = shapes.num_embeddings

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (B,), 0, Nn, jnp.int32)
        g = jax.random.normal(k2, (B, shapes.embedding_dim), jnp.float32)
        return idx, g
    idx, g = jax.block_until_ready(gen(jax.random.PRNGKey(0)))
    print("data generated", flush=True)

    @jax.jit
    def fwd_loop(off0, cores, idx):
        def body(i, carry):
            s, off = carry
            out = tt_lookup_pallas(shapes, cores, (idx + off) % Nn, block=BLK)
            return (s + out.sum(), off + 1)
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), off0))
        return s

    @jax.jit
    def bwd_loop(off0, cores, idx, g):
        def body(i, carry):
            s, off = carry
            grads = tt_grads_pallas(shapes, cores, (idx + off) % Nn, g, block=BLK)
            return (s + sum(x.sum() for x in grads), off + 1)
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), off0))
        return s

    @jax.jit
    def sgd_loop(off0, cores, idx, g):
        def body(i, carry):
            cores, off = carry
            cores = tt_fused_sgd_pallas(shapes, cores, (idx + off) % Nn, g,
                                        lr=0.01, block=BLK)
            return (cores, off + 1)
        cores, _ = jax.lax.fori_loop(0, K, body, (cores, off0))
        return cores[0].sum()

    @jax.jit
    def adagrad_loop(off0, cores, accs, idx, g):
        def body(i, carry):
            cores, accs, off = carry
            cores, accs = tt_fused_adagrad_pallas(
                shapes, cores, accs, (idx + off) % Nn, g, lr=0.01, block=BLK)
            return (cores, accs, off + 1)
        cores, _, _ = jax.lax.fori_loop(0, K, body, (cores, accs, off0))
        return cores[0].sum()

    @jax.jit
    def adam_loop(off0, cores, ms, vs, idx, g):
        def body(i, carry):
            cores, ms, vs, off = carry
            # bias corrections for a representative mid-training step
            scal = jnp.asarray([0.01, 1.0, 1.0], jnp.float32)
            cores, ms, vs = tt_fused_adam_pallas(
                shapes, cores, ms, vs, (idx + off) % Nn, g, scal, block=BLK)
            return (cores, ms, vs, off + 1)
        cores, _, _, _ = jax.lax.fori_loop(0, K, body, (cores, ms, vs, off0))
        return cores[0].sum()

    timed("pallas forward", fwd_loop, cores, idx)
    timed("pallas backward", bwd_loop, cores, idx, g)
    timed("pallas fused-sgd", sgd_loop, cores, idx, g)
    zeros = tuple(jnp.zeros_like(c) for c in cores)
    timed("pallas fused-adagrad", adagrad_loop, cores, zeros, idx, g)
    timed("pallas fused-adam", adam_loop, cores, zeros, zeros, idx, g)


if __name__ == "__main__":
    main()
