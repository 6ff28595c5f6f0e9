"""Headline benchmark — run on real TPU hardware by the driver.

Replicates the reference's embedding-lookup microbenchmark
(`sage_profiler.py:246-500` ``TestTTEmbeddingBag`` with the defaults of
`tt_utils.py:49-59`: batch 1024, ogbn-products TT config p=(125,140,140),
q=(4,5,5), ranks=(16,16), N=2,449,029, D=100) and compares against the
published Efficient_TT number: **3.8593 ms** per lookup
(`/root/reference/README.md:106`, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1 means faster than the reference kernel.
"""

import json
import time

import numpy as np

BASELINE_EFFI_MS = 3.8593  # Efficient_TT lookup, RTX GPU (README.md:106)


def main():
    import jax
    import jax.numpy as jnp
    from falcon_ttdforgnns_tpu.ops import make_tt_shapes, tt_init
    from falcon_ttdforgnns_tpu.ops.tt_lookup import tt_lookup_grouped, tt_lookup_gather

    shapes = make_tt_shapes(2_449_029, 100, (16, 16), (125, 140, 140), (4, 5, 5))
    cores_np = tt_init.init_tt_cores(shapes, "normal", seed=0)
    cores = tuple(jnp.asarray(c) for c in cores_np)

    batch = 1024
    rng = np.random.default_rng(0)
    # skewed access pattern like sampled GNN batches (hot head from RMAT-ish law)
    idx_np = (rng.zipf(1.3, size=batch) % shapes.num_embeddings).astype(np.int32)
    idx = jnp.asarray(idx_np)

    results = {}
    for name, fn in [("grouped", tt_lookup_grouped), ("gather", tt_lookup_gather)]:
        f = jax.jit(lambda c, i, fn=fn: fn(shapes, c, i))
        f(cores, idx).block_until_ready()  # compile
        for _ in range(10):  # warmup (gpu_timing semantics, utils.py:196-220)
            f(cores, idx).block_until_ready()
        reps = 100
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(cores, idx)
        out.block_until_ready()
        results[name] = (time.perf_counter() - t0) / reps * 1e3

    best = min(results.values())
    print(json.dumps({
        "metric": "tt_embedding_lookup_batch1024_products_ms",
        "value": round(best, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_EFFI_MS / best, 2),
    }))


if __name__ == "__main__":
    main()
