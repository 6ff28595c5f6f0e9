"""Sorted-emission grouped TT lookup vs the fused Pallas kernel.

Round-1/2 finding: the Efficient_TT grouped (prefix-dedup) lookup loses on
TPU because (a) `jnp.unique` is a device sort and (b) static shapes force
the unique-prefix chain to run over all B slots anyway.  The sorted-
emission design removes both: the HOST sorts the batch (overlapped with
device compute via prefetch), dedup becomes a compare+cumsum, and the
prefix chain runs over a static `ucap = prod(p[:-1])` capacity (17,500 for
products vs B=918K — the actual FLOP lever).

This bench measures, at products training shapes (918K ids/step):
  - pallas fused forward (the current default — the bar to beat)
  - grouped, device sort (the round-1 loser, for reference)
  - grouped sorted + ucap, forward only (input pre-sorted on host)
  - grouped sorted + ucap + unsort gather (restoring positional order —
    what a trainer integration would actually pay)

Methodology: chained fori_loop (see kernel_bench.py).  Run on the real
chip; nothing else may hold it.
"""

import os, sys, time
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import numpy as np
import jax
import jax.numpy as jnp

from falcon_ttdforgnns_tpu.ops import make_tt_shapes, tt_init
from falcon_ttdforgnns_tpu.ops.tt_lookup import (
    tt_lookup_grouped, tt_lookup_grouped_sorted, grouped_ucap)
from falcon_ttdforgnns_tpu.ops.tt_pallas import tt_lookup_pallas

K = int(os.environ.get("PROBE_K", "32"))
B = int(os.environ.get("PROBE_B", str(918_528)))
BLK = int(os.environ.get("PROBE_BLOCK", "1024"))
# unique ids per batch — a products batch-1024 [5,10,15] step touches
# ~300-500K unique of 938K sampled (duplication from the fanout tree +
# hot hubs); sweepable.
UNIQ = int(os.environ.get("PROBE_UNIQ", str(300_000)))


def timed(name, loop, *args):
    float(loop(jnp.int32(0), *args))
    t0 = time.perf_counter()
    float(loop(jnp.int32(1), *args))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:34s} {dt*1e3:9.3f} ms / {B} ids", flush=True)
    return dt


def main():
    shapes = make_tt_shapes(2_449_029, 100, (16, 16), (125, 140, 140), (5, 5, 4))
    cores = tuple(jnp.asarray(c) for c in
                  tt_init.init_tt_cores(shapes, "normal", seed=0))
    cap = grouped_ucap(shapes)
    print(f"backend={jax.default_backend()} B={B} uniq={UNIQ} ucap={cap}",
          flush=True)

    rng = np.random.default_rng(0)
    uniq = rng.choice(shapes.num_embeddings, size=UNIQ, replace=False)
    idx_np = uniq[rng.integers(0, UNIQ, size=B)]
    order = np.argsort(idx_np, kind="stable")
    unsort = np.empty(B, dtype=np.int32)
    unsort[order] = np.arange(B, dtype=np.int32)
    idx = jnp.asarray(idx_np, jnp.int32)
    idx_sorted = jnp.asarray(idx_np[order], jnp.int32)
    unsort = jnp.asarray(unsort)
    groups = len(np.unique(idx_np // shapes.p_last))
    print(f"unique prefix groups in batch: {groups} "
          f"(dedup {B/groups:.0f}x)", flush=True)

    def chain(fn):
        @jax.jit
        def loop(off0, cores, idx, *extra):
            def body(i, carry):
                s, off = carry
                out = fn(cores, (idx + off) % shapes.num_embeddings, *extra)
                return (s + out.sum(), off + 1)
            s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), off0))
            return s
        return loop

    # NOTE: rotating sorted indices by +off preserves sortedness except at
    # the single wrap point — one extra run, absorbed by ucap slack.
    timed("pallas fused fwd",
          chain(lambda c, i: tt_lookup_pallas(shapes, c, i, block=BLK)),
          cores, idx)
    if B <= (1 << 17):
        # the device-sort path materializes a padded (B, r, q, r') HBM
        # intermediate — 8x tile-padding inflation OOMs 16 GB at 918K ids
        # (docs/PERFORMANCE.md); its round-1 loss was measured at 65K
        timed("grouped (device sort)",
              chain(lambda c, i: tt_lookup_grouped(shapes, c, i)), cores, idx)
    else:
        print(f"grouped (device sort): skipped at B={B} (padded HBM "
              f"intermediate OOMs; measured loser at 65K — 20 ms)",
              flush=True)
    timed("grouped sorted+ucap",
          chain(lambda c, i: tt_lookup_grouped_sorted(shapes, c, i, ucap=cap)),
          cores, idx_sorted)
    timed("grouped sorted+ucap+unsort",
          chain(lambda c, i, u: jnp.take(
              tt_lookup_grouped_sorted(shapes, c, i, ucap=cap), u, axis=0)),
          cores, idx_sorted, unsort)


if __name__ == "__main__":
    main()
