"""Headline benchmark — run on real TPU hardware by the driver.

Measures the TT-embedding lookup in the products configuration of the
reference's microbenchmark (`sage_profiler.py:246-500` with
`tt_utils.py:49-59` defaults: p=(125,140,140), q=(5,5,4), ranks=(16,16),
N=2,449,029, D=100) against the published Efficient_TT number:
**3.8593 ms per batch-1024 lookup** (`/root/reference/README.md:106`).

Methodology: K data-dependent lookups of a 65,536-index batch run inside
one jitted device loop per host readback (async dispatch and the relay
roundtrip cannot fake the number), then normalized to per-1024-rows —
the unit of the reference's measurement.  The 64K batch matches real
training traffic (a products minibatch looks up ~0.9M ids per step,
chunk-streamed by the kernel grid).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"};
vs_baseline > 1 means faster than the reference kernel.  Details go to
stderr.
"""

import glob
import json
import os
import re
import sys
import time

import numpy as np

BASELINE_EFFI_MS = 3.8593  # Efficient_TT per-1024 lookup, RTX GPU (README.md:106)


def _prev_round_value():
    """Latest BENCH_r*.json value, for the regression guard (VERDICT r4 #7)."""
    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        try:
            with open(p) as f:
                doc = json.load(f)
            val = doc.get("parsed", doc).get("value")
        except Exception:
            continue
        if val is not None and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), float(val))
    return best  # (round, value) or None


def _env_versions():
    import jax, jaxlib
    out = {"jax": jax.__version__, "jaxlib": jaxlib.__version__}
    try:
        import libtpu
        out["libtpu"] = getattr(libtpu, "__version__", "?")
    except Exception:
        pass
    try:
        out["platform_version"] = jax.devices()[0].client.platform_version.replace("\n", "; ")
    except Exception:
        pass
    return out


def main():
    import jax
    import jax.numpy as jnp
    from falcon_ttdforgnns_tpu.ops import make_tt_shapes, tt_init
    from falcon_ttdforgnns_tpu.ops.tt_lookup import tt_lookup_gather
    from falcon_ttdforgnns_tpu.ops.tt_pallas import tt_lookup_fused

    shapes = make_tt_shapes(2_449_029, 100, (16, 16), (125, 140, 140), (5, 5, 4))
    cores = tuple(jnp.asarray(c) for c in
                  tt_init.init_tt_cores(shapes, "normal", seed=0))

    B = 65536
    rng = np.random.default_rng(0)
    idx = jnp.asarray((rng.zipf(1.3, size=B) % shapes.num_embeddings)
                      .astype(np.int32))

    on_tpu = jax.default_backend() == "tpu"
    K = 64

    def chained(fn):
        def run(c, ix):
            def body(i, carry):
                s, ix = carry
                out = fn(c, ix)
                return (s + jnp.sum(out), (ix + 1) % shapes.num_embeddings)
            s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), ix))
            return s
        return jax.jit(run)

    candidates = {}
    if on_tpu:
        candidates["pallas_fused"] = lambda c, ix: tt_lookup_fused(
            shapes, 1024, c, ix)
    candidates["xla_gather"] = lambda c, ix: tt_lookup_gather(shapes, c, ix)

    results = {}
    for name, fn in candidates.items():
        try:
            f = chained(fn)
            float(f(cores, idx))  # compile + warm
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                _ = float(f(cores, idx))
            per_iter_ms = (time.perf_counter() - t0) / reps / K * 1e3
            results[name] = per_iter_ms / (B / 1024)  # per-1024-rows
            print(f"{name}: {per_iter_ms:.3f} ms per {B}-batch "
                  f"({results[name]:.4f} ms/1024 rows)", file=sys.stderr)
        except Exception as e:  # keep the bench alive if one path breaks
            print(f"{name} failed: {type(e).__name__}: {e}", file=sys.stderr)

    if not results:
        sys.exit("bench: every lookup path failed (see stderr above)")
    best = min(results.values())
    doc = {
        "metric": "tt_embedding_lookup_per_1024_rows_products_ms",
        "value": round(best, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_EFFI_MS / best, 2),
        "env": _env_versions(),
    }
    prev = _prev_round_value()
    if prev is not None:
        doc["prev"] = {"round": prev[0], "value": prev[1]}
        doc["delta"] = round(best / prev[1], 3)  # >1 = slower than last round
        flag = ""
        if best > prev[1] * 1.5:
            flag = "  *** REGRESSION >1.5x vs previous round — investigate before trusting this round's chip numbers ***"
        print(f"prev round r{prev[0]}: {prev[1]:.4f} ms/1024; this run "
              f"{best:.4f} (x{doc['delta']}){flag}", file=sys.stderr)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
