"""Measure the native k-way partitioner at papers-class scale and warm the
reorder disk cache (VERDICT r3 item 5 prerequisite).

Builds hard-ogbn-papers100M at half scale (55.5M nodes / 1.67B directed
edges — the single-chip int32 ceiling, same config as the round-3 chip run,
docs/PERFORMANCE.md "papers100M-class single-chip training") and times
`reorder_permutation_cached(partition=K)`.  The permutation lands in
./reorder_cache keyed on graph shape + flags, so the subsequent chip
training run pays ~0 s for the reorder.

Host-only: never touches the TPU (JAX_PLATFORMS=cpu guard below).

Usage: python scripts/papers_reorder_measure.py [K=128] [scale=0.5]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # keep off the chip
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    from falcon_ttdforgnns_tpu.graph import get_dataset
    from falcon_ttdforgnns_tpu.graph.reorder import reorder_permutation_cached

    t0 = time.time()
    ds = get_dataset("hard-ogbn-papers100M", synthetic_scale=scale)
    t_build = time.time() - t0
    print(f"graph build: {ds.num_nodes} nodes, {ds.graph.num_edges} edges, "
          f"{t_build:.0f}s", flush=True)

    # levels must match the CLI's call exactly — the disk-cache key hashes
    # them even when partition > 0 ignores them (cli.py passes
    # levels=args.p_shapes, the papers preset [400, 500, 600])
    levels = [400, 500, 600]
    t0 = time.time()
    perm = reorder_permutation_cached(ds.graph, k, levels=levels)
    t_part = time.time() - t0
    assert perm is not None and len(perm) == ds.num_nodes
    print(json.dumps({
        "nodes": int(ds.num_nodes), "edges": int(ds.graph.num_edges),
        "k": k, "build_s": round(t_build, 1),
        "partition_s": round(t_part, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
