"""Full-papers100M host-side feasibility (VERDICT r4 item 5).

Exercises, at the REAL papers100M scale (111M nodes / ~3.3B directed
edges — `/root/reference/run_script.sh:408-430` is the reference's
papers preset; it never actually runs it), the three host-side stages
that have only ever run together at half scale:

  stage build_partition:
    1. hard-ogbn-papers100M graph build at scale 1.0
    2. native 128-way multilevel partition with the refine-skip valve
       engaged (the first owned coarse level ~2.6B edges exceeds the
       1.5B-edge refine cap and is projected through) — the cut-quality
       cost of the valve at this scale is the open question from round 4
       (0.19 -> 0.43 cut fraction when forced at products scale)
    3. permutation lands in reorder_cache/ for any later chip run

  stage layout:
    4. ragged 8-shard ring layout of the full edge set (~36 B/edge model
       => ~119 GB peak on a 125 GB host — measured here)

Each stage prints wall time and the process VmHWM (peak RSS).  Stages
are separate processes so their peaks don't stack; the caller serializes
them against other RAM-heavy jobs.

Usage: python scripts/r5_full_papers.py build_partition|layout [K=128]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # host-only, never the chip
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def vm_hwm_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1e6  # kB -> GB
    return float("nan")


SCALE = float(os.environ.get("FALCON_PAPERS_SCALE", "1.0"))  # smoke-test hook


def stage_build_partition(k: int):
    from falcon_ttdforgnns_tpu.graph import get_dataset
    from falcon_ttdforgnns_tpu.graph.reorder import reorder_permutation_cached

    t0 = time.time()
    ds = get_dataset("hard-ogbn-papers100M", synthetic_scale=SCALE)
    t_build = time.time() - t0
    print(f"graph build: {ds.num_nodes} nodes, {ds.graph.num_edges} edges, "
          f"{t_build:.0f}s, VmHWM {vm_hwm_gb():.1f} GB", flush=True)

    levels = [400, 500, 600]  # must match the CLI cache key (cli.py)
    t0 = time.time()
    perm = reorder_permutation_cached(ds.graph, k, levels=levels)
    t_part = time.time() - t0
    assert perm is not None and len(perm) == ds.num_nodes
    print(json.dumps({
        "stage": "build_partition",
        "nodes": int(ds.num_nodes), "edges": int(ds.graph.num_edges),
        "k": k, "build_s": round(t_build, 1),
        "partition_s": round(t_part, 1),
        "vm_hwm_gb": round(vm_hwm_gb(), 1),
    }), flush=True)


def stage_layout(num_shards: int = 8):
    from falcon_ttdforgnns_tpu.graph import get_dataset
    from falcon_ttdforgnns_tpu.parallel.node_sharding import (
        partition_edges_ragged)
    import numpy as np

    t0 = time.time()
    ds = get_dataset("hard-ogbn-papers100M", synthetic_scale=SCALE)
    t_build = time.time() - t0
    g = ds.graph
    n, E = int(ds.num_nodes), int(g.num_edges)
    print(f"graph build: {n} nodes, {E} edges, {t_build:.0f}s, "
          f"VmHWM {vm_hwm_gb():.1f} GB", flush=True)

    # CSR -> COO src/dst (int32: n < 2^31), then drop everything else the
    # dataset holds before the layout's own temporaries peak
    t0 = time.time()
    dst = np.repeat(np.arange(n, dtype=np.int32),
                    np.diff(g.indptr).astype(np.int64))
    src = g.indices.astype(np.int32, copy=False)
    del ds, g
    t_coo = time.time() - t0
    print(f"COO extract: {t_coo:.0f}s, VmHWM {vm_hwm_gb():.1f} GB", flush=True)

    t0 = time.time()
    lay = partition_edges_ragged(src, dst, n, num_shards)
    t_lay = time.time() - t0
    print(json.dumps({
        "stage": "layout",
        "nodes": n, "edges": E, "shards": num_shards,
        "layout_s": round(t_lay, 1),
        "memory_ratio": round(float(lay.memory_ratio), 3),
        "stored_bytes_per_edge": round(
            (lay.src_r.size + lay.dst_r.size) * 4 / max(E, 1), 1),
        "vm_hwm_gb": round(vm_hwm_gb(), 1),
    }), flush=True)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "build_partition"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    if stage == "build_partition":
        stage_build_partition(k)
    elif stage == "layout":
        stage_layout(8)
    else:
        sys.exit(f"unknown stage {stage!r}")


if __name__ == "__main__":
    main()
