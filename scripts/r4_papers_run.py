"""papers-scale LEARNING run (VERDICT r3 item 5), reorder-cache-gated.

Builds the half-papers dataset up front (so the ~20 min synthetic build
overlaps the native partitioner still running host-side), waits for the
128-way partition to land in ./reorder_cache (the warmup job,
scripts/papers_reorder_measure.py, prints a partition_s JSON line when it
has np.save'd the perm), applies it, and trains the round-3 papers config
(docs/PERFORMANCE.md "papers100M-class single-chip training":
p=400/500/600, q=4/4/8, rank 16, batch 1024, fan-out 5/10/15, puregpu
in-jit sampling, fused-Adam --sparse) for N epochs with sampled eval.

Usage: python scripts/r4_papers_run.py [epochs=12] [gate_timeout_s=3600]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATE_LOG = os.environ.get("PAPERS_GATE_LOG", "logs/r4_papers_reorder.log")
LEVELS = [400, 500, 600]


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    gate_timeout = float(sys.argv[2]) if len(sys.argv) > 2 else 3600.0

    from falcon_ttdforgnns_tpu.graph import get_dataset
    from falcon_ttdforgnns_tpu.graph.reorder import reorder_permutation_cached
    from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
    from falcon_ttdforgnns_tpu.utils.logger import get_logger

    logger = get_logger("falcon_tpu")
    t0 = time.time()
    ds = get_dataset("hard-ogbn-papers100M", synthetic_scale=0.5,
                     official_split=True)
    logger.info(f"dataset: {ds.num_nodes} nodes, {ds.graph.num_edges} edges "
                f"({time.time() - t0:.0f}s)")

    # gate on the warmup job's done line — calling the cached reorder
    # before the perm file exists would RECOMPUTE the partition in-process
    t0 = time.time()
    while time.time() - t0 < gate_timeout:
        try:
            with open(GATE_LOG) as f:
                if "partition_s" in f.read():
                    break
        except OSError:
            pass
        time.sleep(20)
    logger.info(f"reorder gate: waited {time.time() - t0:.0f}s")

    t0 = time.time()
    perm = reorder_permutation_cached(ds.graph, 128, levels=LEVELS)
    assert perm is not None
    ds = ds.permute(perm)
    logger.info(f"reorder partition=128: {time.time() - t0:.0f}s")

    cfg = TrainConfig(
        batch_size=1024, fanouts=(5, 10, 15), epochs=epochs,
        p_shapes=tuple(LEVELS), q_shapes=(4, 4, 8), tt_ranks=(16, 16),
        sparse=True, tt_optimizer="adam", mode="puregpu",
        steps_per_call=48, eval_sampled=True, eval_every=2, log_every=500)
    tr = SageTrainer(ds, cfg, logger=logger)
    best = tr.fit()["best"]
    logger.info(f"papers learning run best: {best}")


if __name__ == "__main__":
    main()
