"""Quantify the sampled-eval bias at products scale (VERDICT r4 item 4).

The round-4 papers-scale learning run reported accuracy through
``--eval-sampled`` (the only eval that fits one chip at 55.5M nodes);
the reference's protocol is layer-wise full-neighbor inference
(`gnn_model.py:220-253`).  This run trains hard-ogbn-products (60%
split, fused-Adam sparse, puregpu — the certified config) and, at
several checkpoints along the curve, evaluates the SAME parameters both
ways: full-neighbor layer-wise inference (`SageTrainer.evaluate`) vs the
sampled fanout eval (`SageTrainer.evaluate_sampled`).  The printed
deltas are the bias the papers numbers inherit.

Usage: python scripts/r5_eval_bias.py [epochs] [dataset] (chip; serialized!)
   CPU smoke: python scripts/r5_eval_bias.py 2 x cpu
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from falcon_ttdforgnns_tpu.graph import get_dataset
from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
from falcon_ttdforgnns_tpu.utils.logger import get_logger


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dataset = sys.argv[2] if len(sys.argv) > 2 else "hard-ogbn-products"
    small = dataset != "hard-ogbn-products"
    if len(sys.argv) > 3 and sys.argv[3] == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    logger = get_logger("eval_bias", "logs")
    ds = get_dataset(dataset)
    cfg = TrainConfig(epochs=1, mode="puregpu", sparse=True,
                      steps_per_call=4 if small else 48, log_every=500,
                      batch_size=128 if small else 1024,
                      fanouts=(4, 4) if small else (5, 10, 15),
                      hidden_dim=32 if small else 256,
                      num_layers=2 if small else 3,
                      tt_ranks=(4, 4) if small else (16, 16),
                      # pin the certified products TT config — the default
                      # suggested shapes compile a fused-Adam kernel whose
                      # scoped-VMEM footprint exceeds the v5e limit (48.6M
                      # vs 41.3M, first session-2 attempt)
                      **({} if small else dict(
                          p_shapes=(125, 140, 140), q_shapes=(5, 5, 4),
                          weight_dist="approx-normal")),
                      # skip the trainer's own per-epoch eval; we eval here
                      skip_eval=True,
                      eval_sample_max=200_000)
    tr = SageTrainer(ds, cfg, logger=logger)
    for ep in range(epochs):
        t0 = time.time()
        tr.train_epoch(ep)
        logger.info(f"epoch {ep}: {time.time() - t0:.1f}s")
        if ep in (0, 1, 3, epochs - 1):
            t0 = time.time()
            full = tr.evaluate()
            t_full = time.time() - t0
            t0 = time.time()
            samp = tr.evaluate_sampled()
            t_samp = time.time() - t0
            logger.info(
                f"epoch {ep} eval parity: full test={full['test_acc']:.4f} "
                f"({t_full:.1f}s) sampled test={samp['test_acc']:.4f} "
                f"({t_samp:.1f}s) bias={samp['test_acc'] - full['test_acc']:+.4f}")
            logger.info(f"  full: {full}")
            logger.info(f"  sampled: {samp}")


if __name__ == "__main__":
    main()
