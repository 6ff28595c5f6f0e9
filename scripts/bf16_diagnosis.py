"""Attribute the bf16 convergence lag (round-4 chip cert finding).

The round-4 hard-ogbn-products certs show the fused-Adam sparse path
converging to 0.9916 in f32 but only 0.9335 at epoch 19 under --bf16
(still climbing — roughly 6-8 epochs behind the f32 curve).  --bf16
covers TWO independent casts:

  (a) tower: conv activations + fanout means in bf16;
  (b) kernel I/O: h_all stored bf16 by the fused lookup, d_h consumed
      bf16 by the fused backward+Adam kernel.

This experiment separates them at CPU scale (same recipe as
scripts/stall_diagnosis.py, which correctly predicted the fused-SGD
stall mechanism): small hard graph, fused-Adam sparse trainer, four
arms x N epochs, loss/acc curves per arm.

Usage: python scripts/cpu_run.py scripts/bf16_diagnosis.py [--epochs 12]
"""

import argparse
import json
import time

from falcon_ttdforgnns_tpu.graph.csr import hard_synthetic_dataset
from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig


def run_arm(name, ds, epochs, **kw):
    cfg = TrainConfig(batch_size=256, fanouts=(5, 10), epochs=epochs,
                      lr=0.003, dropout=0.5, hidden_dim=64, num_layers=2,
                      use_tt=True, tt_ranks=(8, 8), weight_dist="normal",
                      skip_eval=True, steps_per_call=8, log_every=10**9,
                      seed=0, **kw)
    tr = SageTrainer(ds, cfg)
    assert tr._fused_sparse, "diagnosis must exercise the fused path"
    t0 = time.perf_counter()
    curve = []
    for e in range(epochs):
        stats = tr.train_epoch(e)
        curve.append(round(stats["train_acc"], 4))
        print(f"  [{name}] epoch {e} loss {stats['loss']:.4f} "
              f"train_acc {stats['train_acc']:.4f}", flush=True)
    accs = tr.evaluate()
    res = {"arm": name, "curve": curve,
           "final": {k: round(v, 4) for k, v in accs.items()},
           "wall_s": round(time.perf_counter() - t0, 1)}
    print(json.dumps(res), flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--classes", type=int, default=8)
    args = ap.parse_args()

    ds = hard_synthetic_dataset(num_nodes=args.nodes, avg_degree=15,
                                num_classes=args.classes, feat_dim=32,
                                seed=0, homophily=0.9)
    print(f"dataset: {ds.num_nodes} nodes, {ds.graph.num_edges} edges, "
          f"chance={1/args.classes:.3f}", flush=True)

    arms = [
        ("f32", {}),
        ("bf16-full", {"bf16": True}),
        ("bf16-tower-only", {"bf16_tower": True}),
        ("bf16-kernel-only", {"bf16_kernel": True}),
    ]
    results = [run_arm(n, ds, args.epochs, sparse=True,
                       tt_optimizer="adam", **kw) for n, kw in arms]
    print("\nSUMMARY")
    for r in results:
        print(f"  {r['arm']:18s} final test {r['final']['test_acc']:.4f} "
              f"curve {r['curve']}")


if __name__ == "__main__":
    main()
