"""Diagnose the round-3 fused-sparse stall (VERDICT r3 weak #2).

The fused `--sparse` configurations sat at chance accuracy for 20 epochs on
hard-ogbn-products partition 0 while the routed-Adam path converged to
0.9862 under identical conditions.  Three suspects, none ruled out by the
round-3 runs:

  (a) fixed fused lr with zero adaptivity/momentum on cores that carry ALL
      signal on hard graphs (SGD at lr=0.003 moves cores ~|g|/lr slower
      than Adam's normalized steps);
  (b) plateau-feedback collapse: fused cores learn slowly -> loss flat ->
      reduce_on_plateau (patience 800, factor 0.5) halves the DENSE
      tower's Adam lr every 800 steps, freezing the whole model;
  (c) adagrad accumulator dynamics at scale (dense-grad accumulation over
      ~150K lookups/step shrinks the effective lr as 1/sqrt(t) fast).

This experiment separates them cheaply: hard-ogbn-products shrunk to ~98K
nodes (same density/labels/split as the chip cert), sampled training, the
TT-core optimizer emulated via routed optax transforms that are
MATH-PARITY-TESTED against the fused kernels (tests/test_pallas.py,
tests/test_flags.py) — so each arm's core-update semantics are exactly
what the fused kernel would apply, at a fraction of the wall-clock.

Arms:
  adam+plateau        control (the converging routed path)
  sgd+plateau         the stalled fused-SGD semantics
  sgd-noplateau       isolates suspect (b)
  sgd-lr100x          isolates suspect (a) (pure magnitude)
  adagrad+plateau     suspect (c), per-element
  rowwise+plateau     suspect (c), rowwise
  adam-noplateau      the candidate fix's semantics (fused adam)

Usage: python scripts/stall_diagnosis.py [--steps 3000] [--scale 0.04]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def run_arm(name, ds, tt_optimizer, tt_lr, plateau, epochs, log_every=200):
    import jax
    from falcon_ttdforgnns_tpu.train.trainer import SageTrainer, TrainConfig
    from falcon_ttdforgnns_tpu.train.optim import make_optimizer

    cfg = TrainConfig(
        epochs=epochs, use_tt=True,
        p_shapes=None, q_shapes=None,   # suggested shapes at this scale
        steps_per_call=8, mode="mixed", skip_eval=True,
        log_every=log_every, seed=0,
    )
    tr = SageTrainer(ds, cfg)
    # override the optimizer AFTER construction: the routed transforms are
    # math-parity-tested vs the fused kernels, so this reproduces each
    # fused configuration's core-update semantics exactly
    tr.tx = make_optimizer(lr=cfg.lr, tt_optimizer=tt_optimizer,
                           tt_lr=tt_lr, plateau=plateau,
                           plateau_patience=cfg.plateau_patience)
    tr.opt_state = tr.tx.init(tr.variables["params"])
    # rebuild the jitted steps against the new tx
    tr._step_fn = tr._build_step()
    tr._multi_fn = tr._build_multi_step() if cfg.steps_per_call > 1 else None

    t0 = time.perf_counter()
    curve = []
    for epoch in range(epochs):
        stats = tr.train_epoch(epoch)
        curve.append(round(stats["loss"], 4))
        print(f"  [{name}] epoch {epoch} loss {stats['loss']:.4f} "
              f"train_acc {stats['train_acc']:.4f}", flush=True)
    accs = tr.evaluate()
    dt = time.perf_counter() - t0
    res = {"arm": name, "tt_optimizer": tt_optimizer, "tt_lr": tt_lr,
           "plateau": plateau, "loss_curve": curve,
           "final": {k: round(v, 4) for k, v in accs.items()},
           "wall_s": round(dt, 1)}
    print(json.dumps(res), flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.04)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--arms", type=str, default="")
    args = ap.parse_args()

    from falcon_ttdforgnns_tpu.graph import get_dataset
    ds = get_dataset("hard-ogbn-products", synthetic_scale=args.scale)
    steps_per_epoch = len(ds.train_idx) // 1024
    print(f"dataset: {ds.num_nodes} nodes, {ds.graph.num_edges} edges, "
          f"{len(ds.train_idx)} train seeds ({steps_per_epoch} steps/epoch, "
          f"{args.epochs} epochs = {steps_per_epoch*args.epochs} steps)",
          flush=True)

    lr = 0.003
    arms = [
        ("adam+plateau", "adam", lr, True),
        ("sgd+plateau", "sgd", lr, True),
        ("sgd-noplateau", "sgd", lr, False),
        ("sgd-lr100x", "sgd", 100 * lr, True),
        ("adagrad+plateau", "adagrad", lr, True),
        ("rowwise+plateau", "rowwise_adagrad", lr, True),
        ("adam-noplateau", "adam", lr, False),
    ]
    if args.arms:
        keep = set(args.arms.split(","))
        arms = [a for a in arms if a[0] in keep]

    results = []
    for name, opt, tlr, plat in arms:
        results.append(run_arm(name, ds, opt, tlr, plat, args.epochs))

    print("\n=== SUMMARY ===")
    for r in results:
        print(f"{r['arm']:>18}: test_acc {r['final']['test_acc']:.4f} "
              f"loss {r['loss_curve'][0]:.3f} -> {r['loss_curve'][-1]:.3f} "
              f"({r['wall_s']:.0f}s)")


if __name__ == "__main__":
    main()
