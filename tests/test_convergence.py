"""Convergence-parity regression tests (VERDICT r3 item 3).

The round-3 chip certifications discovered — on the last chip hours of the
round — that the fused `--sparse` path (then fixed-lr in-kernel SGD) sat
at chance accuracy for 20 epochs on hard-ogbn-products while routed Adam
converged under identical conditions.  The step-math parity tests could
not catch that: one/two steps of correct SGD arithmetic say nothing about
whether the optimizer's *dynamics* learn.  This module asserts the
missing property at CI scale: on a small HARD graph (planted-partition
labels that require propagation — id bits carry nothing, chance = 1/C),
the fused-sparse path must reach routed-Adam-level accuracy in the same
budget.  Minutes-scale on CPU; would have caught the round-3 stall.
"""

import jax
import numpy as np
import pytest

from falcon_ttdforgnns_tpu.graph.csr import hard_synthetic_dataset
from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig


NUM_CLASSES = 4          # chance = 0.25
EPOCHS = 8


def hard_ds():
    return hard_synthetic_dataset(num_nodes=2000, avg_degree=12,
                                  num_classes=NUM_CLASSES, feat_dim=16,
                                  seed=0, homophily=0.9)


def train_cfg(**kw):
    base = dict(batch_size=64, fanouts=(4, 4), epochs=EPOCHS, lr=0.01,
                dropout=0.0, hidden_dim=32, num_layers=2, use_tt=True,
                tt_ranks=(4, 4), weight_dist="normal", skip_eval=True,
                steps_per_call=4, log_every=10000, seed=0)
    base.update(kw)
    return TrainConfig(**base)


def run(ds, cfg):
    tr = SageTrainer(ds, cfg)
    for e in range(cfg.epochs):
        stats = tr.train_epoch(e)
    accs = tr.evaluate()
    return tr, accs


class TestFusedSparseConverges:
    """The round-4 contract: fused --sparse (default adam) learns hard
    graphs at routed-Adam level.  This is the test class that would have
    caught the round-3 stall in CI instead of on chip."""

    @pytest.fixture(scope="class")
    def results(self):
        ds = hard_ds()
        _, routed = run(ds, train_cfg(sparse=False, tt_optimizer="adam"))
        tr_fused, fused = run(ds, train_cfg(sparse=True,
                                            tt_optimizer="adam"))
        assert tr_fused._fused_sparse, "fused step not selected"
        return routed, fused

    def test_routed_adam_learns(self, results):
        routed, _ = results
        # sanity: the control must clearly leave chance (0.25) or the
        # parity assertion below is vacuous
        assert routed["test_acc"] > 0.55, f"control failed to learn: {routed}"

    def test_fused_leaves_chance(self, results):
        _, fused = results
        # the exact regression the round-3 certs caught: fused-sparse flat
        # at chance (1/C = 0.25) while routed Adam converges
        assert fused["test_acc"] > 0.55, \
            f"fused --sparse stalled near chance: {fused}"

    def test_fused_matches_routed(self, results):
        routed, fused = results
        assert fused["test_acc"] >= 0.9 * routed["test_acc"], \
            (f"fused --sparse below routed-Adam parity: "
             f"fused {fused['test_acc']:.4f} vs routed "
             f"{routed['test_acc']:.4f}")


def test_fused_sgd_documented_nonconvergence_guard():
    """Fixed-lr fused SGD (EXACT_SGD reference parity) is EXPECTED to move
    cores ~|g|/lr slower than Adam on hard graphs — this guard documents
    the behavior class rather than asserting a stall (small graphs can
    eventually learn).  What it does assert: after the same budget the
    sgd arm must NOT beat the adam arm, which would invalidate the
    round-4 default routing of --sparse to fused Adam."""
    ds = hard_ds()
    _, adam = run(ds, train_cfg(sparse=True, tt_optimizer="adam"))
    _, sgd = run(ds, train_cfg(sparse=True, tt_optimizer="sgd"))
    assert adam["test_acc"] >= sgd["test_acc"] - 0.05, \
        (f"fused SGD unexpectedly beats fused Adam on a hard graph: "
         f"{sgd} vs {adam} — revisit the --sparse default routing")
