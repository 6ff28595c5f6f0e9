"""Full-graph GCN/GAT trainer tests (gcn_gat_partition.py parity)."""

import numpy as np
import pytest

from falcon_ttdforgnns_tpu.graph import synthetic_dataset
from falcon_ttdforgnns_tpu.train import FullGraphTrainer, FullGraphConfig


@pytest.fixture(scope="module")
def tiny_ds():
    return synthetic_dataset(num_nodes=500, avg_degree=6, num_classes=4,
                             feat_dim=16, seed=1)


@pytest.mark.parametrize("model", ["gcn", "gat"])
def test_learns(tiny_ds, model):
    # use_linear mirrors the reference GCN preset (run_script.sh:180) — the
    # graph has no self-loops, so the linear branch is the self-feature path
    cfg = FullGraphConfig(model=model, epochs=80, lr=0.01, hidden_dim=16,
                          num_layers=2, num_heads=2, use_linear=True,
                          use_tt=True, tt_ranks=(4, 4), weight_dist="normal",
                          warmup_epochs=10, eval_every=80)
    tr = FullGraphTrainer(tiny_ds, cfg)
    res = tr.fit()
    assert res["best"]["test_acc"] > 0.4   # 4 classes, random = 0.25


def test_label_trick(tiny_ds):
    cfg = FullGraphConfig(model="gcn", epochs=40, lr=0.01, hidden_dim=16,
                          num_layers=2, use_labels=True, use_linear=True,
                          use_tt=True, tt_ranks=(4, 4), weight_dist="normal",
                          warmup_epochs=5, eval_every=40)
    tr = FullGraphTrainer(tiny_ds, cfg)
    res = tr.fit()
    assert np.isfinite(res["history"][-1]["loss"])
    assert res["best"]["test_acc"] > 0.3


def test_log_eps_ce_positive():
    import jax.numpy as jnp
    from falcon_ttdforgnns_tpu.train import log_eps_cross_entropy
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(32, 5)).astype(np.float32))
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 5, 32))
    loss = log_eps_cross_entropy(logits, labels)
    assert float(loss) > 0
    # perfect prediction -> loss near 0
    perfect = jnp.eye(5)[labels] * 50.0
    assert float(log_eps_cross_entropy(perfect, labels)) < 1e-3


def test_materialize_features_exists(tiny_ds):
    """--store-emb uses model.materialize_features on EVERY model type;
    gcn/gat crashed with AttributeError before round 2's fix."""
    import jax
    import jax.numpy as jnp
    cfg = FullGraphConfig(model="gcn", epochs=1, hidden_dim=16,
                          num_layers=2, tt_ranks=(4, 4), seed=0)
    tr = FullGraphTrainer(tiny_ds, cfg)
    mat = jax.jit(lambda v, ids: tr.model.apply(
        v, ids, method=type(tr.model).materialize_features))
    rows = mat(tr.variables, jnp.arange(32, dtype=jnp.int32))
    assert rows.shape == (32, tiny_ds.feat_dim)


def test_warmup_first_epoch_trains(tiny_ds):
    """The reference warmup is lr*epoch/50 counting from 1: epoch 0 must
    apply a NONZERO update (the old schedule started at exactly 0)."""
    import jax
    import numpy as np
    cfg = FullGraphConfig(model="gcn", epochs=1, lr=0.01, hidden_dim=16,
                          num_layers=2, tt_ranks=(4, 4), warmup_epochs=50,
                          seed=0)
    tr = FullGraphTrainer(tiny_ds, cfg)
    before = jax.tree.leaves(tr.variables["params"])
    tr.train_epoch(0)
    after = jax.tree.leaves(tr.variables["params"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after))
    assert changed, "epoch 0 applied a zero update (warmup off-by-one)"


def test_gcn_blocked_spmm_matches_xla(tiny_ds):
    """Full-graph GCN with --spmm blocked: same seed must give the same
    training losses (fp-tolerance) and identical eval accuracies as the
    XLA aggregation path."""
    import numpy as np
    base = dict(model="gcn", epochs=3, lr=0.01, hidden_dim=16,
                num_layers=2, tt_ranks=(4, 4), eval_every=100, seed=0)
    tx = FullGraphTrainer(tiny_ds, FullGraphConfig(**base, spmm="xla"))
    tb = FullGraphTrainer(tiny_ds, FullGraphConfig(**base, spmm="blocked"))
    for e in range(3):
        lx = tx.train_epoch(e)["loss"]
        lb = tb.train_epoch(e)["loss"]
        np.testing.assert_allclose(lx, lb, rtol=1e-3, atol=1e-4)
    ax, ab = tx.evaluate(), tb.evaluate()
    for k in ax:
        assert abs(ax[k] - ab[k]) < 0.02, (k, ax, ab)


def test_gat_blocked_spmm_rejected(tiny_ds):
    import pytest
    with pytest.raises(ValueError, match="GAT"):
        FullGraphTrainer(tiny_ds, FullGraphConfig(model="gat", epochs=1,
                                                  spmm="blocked"))
