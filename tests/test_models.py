"""Model forward/backward and end-to-end smoke tests (tiny synthetic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from falcon_ttdforgnns_tpu.graph import synthetic_dataset, sample_block
from falcon_ttdforgnns_tpu.models import SAGE, GCN, GAT
from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig


@pytest.fixture(scope="module")
def tiny_ds():
    return synthetic_dataset(num_nodes=600, avg_degree=6, num_classes=5,
                             feat_dim=24, seed=0)


def coo(ds):
    src, dst = ds.graph.to_coo()
    return (jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(ds.graph.degrees.astype(np.float32)))


class TestSAGE:
    def test_forward_shapes(self, tiny_ds):
        model = SAGE(num_nodes=tiny_ds.num_nodes, in_dim=24, hidden_dim=32,
                     num_classes=5, num_layers=2, use_tt=True,
                     tt_ranks=(4, 4), weight_dist="normal")
        batch = sample_block(tiny_ds.graph, np.arange(8), (3, 4),
                             np.random.default_rng(0))
        rng = jax.random.PRNGKey(0)
        seeds = jnp.asarray(batch.seeds)
        layers = [jnp.asarray(l) for l in batch.layers]
        variables = model.init({"params": rng, "dropout": rng}, seeds, layers)
        out = model.apply(variables, seeds, layers, train=False)
        assert out.shape == (8, 5)
        assert np.isfinite(np.asarray(out)).all()

    def test_trainer_learns(self, tiny_ds):
        cfg = TrainConfig(batch_size=64, fanouts=(4, 4), epochs=20,
                          hidden_dim=32, num_layers=2, use_tt=True,
                          tt_ranks=(4, 4), weight_dist="normal",
                          eval_every=20, log_every=1000)
        trainer = SageTrainer(tiny_ds, cfg)
        result = trainer.fit()
        # community labels are learnable: beat the 1/5 random baseline solidly
        assert result["best"]["test_acc"] > 0.4

    def test_trainer_with_cache(self, tiny_ds):
        cfg = TrainConfig(batch_size=64, fanouts=(4, 4), epochs=20,
                          hidden_dim=32, num_layers=2, use_tt=True,
                          tt_ranks=(4, 4), weight_dist="normal",
                          cache_size=64, eval_every=20, log_every=1000)
        trainer = SageTrainer(tiny_ds, cfg)
        result = trainer.fit()
        meta = trainer.variables["ttcache"]["embed"]["meta"]
        assert bool(meta.ready)          # cache populated after epoch 0
        assert int((meta.ids >= 0).sum()) > 0
        assert result["best"]["test_acc"] > 0.35

    def test_dense_baseline(self, tiny_ds):
        cfg = TrainConfig(batch_size=64, fanouts=(4, 4), epochs=1,
                          hidden_dim=32, num_layers=2, use_tt=False,
                          eval_every=1, log_every=1000)
        trainer = SageTrainer(tiny_ds, cfg)
        result = trainer.fit()
        assert np.isfinite(result["history"][0]["loss"])


class TestFullGraphModels:
    def test_gcn(self, tiny_ds):
        src, dst, deg = coo(tiny_ds)
        feat = jnp.asarray(np.random.default_rng(0).normal(
            size=(tiny_ds.num_nodes, 24)).astype(np.float32))
        model = GCN(in_dim=24, hidden_dim=16, num_classes=5, num_layers=2)
        rng = jax.random.PRNGKey(0)
        vs = model.init({"params": rng, "dropout": rng}, feat, src, dst, deg)
        out = model.apply(vs, feat, src, dst, deg, train=False)
        assert out.shape == (tiny_ds.num_nodes, 5)
        assert np.isfinite(np.asarray(out)).all()

    def test_gat(self, tiny_ds):
        src, dst, deg = coo(tiny_ds)
        feat = jnp.asarray(np.random.default_rng(0).normal(
            size=(tiny_ds.num_nodes, 24)).astype(np.float32))
        model = GAT(in_dim=24, hidden_dim=8, num_classes=5, num_layers=2,
                    num_heads=2)
        rng = jax.random.PRNGKey(0)
        vs = model.init({"params": rng, "dropout": rng}, feat, src, dst, deg)
        out = model.apply(vs, feat, src, dst, deg, train=False)
        assert out.shape == (tiny_ds.num_nodes, 5)
        assert np.isfinite(np.asarray(out)).all()

    def test_gat_attention_normalized(self, tiny_ds):
        """Edge-softmax property: attention over each destination sums to 1
        (checked indirectly: constant features + no residual/norm give
        outputs equal to the transformed feature)."""
        src, dst, deg = coo(tiny_ds)
        from falcon_ttdforgnns_tpu.nn.layers import GATConv
        feat = jnp.ones((tiny_ds.num_nodes, 8), jnp.float32)
        conv = GATConv(out_dim=4, num_heads=1, residual=False)
        rng = jax.random.PRNGKey(0)
        vs = conv.init(rng, feat, src, dst, deg, tiny_ds.num_nodes)
        out = conv.apply(vs, feat, src, dst, deg, tiny_ds.num_nodes)
        # every node with in-edges gets exactly the (same) projected value
        proj = feat[:1] @ vs["params"]["fc"]["kernel"]
        has_in = np.asarray(deg) > 0
        np.testing.assert_allclose(np.asarray(out)[has_in],
                                   np.tile(np.asarray(proj), (has_in.sum(), 1)),
                                   rtol=1e-4, atol=1e-5)


class TestMultiStepPacking:
    def test_pack_group_roundtrip(self, tiny_ds):
        from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
        cfg = TrainConfig(batch_size=32, fanouts=(3, 4), epochs=1,
                          hidden_dim=16, num_layers=2, use_tt=True,
                          tt_ranks=(4, 4), weight_dist="normal",
                          steps_per_call=3, eval_every=10**9, log_every=10**9)
        tr = SageTrainer(tiny_ds, cfg)
        group = next(iter(tr._grouped_batches()))
        assert len(group) == 3
        packed = tr._pack_group(group)
        widths = tr._layer_widths()
        assert packed.shape == (3, 32, 2 + sum(widths))
        for s, b in enumerate(group):
            np.testing.assert_array_equal(packed[s, :, 0], b.seeds)
            np.testing.assert_array_equal(packed[s, :, 1], b.labels)
            off = 2
            for li, w in enumerate(widths):
                np.testing.assert_array_equal(packed[s, :, off:off + w],
                                              b.layers[li])
                off += w

    def test_grouped_batches_pad_tail(self, tiny_ds):
        from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
        cfg = TrainConfig(batch_size=64, fanouts=(3, 3), epochs=1,
                          hidden_dim=16, num_layers=2, use_tt=True,
                          tt_ranks=(4, 4), weight_dist="normal",
                          steps_per_call=4, eval_every=10**9, log_every=10**9)
        tr = SageTrainer(tiny_ds, cfg)
        groups = list(tr._grouped_batches())
        # 360 train nodes / 64 = 5 batches -> groups of 4: [4, 4(padded)]
        assert all(len(g) == 4 for g in groups)
        assert len(groups) == 2


def test_fixed_feature_embedding(tiny_ds):
    """Real-feature (no learned embedding) path — the reference DDP driver
    trains on prefetched features (`sage_dgl_partition.py:174-176`)."""
    from falcon_ttdforgnns_tpu.nn.tt_embedding import FixedFeatureEmbedding
    feats = np.random.default_rng(0).normal(
        size=(tiny_ds.num_nodes, 24)).astype(np.float32)
    m = FixedFeatureEmbedding(feats)
    idx = jnp.asarray([3, 7, 3])
    vs = m.init(jax.random.PRNGKey(0), idx)
    out = m.apply(vs, idx)
    np.testing.assert_allclose(np.asarray(out), feats[[3, 7, 3]], rtol=1e-6)
    assert "params" not in vs  # nothing trainable


class TestTableBatched:
    """Table-batched contract (`FBTT/tt_embeddings_ops.py:432-915`):
    (num_tables, B) indices -> (num_tables, B, D); cache only ever active
    for num_tables == 1 (`tt_embeddings_cuda.cu:1447-1449`)."""

    def test_shapes_and_per_table_params(self):
        import jax
        import jax.numpy as jnp
        from falcon_ttdforgnns_tpu.nn import TableBatchedTTEmbeddingBag
        m = TableBatchedTTEmbeddingBag(num_tables=3, num_embeddings=200,
                                       embedding_dim=16, tt_ranks=(4, 4),
                                       cache_size=32)
        idx = jnp.arange(12, dtype=jnp.int32).reshape(3, 4) % 200
        vars_ = m.init(jax.random.PRNGKey(0), idx)
        out = m.apply(vars_, idx)
        assert out.shape == (3, 4, 16)
        core0 = vars_["params"]["tt_core_0"]
        assert core0.shape[0] == 3  # leading table axis
        # num_tables>1 => cache vars absent (reference cu:1447-1449 gate)
        assert "ttcache" not in vars_
        # tables differ (split rngs) and lookups differ accordingly
        same_idx = jnp.zeros((3, 4), jnp.int32)
        out2 = m.apply(vars_, same_idx)
        assert not np.allclose(np.asarray(out2[0]), np.asarray(out2[1]))

    def test_single_table_keeps_cache(self):
        import jax
        import jax.numpy as jnp
        from falcon_ttdforgnns_tpu.nn import TableBatchedTTEmbeddingBag
        m = TableBatchedTTEmbeddingBag(num_tables=1, num_embeddings=200,
                                       embedding_dim=16, tt_ranks=(4, 4),
                                       cache_size=32)
        idx = jnp.arange(4, dtype=jnp.int32)[None, :]
        vars_ = m.init(jax.random.PRNGKey(0), idx)
        assert "ttcache" in vars_
