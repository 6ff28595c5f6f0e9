"""Every CLI flag must change behavior (VERDICT round-1 item 2): tests
that the previously-dead flags are wired — --sparse (fused Pallas SGD),
--batch-count, --full-neighbor, --mode puregpu (device sampling),
--num-workers, --emb-name, dist multi-step, node-sharded inference."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from falcon_ttdforgnns_tpu.graph import synthetic_dataset, sample_block
from falcon_ttdforgnns_tpu.models import SAGE
from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig


def small_ds(n=600, classes=4, feat=16, seed=0):
    return synthetic_dataset(num_nodes=n, avg_degree=6, num_classes=classes,
                             feat_dim=feat, seed=seed)


def small_cfg(**kw):
    base = dict(batch_size=16, fanouts=(2, 3), epochs=1, lr=0.01,
                dropout=0.0, hidden_dim=16, num_layers=2, use_tt=True,
                tt_ranks=(4, 4), weight_dist="normal", eval_every=100,
                log_every=1000, seed=0, steps_per_call=1, skip_eval=True)
    base.update(kw)
    return TrainConfig(**base)


class TestBatchCount:
    def test_threads_to_embedding(self):
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(batch_count=4096))
        assert tr.model.batch_count == 4096
        # numeric invariance: chunk size must not change lookup values
        tr2 = SageTrainer(ds, small_cfg(batch_count=64))
        ids = jnp.arange(100, dtype=jnp.int32)
        a = tr.model.apply(tr.variables, ids, method=SAGE.materialize_features)
        b = tr2.model.apply(tr2.variables, ids, method=SAGE.materialize_features)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


class TestFusedSparse:
    def test_selected_and_matches_autograd_sgd(self):
        """--sparse routes TT cores through the fused Pallas backward+SGD;
        one fused step must equal cores - lr * dL/dcores (EXACT_SGD)."""
        ds = small_ds()
        cfg = small_cfg(sparse=True, tt_optimizer="sgd")
        tr = SageTrainer(ds, cfg)
        assert tr._fused_sparse, "sparse config should select the fused step"

        batch = next(iter(tr.loader))
        seeds = jnp.asarray(batch.seeds)
        layers = [jnp.asarray(l) for l in batch.layers]
        labels = jnp.asarray(batch.labels)
        rng = jax.random.PRNGKey(7)

        params0 = jax.tree.map(lambda x: x, tr.variables["params"])

        # expected core update via plain autograd on the XLA lookup path
        def loss_fn(p):
            out = tr.model.apply({"params": p}, seeds, layers, train=True,
                                 rngs={"dropout": rng})
            return optax.softmax_cross_entropy_with_integer_labels(
                out, labels).mean()

        grads = jax.grad(loss_fn)(params0)
        expected = {
            k: params0["embed"][k] - cfg.lr * grads["embed"][k]
            for k in params0["embed"] if k.startswith("tt_core_")
        }

        new_vars, _, loss, _ = tr._step_fn(tr.variables, tr.opt_state,
                                           seeds, layers, labels, rng)
        assert np.isfinite(float(loss))
        for k, exp in expected.items():
            got = np.asarray(new_vars["params"]["embed"][k])
            # bf16 compute inside the kernels -> loose tolerance
            np.testing.assert_allclose(got, np.asarray(exp), atol=5e-3,
                                       rtol=5e-2)

    def test_fused_multi_step_trains(self):
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(sparse=True, tt_optimizer="sgd",
                                       steps_per_call=2, epochs=1))
        assert tr._fused_sparse and tr._multi_fn is not None
        stats = tr.train_epoch(0)
        assert np.isfinite(stats["loss"])


class TestFusedAdagrad:
    """--sparse --tt-optimizer adagrad/rowwise_adagrad routes TT cores
    through the fused Pallas adagrad kernel (the reference's
    EXACT_ADAGRAD / EXACT_ROWWISE_ADAGRAD fused sparse optimizers,
    cu:399-419 / cu:1746-1846); two steps must match the routed-optimizer
    math applied to autograd core grads, accumulator threaded between."""

    @staticmethod
    def _autograd_core_grads(tr, params, seeds, layers, labels, rng):
        def loss_fn(p):
            out = tr.model.apply({"params": p}, seeds, layers, train=True,
                                 rngs={"dropout": rng})
            return optax.softmax_cross_entropy_with_integer_labels(
                out, labels).mean()
        g = jax.grad(loss_fn)(params)
        return {k: v for k, v in g["embed"].items()
                if k.startswith("tt_core_")}

    @pytest.mark.parametrize("opt", ["adagrad", "rowwise_adagrad"])
    def test_two_steps_match_routed_math(self, opt):
        ds = small_ds()
        cfg = small_cfg(sparse=True, tt_optimizer=opt)
        tr = SageTrainer(ds, cfg)
        assert tr._fused_sparse, "adagrad sparse should select the fused step"
        assert "tt_opt" in tr.variables, "accumulator state missing"
        rowwise = opt == "rowwise_adagrad"
        eps = 1e-8 if rowwise else 1e-10

        batch = next(iter(tr.loader))
        seeds = jnp.asarray(batch.seeds)
        layers = [jnp.asarray(l) for l in batch.layers]
        labels = jnp.asarray(batch.labels)
        rng = jax.random.PRNGKey(7)

        def expected(core, acc, g):
            if rowwise:
                a = acc + jnp.mean(g * g, axis=tuple(range(1, g.ndim)))
                scale = cfg.lr / (jnp.sqrt(a) + eps)
                return core - scale.reshape((-1,) + (1,) * (g.ndim - 1)) * g, a
            a = acc + g * g
            return core - cfg.lr * g / (jnp.sqrt(a) + eps), a

        v, o = tr.variables, tr.opt_state
        for step in range(2):
            params = v["params"]
            grads = self._autograd_core_grads(tr, params, seeds, layers,
                                              labels, rng)
            exp = {k: expected(params["embed"][k],
                               v["tt_opt"][f"acc_{k[-1]}"], grads[k])
                   for k in grads}
            v, o, loss, _ = tr._step_fn(v, o, seeds, layers, labels, rng)
            assert np.isfinite(float(loss))
            for k, (w_ref, a_ref) in exp.items():
                np.testing.assert_allclose(
                    np.asarray(v["params"]["embed"][k]), np.asarray(w_ref),
                    atol=5e-3, rtol=5e-2)
                np.testing.assert_allclose(
                    np.asarray(v["tt_opt"][f"acc_{k[-1]}"]),
                    np.asarray(a_ref), atol=5e-3, rtol=5e-2)

    def test_multi_step_threads_state(self):
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(sparse=True,
                                       tt_optimizer="rowwise_adagrad",
                                       steps_per_call=2, epochs=1))
        assert tr._fused_sparse and tr._multi_fn is not None
        stats = tr.train_epoch(0)
        assert np.isfinite(stats["loss"])
        accs = tr.variables["tt_opt"]
        assert all(float(jnp.max(a)) > 0 for a in accs.values()), \
            "accumulators never updated through the multi-step loop"


class TestFusedAdam:
    """--sparse (default --tt-optimizer adam) routes TT cores through the
    fused Pallas Adam kernel — the adaptive fused update the round-3 certs
    showed hard graphs require (VERDICT r3 item 1).  Two fused steps must
    match optax.adam applied to autograd core grads, moments + step count
    threaded between; the plateau scale is 1.0 at this horizon so the
    traced lr equals cfg.lr."""

    def test_two_steps_match_routed_adam(self):
        ds = small_ds()
        cfg = small_cfg(sparse=True, tt_optimizer="adam")
        tr = SageTrainer(ds, cfg)
        assert tr._fused_sparse, "sparse+adam should select the fused step"
        assert "tt_opt" in tr.variables and "t" in tr.variables["tt_opt"]

        batch = next(iter(tr.loader))
        seeds = jnp.asarray(batch.seeds)
        layers = [jnp.asarray(l) for l in batch.layers]
        labels = jnp.asarray(batch.labels)
        rng = jax.random.PRNGKey(7)

        def core_grads(params):
            def loss_fn(p):
                out = tr.model.apply({"params": p}, seeds, layers,
                                     train=True, rngs={"dropout": rng})
                return optax.softmax_cross_entropy_with_integer_labels(
                    out, labels).mean()
            g = jax.grad(loss_fn)(params)
            return {k: v for k, v in g["embed"].items()
                    if k.startswith("tt_core_")}

        ref_tx = optax.adam(cfg.lr)
        cores0 = {k: v for k, v in tr.variables["params"]["embed"].items()
                  if k.startswith("tt_core_")}
        ref_state = ref_tx.init(cores0)
        ref_cores = cores0

        v, o = tr.variables, tr.opt_state
        for step in range(2):
            g = core_grads(v["params"])
            upd, ref_state = ref_tx.update(g, ref_state, ref_cores)
            ref_cores = optax.apply_updates(ref_cores, upd)
            v, o, loss, _ = tr._step_fn(v, o, seeds, layers, labels, rng)
            assert np.isfinite(float(loss))
            assert int(v["tt_opt"]["t"]) == step + 1
            for k, w_ref in ref_cores.items():
                np.testing.assert_allclose(
                    np.asarray(v["params"]["embed"][k]),
                    np.asarray(w_ref), atol=5e-3, rtol=5e-2)

    def test_no_dormant_state_on_routed_branches(self):
        """tt_opt must exist iff a fused step consumes it: --full-neighbor
        and routed configs train cores via optax, so no dormant always-zero
        state may ride in variables/checkpoints (ADVICE r3)."""
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(sparse=True, tt_optimizer="adam",
                                       use_sample=False, batch_size=32))
        assert not tr._fused_sparse
        assert "tt_opt" not in tr.variables
        tr2 = SageTrainer(ds, small_cfg(sparse=False))
        assert "tt_opt" not in tr2.variables

    def test_multi_step_threads_state(self):
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(sparse=True, tt_optimizer="adam",
                                       steps_per_call=2, epochs=1))
        assert tr._fused_sparse and tr._multi_fn is not None
        stats = tr.train_epoch(0)
        assert np.isfinite(stats["loss"])
        assert int(tr.variables["tt_opt"]["t"]) > 0
        vs = [v for k, v in tr.variables["tt_opt"].items()
              if k.startswith("v_")]
        assert all(float(jnp.max(v)) > 0 for v in vs), \
            "second moments never updated through the multi-step loop"


class TestEvalSampled:
    """--eval-sampled: held-out accuracy via the sampled fanout forward —
    the papers-scale single-chip eval (full layer-wise inference cannot
    materialize (N, D) there).  Must roughly agree with the full eval on
    a small trained model."""

    def test_tracks_full_eval(self):
        ds = small_ds(n=2000)
        from dataclasses import replace
        cfg = small_cfg(batch_size=64, fanouts=(4, 4), epochs=3,
                        hidden_dim=32, lr=0.01, steps_per_call=4)
        tr = SageTrainer(ds, cfg)
        for e in range(3):
            tr.train_epoch(e)
        full = tr.evaluate()
        tr.cfg = replace(tr.cfg, eval_sampled=True)
        sampled = tr.evaluate()
        assert set(sampled) == {"train_acc", "val_acc", "test_acc"}
        # fanout-bounded neighborhoods approximate the exact aggregation
        assert abs(sampled["test_acc"] - full["test_acc"]) < 0.15, \
            (sampled, full)

    def test_subsamples_large_splits(self):
        ds = small_ds(n=2000)
        cfg = small_cfg(batch_size=64, fanouts=(4, 4),
                        eval_sampled=True, eval_sample_max=128)
        tr = SageTrainer(ds, cfg)
        accs = tr.evaluate_sampled()
        assert all(0.0 <= v <= 1.0 for v in accs.values())


class TestFullNeighbor:
    def test_flag_changes_path_and_trains(self):
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(use_sample=False, batch_size=32))
        assert tr._full_step_fn is not None
        stats = tr.train_epoch(0)
        assert np.isfinite(stats["loss"])

    def test_full_graph_forward_matches_inference_propagation(self):
        """forward_full_graph (training path) must equal the layer-wise
        inference propagation in eval mode — exact-aggregation parity."""
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(use_sample=False))
        logits_train_path = tr.model.apply(
            tr.variables, tr._src_dev, tr._dst_dev, tr._indeg_dev, False,
            method=SAGE.forward_full_graph)
        logits_infer = tr.infer_full()
        np.testing.assert_allclose(np.asarray(logits_train_path),
                                   logits_infer, atol=2e-5, rtol=1e-4)


class TestPureGPUMode:
    def test_device_sampler_correctness(self):
        from falcon_ttdforgnns_tpu.graph.device_sampler import (
            device_sample_neighbors)
        ds = small_ds()
        g = ds.graph
        indptr = jnp.asarray(g.indptr.astype(np.int32))
        indices = jnp.asarray(g.indices.astype(np.int32))
        nodes = np.arange(64, dtype=np.int32)
        nbrs = np.asarray(device_sample_neighbors(
            indptr, indices, jnp.asarray(nodes), 5, jax.random.PRNGKey(0)))
        for i, v in enumerate(nodes):
            s, e = g.indptr[v], g.indptr[v + 1]
            neigh = set(g.indices[s:e].tolist())
            for u in nbrs[i]:
                if e > s:
                    assert int(u) in neigh
                else:
                    assert int(u) == v  # isolated -> self loop

    def test_puregpu_epoch_trains(self):
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(mode="puregpu", steps_per_call=2))
        assert tr._device_multi_fn is not None
        before = np.asarray(
            jax.tree.leaves(tr.variables["params"])[0]).copy()
        stats = tr.train_epoch(0)
        after = np.asarray(jax.tree.leaves(tr.variables["params"])[0])
        assert np.isfinite(stats["loss"])
        assert not np.allclose(before, after), "params must move"

    def test_neighbor_table_membership_and_uniformity(self):
        """Every table slot is a true neighbor (self-loop when isolated),
        and slot draws are marginally uniform over the neighbor set."""
        from falcon_ttdforgnns_tpu.graph.device_sampler import (
            build_neighbor_table)
        ds = small_ds()
        g = ds.graph
        tbl = build_neighbor_table(g.indptr, g.indices, width=64, seed=3)
        assert tbl.shape == (g.num_nodes, 64)
        for v in range(min(64, g.num_nodes)):
            s, e = g.indptr[v], g.indptr[v + 1]
            if e > s:
                neigh = set(g.indices[s:e].tolist())
                assert set(tbl[v].tolist()) <= neigh
            else:
                assert (tbl[v] == v).all()
        # uniformity: over many slots, each neighbor of a high-degree node
        # appears with frequency ~ 1/deg (loose 4-sigma binomial bound)
        v = int(np.argmax(g.indptr[1:] - g.indptr[:-1]))
        neigh = g.indices[g.indptr[v]:g.indptr[v + 1]]
        uniq, mult = np.unique(neigh, return_counts=True)
        wide = build_neighbor_table(g.indptr, g.indices, width=2048, seed=5)
        counts = np.bincount(np.searchsorted(uniq, wide[v]),
                             minlength=len(uniq))
        p = mult / len(neigh)  # per-entry uniform -> multiplicity-weighted
        sigma = np.sqrt(2048 * p * (1 - p))
        assert (np.abs(counts - 2048 * p) < 4 * sigma + 1).all()

    def test_table_sampler_flag_changes_behavior(self):
        """--sampler table must route the puregpu step through the
        neighbor table: _table_dev is built, sampled ids are neighbors,
        and an epoch trains."""
        from falcon_ttdforgnns_tpu.graph.device_sampler import (
            device_sample_block_table)
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(mode="puregpu", steps_per_call=2,
                                       sampler="table", table_width=16))
        assert tr._table_dev is not None
        assert tr._table_dev.shape == (ds.num_nodes, 16)
        # layer contract matches the CSR device sampler
        seeds = jnp.arange(8, dtype=jnp.int32)
        layers = device_sample_block_table(tr._table_dev, seeds,
                                           tr.cfg.fanouts,
                                           jax.random.PRNGKey(0))
        widths = []
        f = 1
        for fo in reversed(tr.cfg.fanouts):
            f *= fo
            widths.append(f)
        assert [l.shape for l in layers] == [(8, w) for w in widths]
        stats = tr.train_epoch(0)
        assert np.isfinite(stats["loss"])

        csr_tr = SageTrainer(ds, small_cfg(mode="puregpu", steps_per_call=2))
        assert csr_tr._table_dev is None  # default csr path untouched

    def test_rbg_rng_impl_trains(self):
        """--rng-impl rbg must route in-step randomness through the rbg
        generator (typed key) and still train."""
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(mode="puregpu", steps_per_call=2,
                                       rng_impl="rbg"))
        key = tr._epoch_rng(0)
        assert jnp.issubdtype(key.dtype, jax.dtypes.prng_key)
        stats = tr.train_epoch(0)
        assert np.isfinite(stats["loss"])


class TestDistMultiStep:
    @pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
    def test_dp_multi_step_wired(self):
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(dist=True, steps_per_call=2,
                                       batch_size=16))
        assert tr.mesh is not None and tr._multi_fn is not None
        stats = tr.train_epoch(0)
        assert np.isfinite(stats["loss"])


class TestEmbName:
    def test_eff_selects_grouped(self):
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(grouped=True))
        assert tr.model.grouped is True
        ids = jnp.asarray(np.random.default_rng(0).integers(0, ds.num_nodes,
                                                            64, dtype=np.int32))
        a = tr.model.apply(tr.variables, ids, method=SAGE.materialize_features)
        tr2 = SageTrainer(ds, small_cfg(grouped=False))
        b = tr2.model.apply(tr2.variables, ids, method=SAGE.materialize_features)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5)


class TestNumWorkers:
    def test_parallel_loader_yields_valid_batches(self):
        from falcon_ttdforgnns_tpu.graph.sampler import NeighborLoader
        ds = small_ds()
        loader = NeighborLoader(ds.graph, ds.train_idx, ds.labels, (2, 3),
                                16, seed=0, num_workers=4)
        batches = list(loader)
        assert len(batches) == len(loader)
        for b in batches[:3]:
            assert b.seeds.shape == (16,)
            assert b.layers[0].shape == (16, 3)
            assert b.layers[1].shape == (16, 6)
            assert (b.layers[0] < ds.num_nodes).all()
        assert loader.freq is not None and loader.freq.sum() > 0


class TestNodeShardInference:
    @pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
    def test_sharded_inference_matches_single(self):
        ds = small_ds(n=512)
        tr = SageTrainer(ds, small_cfg())
        ref = tr.infer_full()
        tr.cfg.node_shard = True
        out = tr.infer_full_sharded()
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


class TestNodeShardTraining:
    @pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
    def test_full_neighbor_node_shard_trains(self):
        """--full-neighbor + --node-shard: the trainer routes through the
        ring-SpMM sharded step and trains."""
        ds = small_ds(n=400)
        tr = SageTrainer(ds, small_cfg(use_sample=False, node_shard=True,
                                       batch_size=32))
        assert getattr(tr, "_nshard_train", False)
        stats = tr.train_epoch(0)
        assert np.isfinite(stats["loss"])

    @pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
    def test_dist_puregpu_samples_in_jit(self):
        """--dist --mode puregpu: DP composes with device-side sampling —
        CSR replicated per chip, seeds sharded over 'data', and the result
        matches the single-device puregpu program exactly (VERDICT r2
        item 4; reference per-rank UVA sampling,
        sage_dgl_partition.py:153,164)."""
        ds = small_ds(n=800)
        common = dict(mode="puregpu", steps_per_call=4, batch_size=32,
                      dropout=0.0)
        tr_dp = SageTrainer(ds, small_cfg(dist=True, **common))
        assert tr_dp.mesh is not None          # DP mesh built
        assert tr_dp._device_multi_fn is not None  # in-jit sampling path
        m_dp = tr_dp.train_epoch(0)
        tr_1 = SageTrainer(ds, small_cfg(dist=False, **common))
        m_1 = tr_1.train_epoch(0)
        assert abs(m_dp["loss"] - m_1["loss"]) < 1e-4
        for a, b in zip(jax.tree.leaves(tr_dp.variables["params"]),
                        jax.tree.leaves(tr_1.variables["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)

    @pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
    def test_dist_node_shard_hybrid_mesh(self):
        """--dist --node-shard: hybrid 2x4 data x node mesh — batch sharded
        over 'data', ring SpMM over 'node' (VERDICT r2 item 3)."""
        ds = small_ds(n=400)
        tr = SageTrainer(ds, small_cfg(use_sample=False, node_shard=True,
                                       dist=True, batch_size=32))
        assert dict(tr._nshard_mesh.shape) == {"data": 2, "node": 4}
        stats = tr.train_epoch(0)
        assert np.isfinite(stats["loss"])

    @pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
    def test_data_shards_flag(self):
        """--data-shards picks the hybrid mesh split explicitly."""
        ds = small_ds(n=400)
        tr = SageTrainer(ds, small_cfg(use_sample=False, node_shard=True,
                                       dist=True, data_shards=4,
                                       batch_size=32))
        assert dict(tr._nshard_mesh.shape) == {"data": 4, "node": 2}
        with pytest.raises(ValueError, match="data-shards"):
            SageTrainer(ds, small_cfg(use_sample=False, node_shard=True,
                                      dist=True, data_shards=3))


class TestBf16:
    def test_bf16_tower_close_to_f32(self):
        """--bf16: conv-tower activations in bfloat16 — same program shape,
        loss within bf16 tolerance of the f32 step, params stay f32."""
        ds = small_ds(n=600)
        common = dict(mode="puregpu", steps_per_call=2, batch_size=32,
                      dropout=0.0)
        tr_b = SageTrainer(ds, small_cfg(bf16=True, **common))
        m_b = tr_b.train_epoch(0)
        tr_f = SageTrainer(ds, small_cfg(bf16=False, **common))
        m_f = tr_f.train_epoch(0)
        assert np.isfinite(m_b["loss"])
        assert abs(m_b["loss"] - m_f["loss"]) < 5e-2
        for leaf in jax.tree.leaves(tr_b.variables["params"]):
            assert leaf.dtype == np.float32

    def test_bf16_with_fused_sparse(self):
        """--bf16 --sparse: the f32 cotangent reaching the fused TT-SGD
        kernel comes from the bf16 tower via the astype transpose."""
        ds = small_ds(n=600)
        tr = SageTrainer(ds, small_cfg(bf16=True, sparse=True,
                                       tt_optimizer="sgd", dropout=0.0,
                                       batch_size=32))
        assert tr._fused_sparse
        m = tr.train_epoch(0)
        assert np.isfinite(m["loss"])

    def test_bf16_attribution_halves(self):
        """--bf16-tower / --bf16-kernel enable exactly one half of --bf16
        (the r4 precision-attribution knobs): tower-only keeps kernel I/O
        f32; kernel-only keeps the tower f32 with a bf16 h_all.  Both run
        the fused-Adam sparse step and land within bf16 tolerance of the
        f32 loss."""
        ds = small_ds(n=600)
        common = dict(sparse=True, tt_optimizer="adam", dropout=0.0,
                      batch_size=32, steps_per_call=2)
        losses = {}
        for name, kw in [("f32", {}), ("tower", {"bf16_tower": True}),
                         ("kernel", {"bf16_kernel": True})]:
            tr = SageTrainer(ds, small_cfg(**common, **kw))
            assert tr._fused_sparse
            # the model-side cast follows tower bf16; kernel-only keeps it f32
            assert tr.model.bf16 == (name == "tower")
            m = tr.train_epoch(0)
            losses[name] = m["loss"]
            assert np.isfinite(m["loss"])
        assert abs(losses["tower"] - losses["f32"]) < 5e-2
        assert abs(losses["kernel"] - losses["f32"]) < 5e-2

    def test_bf16_mean_f32_accumulation(self):
        """--bf16-mean-f32: under a bf16 tower the fanout means accumulate
        in f32 (output cast back to bf16) — the tower-half convergence-lag
        fix candidate.  Must thread to the model, train, and stay within
        bf16 tolerance of the plain bf16 step (it only changes the reduce
        accumulator, not the program)."""
        ds = small_ds(n=600)
        common = dict(mode="puregpu", steps_per_call=2, batch_size=32,
                      dropout=0.0, bf16=True)
        tr = SageTrainer(ds, small_cfg(bf16_mean_f32=True, **common))
        assert tr.model.mean_acc_f32
        m = tr.train_epoch(0)
        tr_p = SageTrainer(ds, small_cfg(**common))
        assert not tr_p.model.mean_acc_f32
        m_p = tr_p.train_epoch(0)
        assert np.isfinite(m["loss"])
        assert abs(m["loss"] - m_p["loss"]) < 5e-2

    def test_bf16_sr_store(self):
        """--bf16-sr: the fused-sparse step stores h_all with stochastic
        rounding (kernel-half convergence-lag fix candidate).  Trains,
        stays within bf16 tolerance of the RN bf16 step."""
        ds = small_ds(n=600)
        common = dict(sparse=True, tt_optimizer="adam", dropout=0.0,
                      batch_size=32, steps_per_call=2, bf16=True)
        tr = SageTrainer(ds, small_cfg(bf16_sr=True, **common))
        assert tr._fused_sparse
        m = tr.train_epoch(0)
        tr_rn = SageTrainer(ds, small_cfg(**common))
        m_rn = tr_rn.train_epoch(0)
        assert np.isfinite(m["loss"])
        assert abs(m["loss"] - m_rn["loss"]) < 5e-2


class TestEpochEdgeCases:
    def test_wrap_full_cyclic(self):
        """Ragged-tail wrap stays full-size even when the whole index set
        is smaller than one group (tiny --synthetic-scale crash)."""
        order = np.arange(10)
        out = SageTrainer._wrap_full(order[:10], order, 10)
        assert len(out) == 10
        out = SageTrainer._wrap_full(order[0:0][:0], order, 32)
        assert len(out) == 32
        out = SageTrainer._wrap_full(order[8:10], order, 32)
        assert len(out) == 32 and out[0] == 8 and out[1] == 9

    def test_puregpu_tiny_trainset(self):
        """per_group larger than the train set must not crash the reshape."""
        ds = small_ds(n=600)
        tr = SageTrainer(ds, small_cfg(mode="puregpu", steps_per_call=8,
                                       batch_size=64))
        assert len(ds.train_idx) < 8 * 64
        m = tr.train_epoch(0)
        assert np.isfinite(m["loss"])

    def test_full_neighbor_tiny_trainset(self):
        ds = small_ds(n=600)
        tr = SageTrainer(ds, small_cfg(use_sample=False, batch_size=512))
        assert len(ds.train_idx) < 512
        m = tr.train_epoch(0)
        assert np.isfinite(m["loss"])

    def test_dist_full_neighbor_rejected(self):
        """--dist + --full-neighbor would crash on a None step fn at the
        first batch; it must fail loudly at construction instead."""
        ds = small_ds()
        with pytest.raises(ValueError, match="node-shard"):
            SageTrainer(ds, small_cfg(use_sample=False, dist=True))


class TestGroupedKernelRouting:
    def test_grouped_wins_over_pallas_auto(self, monkeypatch):
        """--emb-name eff (grouped dedup) only exists on the XLA path; under
        kernel='auto' on TPU it must suppress the Pallas default or the
        flag is silently ignored."""
        from falcon_ttdforgnns_tpu.nn.tt_embedding import TTEmbeddingBag
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        mk = lambda **kw: TTEmbeddingBag(num_embeddings=1000, embedding_dim=16,
                                         tt_ranks=(4, 4), **kw)
        assert mk()._use_pallas()
        assert not mk(grouped=True)._use_pallas()
        assert mk(grouped=True, kernel="pallas")._use_pallas()  # explicit wins


class TestPuregpuCacheLifecycle:
    def test_device_counters_feed_populate(self):
        """In puregpu mode the host loader never runs: populate must use
        the device-side LFU counters (device_freq auto-enabled), not the
        loader's all-zero freq array (which populated an EMPTY cache)."""
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(mode="puregpu", steps_per_call=2,
                                       cache_size=32))
        assert tr.model.device_freq
        tr.train_epoch(0)
        meta = jax.tree.leaves(
            tr.variables["ttcache"], is_leaf=lambda x: hasattr(x, "freq"))[0]
        assert int(np.asarray(meta.freq).sum()) > 0  # device counting ran
        tr.maybe_populate_cache()
        meta = jax.tree.leaves(
            tr.variables["ttcache"], is_leaf=lambda x: hasattr(x, "ids"))[0]
        assert int((np.asarray(meta.ids) >= 0).sum()) > 0  # non-empty cache

    def test_puregpu_epoch_covers_tail_seeds(self):
        """ceil-grouping: a train set slightly above one group must yield
        two groups (floor dropped up to S*B-1 seeds per epoch)."""
        ds = small_ds(n=900)
        cfg = small_cfg(mode="puregpu", steps_per_call=4, batch_size=64)
        tr = SageTrainer(ds, cfg)
        per_group = 4 * 64
        n = len(ds.train_idx)
        assert n > per_group  # at least one full group plus a tail
        import math
        expect = max(1, math.ceil(n / per_group)) * 4
        tr.train_epoch(0)
        assert tr.step == expect


class TestPlateauPatience:
    def test_zero_disables_plateau_transform(self):
        """--plateau-patience 0 must build an optimizer with NO PlateauState
        leaf (plateau_scale == 1.0 forever); the default keeps it."""
        from falcon_ttdforgnns_tpu.train.optim import PlateauState, plateau_scale
        ds = small_ds()
        tr_off = SageTrainer(ds, small_cfg(plateau_patience=0))
        tr_on = SageTrainer(ds, small_cfg(plateau_patience=5))

        def has_plateau(tr):
            return any(isinstance(l, PlateauState) for l in jax.tree_util.tree_leaves(
                tr.opt_state, is_leaf=lambda x: isinstance(x, PlateauState)))

        assert not has_plateau(tr_off)
        assert has_plateau(tr_on)
        assert float(plateau_scale(tr_off.opt_state)) == 1.0

    def test_zero_trains_fused_sparse(self):
        """The fused path's in-kernel lr coupling must tolerate the missing
        plateau transform (lr_eff = lr * 1.0)."""
        ds = small_ds()
        tr = SageTrainer(ds, small_cfg(sparse=True, plateau_patience=0,
                                       epochs=2))
        r = tr.fit()
        assert np.isfinite(r["history"][-1]["loss"])

    def test_cli_flag_parses(self):
        from falcon_ttdforgnns_tpu.utils.config import parse_args
        args = parse_args(["--plateau-patience", "0"])
        assert args.plateau_patience == 0
        assert parse_args([]).plateau_patience == -1  # auto

    def test_auto_disables_under_bf16(self):
        """plateau_patience=-1 (auto): reference-parity 800 in f32,
        DISABLED under a bf16 tower (the r4 bf16 accuracy ceiling was the
        plateau ratchet; certified fix, logs/r5_cert.log)."""
        from falcon_ttdforgnns_tpu.train.optim import PlateauState
        ds = small_ds()

        def has_plateau(tr):
            return any(isinstance(l, PlateauState)
                       for l in jax.tree_util.tree_leaves(
                           tr.opt_state,
                           is_leaf=lambda x: isinstance(x, PlateauState)))

        assert has_plateau(SageTrainer(ds, small_cfg()))            # f32 auto
        assert not has_plateau(SageTrainer(ds, small_cfg(bf16=True)))  # bf16 auto
        # explicit patience wins over the auto rule
        assert has_plateau(SageTrainer(ds, small_cfg(bf16=True,
                                                     plateau_patience=5)))


class TestBf16F32Layers:
    def test_f32_head_and_first_change_dtypes(self):
        """--bf16-f32-head / --bf16-f32-first: the named conv runs f32
        under a bf16 tower (its conv output is f32; the rest stay bf16).
        Mechanism probes for the bf16 tower ceiling (round 5)."""
        ds = small_ds(n=600)
        common = dict(mode="puregpu", steps_per_call=2, batch_size=32,
                      dropout=0.0, bf16=True)
        losses = {}
        for name, kw in [("plain", {}), ("head", {"bf16_f32_head": True}),
                         ("first", {"bf16_f32_first": True})]:
            tr = SageTrainer(ds, small_cfg(**common, **kw))
            assert tr.model.bf16_f32_head == (name == "head")
            assert tr.model.bf16_f32_first == (name == "first")
            m = tr.train_epoch(0)
            losses[name] = m["loss"]
            assert np.isfinite(m["loss"])
            # params stay f32 in every arm
            for leaf in jax.tree.leaves(tr.variables["params"]):
                assert leaf.dtype == np.float32
        assert abs(losses["head"] - losses["plain"]) < 5e-2
        assert abs(losses["first"] - losses["plain"]) < 5e-2

    def test_cli_flags_parse(self):
        from falcon_ttdforgnns_tpu.utils.config import parse_args
        a = parse_args(["--bf16", "--bf16-f32-head"])
        assert a.bf16_f32_head and not a.bf16_f32_first
        a = parse_args(["--bf16", "--bf16-f32-first"])
        assert a.bf16_f32_first
