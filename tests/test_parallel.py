"""Multi-device tests on the 8-device virtual CPU mesh: DP train step and
node-sharded ring SpMM — capabilities the CUDA reference could only test on
real multi-GPU hosts (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from falcon_ttdforgnns_tpu.graph import synthetic_dataset, sample_block, rmat_edges
from falcon_ttdforgnns_tpu.models import SAGE
from falcon_ttdforgnns_tpu.parallel import (
    make_mesh, make_dp_train_step, shard_batch, replicate, scaling_efficiency)
from falcon_ttdforgnns_tpu.parallel.node_sharding import (
    partition_edges_by_block, ring_spmm)
from falcon_ttdforgnns_tpu.train.optim import make_optimizer

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


class TestDataParallel:
    def test_dp_step_matches_single_device(self):
        """One DP step over 8 devices == the same step on one device."""
        ds = synthetic_dataset(num_nodes=800, avg_degree=5, num_classes=4,
                               feat_dim=16, seed=0)
        model = SAGE(num_nodes=ds.num_nodes, in_dim=16, hidden_dim=16,
                     num_classes=4, num_layers=2, use_tt=True, tt_ranks=(4, 4),
                     weight_dist="normal", dropout=0.0)
        batch = sample_block(ds.graph, np.arange(32), (2, 3),
                             np.random.default_rng(0))
        seeds = jnp.asarray(batch.seeds)
        layers = tuple(jnp.asarray(l) for l in batch.layers)
        labels = jnp.asarray(ds.labels[np.asarray(batch.seeds)].astype(np.int32))
        key = jax.random.PRNGKey(0)
        variables = model.init({"params": key, "dropout": key}, seeds, layers)
        tx = make_optimizer(lr=0.01, plateau=False)
        opt_state = tx.init(variables["params"])

        # single-device reference step
        import optax

        def step(vs, os_, s, ls, y, k):
            def loss_fn(p):
                out = model.apply({"params": p}, s, ls, train=True,
                                  rngs={"dropout": k})
                return optax.softmax_cross_entropy_with_integer_labels(out, y).mean()
            loss, grads = jax.value_and_grad(loss_fn)(vs["params"])
            ups, nos = tx.update(grads, os_, vs["params"], value=loss)
            return optax.apply_updates(vs["params"], ups), loss

        ref_params, ref_loss = jax.jit(step)(variables, opt_state, seeds,
                                             layers, labels, key)

        mesh = make_mesh(n_data=8)
        dp_step = make_dp_train_step(model, tx, mesh)
        vs = replicate(mesh, variables)
        os_ = replicate(mesh, tx.init(variables["params"]))
        s, y = shard_batch(mesh, seeds, labels)
        ls = tuple(shard_batch(mesh, l) for l in layers)
        new_vars, _, loss, acc = dp_step(vs, os_, s, ls, y,
                                         replicate(mesh, key))
        # same loss (global mean) and same updated params (grad allreduce)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        a = jax.tree.leaves(new_vars["params"])
        b = jax.tree.leaves(ref_params)
        for x, y_ in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y_),
                                       rtol=5e-4, atol=1e-5)

    def test_scaling_efficiency_helper(self):
        eff = scaling_efficiency({1: 100.0, 8: 640.0})
        assert eff[8] == pytest.approx(0.8)


class TestRingSpmm:
    def test_matches_dense_spmm(self):
        n, s_shards = 64, 8
        src, dst = rmat_edges(n, 400, seed=2)
        src = src.astype(np.int64); dst = dst.astype(np.int64)
        d = 16
        h = np.random.default_rng(0).normal(size=(n, d)).astype(np.float32)

        # dense reference
        ref = np.zeros_like(h)
        np.add.at(ref, dst, h[src])

        src_b, dst_b, w_b, block = partition_edges_by_block(
            src, dst, n, s_shards, pad_multiple=8)
        n_pad = block * s_shards
        h_pad = np.zeros((n_pad, d), np.float32)
        h_pad[:n] = h

        mesh = make_mesh(n_data=1, n_node=8)
        out = ring_spmm(mesh, jnp.asarray(h_pad), jnp.asarray(src_b),
                        jnp.asarray(dst_b), jnp.asarray(w_b), axis="node")
        np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=1e-4,
                                   atol=1e-4)


class TestRaggedRingSpmm:
    """Ragged layout: O(E + S^2*chunk) memory with ring parity preserved
    (VERDICT r2 item 2)."""

    def _layout_and_ref(self, n, e, seed, chunk):
        from falcon_ttdforgnns_tpu.parallel.node_sharding import (
            partition_edges_ragged)
        src, dst = rmat_edges(n, e, seed=seed)
        src, dst = src.astype(np.int64), dst.astype(np.int64)
        d = 16
        h = np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)
        ref = np.zeros_like(h, dtype=np.float64)
        np.add.at(ref, dst, h[src].astype(np.float64))
        lay = partition_edges_ragged(src, dst, n, 8, chunk=chunk)
        return src, dst, h, ref, lay

    def test_matches_dense_spmm(self):
        from falcon_ttdforgnns_tpu.parallel.node_sharding import (
            ring_spmm_ragged)
        src, dst, h, ref, lay = self._layout_and_ref(64, 400, 2, chunk=8)
        h_pad = np.zeros((lay.num_rows_padded, h.shape[1]), np.float32)
        h_pad[lay.row_of] = h
        mesh = make_mesh(n_data=1, n_node=8)
        out = ring_spmm_ragged(mesh, jnp.asarray(h_pad),
                               jnp.asarray(lay.src_r), jnp.asarray(lay.dst_r),
                               jnp.asarray(lay.nreal),
                               jnp.asarray(lay.chunk_offs), lay.max_chunks,
                               lay.chunk)
        np.testing.assert_allclose(np.asarray(out)[lay.row_of], ref,
                                   rtol=1e-4, atol=1e-4)

    def test_gradient_matches_transpose(self):
        """d/dh of sum(out^2): ppermute/scan/dynamic_slice all transpose
        correctly (the training step differentiates through the ring)."""
        from falcon_ttdforgnns_tpu.parallel.node_sharding import (
            ring_spmm_ragged)
        src, dst, h, ref, lay = self._layout_and_ref(48, 300, 7, chunk=8)
        h_pad = np.zeros((lay.num_rows_padded, h.shape[1]), np.float32)
        h_pad[lay.row_of] = h
        mesh = make_mesh(n_data=1, n_node=8)
        args = (jnp.asarray(lay.src_r), jnp.asarray(lay.dst_r),
                jnp.asarray(lay.nreal), jnp.asarray(lay.chunk_offs))

        def loss(hp):
            o = ring_spmm_ragged(mesh, hp, *args, lay.max_chunks, lay.chunk)
            return (o ** 2).sum()

        g = np.asarray(jax.grad(loss)(jnp.asarray(h_pad)))[lay.row_of]
        gref = np.zeros_like(h, dtype=np.float64)
        np.add.at(gref, src, 2.0 * ref[dst])
        np.testing.assert_allclose(g, gref, rtol=1e-3, atol=1e-3)

    def test_skew_memory_bound(self):
        """Power-law RMAT at S=8: ragged stays <= 1.5x the edge count where
        the dense bucket layout pads to several x (the papers100M blocker,
        VERDICT r2 item 2 'done' criterion)."""
        from falcon_ttdforgnns_tpu.parallel.node_sharding import (
            partition_edges_by_block, partition_edges_ragged)
        n, e, S = 2 ** 14, 400_000, 8
        src, dst = rmat_edges(n, e, seed=1)
        src, dst = src.astype(np.int64), dst.astype(np.int64)
        lay = partition_edges_ragged(src, dst, n, S, chunk=1024)
        assert lay.memory_ratio <= 1.5, lay.memory_ratio
        src_b, _, _, _ = partition_edges_by_block(src, dst, n, S)
        dense_ratio = src_b.size / len(src)
        # the dense layout on the same graph is the blowup the ragged
        # layout exists to fix
        assert dense_ratio > 3.0, dense_ratio
        # ring parity on the skewed graph too (spot-check, small D)
        d = 4
        h = np.random.default_rng(0).normal(size=(n, d)).astype(np.float32)
        ref = np.zeros_like(h, dtype=np.float64)
        np.add.at(ref, dst, h[src].astype(np.float64))
        h_pad = np.zeros((lay.num_rows_padded, d), np.float32)
        h_pad[lay.row_of] = h
        from falcon_ttdforgnns_tpu.parallel.node_sharding import (
            ring_spmm_ragged)
        mesh = make_mesh(n_data=1, n_node=8)
        out = ring_spmm_ragged(mesh, jnp.asarray(h_pad),
                               jnp.asarray(lay.src_r), jnp.asarray(lay.dst_r),
                               jnp.asarray(lay.nreal),
                               jnp.asarray(lay.chunk_offs), lay.max_chunks,
                               lay.chunk)
        out = np.asarray(out)[lay.row_of]
        rel = np.abs(out - ref) / (np.abs(ref) + 1e-2)
        assert rel.max() < 5e-3, rel.max()

    def test_balanced_assignment_balances_skew(self):
        from falcon_ttdforgnns_tpu.parallel.node_sharding import (
            balanced_row_assignment)
        rng = np.random.default_rng(0)
        # heavy-tailed but physical (unclamped zipf(1.5) puts 99.8% of all
        # mass on one node — no assignment can balance that)
        deg = np.minimum(rng.zipf(1.5, 4096), 10_000).astype(np.int64)
        row_of, block = balanced_row_assignment(deg, 8)
        shard = row_of // block
        loads = np.bincount(shard, weights=deg, minlength=8)
        assert loads.max() / max(loads.mean(), 1) < 1.05


class TestShardedInference:
    def test_layerwise_matches_dense(self):
        """Node-sharded layer-wise inference == dense reference on the
        8-device mesh (the papers100M inference path)."""
        from falcon_ttdforgnns_tpu.parallel.node_sharding import (
            partition_edges_by_block, sharded_layerwise_inference)
        n, s_shards, d = 64, 8, 8
        src, dst = rmat_edges(n, 300, seed=5)
        src, dst = src.astype(np.int64), dst.astype(np.int64)
        h0 = np.random.default_rng(1).normal(size=(n, d)).astype(np.float32)
        in_deg = np.bincount(dst, minlength=n).astype(np.float32)
        w = np.random.default_rng(2).normal(size=(d, d)).astype(np.float32) * 0.3

        src_b, dst_b, w_b, block = partition_edges_by_block(src, dst, n, s_shards,
                                                            pad_multiple=8)
        n_pad = block * s_shards
        h_pad = np.zeros((n_pad, d), np.float32)
        h_pad[:n] = h0
        deg_pad = np.ones((n_pad,), np.float32)
        deg_pad[:n] = np.maximum(in_deg, 1.0)

        def apply_fn(variables, h, agg, li):
            return jnp.tanh(agg @ variables)  # simple per-layer transform

        mesh = make_mesh(n_data=1, n_node=8)
        out = sharded_layerwise_inference(
            mesh, apply_fn, jnp.asarray(w), jnp.asarray(h_pad),
            jnp.asarray(src_b), jnp.asarray(dst_b), jnp.asarray(w_b),
            jnp.asarray(deg_pad), num_layers=2)

        # dense reference
        h = h0
        for _ in range(2):
            agg = np.zeros_like(h)
            np.add.at(agg, dst, h[src])
            agg = agg / np.maximum(in_deg, 1.0)[:, None]
            h = np.tanh(agg @ w)
        np.testing.assert_allclose(np.asarray(out)[:n], h, rtol=1e-4, atol=1e-4)


class TestDpMultiStep:
    def test_runs_and_learns_shape(self):
        from falcon_ttdforgnns_tpu.parallel.data_parallel import make_dp_multi_step
        from falcon_ttdforgnns_tpu.train.optim import make_optimizer
        ds = synthetic_dataset(num_nodes=600, avg_degree=5, num_classes=4,
                               feat_dim=16, seed=1)
        model = SAGE(num_nodes=ds.num_nodes, in_dim=16, hidden_dim=16,
                     num_classes=4, num_layers=2, use_tt=True, tt_ranks=(4, 4),
                     weight_dist="normal", dropout=0.0)
        B, S = 32, 3
        widths = [3, 9]
        rng_np = np.random.default_rng(0)
        packed = np.empty((S, B, 2 + sum(widths)), np.int32)
        for s in range(S):
            batch = sample_block(ds.graph, rng_np.integers(0, ds.num_nodes, B),
                                 (3, 3), rng_np)
            packed[s, :, 0] = batch.seeds
            packed[s, :, 1] = ds.labels[batch.seeds]
            packed[s, :, 2:2 + 3] = batch.layers[0]
            packed[s, :, 5:5 + 9] = batch.layers[1]
        key = jax.random.PRNGKey(0)
        seeds0 = jnp.asarray(packed[0, :, 0])
        layers0 = [jnp.asarray(packed[0, :, 2:5]), jnp.asarray(packed[0, :, 5:14])]
        variables = model.init({"params": key, "dropout": key}, seeds0, layers0)
        tx = make_optimizer(lr=0.01, plateau=False)
        mesh = make_mesh(n_data=8)
        step = make_dp_multi_step(model, tx, mesh, S, widths)
        vs = replicate(mesh, variables)
        os_ = replicate(mesh, tx.init(variables["params"]))
        pk = jax.device_put(jnp.asarray(packed),
                            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data", None)))
        vs, os_, loss, acc = step(vs, os_, pk, replicate(mesh, key))
        assert np.isfinite(float(loss))


class TestNodeShardedTraining:
    def test_full_step_matches_single_device(self):
        """Node-sharded full-neighbor TRAIN step == the single-device
        forward_full_graph step: same loss, same updated params (the
        papers100M training regime, VERDICT r1 item 6)."""
        import optax
        from falcon_ttdforgnns_tpu.parallel.node_sharding import (
            partition_edges_ragged, make_node_sharded_full_step)
        from falcon_ttdforgnns_tpu.train.optim import make_optimizer

        ds = synthetic_dataset(num_nodes=200, avg_degree=5, num_classes=4,
                               feat_dim=16, seed=3)
        n, s_shards = ds.num_nodes, 8
        model = SAGE(num_nodes=n, in_dim=16, hidden_dim=16, num_classes=4,
                     num_layers=2, use_tt=True, tt_ranks=(4, 4),
                     weight_dist="normal", dropout=0.0)
        src, dst = ds.graph.to_coo()
        in_deg = ds.graph.degrees.astype(np.float32)
        seeds = np.arange(0, 40, dtype=np.int32)
        labels = ds.labels[seeds].astype(np.int32)
        key = jax.random.PRNGKey(0)
        b0 = sample_block(ds.graph, np.arange(8), (2, 2),
                          np.random.default_rng(0))
        variables = model.init({"params": key, "dropout": key},
                               jnp.asarray(b0.seeds),
                               [jnp.asarray(l) for l in b0.layers])
        tx = make_optimizer(lr=0.01, plateau=False)
        opt_state = tx.init(variables["params"])

        # single-device reference step on forward_full_graph
        def ref_step(vs, os_):
            def loss_fn(p):
                logits_all = model.apply(
                    {"params": p}, jnp.asarray(src.astype(np.int32)),
                    jnp.asarray(dst), jnp.asarray(in_deg), False,
                    method=SAGE.forward_full_graph)
                logits = jnp.take(logits_all, jnp.asarray(seeds), axis=0)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, jnp.asarray(labels)).mean()
            loss, grads = jax.value_and_grad(loss_fn)(vs["params"])
            ups, _ = tx.update(grads, os_, vs["params"], value=loss)
            return optax.apply_updates(vs["params"], ups), loss

        ref_params, ref_loss = jax.jit(ref_step)(variables, opt_state)

        # node-sharded step on the 8-device mesh (ragged balanced layout)
        lay = partition_edges_ragged(src.astype(np.int64),
                                     dst.astype(np.int64), n, s_shards,
                                     chunk=16)
        deg_pad = np.ones((lay.num_rows_padded,), np.float32)
        deg_pad[lay.row_of] = in_deg
        mesh = make_mesh(n_data=1, n_node=8)
        step = make_node_sharded_full_step(model, tx, mesh, 2,
                                           lay.max_chunks, lay.chunk)
        new_vars, _, loss, acc = step(
            variables, tx.init(variables["params"]), jnp.asarray(lay.src_r),
            jnp.asarray(lay.dst_r), jnp.asarray(lay.nreal),
            jnp.asarray(lay.chunk_offs), jnp.asarray(lay.node_at),
            jnp.asarray(deg_pad),
            jnp.asarray(lay.row_of[seeds].astype(np.int32)),
            jnp.asarray(labels), jax.random.PRNGKey(1))

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
        for x, y_ in zip(jax.tree.leaves(new_vars["params"]),
                         jax.tree.leaves(ref_params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y_),
                                       rtol=5e-4, atol=1e-5)

    def test_hybrid_data_x_node_matches_single_device(self):
        """--dist --node-shard: the SAME step on a 2x4 data x node mesh —
        batch sharded over 'data', ring over 'node' — must produce the
        identical loss and params (grads psum over both axes; VERDICT r2
        item 3)."""
        import optax
        from falcon_ttdforgnns_tpu.parallel.node_sharding import (
            partition_edges_ragged, make_node_sharded_full_step)
        from falcon_ttdforgnns_tpu.train.optim import make_optimizer

        ds = synthetic_dataset(num_nodes=160, avg_degree=5, num_classes=4,
                               feat_dim=16, seed=4)
        n = ds.num_nodes
        model = SAGE(num_nodes=n, in_dim=16, hidden_dim=16, num_classes=4,
                     num_layers=2, use_tt=True, tt_ranks=(4, 4),
                     weight_dist="normal", dropout=0.0)
        src, dst = ds.graph.to_coo()
        in_deg = ds.graph.degrees.astype(np.float32)
        seeds = np.arange(0, 32, dtype=np.int32)
        labels = ds.labels[seeds].astype(np.int32)
        key = jax.random.PRNGKey(0)
        b0 = sample_block(ds.graph, np.arange(8), (2, 2),
                          np.random.default_rng(0))
        variables = model.init({"params": key, "dropout": key},
                               jnp.asarray(b0.seeds),
                               [jnp.asarray(l) for l in b0.layers])
        tx = make_optimizer(lr=0.01, plateau=False)

        def ref_step(vs, os_):
            def loss_fn(p):
                logits_all = model.apply(
                    {"params": p}, jnp.asarray(src.astype(np.int32)),
                    jnp.asarray(dst), jnp.asarray(in_deg), False,
                    method=SAGE.forward_full_graph)
                logits = jnp.take(logits_all, jnp.asarray(seeds), axis=0)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, jnp.asarray(labels)).mean()
            loss, grads = jax.value_and_grad(loss_fn)(vs["params"])
            ups, _ = tx.update(grads, os_, vs["params"], value=loss)
            return optax.apply_updates(vs["params"], ups), loss

        ref_params, ref_loss = jax.jit(ref_step)(
            variables, tx.init(variables["params"]))

        lay = partition_edges_ragged(src.astype(np.int64),
                                     dst.astype(np.int64), n, 4, chunk=16)
        deg_pad = np.ones((lay.num_rows_padded,), np.float32)
        deg_pad[lay.row_of] = in_deg
        mesh = make_mesh(n_data=2, n_node=4)
        assert dict(mesh.shape) == {"data": 2, "node": 4}
        step = make_node_sharded_full_step(model, tx, mesh, 2,
                                           lay.max_chunks, lay.chunk,
                                           data_axis="data")
        new_vars, _, loss, acc = step(
            variables, tx.init(variables["params"]), jnp.asarray(lay.src_r),
            jnp.asarray(lay.dst_r), jnp.asarray(lay.nreal),
            jnp.asarray(lay.chunk_offs), jnp.asarray(lay.node_at),
            jnp.asarray(deg_pad),
            jnp.asarray(lay.row_of[seeds].astype(np.int32)),
            jnp.asarray(labels), jax.random.PRNGKey(1))

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
        for x, y_ in zip(jax.tree.leaves(new_vars["params"]),
                         jax.tree.leaves(ref_params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y_),
                                       rtol=5e-4, atol=1e-5)
