"""Aux subsystems: profiler harness, checkpoint roundtrip, tuner, metrics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from falcon_ttdforgnns_tpu.profiler import (generate_sparse_feature,
                                            TTEmbeddingBenchmark)
from falcon_ttdforgnns_tpu.train.checkpoint import (save_checkpoint,
                                                    restore_checkpoint,
                                                    latest_checkpoint)
from falcon_ttdforgnns_tpu.utils.tuner import minimize, tune_tt_rank
from falcon_ttdforgnns_tpu.utils import metrics as M


class TestProfiler:
    def test_sparse_feature_gen(self):
        idx, offs = generate_sparse_feature(64, 1000, pooling_factor=5.0)
        assert offs.shape == (65,)
        assert offs[-1] == len(idx)
        assert (np.diff(offs) >= 1).all()
        assert idx.max() < 1000

    def test_bench_correctness_small(self):
        b = TTEmbeddingBenchmark(batch_size=128, p_shapes=(10, 12, 14),
                                 q_shapes=(3, 4, 5), ranks=(8, 8))
        err = b.check_forward()
        assert err < 1e-3


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        variables = {"params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                                "b": jnp.ones((3,))}}
        opt_state = {"mu": jnp.zeros((2, 3))}
        path = save_checkpoint(str(tmp_path), 7, variables, opt_state,
                               {"best": 0.5})
        assert latest_checkpoint(str(tmp_path)) == path
        restored = restore_checkpoint(path, {"variables": variables,
                                             "opt_state": opt_state,
                                             "extra": {"best": 0.5}})
        np.testing.assert_array_equal(
            np.asarray(restored["variables"]["params"]["w"]),
            np.asarray(variables["params"]["w"]))
        np.testing.assert_array_equal(
            np.asarray(restored["opt_state"]["mu"]),
            np.asarray(opt_state["mu"]))

    def test_multiple_steps_latest(self, tmp_path):
        v = {"x": jnp.zeros((2,))}
        save_checkpoint(str(tmp_path), 1, v, {})
        p2 = save_checkpoint(str(tmp_path), 10, v, {})
        assert latest_checkpoint(str(tmp_path)) == p2


class TestTuner:
    def test_minimize_quadratic(self):
        res = minimize(lambda p: (p["x"] - 17) ** 2, {"x": (1, 64)},
                       budget=40, seed=0, engine="es")
        assert abs(res.best_params["x"] - 17) <= 4

    def test_tune_tt_rank_interface(self):
        calls = []

        def train_fn(ranks):
            calls.append(ranks)
            r1, r2 = ranks
            return 1000.0 / (1 + abs(r1 - 16) + abs(r2 - 16))  # peak at 16,16

        res = tune_tt_rank(train_fn, budget=20, rank_range=(2, 64), engine="es")
        assert len(calls) == 20
        assert abs(res.best_params["r1"] - 16) <= 12


class TestMetrics:
    def test_access_percentages(self):
        counts = np.zeros(100)
        counts[:10] = 100  # top 10% serve everything
        pct = M.access_percentages(counts, (0.1, 0.5))
        assert pct[0.1] == pytest.approx(1.0)

    def test_model_size(self):
        params = {"a": jnp.zeros((100, 10), jnp.float32)}
        assert M.model_size_mb(params) == pytest.approx(0.004)

    def test_cumulative_curve(self):
        xs, ys = M.cumulative_access_curve(np.random.default_rng(0).zipf(1.5, 1000))
        assert ys[-1] == pytest.approx(1.0)
        assert (np.diff(ys) >= -1e-9).all()


class TestTrainerResume:
    def test_save_restore_continue(self, tmp_path):
        from falcon_ttdforgnns_tpu.graph import synthetic_dataset
        from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
        ds = synthetic_dataset(num_nodes=400, avg_degree=5, num_classes=4,
                               feat_dim=16, seed=3)
        cfg = TrainConfig(batch_size=64, fanouts=(3, 3), epochs=1,
                          hidden_dim=16, num_layers=2, use_tt=True,
                          tt_ranks=(4, 4), weight_dist="normal",
                          eval_every=10**9, log_every=10**9, seed=5)
        t1 = SageTrainer(ds, cfg)
        t1.train_epoch(0)
        path = t1.save(str(tmp_path))
        logits1 = t1.infer_full()

        t2 = SageTrainer(ds, cfg)   # fresh init (different state)
        t2.restore(path)
        assert t2.step == t1.step
        logits2 = t2.infer_full()
        np.testing.assert_allclose(logits1, logits2, rtol=1e-5, atol=1e-5)
        # training continues from the restored state without error
        stats = t2.train_epoch(1)
        assert np.isfinite(stats["loss"])

    def test_fused_adagrad_state_roundtrips(self, tmp_path):
        """The fused-adagrad accumulators live in the variables pytree and
        must survive save/restore (a reset accumulator would silently
        restart the adagrad schedule)."""
        from falcon_ttdforgnns_tpu.graph import synthetic_dataset
        from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
        ds = synthetic_dataset(num_nodes=400, avg_degree=5, num_classes=4,
                               feat_dim=16, seed=3)
        cfg = TrainConfig(batch_size=64, fanouts=(3, 3), epochs=1,
                          hidden_dim=16, num_layers=2, use_tt=True,
                          tt_ranks=(4, 4), weight_dist="normal",
                          sparse=True, tt_optimizer="rowwise_adagrad",
                          eval_every=10**9, log_every=10**9, seed=5)
        t1 = SageTrainer(ds, cfg)
        t1.train_epoch(0)
        accs1 = {k: np.asarray(v) for k, v in t1.variables["tt_opt"].items()}
        assert any(a.max() > 0 for a in accs1.values())
        path = t1.save(str(tmp_path))

        t2 = SageTrainer(ds, cfg)
        t2.restore(path)
        for k, a in accs1.items():
            np.testing.assert_array_equal(
                np.asarray(t2.variables["tt_opt"][k]), a)
        stats = t2.train_epoch(1)
        assert np.isfinite(stats["loss"])

    def test_fused_adam_state_roundtrips(self, tmp_path):
        """The fused-Adam moments + step count (the round-4 --sparse
        default) must survive save/restore — a reset ``t`` would replay
        the bias-correction warmup and a reset ``v`` the lr ramp."""
        from falcon_ttdforgnns_tpu.graph import synthetic_dataset
        from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
        ds = synthetic_dataset(num_nodes=400, avg_degree=5, num_classes=4,
                               feat_dim=16, seed=3)
        cfg = TrainConfig(batch_size=64, fanouts=(3, 3), epochs=1,
                          hidden_dim=16, num_layers=2, use_tt=True,
                          tt_ranks=(4, 4), weight_dist="normal",
                          sparse=True, tt_optimizer="adam",
                          eval_every=10**9, log_every=10**9, seed=5)
        t1 = SageTrainer(ds, cfg)
        t1.train_epoch(0)
        state1 = {k: np.asarray(v) for k, v in t1.variables["tt_opt"].items()}
        assert int(state1["t"]) > 0
        path = t1.save(str(tmp_path))

        t2 = SageTrainer(ds, cfg)
        t2.restore(path)
        for k, a in state1.items():
            np.testing.assert_array_equal(
                np.asarray(t2.variables["tt_opt"][k]), a)
        stats = t2.train_epoch(1)
        assert np.isfinite(stats["loss"])


def test_training_is_seed_deterministic():
    """Two trainers with identical seeds must produce IDENTICAL loss
    sequences — covers the native CSR row-order and per-position sampler
    seeding fixes (thread interleaving must not leak into batches)."""
    from falcon_ttdforgnns_tpu.graph import synthetic_dataset
    from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
    import numpy as np

    def one_epoch_losses():
        ds = synthetic_dataset(num_nodes=800, avg_degree=6, num_classes=4,
                               feat_dim=16, seed=3)
        cfg = TrainConfig(batch_size=32, fanouts=(3, 3), epochs=1,
                          dropout=0.5, hidden_dim=16, num_layers=2,
                          use_tt=True, tt_ranks=(4, 4),
                          weight_dist="normal", eval_every=100,
                          log_every=1000, seed=11, skip_eval=True)
        tr = SageTrainer(ds, cfg)
        losses = []
        for batch in tr.loader:
            import jax, jax.numpy as jnp
            rng = jax.random.fold_in(jax.random.PRNGKey(0), len(losses))
            tr.variables, tr.opt_state, loss, _ = tr._step_fn(
                tr.variables, tr.opt_state, jnp.asarray(batch.seeds),
                [jnp.asarray(l) for l in batch.layers],
                jnp.asarray(batch.labels), rng)
            losses.append(float(loss))
            if len(losses) >= 6:
                break
        return np.asarray(losses)

    a = one_epoch_losses()
    b = one_epoch_losses()
    np.testing.assert_array_equal(a, b)
