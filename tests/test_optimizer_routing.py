"""Optimizer routing correctness: multi_transform labels actually route
parameter groups to their transforms (SURVEY §2.2 OptimType semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from falcon_ttdforgnns_tpu.train.optim import (make_optimizer, _label_params,
                                               rowwise_adagrad)


def fake_params():
    return {
        "embed": {
            "tt_core_0": jnp.ones((4, 1, 2, 3)),
            "tt_core_1": jnp.ones((5, 3, 2, 1)),
            "cache_weight": jnp.ones((8, 6)),
        },
        "conv_0": {"self": {"kernel": jnp.ones((6, 6)), "bias": jnp.ones((6,))}},
    }


def test_labels():
    labels = _label_params(fake_params())
    assert labels["embed"]["tt_core_0"] == "tt"
    assert labels["embed"]["tt_core_1"] == "tt"
    assert labels["embed"]["cache_weight"] == "cache"
    assert labels["conv_0"]["self"]["kernel"] == "model"


def test_tt_sgd_routing():
    """tt_optimizer='sgd' => core update is exactly -lr*grad while model
    params get Adam (different magnitude for same grad)."""
    params = fake_params()
    tx = make_optimizer(lr=0.1, tt_optimizer="sgd", plateau=False)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params, value=jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(updates["embed"]["tt_core_0"]),
                               -0.1, rtol=1e-6)
    # adam first step ~ -lr * g/(sqrt(g^2)+eps) ~ -lr but not exactly -lr*g
    adam_up = float(np.asarray(updates["conv_0"]["self"]["kernel"])[0, 0])
    assert abs(adam_up + 0.1) < 0.05 and adam_up != -0.1


def test_rowwise_adagrad_semantics():
    tx = rowwise_adagrad(lr=1.0)
    p = {"w": jnp.ones((4, 8))}
    st = tx.init(p)
    g = {"w": jnp.full((4, 8), 2.0)}
    up, st = tx.update(g, st, p)
    # acc = mean(4) = 4 per row; update = -1/sqrt(4) * 2 = -1
    np.testing.assert_allclose(np.asarray(up["w"]), -1.0, rtol=1e-5)
    up2, st = tx.update(g, st, p)
    # acc = 8; update = -2/sqrt(8)
    np.testing.assert_allclose(np.asarray(up2["w"]), -2 / np.sqrt(8), rtol=1e-5)


def test_tt_adagrad_routing():
    """tt_optimizer='adagrad' => per-element accumulator semantics on the
    cores (`tt_adagrad_backward`, cu:721-754): first-step update is
    -lr * g / sqrt(g^2 + eps) = -lr (for unit grads, eps->0), and the
    SECOND step shrinks by sqrt(2) — unlike sgd which stays constant."""
    params = fake_params()
    tx = make_optimizer(lr=0.1, tt_optimizer="adagrad", plateau=False)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    up1, state = tx.update(grads, state, params, value=jnp.float32(1.0))
    u1 = float(np.asarray(up1["embed"]["tt_core_0"])[0, 0, 0, 0])
    params = optax.apply_updates(params, up1)
    up2, state = tx.update(grads, state, params, value=jnp.float32(1.0))
    u2 = float(np.asarray(up2["embed"]["tt_core_0"])[0, 0, 0, 0])
    np.testing.assert_allclose(u1, -0.1, rtol=1e-2)
    np.testing.assert_allclose(u2, -0.1 / np.sqrt(2), rtol=1e-2)


def test_tt_rowwise_adagrad_routing():
    """tt_optimizer='rowwise_adagrad' => one accumulator per p-row of each
    4-D core (EXACT_ROWWISE_ADAGRAD semantics)."""
    params = fake_params()
    tx = make_optimizer(lr=1.0, tt_optimizer="rowwise_adagrad", plateau=False)
    state = tx.init(params)
    grads = jax.tree.map(lambda p: 2.0 * jnp.ones_like(p), params)
    up, _ = tx.update(grads, state, params, value=jnp.float32(1.0))
    # acc = mean(g^2) over non-leading axes = 4; update = -2/sqrt(4) = -1
    np.testing.assert_allclose(np.asarray(up["embed"]["tt_core_0"]), -1.0,
                               rtol=1e-5)


def test_rowwise_adagrad_on_4d_cores():
    tx = rowwise_adagrad(lr=1.0)
    p = {"c": jnp.ones((4, 2, 3, 2))}
    st = tx.init(p)
    assert st["c"].shape == (4,)
    g = {"c": jnp.full((4, 2, 3, 2), 2.0)}
    up, st = tx.update(g, st, p)
    np.testing.assert_allclose(np.asarray(up["c"]), -1.0, rtol=1e-5)


def test_plateau_reduces_lr():
    """Constant loss for > patience steps halves the effective step."""
    params = {"w": jnp.ones((3,))}
    tx = make_optimizer(lr=0.1, tt_optimizer="sgd", plateau=True,
                        plateau_patience=3, plateau_factor=0.5)
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    scales = []
    for i in range(10):
        up, state = tx.update(g, state, params, value=jnp.float32(1.0))
        scales.append(float(np.asarray(up["w"])[0]))
    assert scales[-1] > scales[0]  # updates are negative; shrunk magnitude
    assert abs(scales[-1]) < abs(scales[0])


def test_unknown_optimizer_names_raise():
    import pytest
    with pytest.raises(ValueError, match="tt_optimizer"):
        make_optimizer(tt_optimizer="adamw")
    with pytest.raises(ValueError, match="cache_optimizer"):
        make_optimizer(cache_optimizer="rowwise-adagrad")  # typo'd name


def test_reset_cache_opt_state_only_resets_cache():
    """populate() re-sorts the slot->id table, so per-slot cache
    accumulators must reset while model/TT momenta survive."""
    from falcon_ttdforgnns_tpu.train.optim import reset_cache_opt_state
    params = fake_params()
    tx = make_optimizer(tt_optimizer="adam", cache_optimizer="rowwise_adagrad",
                        plateau=False)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    _, state = tx.update(grads, state, params)

    def find_partition(s):
        if hasattr(s, "inner_states"):
            return s
        if isinstance(s, tuple):
            for x in s:
                r = find_partition(x)
                if r is not None:
                    return r
        return None

    st = find_partition(state)
    cache_acc = jax.tree.leaves(st.inner_states["cache"])
    assert any(float(jnp.sum(l)) != 0 for l in cache_acc if hasattr(l, "sum"))

    state2 = reset_cache_opt_state(tx, state, params)
    st2 = find_partition(state2)
    for l in jax.tree.leaves(st2.inner_states["cache"]):
        if hasattr(l, "sum"):
            np.testing.assert_array_equal(np.asarray(l), 0)
    # model adam moments preserved bit-for-bit
    for a, b in zip(jax.tree.leaves(st.inner_states["model"]),
                    jax.tree.leaves(st2.inner_states["model"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plateau_smoothing_zero_is_exact_parity():
    """smoothing=0 must reproduce the raw-value ratchet bit-for-bit (the
    reference-parity default in f32)."""
    import jax.numpy as jnp
    from falcon_ttdforgnns_tpu.train.optim import reduce_on_plateau

    tx0 = reduce_on_plateau(patience=3, factor=0.5)
    txs = reduce_on_plateau(patience=3, factor=0.5, smoothing=0.0)
    s0, ss = tx0.init(None), txs.init(None)
    params = {"w": jnp.zeros(2)}
    for v in [1.0, 0.9, 0.95, 0.94, 0.93, 0.92, 0.5, 0.6]:
        _, s0 = tx0.update({"w": jnp.zeros(2)}, s0, params, value=v)
        _, ss = txs.update({"w": jnp.zeros(2)}, ss, params, value=v)
        assert float(s0.scale) == float(ss.scale)
        assert float(s0.best_value) == float(ss.best_value)


def test_trainer_threads_plateau_knobs():
    from falcon_ttdforgnns_tpu.graph import synthetic_dataset
    from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig

    ds = synthetic_dataset(num_nodes=600, avg_degree=6, num_classes=4,
                           feat_dim=16, seed=0)

    def cfg(**kw):
        return TrainConfig(batch_size=16, fanouts=(2, 3), epochs=1,
                           hidden_dim=16, num_layers=2, tt_ranks=(4, 4),
                           weight_dist="normal", skip_eval=True, **kw)

    import falcon_ttdforgnns_tpu.train.trainer as T
    seen = {}
    orig = T.make_optimizer

    def spy(**kw):
        seen.update(kw)
        return orig(**kw)

    T.make_optimizer = spy
    try:
        SageTrainer(ds, cfg())
        assert seen["plateau"] and seen["plateau_patience"] == 800
        SageTrainer(ds, cfg(bf16=True))
        assert not seen["plateau"]          # auto-disable under bf16
        SageTrainer(ds, cfg(bf16=True, plateau_patience=7,
                            plateau_smooth=0.25, plateau_rtol=3e-3))
        assert seen["plateau"] and seen["plateau_patience"] == 7
        assert seen["plateau_smoothing"] == 0.25
        assert seen["plateau_rtol"] == 3e-3
    finally:
        T.make_optimizer = orig
