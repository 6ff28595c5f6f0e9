"""Window-blocked SpMM (ops/spmm_blocked.py) vs the dense segment-sum
reference — tiling invariants and numeric parity (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from falcon_ttdforgnns_tpu.ops.segment import spmm_sum
from falcon_ttdforgnns_tpu.ops.spmm_blocked import (build_window_tiles,
                                                    spmm_sum_blocked)


def random_graph(n, e, seed=0, zipf=False):
    rng = np.random.default_rng(seed)
    if zipf:  # skewed degrees (hub nodes)
        src = (rng.zipf(1.4, e) % n).astype(np.int64)
        dst = (rng.zipf(1.4, e) % n).astype(np.int64)
    else:
        src = rng.integers(0, n, e).astype(np.int64)
        dst = rng.integers(0, n, e).astype(np.int64)
    return src, dst


@pytest.mark.parametrize("zipf", [False, True])
@pytest.mark.parametrize("buckets", [1, 4])
def test_blocked_matches_segment_sum(zipf, buckets):
    n, e, d = 3000, 20_000, 16
    src, dst = random_graph(n, e, seed=1, zipf=zipf)
    w = np.random.default_rng(2).random(e).astype(np.float32)
    h = jnp.asarray(np.random.default_rng(3).normal(size=(n, d)).astype(np.float32))

    ts = build_window_tiles(src, dst, n, edge_weight=w, tile=256,
                            dst_buckets=buckets, chunk_tiles=8)
    got = spmm_sum_blocked(h, ts, chunk_tiles=8, interpret=True)
    want = spmm_sum(h, jnp.asarray(src.astype(np.int32)),
                    jnp.asarray(dst.astype(np.int32)), n,
                    edge_weight=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_tiling_invariants():
    n, e = 5000, 40_000
    src, dst = random_graph(n, e, seed=7, zipf=True)
    T = 512
    ts = build_window_tiles(src, dst, n, tile=T, dst_buckets=8,
                            chunk_tiles=4)
    assert ts.win.shape[0] % 4 == 0
    assert float(ts.w.sum()) == e  # every real edge exactly once (w=1)
    # every real slot's src stays inside its tile's window
    half = T // 2
    real = ts.w > 0
    assert (ts.idx[real] >= 0).all() and (ts.idx[real] < T).all()
    # fragmentation sanity: padded slots bounded (tiles ~ E/T + windows)
    assert ts.win.shape[0] * T < 6 * e
    # reconstruct each edge's global src and check multiset equality
    gsrc = (ts.win[:, None] * half + ts.idx)[real]
    np.testing.assert_array_equal(np.sort(gsrc), np.sort(src))
    gdst = ts.dst[real]
    np.testing.assert_array_equal(np.sort(gdst), np.sort(dst))


def test_blocked_self_loops_and_empty_rows():
    n, d = 257, 8
    src = np.arange(n, dtype=np.int64)
    dst = np.arange(n, dtype=np.int64)  # pure self-loops; many empty rows
    h = jnp.asarray(np.random.default_rng(0).normal(size=(n, d)).astype(np.float32))
    ts = build_window_tiles(src, dst, n, tile=128, dst_buckets=2,
                            chunk_tiles=2)
    got = spmm_sum_blocked(h, ts, chunk_tiles=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(h), rtol=1e-5)


def test_blocked_dev_inside_jit_layerwise():
    """The trainer's eval embeds spmm_sum_blocked_dev inside one jitted
    multi-layer propagation — the scan formulation must trace cleanly and
    agree with the reference layer-by-layer."""
    from falcon_ttdforgnns_tpu.ops.spmm_blocked import (chunk_tiles_host,
                                                        spmm_sum_blocked_dev)
    n, e, d = 2000, 12_000, 8
    src, dst = random_graph(n, e, seed=5)
    h0 = jnp.asarray(np.random.default_rng(6).normal(size=(n, d)).astype(np.float32))
    ts = build_window_tiles(src, dst, n, tile=256, dst_buckets=4,
                            chunk_tiles=8)
    chunks = tuple(jnp.asarray(a) for a in chunk_tiles_host(ts, 8))

    @jax.jit
    def prop(h, win2, idx2, dst2, w2):
        for _ in range(2):
            h = spmm_sum_blocked_dev(h, win2, idx2, dst2, w2, 256, n,
                                     interpret=True)
        return h

    got = prop(h0, *chunks)
    want = h0
    srcj = jnp.asarray(src.astype(np.int32))
    dstj = jnp.asarray(dst.astype(np.int32))
    for _ in range(2):
        want = spmm_sum(want, srcj, dstj, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_blocked_vjp_matches_reference_grad():
    """apply_blocked_spmm's custom VJP (transposed tiling) must agree
    with autodiff through the dense segment-sum reference."""
    from falcon_ttdforgnns_tpu.ops.spmm_blocked import (build_blocked_spmm,
                                                        apply_blocked_spmm)
    n, e, d = 1500, 9_000, 8
    src, dst = random_graph(n, e, seed=9)
    w = np.random.default_rng(10).random(e).astype(np.float32)
    h0 = jnp.asarray(np.random.default_rng(11).normal(size=(n, d)).astype(np.float32))
    op = build_blocked_spmm(src, dst, n, edge_weight=w, tile=256,
                            dst_buckets=4, chunk_tiles=8)
    srcj = jnp.asarray(src.astype(np.int32))
    dstj = jnp.asarray(dst.astype(np.int32))
    wj = jnp.asarray(w)

    @jax.jit
    def loss_blocked(h):
        out = apply_blocked_spmm(h, op)
        return jnp.sum(jnp.sin(out) * out)

    @jax.jit
    def loss_ref(h):
        out = spmm_sum(h, srcj, dstj, n, edge_weight=wj)
        return jnp.sum(jnp.sin(out) * out)

    np.testing.assert_allclose(float(loss_blocked(h0)), float(loss_ref(h0)),
                               rtol=1e-4)
    g_b = jax.grad(loss_blocked)(h0)
    g_r = jax.grad(loss_ref)(h0)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_r),
                               rtol=1e-3, atol=1e-4)


def test_trainer_eval_blocked_matches_xla():
    """--spmm blocked evaluation wiring: accuracies must match the
    default XLA eval path exactly (same model state, same graph)."""
    from falcon_ttdforgnns_tpu.graph import synthetic_dataset
    from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
    ds = synthetic_dataset(num_nodes=600, avg_degree=6, num_classes=4,
                           feat_dim=16, seed=0)
    base = dict(batch_size=16, fanouts=(2, 3), epochs=1, dropout=0.0,
                hidden_dim=16, num_layers=2, use_tt=True, tt_ranks=(4, 4),
                weight_dist="normal", eval_every=100, log_every=1000,
                seed=0, skip_eval=True)
    tr_x = SageTrainer(ds, TrainConfig(**base, spmm="xla"))
    tr_b = SageTrainer(ds, TrainConfig(**base, spmm="blocked"))
    tr_b.variables = tr_x.variables  # identical params
    ax = tr_x.evaluate()
    ab = tr_b.evaluate()
    for k in ax:
        assert abs(ax[k] - ab[k]) < 1e-6, (k, ax, ab)


def test_infer_full_blocked_matches_xla():
    """infer_full with --spmm blocked returns the same logits as the XLA
    layer-wise path (same model state)."""
    from falcon_ttdforgnns_tpu.graph import synthetic_dataset
    from falcon_ttdforgnns_tpu.train import SageTrainer, TrainConfig
    ds = synthetic_dataset(num_nodes=500, avg_degree=5, num_classes=4,
                           feat_dim=8, seed=2)
    base = dict(batch_size=16, fanouts=(2, 2), epochs=1, dropout=0.0,
                hidden_dim=8, num_layers=2, use_tt=True, tt_ranks=(4, 4),
                weight_dist="normal", eval_every=100, log_every=1000,
                seed=0, skip_eval=True, inference_chunk=128)
    tx = SageTrainer(ds, TrainConfig(**base, spmm="xla"))
    tb = SageTrainer(ds, TrainConfig(**base, spmm="blocked"))
    tb.variables = tx.variables
    lx = tx.infer_full()
    lb = tb.infer_full()
    np.testing.assert_allclose(lb, lx, rtol=1e-4, atol=1e-4)


def test_blocked_raises_on_tpu_backend():
    """On real TPUs the blocked path must fail with the measured
    explanation, not a cryptic Mosaic 'multiple source vregs' compile
    error (docs/PERFORMANCE.md 'window-blocked SpMM: measured dead
    end')."""
    from falcon_ttdforgnns_tpu.ops.spmm_blocked import (
        check_blocked_supported)
    with pytest.raises(ValueError, match="cannot run on TPU"):
        check_blocked_supported(backend="tpu")
    check_blocked_supported(backend="cpu")  # interpret mode stays open
