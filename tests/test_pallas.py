"""Pallas fused TT-lookup kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from falcon_ttdforgnns_tpu.ops import TTShapes, make_tt_shapes, tt_init
from falcon_ttdforgnns_tpu.ops.tt_lookup import tt_lookup_gather
from falcon_ttdforgnns_tpu.ops.tt_pallas import (tt_lookup_pallas,
                                                 tt_lookup_pallas_padded)


@pytest.fixture(scope="module")
def case():
    shapes = TTShapes(int(np.prod((10, 12, 14))), 60, (10, 12, 14), (3, 4, 5), (8, 8))
    cores = tuple(jnp.asarray(c) for c in tt_init.init_tt_cores(shapes, "normal", 0))
    return shapes, cores


def test_matches_reference(case):
    shapes, cores = case
    idx = jnp.asarray(np.random.default_rng(0).integers(
        0, shapes.num_embeddings, 512).astype(np.int32))
    ref = tt_lookup_gather(shapes, cores, idx)
    out = tt_lookup_pallas(shapes, cores, idx, block=128,
                           compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_padded_arbitrary_length(case):
    shapes, cores = case
    idx = jnp.asarray(np.random.default_rng(1).integers(
        0, shapes.num_embeddings, 333).astype(np.int32))
    ref = tt_lookup_gather(shapes, cores, idx)
    out = tt_lookup_pallas_padded(shapes, cores, idx, block=128,
                                  compute_dtype=jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_products_config_shapes():
    shapes = make_tt_shapes(2_449_029, 100, (16, 16), (125, 140, 140), (5, 5, 4))
    cores = tuple(jnp.asarray(c) for c in tt_init.init_tt_cores(shapes, "normal", 0))
    idx = jnp.asarray(np.random.default_rng(2).integers(
        0, shapes.num_embeddings, 256).astype(np.int32))
    ref = tt_lookup_gather(shapes, cores, idx)
    out = tt_lookup_pallas(shapes, cores, idx, block=256,
                           compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def _case_for(ndim):
    """2/3/4-core cases (kernel-family parity with the reference's
    2T/3T/4T kernels, `FBTT/tt_embeddings_cuda.cu:757-851`)."""
    if ndim == 2:
        shapes = TTShapes(256, 64, (16, 16), (8, 8), (12,))
    elif ndim == 3:
        shapes = TTShapes(int(np.prod((10, 12, 14))), 60, (10, 12, 14),
                          (3, 4, 5), (8, 8))
    else:
        shapes = TTShapes(1296, 36, (6, 6, 6, 6), (2, 3, 3, 2), (6, 6, 6))
    cores = tuple(jnp.asarray(c) for c in
                  tt_init.init_tt_cores(shapes, "normal", 0))
    return shapes, cores


@pytest.mark.parametrize("ndim", [2, 3, 4])
def test_forward_family(ndim):
    shapes, cores = _case_for(ndim)
    idx = jnp.asarray(np.random.default_rng(ndim).integers(
        0, shapes.num_embeddings, 384).astype(np.int32))
    ref = tt_lookup_gather(shapes, cores, idx)
    out = tt_lookup_pallas(shapes, cores, idx, block=128,
                           compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ndim", [2, 3, 4])
def test_backward_family(ndim):
    """tt_grads_pallas == dense-path core grads for every arity."""
    from falcon_ttdforgnns_tpu.ops.tt_lookup import tt_core_grads
    from falcon_ttdforgnns_tpu.ops.tt_pallas import tt_grads_pallas
    shapes, cores = _case_for(ndim)
    rng = np.random.default_rng(10 + ndim)
    idx = jnp.asarray(rng.integers(0, shapes.num_embeddings, 256).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(256, shapes.embedding_dim)).astype(np.float32))
    got = tt_grads_pallas(shapes, cores, idx, g, block=128,
                          compute_dtype=jnp.float32)
    want = tt_core_grads(shapes, cores, idx, g, dedup=False)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ndim", [2, 4])
def test_fused_sgd_family(ndim):
    from falcon_ttdforgnns_tpu.ops.tt_lookup import tt_core_grads
    from falcon_ttdforgnns_tpu.ops.tt_pallas import tt_fused_sgd_pallas
    shapes, cores = _case_for(ndim)
    rng = np.random.default_rng(20 + ndim)
    idx = jnp.asarray(rng.integers(0, shapes.num_embeddings, 200).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(200, shapes.embedding_dim)).astype(np.float32))
    lr = 0.05
    new = tt_fused_sgd_pallas(shapes, cores, idx, g, lr, block=128,
                              compute_dtype=jnp.float32)
    grads = tt_core_grads(shapes, cores, idx, g, dedup=False)
    for nc, c, gr in zip(new, cores, grads):
        np.testing.assert_allclose(np.asarray(nc), np.asarray(c - lr * gr),
                                   rtol=1e-4, atol=1e-5)


def test_fused_sgd_matches_manual(case):
    """fused SGD step == cores - lr * dense grads."""
    from falcon_ttdforgnns_tpu.ops.tt_lookup import tt_core_grads
    from falcon_ttdforgnns_tpu.ops.tt_pallas import tt_fused_sgd_pallas
    shapes, cores = case
    rng = np.random.default_rng(3)
    idx = jnp.asarray(rng.integers(0, shapes.num_embeddings, 300).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(300, shapes.embedding_dim)).astype(np.float32))
    lr = 0.05
    new = tt_fused_sgd_pallas(shapes, cores, idx, g, lr, block=128,
                              compute_dtype=jnp.float32)
    grads = tt_core_grads(shapes, cores, idx, g, dedup=False)
    for nc, c, gr in zip(new, cores, grads):
        np.testing.assert_allclose(np.asarray(nc), np.asarray(c - lr * gr),
                                   rtol=1e-4, atol=1e-5)


def test_two_core_kernel():
    shapes = TTShapes(256, 64, (16, 16), (8, 8), (12,))
    cores = tuple(jnp.asarray(c) for c in tt_init.init_tt_cores(shapes, "normal", 0))
    idx = jnp.asarray(np.random.default_rng(5).integers(0, 256, 384).astype(np.int32))
    ref = tt_lookup_gather(shapes, cores, idx)
    out = tt_lookup_pallas(shapes, cores, idx, block=128,
                           compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_sgd_preserves_f32_master(case):
    """bf16 compute must not quantize the f32 master weights: with a zero
    gradient the fused step is an exact identity (previously each step
    returned bf16(cores), erasing sub-ulp updates)."""
    from falcon_ttdforgnns_tpu.ops.tt_pallas import tt_fused_sgd_pallas
    shapes, cores = case
    # nudge the cores off the bf16 grid so a hidden bf16 round-trip shows
    cores = tuple(c + 1e-4 * np.pi for c in cores)
    idx = jnp.asarray(np.arange(128, dtype=np.int32) % shapes.num_embeddings)
    g = jnp.zeros((128, shapes.embedding_dim), jnp.float32)
    new = tt_fused_sgd_pallas(shapes, cores, idx, g, lr=0.05, block=128,
                              compute_dtype=jnp.bfloat16, interpret=True)
    for nc, c in zip(new, cores):
        assert nc.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(nc), np.asarray(c))


@pytest.mark.parametrize("ndim", [2, 3, 4])
@pytest.mark.parametrize("rowwise", [False, True])
def test_fused_adagrad_family(ndim, rowwise):
    """tt_fused_adagrad_pallas == dense grads pushed through the routed
    optimizer math (train/optim.py tt_adagrad / rowwise_adagrad, reference
    eps convention cu:399-419 / cu:1746-1846) — including a nonzero
    incoming accumulator and a multi-block grid (total-grad-then-update
    two-phase semantics)."""
    from falcon_ttdforgnns_tpu.ops.tt_lookup import tt_core_grads
    from falcon_ttdforgnns_tpu.ops.tt_pallas import tt_fused_adagrad_pallas
    shapes, cores = _case_for(ndim)
    rng = np.random.default_rng(30 + ndim)
    idx = jnp.asarray(rng.integers(0, shapes.num_embeddings, 300)
                      .astype(np.int32))
    g = jnp.asarray(rng.normal(size=(300, shapes.embedding_dim))
                    .astype(np.float32))
    lr, eps = 0.05, (1e-8 if rowwise else 1e-10)
    if rowwise:
        accs = tuple(jnp.abs(jnp.asarray(
            rng.normal(size=(c.shape[0],)).astype(np.float32))) for c in cores)
    else:
        accs = tuple(jnp.abs(jnp.asarray(
            rng.normal(size=c.shape).astype(np.float32))) for c in cores)
    new_cores, new_accs = tt_fused_adagrad_pallas(
        shapes, cores, accs, idx, g, lr, eps, block=128, rowwise=rowwise,
        compute_dtype=jnp.float32)
    grads = tt_core_grads(shapes, cores, idx, g, dedup=False)
    for k, (c, a, gr) in enumerate(zip(cores, accs, grads)):
        if rowwise:
            a_ref = a + jnp.mean(gr * gr, axis=(1, 2, 3))
            scale = lr / (jnp.sqrt(a_ref) + eps)
            w_ref = c - scale[:, None, None, None] * gr
        else:
            a_ref = a + gr * gr
            w_ref = c - lr * gr / (jnp.sqrt(a_ref) + eps)
        np.testing.assert_allclose(np.asarray(new_accs[k]),
                                   np.asarray(a_ref), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_cores[k]),
                                   np.asarray(w_ref), rtol=1e-4, atol=1e-5)


def test_fused_adagrad_state_accumulates(case):
    """Two sequential fused-adagrad steps thread the accumulator: step 2's
    normalization must see g1^2 + g2^2."""
    from falcon_ttdforgnns_tpu.ops.tt_lookup import tt_core_grads
    from falcon_ttdforgnns_tpu.ops.tt_pallas import tt_fused_adagrad_pallas
    shapes, cores = case
    rng = np.random.default_rng(40)
    idx = jnp.asarray(rng.integers(0, shapes.num_embeddings, 256)
                      .astype(np.int32))
    g1 = jnp.asarray(rng.normal(size=(256, shapes.embedding_dim))
                     .astype(np.float32))
    g2 = jnp.asarray(rng.normal(size=(256, shapes.embedding_dim))
                     .astype(np.float32))
    lr, eps = 0.05, 1e-10
    accs0 = tuple(jnp.zeros_like(c) for c in cores)
    c1, a1 = tt_fused_adagrad_pallas(shapes, cores, accs0, idx, g1, lr, eps,
                                     block=128, compute_dtype=jnp.float32)
    c2, a2 = tt_fused_adagrad_pallas(shapes, c1, a1, idx, g2, lr, eps,
                                     block=128, compute_dtype=jnp.float32)
    gr1 = tt_core_grads(shapes, cores, idx, g1, dedup=False)
    gr2 = tt_core_grads(shapes, c1, idx, g2, dedup=False)
    for k in range(shapes.ndim):
        a_ref = gr1[k] * gr1[k] + gr2[k] * gr2[k]
        w_ref = c1[k] - lr * gr2[k] / (jnp.sqrt(a_ref) + eps)
        np.testing.assert_allclose(np.asarray(a2[k]), np.asarray(a_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c2[k]), np.asarray(w_ref),
                                   rtol=1e-4, atol=1e-5)


def test_fused_bf16_lookup_and_grads(case):
    """tt_lookup_fused_bf16: bf16 output close to the f32 path; the bf16
    cotangent reaches the same core grads (within bf16 quantization)."""
    from falcon_ttdforgnns_tpu.ops.tt_pallas import (tt_lookup_fused,
                                                     tt_lookup_fused_bf16)
    shapes, cores = case
    idx = jnp.asarray(np.random.default_rng(50).integers(
        0, shapes.num_embeddings, 256).astype(np.int32))
    out16 = tt_lookup_fused_bf16(shapes, 128, cores, idx)
    out32 = tt_lookup_fused(shapes, 128, cores, idx)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(out32), rtol=2e-2, atol=2e-2)

    def loss16(cs):
        return jnp.sum(tt_lookup_fused_bf16(shapes, 128, cs, idx)
                       .astype(jnp.float32) ** 2)

    def loss32(cs):
        return jnp.sum(tt_lookup_fused(shapes, 128, cs, idx) ** 2)

    g16 = jax.grad(loss16)(cores)
    g32 = jax.grad(loss32)(cores)
    for a, b in zip(g16, g32):
        assert a.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-1)


def test_fused_bf16_sr_lookup(case):
    """tt_lookup_fused_bf16_sr (--bf16-sr): stochastic rounding on the
    h_all store.  (a) close to the f32 path within bf16 ulp; (b) the
    seed-averaged SR output beats (or matches) round-to-nearest's distance
    to the f32 truth — SR is unbiased where RN has a per-element bias;
    (c) different seeds produce different dither; (d) the VJP matches the
    RN variant (the backward is seed-free)."""
    from falcon_ttdforgnns_tpu.ops.tt_pallas import (tt_lookup_fused,
                                                     tt_lookup_fused_bf16_sr)
    shapes, cores = case
    idx = jnp.asarray(np.random.default_rng(51).integers(
        0, shapes.num_embeddings, 256).astype(np.int32))
    out32 = np.asarray(tt_lookup_fused(shapes, 128, cores, idx),
                       np.float64)
    outs = [np.asarray(tt_lookup_fused_bf16_sr(
                shapes, 128, cores, idx, jnp.int32(s)), np.float64)
            for s in range(16)]
    assert not np.array_equal(outs[0], outs[1])  # dither varies with seed
    for o in outs:
        np.testing.assert_allclose(o, out32, rtol=2e-2, atol=2e-2)
    # unbiasedness: the 16-seed mean must be at least as close to the f32
    # truth as one RN cast (strictly closer wherever RN is biased)
    rn_err = np.abs(np.asarray(
        jnp.asarray(out32, jnp.float32).astype(jnp.bfloat16), np.float64)
        - out32).mean()
    sr_err = np.abs(np.mean(outs, axis=0) - out32).mean()
    assert sr_err <= rn_err * 1.05

    def loss_sr(cs):
        return jnp.sum(tt_lookup_fused_bf16_sr(shapes, 128, cs, idx,
                                               jnp.int32(7))
                       .astype(jnp.float32) ** 2)

    def loss32(cs):
        return jnp.sum(tt_lookup_fused(shapes, 128, cs, idx) ** 2)

    g_sr = jax.grad(loss_sr)(cores)
    g32 = jax.grad(loss32)(cores)
    for a, b in zip(g_sr, g32):
        assert a.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-1)
