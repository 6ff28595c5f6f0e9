"""Dense-reference parity tests for the TT lookup — the assertions the
reference left commented out (`sage_profiler.py:303-305, 365-367, 425-426`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from falcon_ttdforgnns_tpu.ops import (
    TTShapes,
    make_tt_shapes,
    suggested_tt_shapes,
    tt_digits,
    tt_to_full,
    tt_lookup,
    tt_lookup_gather,
    tt_lookup_grouped,
    tt_embedding_bag,
    tt_core_grads,
    tt_init,
)


def make_case(seed=0, p=(7, 9, 11), q=(3, 4, 5), ranks=(13, 12), n=None):
    n = n or int(np.prod(p))
    shapes = TTShapes(n, int(np.prod(q)), p, q, ranks)
    rng = np.random.default_rng(seed)
    cores = tuple(
        jnp.asarray(rng.normal(scale=0.5, size=shapes.core_shape(k)).astype(np.float32))
        for k in range(shapes.ndim)
    )
    return shapes, cores


class TestShapes:
    def test_strides_rowmajor(self):
        shapes, _ = make_case()
        assert shapes.strides == (99, 11, 1)

    def test_digits_roundtrip(self):
        shapes, _ = make_case()
        idx = np.random.default_rng(1).integers(0, shapes.num_embeddings, 64)
        digs = tt_digits(shapes, jnp.asarray(idx))
        recon = sum(np.asarray(d) * s for d, s in zip(digs, shapes.strides))
        np.testing.assert_array_equal(recon, idx)

    def test_suggested_shapes(self):
        assert int(np.prod(suggested_tt_shapes(2449029, 3))) >= 2449029
        assert sorted(suggested_tt_shapes(100, 3, allow_round_up=False), reverse=True) == [5, 5, 4]

    def test_validation(self):
        with pytest.raises(ValueError):
            TTShapes(1000, 64, (5, 5), (8, 8), (8,))  # prod(p) < N
        with pytest.raises(ValueError):
            TTShapes(100, 63, (5, 5, 4), (4, 4, 4), (8, 8))  # prod(q) != D

    def test_compression(self):
        shapes = make_tt_shapes(2449029, 100, (16, 16), (125, 140, 140), (5, 5, 4))
        assert shapes.compression_rate > 8.0


class TestForward:
    def test_gather_matches_full_table(self):
        shapes, cores = make_case()
        full = np.asarray(tt_to_full(shapes, cores))
        assert full.shape == (shapes.num_embeddings, shapes.embedding_dim)
        idx = np.random.default_rng(2).integers(0, shapes.num_embeddings, 256)
        out = tt_lookup_gather(shapes, cores, jnp.asarray(idx))
        np.testing.assert_allclose(np.asarray(out), full[idx], rtol=1e-5, atol=1e-5)

    def test_grouped_matches_gather(self):
        shapes, cores = make_case()
        # heavy duplication to exercise the dedup path
        idx = np.random.default_rng(3).integers(0, shapes.num_embeddings, 512) % 50
        a = tt_lookup_gather(shapes, cores, jnp.asarray(idx))
        b = tt_lookup_grouped(shapes, cores, jnp.asarray(idx))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def test_grouped_sorted_matches_full_table(self):
        """Sorted-emission grouped path: full parity on a host-sorted batch
        (the sampler-side sort that removes the device sort from dedup)."""
        from falcon_ttdforgnns_tpu.ops.tt_lookup import tt_lookup_grouped_sorted
        shapes, cores = make_case()
        full = np.asarray(tt_to_full(shapes, cores))
        idx = np.sort(np.random.default_rng(8).integers(0, shapes.num_embeddings, 512) % 60)
        out = tt_lookup_grouped_sorted(shapes, cores, jnp.asarray(idx))
        np.testing.assert_allclose(np.asarray(out), full[idx], rtol=1e-5, atol=1e-5)

    def test_grouped_sorted_ucap(self):
        """Static unique capacity prod(p[:-1]) (the FLOP lever): parity on a
        sorted batch spanning every group."""
        from falcon_ttdforgnns_tpu.ops.tt_lookup import (
            tt_lookup_grouped_sorted, grouped_ucap)
        shapes, cores = make_case()
        full = np.asarray(tt_to_full(shapes, cores))
        cap = grouped_ucap(shapes)
        assert cap < 512  # the test must actually exercise ucap < B
        idx = np.sort(np.random.default_rng(10).integers(
            0, shapes.num_embeddings, 512))
        out = tt_lookup_grouped_sorted(shapes, cores, jnp.asarray(idx), ucap=cap)
        np.testing.assert_allclose(np.asarray(out), full[idx], rtol=1e-5, atol=1e-5)

    def test_grouped_sorted_correct_even_unsorted(self):
        """Run-dedup is unconditionally correct: unsorted input loses dedup,
        never correctness."""
        from falcon_ttdforgnns_tpu.ops.tt_lookup import tt_lookup_grouped_sorted
        shapes, cores = make_case()
        idx = np.random.default_rng(9).integers(0, shapes.num_embeddings, 256)
        a = tt_lookup_gather(shapes, cores, jnp.asarray(idx))
        b = tt_lookup_grouped_sorted(shapes, cores, jnp.asarray(idx))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def test_two_and_four_cores(self):
        for p, q, r in [((16, 16), (8, 8), (12,)), ((4, 5, 6, 7), (2, 2, 2, 2), (5, 6, 7))]:
            shapes, cores = make_case(p=p, q=q, ranks=r)
            full = np.asarray(tt_to_full(shapes, cores))
            idx = np.random.default_rng(4).integers(0, shapes.num_embeddings, 128)
            out = tt_lookup_gather(shapes, cores, jnp.asarray(idx))
            np.testing.assert_allclose(np.asarray(out), full[idx], rtol=1e-4, atol=1e-4)

    def test_jit(self):
        shapes, cores = make_case()
        idx = jnp.arange(64, dtype=jnp.int32)
        f = jax.jit(lambda c, i: tt_lookup_grouped(shapes, c, i))
        np.testing.assert_allclose(
            np.asarray(f(cores, idx)),
            np.asarray(tt_lookup_gather(shapes, cores, idx)),
            rtol=1e-5, atol=1e-5,
        )


class TestBackward:
    def test_grads_match_dense_reference(self):
        """d(sum(W[idx] * G)) / d(cores) computed via our custom VJP must equal
        autodiff through the materialized full table."""
        shapes, cores = make_case()
        rng = np.random.default_rng(5)
        idx = jnp.asarray(rng.integers(0, shapes.num_embeddings, 128))
        g = jnp.asarray(rng.normal(size=(128, shapes.embedding_dim)).astype(np.float32))

        def loss_custom(cs):
            return jnp.sum(tt_lookup(shapes, True, cs, idx) * g)

        def loss_dense(cs):
            return jnp.sum(jnp.take(tt_to_full(shapes, cs), idx, axis=0) * g)

        g_custom = jax.grad(loss_custom)(cores)
        g_dense = jax.grad(loss_dense)(cores)
        for a, b in zip(g_custom, g_dense):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)

    def test_sorted_vjp_matches_dense_reference(self):
        """grouped='sorted' custom VJP (compare+cumsum dedup in fwd AND bwd)
        vs autodiff through the materialized table, on a sorted duplicated
        batch."""
        shapes, cores = make_case()
        rng = np.random.default_rng(11)
        idx = jnp.asarray(np.sort(rng.integers(0, 40, 256)))
        g = jnp.asarray(rng.normal(size=(256, shapes.embedding_dim)).astype(np.float32))

        def loss_sorted(cs):
            return jnp.sum(tt_lookup(shapes, "sorted", cs, idx) * g)

        def loss_dense(cs):
            return jnp.sum(jnp.take(tt_to_full(shapes, cs), idx, axis=0) * g)

        g_sorted = jax.grad(loss_sorted)(cores)
        g_dense = jax.grad(loss_dense)(cores)
        for a, b in zip(g_sorted, g_dense):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)

    def test_grads_sorted_hint_on_unsorted_still_correct(self):
        shapes, cores = make_case()
        rng = np.random.default_rng(12)
        idx = jnp.asarray(rng.integers(0, 20, 256))  # duplicated, unsorted
        g = jnp.asarray(rng.normal(size=(256, shapes.embedding_dim)).astype(np.float32))
        a = tt_core_grads(shapes, cores, idx, g, dedup=True, sorted_hint=True)
        b = tt_core_grads(shapes, cores, idx, g, dedup=False)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-4)

    def test_grads_with_duplicates(self):
        shapes, cores = make_case()
        rng = np.random.default_rng(6)
        idx = jnp.asarray(rng.integers(0, 20, 256))  # heavy duplication
        g = jnp.asarray(rng.normal(size=(256, shapes.embedding_dim)).astype(np.float32))
        grads = tt_core_grads(shapes, cores, idx, g, dedup=True)
        grads_nodedup = tt_core_grads(shapes, cores, idx, g, dedup=False)
        for a, b in zip(grads, grads_nodedup):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


class TestBag:
    def test_bag_pooling(self):
        shapes, cores = make_case()
        rng = np.random.default_rng(7)
        nnz, B = 64, 16
        idx = rng.integers(0, shapes.num_embeddings, nnz)
        offsets = np.sort(rng.integers(0, nnz, B - 1))
        offsets = np.concatenate([[0], offsets, [nnz]]).astype(np.int32)
        out = tt_embedding_bag(shapes, cores, jnp.asarray(idx), jnp.asarray(offsets))
        full = np.asarray(tt_to_full(shapes, cores))
        expect = np.zeros((B, shapes.embedding_dim), np.float32)
        for b in range(B):
            expect[b] = full[idx[offsets[b]:offsets[b + 1]]].sum(axis=0)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)

    def test_unary_bag(self):
        shapes, cores = make_case()
        idx = jnp.arange(32, dtype=jnp.int32)
        out = tt_embedding_bag(shapes, cores, idx, None)
        ref = tt_lookup_gather(shapes, cores, idx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


class TestInit:
    @pytest.mark.parametrize("dist", ["uniform", "naive-uniform", "normal", "approx-normal", "approx-uniform"])
    def test_dists_shapes_finite(self, dist):
        shapes = TTShapes(int(np.prod((10, 12, 14))), 60, (10, 12, 14), (3, 4, 5), (8, 8))
        cores = tt_init.init_tt_cores(shapes, dist, seed=0)
        for k, c in enumerate(cores):
            assert c.shape == shapes.core_shape(k)
            assert np.isfinite(c).all()

    def test_ortho(self):
        shapes, _ = make_case()
        cores = tt_init.init_ortho(shapes, seed=0)
        for k, c in enumerate(cores):
            assert c.shape == shapes.core_shape(k)
            # each (r, q) slice is a unit row
            norms = np.linalg.norm(c.transpose(1, 2, 0, 3).reshape(c.shape[1] * c.shape[2], -1), axis=1)
            np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    def test_tt_svd_reconstructs(self):
        """TT-SVD at sufficient ranks must exactly reconstruct a matrix that
        *is* a TT tensor of those ranks (matrix rank does not bound TT
        unfolding ranks, so the test matrix is generated from TT cores)."""
        shapes, cores = make_case(seed=9, p=(4, 5, 6), q=(3, 2, 4), ranks=(5, 4))
        mat = np.asarray(tt_to_full(shapes, cores))
        # decompose at generous ranks
        shapes2 = TTShapes(shapes.num_embeddings, shapes.embedding_dim,
                           shapes.p_shapes, shapes.q_shapes, (12, 8))
        cores2 = tt_init.tt_svd(shapes2, mat)
        full = np.asarray(tt_to_full(shapes2, tuple(jnp.asarray(c) for c in cores2)))
        np.testing.assert_allclose(full, mat, rtol=1e-3, atol=1e-3)


def test_suggested_shapes_highly_composite_fast():
    """2^20 nodes must factorize in milliseconds, not 3^20 assignments."""
    import time
    from falcon_ttdforgnns_tpu.ops.tt_shapes import suggested_tt_shapes
    t0 = time.perf_counter()
    shapes = suggested_tt_shapes(1 << 20, 3)
    assert time.perf_counter() - t0 < 5.0
    assert int(np.prod(shapes)) >= 1 << 20
    assert sorted(shapes, reverse=True) == shapes and min(shapes) > 1
