"""headed_spmm (GAT's weighted per-head aggregation, custom VJP) vs the
naive gather+segment_sum formulation — values and gradients, single- and
multi-chunk, plus the GATConv integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from falcon_ttdforgnns_tpu.ops.segment import headed_spmm


def naive(feat, w, src, dst, num_nodes):
    msgs = jnp.take(feat, src, axis=0) * w[..., None]
    return jax.ops.segment_sum(msgs, dst, num_segments=num_nodes)


def make_case(n=50, e=300, h=3, d=8, seed=0):
    rng = np.random.default_rng(seed)
    feat = rng.normal(size=(n, h, d)).astype(np.float32)
    w = rng.normal(size=(e, h)).astype(np.float32)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    return (jnp.asarray(feat), jnp.asarray(w), jnp.asarray(src),
            jnp.asarray(dst), n)


@pytest.mark.parametrize("chunk", [1 << 19, 64, 37])  # 1 / 5 / 9 chunks
def test_forward_parity(chunk):
    feat, w, src, dst, n = make_case(seed=chunk)
    got = headed_spmm(feat, w, src, dst, n, chunk)
    want = naive(feat, w, src, dst, n)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunk", [1 << 19, 64])
def test_grad_parity(chunk):
    feat, w, src, dst, n = make_case(e=257, seed=1)  # non-multiple of chunk

    def loss_ours(feat, w):
        out = headed_spmm(feat, w, src, dst, n, chunk)
        return jnp.sum(jnp.sin(out))  # nontrivial cotangent

    def loss_naive(feat, w):
        return jnp.sum(jnp.sin(naive(feat, w, src, dst, n)))

    g1f, g1w = jax.grad(loss_ours, argnums=(0, 1))(feat, w)
    g2f, g2w = jax.grad(loss_naive, argnums=(0, 1))(feat, w)
    np.testing.assert_allclose(g1f, g2f, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g1w, g2w, rtol=1e-4, atol=1e-5)


def test_jit_and_int_cotangent():
    feat, w, src, dst, n = make_case(seed=2)
    f = jax.jit(lambda feat, w: headed_spmm(feat, w, src, dst, n, 64))
    out = f(feat, w)
    assert out.shape == (n, 3, 8)
    # grad under jit, indices as traced args
    g = jax.jit(jax.grad(
        lambda feat, w, s, d: jnp.sum(headed_spmm(feat, w, s, d, n, 64) ** 2),
        argnums=(0, 1)))(feat, w, src, dst)
    assert np.isfinite(np.asarray(g[0])).all()


def test_gatconv_chunked_matches_unchunked():
    """GATConv forward+grad must be identical whichever edge_chunk is set."""
    from falcon_ttdforgnns_tpu.nn.layers import GATConv
    rng = np.random.default_rng(3)
    n, e = 40, 200
    h = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    deg = jax.ops.segment_sum(jnp.ones_like(dst), dst, num_segments=n)

    outs, grads = [], []
    for chunk in (None, 64):
        conv = GATConv(out_dim=8, num_heads=2, edge_chunk=chunk)
        variables = conv.init(jax.random.PRNGKey(0), h, src, dst, deg, n)

        def loss(v):
            return jnp.sum(conv.apply(v, h, src, dst, deg, n) ** 2)

        outs.append(conv.apply(variables, h, src, dst, deg, n))
        grads.append(jax.grad(loss)(variables))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                         atol=1e-5),
                 grads[0], grads[1])
