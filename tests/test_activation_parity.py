"""Activation-parity harness (BASELINE.md final bullet / VERDICT 3b):
an independent from-scratch NUMPY implementation of the TT lookup chain
and the SAGE dense-fanout forward, checked allclose against the framework
at equal cores/params.  This is the verification the reference left as
commented-out assertions (`sage_profiler.py:303-305,365-367`) — here it
runs, at f32 on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from falcon_ttdforgnns_tpu.graph import synthetic_dataset, sample_block
from falcon_ttdforgnns_tpu.models import SAGE
from falcon_ttdforgnns_tpu.ops import TTShapes, make_tt_shapes, tt_init
from falcon_ttdforgnns_tpu.ops.tt_lookup import tt_lookup_gather


# ---------------------------------------------------------------------------
# independent numpy reference
# ---------------------------------------------------------------------------

def np_tt_lookup(shapes, cores, indices):
    """Row-by-row TT chain contraction in numpy: cores[k] is
    (p_k, r_in, q_k, r_out); row(i) = chain of per-digit core slices."""
    cores = [np.asarray(c) for c in cores]
    out = np.zeros((len(indices), shapes.embedding_dim), np.float32)
    for n, idx in enumerate(np.asarray(indices)):
        acc = None
        for k in range(shapes.ndim):
            digit = (idx // shapes.strides[k]) % shapes.p_shapes[k]
            piece = cores[k][digit]          # (r_in, q_k, r_out)
            if acc is None:
                acc = piece[0]               # (q_1, r_1)
            else:
                # acc (Q, r_in) x piece (r_in, q_k, r_out) -> (Q*q_k, r_out)
                acc = np.einsum("ar,rbs->abs", acc, piece).reshape(
                    -1, piece.shape[2])
        out[n] = acc.reshape(-1)
    return out


def np_dense(x, p):
    y = x @ np.asarray(p["kernel"])
    if "bias" in p:
        y = y + np.asarray(p["bias"])
    return y


def np_sage_forward(variables, shapes, cores, seeds, layers, num_layers):
    """Full dense-fanout SAGE forward in numpy (mirrors SAGE.__call__
    semantics independently: one lookup over all levels, reshape-mean
    neighbor aggregation, W_self h + W_neigh mean, relu between layers)."""
    params = variables["params"]
    B = len(seeds)
    levels = [np.asarray(seeds).reshape(B, 1)] + [
        np.asarray(l).reshape(B, -1) for l in layers]
    hs = [np_tt_lookup(shapes, cores, lv.reshape(-1)).reshape(
        B, lv.shape[1], -1) for lv in levels]

    for li in range(num_layers):
        conv = params[f"conv_{li}"]
        new_hs = []
        for lev in range(len(hs) - 1):
            f = hs[lev + 1].shape[1] // hs[lev].shape[1]
            d = hs[lev].shape[-1]
            h_neigh = hs[lev + 1].reshape(B, hs[lev].shape[1], f, d).mean(2)
            h = np_dense(hs[lev], conv["self"]) + np_dense(h_neigh,
                                                           conv["neigh"])
            if li < num_layers - 1:
                h = np.maximum(h, 0.0)
            new_hs.append(h)
        hs = new_hs
    return hs[0][:, 0, :]


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    ds = synthetic_dataset(num_nodes=1000, avg_degree=6, num_classes=5,
                           feat_dim=24, seed=0)
    model = SAGE(num_nodes=ds.num_nodes, in_dim=24, hidden_dim=16,
                 num_classes=5, num_layers=2, dropout=0.0, use_tt=True,
                 tt_ranks=(6, 6), weight_dist="normal")
    batch = sample_block(ds.graph, np.arange(40), (3, 4),
                         np.random.default_rng(0))
    seeds = jnp.asarray(batch.seeds)
    layers = [jnp.asarray(l) for l in batch.layers]
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, seeds, layers)
    shapes = make_tt_shapes(ds.num_nodes, 24, (6, 6), None, None)
    cores = tuple(variables["params"]["embed"][f"tt_core_{k}"]
                  for k in range(shapes.ndim))
    return model, variables, shapes, cores, seeds, layers


def test_tt_lookup_matches_numpy(setup):
    """TT lookup vs the row-by-row numpy chain — every backend path."""
    model, variables, shapes, cores, seeds, layers = setup
    rng = np.random.default_rng(1)
    idx = rng.integers(0, shapes.num_embeddings, 64).astype(np.int32)
    want = np_tt_lookup(shapes, cores, idx)

    got_gather = np.asarray(tt_lookup_gather(shapes, cores, jnp.asarray(idx)))
    np.testing.assert_allclose(got_gather, want, rtol=1e-5, atol=1e-5)

    from falcon_ttdforgnns_tpu.ops.tt_pallas import tt_lookup_pallas_padded
    got_pallas = np.asarray(tt_lookup_pallas_padded(
        shapes, cores, jnp.asarray(idx), block=64,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got_pallas, want, rtol=1e-5, atol=1e-5)


def test_full_model_activations_match_numpy(setup):
    """End-to-end SAGE forward: framework vs the independent numpy
    implementation, allclose at f32."""
    model, variables, shapes, cores, seeds, layers = setup
    got = np.asarray(model.apply(variables, seeds, layers, train=False))
    want = np_sage_forward(variables, shapes, cores, np.asarray(seeds),
                           layers, num_layers=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_embedding_bag_pooling_matches_numpy(setup):
    """Offsets (EmbeddingBag) pooling parity: segment sums over bags
    (`reduce_output_kernel` semantics, cu:923-965)."""
    model, variables, shapes, cores, seeds, layers = setup
    rng = np.random.default_rng(2)
    idx = rng.integers(0, shapes.num_embeddings, 50).astype(np.int32)
    offsets = np.array([0, 3, 3, 10, 30, 50], np.int32)
    rows = np_tt_lookup(shapes, cores, idx)
    want = np.stack([rows[a:b].sum(0) for a, b in
                     zip(offsets[:-1], offsets[1:])])

    from falcon_ttdforgnns_tpu.nn.tt_embedding import TTEmbeddingBag
    bag = TTEmbeddingBag(num_embeddings=shapes.num_embeddings,
                         embedding_dim=shapes.embedding_dim,
                         tt_ranks=(6, 6), weight_dist="normal")
    vs = {"params": {f"tt_core_{k}": c for k, c in enumerate(cores)}}
    got = np.asarray(bag.apply(vs, jnp.asarray(idx), jnp.asarray(offsets)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
