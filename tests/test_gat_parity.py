"""GATConv vs a from-scratch dense implementation of the reference
semantics (`gnn_model.py:375-441`): 'both' norm scales only the source
features; attention uses er from UNSCALED dst features; edge softmax per
dst; out scaled by deg^0.5; residual projection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from falcon_ttdforgnns_tpu.nn.layers import GATConv


def dense_reference(params, h, src, dst, in_deg, num_nodes, H, Do,
                    symmetric, slope=0.2):
    W = params["fc"]["kernel"]
    feat = (h @ W).reshape(-1, H, Do)
    feat_src = feat
    if symmetric:
        norm = np.power(np.maximum(in_deg, 1.0), -0.5)
        feat_src = feat * norm[:, None, None]
    el = (feat_src * np.asarray(params["attn_l"])).sum(-1)   # (N, H)
    er = (feat * np.asarray(params["attn_r"])).sum(-1)       # UNSCALED dst
    e = el[src] + er[dst]
    e = np.where(e > 0, e, slope * e)
    # per-dst softmax (naive loops — tiny graph)
    alpha = np.zeros_like(e)
    for v in range(num_nodes):
        m = dst == v
        if m.any():
            ev = e[m]
            ex = np.exp(ev - ev.max(axis=0, keepdims=True))
            alpha[m] = ex / ex.sum(axis=0, keepdims=True)
    out = np.zeros((num_nodes, H, Do))
    for i in range(len(src)):
        out[dst[i]] += alpha[i][:, None] * feat_src[src[i]]
    if symmetric:
        out = out * np.power(np.maximum(in_deg, 1.0), 0.5)[:, None, None]
    res = (h @ params["res_fc"]["kernel"]).reshape(-1, H, Do)
    return (out + res).reshape(num_nodes, H * Do)


@pytest.mark.parametrize("symmetric", [False, True])
def test_gatconv_matches_dense_reference(symmetric):
    rng = np.random.default_rng(0)
    N, E, D, H, Do = 12, 40, 6, 3, 5
    h = rng.normal(size=(N, D)).astype(np.float32)
    src = rng.integers(0, N, E).astype(np.int32)
    dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
    in_deg = np.bincount(dst, minlength=N).astype(np.float32)

    conv = GATConv(out_dim=Do, num_heads=H, use_symmetric_norm=symmetric,
                   edge_chunk=16)  # force the chunked scatter path
    variables = conv.init(jax.random.PRNGKey(1), jnp.asarray(h),
                          jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(in_deg), N)
    got = np.asarray(conv.apply(variables, jnp.asarray(h), jnp.asarray(src),
                                jnp.asarray(dst), jnp.asarray(in_deg), N))
    p = jax.tree.map(np.asarray, variables["params"])
    want = dense_reference(p, h, src, dst, in_deg, N, H, Do, symmetric)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
