"""RGAT (heterogeneous) and molecular GIN/virtual-node stack tests
(`gnn_model.py:515-595, 599-983` parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from falcon_ttdforgnns_tpu.models import RGAT, MolGNN, graph_pool


def test_rgat_forward():
    n, d = 50, 8
    rng = np.random.default_rng(0)
    typed_edges = []
    for _ in range(3):  # 3 edge types
        src = jnp.asarray(rng.integers(0, n, 120))
        dst = jnp.asarray(rng.integers(0, n, 120))
        typed_edges.append((src, dst))
    feat = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    model = RGAT(in_dim=d, hidden_dim=4, num_classes=6, num_etypes=3,
                 num_layers=2, num_heads=2)
    key = jax.random.PRNGKey(0)
    vs = model.init({"params": key, "dropout": key}, feat, typed_edges, n)
    out = model.apply(vs, feat, typed_edges, n, train=False)
    assert out.shape == (n, 6)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("conv", ["gin", "gcn"])
@pytest.mark.parametrize("pooling", ["sum", "mean", "max", "attention",
                                     "set2set"])
def test_mol_gnn(conv, pooling):
    """Batched molecular graphs: 4 graphs, ~10 nodes each."""
    rng = np.random.default_rng(1)
    num_graphs, nodes_per = 4, 10
    n = num_graphs * nodes_per
    graph_id = np.repeat(np.arange(num_graphs), nodes_per)
    src, dst = [], []
    for g in range(num_graphs):
        base = g * nodes_per
        s = rng.integers(0, nodes_per, 20) + base
        d = rng.integers(0, nodes_per, 20) + base
        src.append(s); dst.append(d)
    src = jnp.asarray(np.concatenate(src))
    dst = jnp.asarray(np.concatenate(dst))
    edge_attr = jnp.asarray(rng.integers(0, 2, (len(src), 3)))
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))

    model = MolGNN(num_tasks=3, emb_dim=16, num_layers=2, conv_type=conv,
                   virtual_node=True, pooling=pooling)
    key = jax.random.PRNGKey(0)
    vs = model.init({"params": key, "dropout": key}, x, src, dst, edge_attr,
                    jnp.asarray(graph_id), n, num_graphs)
    out = model.apply(vs, x, src, dst, edge_attr, jnp.asarray(graph_id), n,
                      num_graphs, train=False)
    assert out.shape == (num_graphs, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_graph_pool_correct():
    h = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    gid = jnp.asarray([0, 0, 0, 1, 1, 1])
    s = graph_pool(h, gid, 2, "sum")
    np.testing.assert_allclose(np.asarray(s), [[6, 9], [24, 27]])
    m = graph_pool(h, gid, 2, "mean")
    np.testing.assert_allclose(np.asarray(m), [[2, 3], [8, 9]])
    mx = graph_pool(h, gid, 2, "max")
    np.testing.assert_allclose(np.asarray(mx), [[4, 5], [10, 11]])
