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


def test_rgat_learns_typed_homophily():
    """RGAT must exploit the *informative* edge type: etype-0 edges connect
    same-class nodes, etype-1 edges are uniform noise.  Features are noisy
    class one-hots; a model that denoises via etype-0 neighbors must beat
    the feature-only argmax readout on held-out nodes (measured in-test,
    so the bar is the actual per-seed feature signal, not a magic number)."""
    import optax
    rng = np.random.default_rng(7)
    n, c = 400, 4
    lab = rng.integers(0, c, n)
    # homophilous etype-0: pair nodes within each class
    src0, dst0 = [], []
    for k in range(c):
        ids = np.where(lab == k)[0]
        src0.append(rng.choice(ids, 4 * len(ids)))
        dst0.append(rng.choice(ids, 4 * len(ids)))
    e0 = (jnp.asarray(np.concatenate(src0)), jnp.asarray(np.concatenate(dst0)))
    e1 = (jnp.asarray(rng.integers(0, n, 1600)), jnp.asarray(rng.integers(0, n, 1600)))
    feat = np.eye(c, dtype=np.float32)[lab] + rng.normal(0, 2.0, (n, c)).astype(np.float32)
    feat = jnp.asarray(feat)
    labels = jnp.asarray(lab)
    train_mask = np.zeros(n, bool); train_mask[: n // 2] = True
    rng.shuffle(train_mask)
    tr = jnp.asarray(np.where(train_mask)[0])
    te = np.where(~train_mask)[0]

    model = RGAT(in_dim=c, hidden_dim=8, num_classes=c, num_etypes=2,
                 num_layers=2, num_heads=2, dropout=0.0)
    key = jax.random.PRNGKey(0)
    vs = model.init({"params": key, "dropout": key}, feat, [e0, e1], n)
    tx = optax.adam(0.01)
    opt = tx.init(vs["params"])

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply({"params": p}, feat, [e0, e1], n, train=False)
            return optax.softmax_cross_entropy_with_integer_labels(
                out[tr], labels[tr]).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    params = vs["params"]
    for _ in range(120):
        params, opt, loss = step(params, opt)
    out = model.apply({"params": params}, feat, [e0, e1], n, train=False)
    acc = (np.asarray(out.argmax(-1))[te] == lab[te]).mean()
    # feature-only readout: argmax of the noisy one-hot is the best a model
    # that ignores the graph can do (measured ~0.40 at this noise); typed
    # message passing lifts held-out accuracy well above it (~0.60).
    feat_acc = (np.asarray(feat).argmax(-1)[te] == lab[te]).mean()
    assert acc >= feat_acc + 0.10, f"held-out {acc:.3f} vs feature-only {feat_acc:.3f}"


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


def test_mol_gnn_learns_topology():
    """The revised GIN/virtual-node stack must separate rings from stars
    (label depends on topology only; features are random noise).

    Features are RANDOM rather than all-ones on purpose: with only two
    distinct input patterns the BatchNorm batch statistics are degenerate
    and the running averages used at eval diverge (train acc 1.0 / eval
    0.5) — a property of the data, not the model."""
    import optax
    rng = np.random.default_rng(0)
    G, NN = 64, 8  # graphs, nodes per graph
    srcs, dsts, gids, labels = [], [], [], []
    for g in range(G):
        base = g * NN
        ring = g % 2 == 0
        if ring:
            s = np.arange(NN) + base
            d = (np.arange(NN) + 1) % NN + base
        else:  # star
            s = np.full(NN - 1, 0) + base
            d = np.arange(1, NN) + base
        srcs.append(np.concatenate([s, d]))  # undirected
        dsts.append(np.concatenate([d, s]))
        gids.append(np.full(NN, g))
        labels.append(int(ring))
    src = jnp.asarray(np.concatenate(srcs).astype(np.int32))
    dst = jnp.asarray(np.concatenate(dsts).astype(np.int32))
    gid = jnp.asarray(np.concatenate(gids).astype(np.int32))
    y = jnp.asarray(np.array(labels, np.int32))
    x = jnp.asarray(rng.normal(size=(G * NN, 4)).astype(np.float32))
    eattr = jnp.zeros((len(src), 3), jnp.int32)

    model = MolGNN(num_tasks=2, emb_dim=16, num_layers=2, conv_type="gin",
                   virtual_node=True, pooling="attention", dropout=0.0)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           x, src, dst, eattr, gid, G * NN, G, train=False)
    tx = optax.adam(5e-3)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(variables, opt):
        params = variables["params"]
        aux = {k: v for k, v in variables.items() if k != "params"}
        def loss_fn(p):
            out, mut = model.apply({"params": p, **aux}, x, src, dst, eattr,
                                   gid, G * NN, G, train=True,
                                   mutable=["batch_stats"])
            return optax.softmax_cross_entropy_with_integer_labels(
                out, y).mean(), mut
        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return ({"params": optax.apply_updates(params, upd), **{**aux, **mut}},
                opt, loss)

    for _ in range(300):
        variables, opt, loss = step(variables, opt)
    logits = model.apply(variables, x, src, dst, eattr, gid, G * NN, G,
                         train=False)
    acc = float((jnp.argmax(logits, -1) == y).mean())
    assert acc >= 0.9, f"mol GNN failed to separate rings from stars: {acc}"
