"""Graph-property (molecular) GNN stack with virtual node.

Re-design of the reference's OGB mol stack
(`gnn_model.py:599-983`: GNN / GNN_node / GNN_node_Virtualnode / GINConv /
GCNConv / BondEncoder): batched small graphs, bond-feature encoders, GIN
or GCN convolutions, optional virtual-node channel, and the five graph
pooling choices (sum / mean / max / attention / set2set — the last a
full LSTM-query Set2Set matching dgl.nn.Set2Set(emb_dim, 2, 2)).

Batched-graph representation (static shapes): a batch of G graphs is one
COO edge list with a ``graph_id`` per node; pooling = segment ops over
graph_id.  Edge features ride along the edge list.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BondEncoder(nn.Module):
    """Sum of per-feature embeddings of integer bond features
    (`gnn_model.py:599-616` parity, without the ogb dependency: feature
    cardinalities are a constructor arg)."""

    emb_dim: int
    feature_dims: Tuple[int, ...] = (5, 6, 2)  # ogb bond feature dims

    @nn.compact
    def __call__(self, edge_attr: jax.Array) -> jax.Array:
        out = 0.0
        for i, card in enumerate(self.feature_dims):
            table = nn.Embed(card, self.emb_dim, name=f"bond_{i}")
            out = out + table(edge_attr[:, i])
        return out


class GINConv(nn.Module):
    """GIN with edge features: h' = MLP((1+eps) h + Σ relu(h_u + e_uv)),
    MLP = Dense(d) -> BatchNorm -> relu -> Dense(d) (`gnn_model.py:619-650`)."""

    emb_dim: int
    bond_dims: Tuple[int, ...] = (5, 6, 2)

    @nn.compact
    def __call__(self, h, src, dst, edge_attr, num_nodes, train=False):
        e = BondEncoder(self.emb_dim, self.bond_dims)(edge_attr)
        msgs = nn.relu(jnp.take(h, src, axis=0) + e)
        agg = jax.ops.segment_sum(msgs, dst, num_segments=num_nodes)
        eps = self.param("eps", nn.initializers.zeros, ())
        x = (1 + eps) * h + agg
        x = nn.Dense(self.emb_dim)(x)
        x = nn.BatchNorm(use_running_average=not train, name="mlp_bn")(x)
        x = nn.relu(x)
        return nn.Dense(self.emb_dim)(x)


class MolGCNConv(nn.Module):
    """Degree-normalized conv with edge features (`gnn_model.py:653-689`):
    msgs = norm_u·norm_v · relu(h_u + e_uv); self term
    relu(h + root_emb)/deg with a trainable root embedding."""

    emb_dim: int
    bond_dims: Tuple[int, ...] = (5, 6, 2)

    @nn.compact
    def __call__(self, h, src, dst, edge_attr, num_nodes, train=False):
        e = BondEncoder(self.emb_dim, self.bond_dims)(edge_attr)
        h = nn.Dense(self.emb_dim)(h)
        deg = jax.ops.segment_sum(jnp.ones_like(dst, jnp.float32), dst,
                                  num_segments=num_nodes) + 1.0
        norm = jax.lax.rsqrt(deg)
        norm_uv = jnp.take(norm, src) * jnp.take(norm, dst)   # (E,)
        msgs = norm_uv[:, None] * nn.relu(jnp.take(h, src, axis=0) + e)
        agg = jax.ops.segment_sum(msgs, dst, num_segments=num_nodes)
        root = self.param("root_emb", nn.initializers.normal(1.0),
                          (self.emb_dim,))
        return agg + nn.relu(h + root[None, :]) * (1.0 / deg)[:, None]


def graph_pool(h: jax.Array, graph_id: jax.Array, num_graphs: int,
               method: str = "mean") -> jax.Array:
    """The five pooling choices (`gnn_model.py:744-768`)."""
    if method == "sum":
        return jax.ops.segment_sum(h, graph_id, num_segments=num_graphs)
    if method == "mean":
        s = jax.ops.segment_sum(h, graph_id, num_segments=num_graphs)
        c = jax.ops.segment_sum(jnp.ones((h.shape[0], 1), h.dtype), graph_id,
                                num_segments=num_graphs)
        return s / jnp.maximum(c, 1.0)
    if method == "max":
        m = jax.ops.segment_max(h, graph_id, num_segments=num_graphs)
        # empty (padding) segments fill with -inf; 0*-inf downstream = NaN
        return jnp.where(jnp.isfinite(m), m, 0.0)
    raise ValueError(f"unknown pooling {method!r}")


class AttentionPool(nn.Module):
    """Gated attention pooling; the gate is the reference's two-layer MLP
    Dense(2d) -> BatchNorm -> relu -> Dense(1) (`gnn_model.py:956-962`)."""

    @nn.compact
    def __call__(self, h, graph_id, num_graphs, train=False):
        g = nn.Dense(2 * h.shape[-1])(h)
        g = nn.BatchNorm(use_running_average=not train, name="gate_bn")(g)
        gate = nn.Dense(1)(nn.relu(g))  # (N, 1)
        gmax = jax.ops.segment_max(gate, graph_id, num_segments=num_graphs)
        gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
        ex = jnp.exp(gate - jnp.take(gmax, graph_id, axis=0))
        denom = jax.ops.segment_sum(ex, graph_id, num_segments=num_graphs)
        alpha = ex / jnp.maximum(jnp.take(denom, graph_id, axis=0), 1e-9)
        return jax.ops.segment_sum(h * alpha, graph_id, num_segments=num_graphs)


class Set2Set(nn.Module):
    """Set2Set pooling (`gnn_model.py:964-969`: dgl.nn.Set2Set(emb_dim,
    n_iters=2, n_layers=2)) — attention readout driven by a stacked LSTM
    query; output dim is 2*emb_dim.  n_iters is tiny and static, so the
    loop unrolls into straight-line XLA."""

    emb_dim: int
    n_iters: int = 2
    n_layers: int = 2

    @nn.compact
    def __call__(self, h, graph_id, num_graphs):
        d = self.emb_dim
        cells = [nn.LSTMCell(d, name=f"lstm_{i}")
                 for i in range(self.n_layers)]
        states = [(jnp.zeros((num_graphs, d), h.dtype),
                   jnp.zeros((num_graphs, d), h.dtype)) for _ in cells]
        q_star = jnp.zeros((num_graphs, 2 * d), h.dtype)
        for _ in range(self.n_iters):
            x = q_star
            new_states = []
            for cell, st in zip(cells, states):
                st, x = cell(st, x)
                new_states.append(st)
            states = new_states
            q = x                                       # (G, d)
            e = jnp.sum(h * jnp.take(q, graph_id, axis=0), axis=-1,
                        keepdims=True)                  # (N, 1)
            emax = jax.ops.segment_max(e, graph_id, num_segments=num_graphs)
            emax = jnp.where(jnp.isfinite(emax), emax, 0.0)
            ex = jnp.exp(e - jnp.take(emax, graph_id, axis=0))
            denom = jax.ops.segment_sum(ex, graph_id, num_segments=num_graphs)
            alpha = ex / jnp.maximum(jnp.take(denom, graph_id, axis=0), 1e-9)
            r = jax.ops.segment_sum(h * alpha, graph_id,
                                    num_segments=num_graphs)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star


class GNNNode(nn.Module):
    """Node-embedding stack, optionally with a virtual node channel
    (`gnn_model.py:692-860`): a per-graph latent that aggregates all node
    states and broadcasts back between layers."""

    emb_dim: int
    num_layers: int = 5
    conv_type: str = "gin"    # gin | gcn
    virtual_node: bool = True
    dropout: float = 0.5
    residual: bool = False
    bond_dims: Tuple[int, ...] = (5, 6, 2)

    @nn.compact
    def __call__(self, x, src, dst, edge_attr, graph_id, num_nodes,
                 num_graphs, train=False):
        h = nn.Dense(self.emb_dim, name="atom_encoder")(x)
        if self.virtual_node:
            vn = self.param("vn_init", nn.initializers.zeros,
                            (1, self.emb_dim))
            vn = jnp.tile(vn, (num_graphs, 1))
        hs = [h]
        for layer in range(self.num_layers):
            h_in = hs[-1]
            if self.virtual_node:
                h_in = h_in + jnp.take(vn, graph_id, axis=0)
            conv_cls = GINConv if self.conv_type == "gin" else MolGCNConv
            h_out = conv_cls(self.emb_dim, self.bond_dims,
                             name=f"conv_{layer}")(h_in, src, dst, edge_attr,
                                                   num_nodes, train)
            h_out = nn.BatchNorm(use_running_average=not train,
                                 name=f"bn_{layer}")(h_out)
            if layer < self.num_layers - 1:
                h_out = nn.relu(h_out)
            h_out = nn.Dropout(self.dropout)(h_out, deterministic=not train)
            if self.residual:
                # the reference residual adds the vn-AUGMENTED layer input
                # (h_list[layer] is mutated in place before the conv)
                h_out = h_out + h_in
            hs.append(h_out)
            if self.virtual_node and layer < self.num_layers - 1:
                # vn update pools the layer INPUT (with the vn broadcast),
                # not the conv output (`gnn_model.py:861-870`); the vn MLP
                # is Dense->BN->relu twice
                pooled = graph_pool(h_in, graph_id, num_graphs, "sum")
                vn_new = vn + pooled
                for j in range(2):
                    vn_new = nn.Dense(self.emb_dim,
                                      name=f"vn_mlp_{layer}_{j}")(vn_new)
                    vn_new = nn.BatchNorm(use_running_average=not train,
                                          name=f"vn_bn_{layer}_{j}")(vn_new)
                    vn_new = nn.relu(vn_new)
                vn = nn.Dropout(self.dropout)(vn_new, deterministic=not train)
        return hs[-1]


class MolGNN(nn.Module):
    """Graph-property prediction head (`gnn_model.py:862-983` ``GNN``)."""

    num_tasks: int
    emb_dim: int = 300
    num_layers: int = 5
    conv_type: str = "gin"
    virtual_node: bool = True
    pooling: str = "mean"     # sum | mean | max | attention
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, src, dst, edge_attr, graph_id, num_nodes,
                 num_graphs, train=False):
        h = GNNNode(self.emb_dim, self.num_layers, self.conv_type,
                    self.virtual_node, self.dropout, name="gnn_node")(
            x, src, dst, edge_attr, graph_id, num_nodes, num_graphs, train)
        if self.pooling == "attention":
            hg = AttentionPool(name="pool")(h, graph_id, num_graphs, train)
        elif self.pooling == "set2set":
            hg = Set2Set(self.emb_dim, name="pool")(h, graph_id, num_graphs)
        else:
            hg = graph_pool(h, graph_id, num_graphs, self.pooling)
        return nn.Dense(self.num_tasks, name="graph_pred")(hg)
