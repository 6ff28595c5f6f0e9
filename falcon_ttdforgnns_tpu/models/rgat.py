"""Heterogeneous relational GAT (re-design of `gnn_model.py:515-595`):
per-edge-type GATConv banks with skip connections, MAG-style.  The
reference's RGAT is unused by its drivers but part of the model family;
here it runs on a typed COO edge list (one (src, dst) pair per etype).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import GATConv


class RGATLayer(nn.Module):
    out_dim: int  # per-head
    num_heads: int
    num_etypes: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, h, typed_edges, in_degs, num_nodes, train=False):
        """typed_edges: sequence of (src, dst) per etype; in_degs: per-etype
        in-degree arrays.  Per-etype attention, mean-combined, plus skip."""
        outs = []
        for t, (src, dst) in enumerate(typed_edges):
            conv = GATConv(self.out_dim, num_heads=self.num_heads,
                           residual=False, name=f"etype_{t}")
            outs.append(conv(h, src, dst, in_degs[t], num_nodes,
                             deterministic=not train))
        agg = jnp.mean(jnp.stack(outs, axis=0), axis=0)
        skip = nn.Dense(self.out_dim * self.num_heads, name="skip")(h)
        out = agg + skip
        out = nn.relu(out)
        return nn.Dropout(self.dropout)(out, deterministic=not train)


class RGAT(nn.Module):
    in_dim: int
    hidden_dim: int   # per-head
    num_classes: int
    num_etypes: int
    num_layers: int = 2
    num_heads: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, feat, typed_edges, num_nodes, train=False):
        in_degs = []
        for src, dst in typed_edges:
            deg = jax.ops.segment_sum(jnp.ones_like(dst, jnp.float32), dst,
                                      num_segments=num_nodes)
            in_degs.append(deg)
        h = feat
        for i in range(self.num_layers):
            h = RGATLayer(self.hidden_dim, self.num_heads, self.num_etypes,
                          self.dropout, name=f"layer_{i}")(
                h, typed_edges, in_degs, num_nodes, train)
        return nn.Dense(self.num_classes, name="out")(h)
