"""Full-graph GCN (re-design of `gnn_model.py:269-315`): GraphConv stack
with optional parallel linear branch, batch norm, dropout — trained
full-graph on arxiv-scale graphs with the embedding layer materializing
features from node ids each epoch (`gcn_gat_partition.py:85-121`)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import GraphConv


class GCN(nn.Module):
    in_dim: int
    hidden_dim: int
    num_classes: int
    num_layers: int = 3
    dropout: float = 0.5
    use_linear: bool = False
    blocked_tile: int = 0  # >0: convs accept blocked-SpMM tiling args

    @nn.compact
    def __call__(self, feat: jax.Array, src: jax.Array, dst: jax.Array,
                 in_deg: jax.Array, train: bool = False,
                 spmm_args=None) -> jax.Array:
        n = feat.shape[0]
        h = feat
        for i in range(self.num_layers):
            out_d = self.num_classes if i == self.num_layers - 1 else self.hidden_dim
            conv = GraphConv(out_d, name=f"conv_{i}",
                             blocked_tile=self.blocked_tile or None)(
                h, src, dst, in_deg, n, spmm_args)
            if self.use_linear:
                conv = conv + nn.Dense(out_d, use_bias=False, name=f"linear_{i}")(h)
            h = conv
            if i < self.num_layers - 1:
                h = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(h)
                h = nn.relu(h)
                h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return h
