"""Full-graph GAT (re-design of `gnn_model.py:443-496`): GATConv stack with
per-layer parallel linear branch, batch norm, and a trailing standalone
bias layer, matching the reference's arxiv recipe
(`gcn_gat_partition.py:38-50`)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import GATConv, Bias


class GAT(nn.Module):
    in_dim: int
    hidden_dim: int          # per-head
    num_classes: int
    num_layers: int = 3
    num_heads: int = 3
    dropout: float = 0.5
    attn_dropout: float = 0.05
    use_linear: bool = False
    use_symmetric_norm: bool = True

    @nn.compact
    def __call__(self, feat: jax.Array, src: jax.Array, dst: jax.Array,
                 in_deg: jax.Array, train: bool = False) -> jax.Array:
        n = feat.shape[0]
        h = feat
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            heads = 1 if last else self.num_heads
            out_d = self.num_classes if last else self.hidden_dim
            conv = GATConv(out_d, num_heads=heads,
                           use_symmetric_norm=self.use_symmetric_norm,
                           attn_dropout=self.attn_dropout,
                           name=f"conv_{i}")(h, src, dst, in_deg, n,
                                             deterministic=not train)
            if self.use_linear:
                conv = conv + nn.Dense(out_d * heads, use_bias=False,
                                       name=f"linear_{i}")(h)
            h = conv
            if not last:
                h = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(h)
                h = nn.relu(h)
                h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return Bias(self.num_classes, name="bias_last")(h)
