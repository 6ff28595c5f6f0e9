"""GNN convolution layers, TPU-first.

Two message-passing backends replace DGL's SpMM (`gnn_model.py` uses
``dglnn.SAGEConv``/``dglnn.GraphConv`` and a hand-rolled ``GATConv``):

1. **Dense-fanout** ("block") form for neighbor-sampled training: the
   sampler emits static (B, fanout) neighbor tensors, so aggregation is a
   reshape + mean — pure VPU work feeding MXU matmuls, no segment ops, no
   sorting, no dynamic shapes.  This is the TPU-native redesign of DGL's
   bipartite blocks.

2. **COO segment-sum** form for full-graph training and layer-wise
   inference: gather source features over the edge list, ``segment_sum``
   into destinations (deterministic; the XLA idiom for SpMM).

Both forms share the same parameter shapes, so a model trained with
sampled blocks evaluates with full-neighbor COO (exactly the reference's
train-sampled / infer-full split, `gnn_model.py:193-253`).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def segment_mean(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    s = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    cnt = jax.ops.segment_sum(jnp.ones((data.shape[0], 1), data.dtype), segment_ids,
                              num_segments=num_segments)
    return s / jnp.maximum(cnt, 1.0)


class SAGEConv(nn.Module):
    """GraphSAGE convolution, mean aggregator (parity with
    ``dglnn.SAGEConv(..., 'mean')`` used at `gnn_model.py:92-101`):

        h_v' = W_self h_v + W_neigh mean_{u in N(v)} h_u   (+ bias)
    """

    out_dim: int
    use_bias: bool = True
    # compute dtype (params stay f32): bfloat16 halves the HBM traffic of
    # the big fanout-level activations — the step's bottleneck at products
    # scale is bytes, not MXU flops
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, h_dst: jax.Array, h_neigh: jax.Array) -> jax.Array:
        """h_dst (..., D), h_neigh (..., D) pre-aggregated neighbor mean."""
        w_self = nn.Dense(self.out_dim, use_bias=self.use_bias, name="self",
                          dtype=self.dtype)
        w_neigh = nn.Dense(self.out_dim, use_bias=False, name="neigh",
                           dtype=self.dtype)
        return w_self(h_dst) + w_neigh(h_neigh)


class GraphConv(nn.Module):
    """GCN convolution with symmetric degree normalization (parity with
    ``dglnn.GraphConv(..., norm='both')``, `gnn_model.py:277-283`):

        H' = D^{-1/2} A D^{-1/2} H W
    """

    out_dim: int
    use_bias: bool = True
    # set (with spmm_args passed at call time) to aggregate via the
    # window-blocked kernel (ops/spmm_blocked.py) instead of the XLA
    # gather+segment-sum — the tiling arrays come in as ARGUMENTS so jit
    # does not bake edge-scale constants into the program
    blocked_tile: Optional[int] = None

    @nn.compact
    def __call__(self, h: jax.Array, src: jax.Array, dst: jax.Array,
                 in_deg: jax.Array, num_nodes: int,
                 spmm_args=None) -> jax.Array:
        h = nn.Dense(self.out_dim, use_bias=self.use_bias)(h)
        norm = jax.lax.rsqrt(jnp.maximum(in_deg.astype(h.dtype), 1.0))
        hn = h * norm[:, None]
        if spmm_args is not None:
            if self.blocked_tile is None:
                raise ValueError("GraphConv: passing spmm_args requires "
                                 "blocked_tile (the tiling's tile size)")
            from ..ops.spmm_blocked import BlockedSpmm, apply_blocked_spmm
            op = BlockedSpmm(fwd=spmm_args[0], bwd=spmm_args[1],
                             tile=self.blocked_tile, num_nodes=num_nodes)
            agg = apply_blocked_spmm(hn, op)
        else:
            msgs = jnp.take(hn, src, axis=0)
            agg = jax.ops.segment_sum(msgs, dst, num_segments=num_nodes)
        return agg * norm[:, None]


class GATConv(nn.Module):
    """Multi-head graph attention (redesigned from the reference's custom
    GATConv, `gnn_model.py:318-441`: u_add_v edge attention + edge_softmax
    + optional symmetric norm + residual).

    Edge softmax = segment_max / segment_sum over destination segments.
    """

    out_dim: int  # per-head
    num_heads: int = 1
    negative_slope: float = 0.2
    residual: bool = True
    use_symmetric_norm: bool = False
    attn_dropout: float = 0.0
    # edge-chunk size for the weighted aggregation; None = auto (bound the
    # per-chunk (chunk, H, Do) slab to ~512 MB f32)
    edge_chunk: Optional[int] = None

    @nn.compact
    def __call__(self, h: jax.Array, src: jax.Array, dst: jax.Array,
                 in_deg: jax.Array, num_nodes: int,
                 deterministic: bool = True) -> jax.Array:
        H, Do = self.num_heads, self.out_dim
        feat = nn.Dense(H * Do, use_bias=False, name="fc")(h).reshape(-1, H, Do)

        # "both" norm scales only the SOURCE features (deg^-0.5); er comes
        # from the unscaled dst features — leaky_relu runs before the
        # per-dst softmax, so a dst-side rescaling would NOT cancel and
        # would silently change the attention (`gnn_model.py:396-401,413`)
        feat_src = feat
        if self.use_symmetric_norm:
            norm = jnp.power(jnp.maximum(in_deg.astype(h.dtype), 1.0), -0.5)
            feat_src = feat * norm[:, None, None]

        attn_l = self.param("attn_l", nn.initializers.glorot_uniform(), (1, H, Do))
        attn_r = self.param("attn_r", nn.initializers.glorot_uniform(), (1, H, Do))
        el = jnp.sum(feat_src * attn_l, axis=-1)  # (N, H)
        er = jnp.sum(feat * attn_r, axis=-1)

        e = jnp.take(el, src, axis=0) + jnp.take(er, dst, axis=0)  # (E, H)
        e = nn.leaky_relu(e, self.negative_slope)
        # edge softmax over incoming edges of each dst
        emax = jax.ops.segment_max(e, dst, num_segments=num_nodes)
        emax = jnp.where(jnp.isfinite(emax), emax, 0.0)
        ex = jnp.exp(e - jnp.take(emax, dst, axis=0))
        esum = jax.ops.segment_sum(ex, dst, num_segments=num_nodes)
        alpha = ex / jnp.maximum(jnp.take(esum, dst, axis=0), 1e-9)  # (E, H)
        if self.attn_dropout > 0.0 and not deterministic:
            alpha = nn.Dropout(self.attn_dropout)(alpha, deterministic=False)

        # weighted aggregation WITHOUT materializing (E, H, Do) messages:
        # custom-VJP edge-chunked scatter (7.3 GB at arxiv scale with the
        # reference-default 3 heads x 256 — OOMs a 16 GB chip otherwise)
        from ..ops.segment import headed_spmm
        chunk = self.edge_chunk
        if chunk is None:
            budget = (512 << 20) // (4 * H * Do)  # ~512 MB f32 slab
            chunk = max(1 << 14, min(1 << 22, budget))
        out = headed_spmm(feat_src, alpha, src, dst, num_nodes, chunk)  # (N, H, Do)

        if self.use_symmetric_norm:
            inv = jnp.power(jnp.maximum(in_deg.astype(h.dtype), 1.0), 0.5)
            out = out * inv[:, None, None]

        if self.residual:
            res = nn.Dense(H * Do, use_bias=False, name="res_fc")(h).reshape(-1, H, Do)
            out = out + res
        return out.reshape(-1, H * Do)


class Bias(nn.Module):
    """Standalone learned bias (final layer of the reference GAT,
    `gnn_model.py:443-455`)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return x + b
