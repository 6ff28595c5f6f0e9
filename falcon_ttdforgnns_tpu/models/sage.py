"""GraphSAGE with TT-compressed node embeddings.

Re-design of the reference SAGE (`gnn_model.py:50-253`): same layer stack
(TT/dense embedding -> L SAGEConv layers -> logits), but training runs on
the sampler's *dense-fanout* tensors (static shapes, reshape+mean
aggregation) instead of DGL bipartite blocks, and layer-wise full-neighbor
inference runs as edge-chunked COO SpMM over the whole graph
(`gnn_model.py:220-253`).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import SAGEConv
from ..nn.tt_embedding import (TTEmbeddingBag, DenseEmbedding,
                               AccessCountingEmbedding, FixedFeatureEmbedding)
from ..ops.segment import spmm_mean


def make_embed_layer(num_nodes: int, feat_dim: int, use_tt: bool = True,
                     tt_ranks: Sequence[int] = (16, 16),
                     p_shapes: Optional[Sequence[int]] = None,
                     q_shapes: Optional[Sequence[int]] = None,
                     weight_dist: str = "approx-normal",
                     cache_size: int = 0,
                     access_counts: bool = False,
                     precomputed_cores=None,
                     fixed_features=None,
                     batch_count: int = 131072,
                     grouped: bool = False,
                     device_freq: bool = False) -> nn.Module:
    """Embedding layer selection, parity with `gnn_model.py:107-190`
    (+ the DDP driver's real-feature path, `sage_dgl_partition.py:174`).
    ``batch_count`` is the lookup chunk / VMEM-budget knob (cu:1027 analog);
    ``grouped`` opts into the Efficient_TT prefix-dedup lookup;
    ``device_freq`` enables in-step LFU counting on device (the only
    frequency source when sampling runs inside jit, --mode puregpu)."""
    if fixed_features is not None:
        return FixedFeatureEmbedding(fixed_features, name="embed")
    if use_tt:
        return TTEmbeddingBag(
            num_embeddings=num_nodes, embedding_dim=feat_dim,
            tt_ranks=tuple(tt_ranks),
            p_shapes=tuple(p_shapes) if p_shapes else None,
            q_shapes=tuple(q_shapes) if q_shapes else None,
            weight_dist=weight_dist, cache_size=cache_size,
            precomputed_cores=precomputed_cores,
            batch_count=batch_count, grouped=grouped,
            device_freq=device_freq, name="embed")
    if access_counts:
        return AccessCountingEmbedding(num_nodes, feat_dim, name="embed")
    return DenseEmbedding(num_nodes, feat_dim, name="embed")


def collect_level_ids(seeds: jax.Array, layers: Sequence[jax.Array]):
    """Flattened node ids over every fanout level, plus the per-level widths
    — the single-lookup contract of SAGE.__call__ (duplicates included; they
    are exactly what TT dedup and the hot-row cache exploit)."""
    B = seeds.shape[0]
    levels = [seeds.reshape(B, 1)] + [l.reshape(B, -1) for l in layers]
    sizes = [lv.shape[1] for lv in levels]
    all_ids = jnp.concatenate([lv.reshape(-1) for lv in levels])
    return all_ids, sizes, B


class SAGE(nn.Module):
    """num_layers == len(fanouts); hidden width and dropout mirror the
    reference defaults (`tt_utils.py:44-47`: 256 hidden, 3 layers, 0.5
    dropout)."""

    num_nodes: int
    in_dim: int
    hidden_dim: int
    num_classes: int
    num_layers: int = 3
    dropout: float = 0.5
    use_tt: bool = True
    tt_ranks: Tuple[int, ...] = (16, 16)
    p_shapes: Optional[Tuple[int, ...]] = None
    q_shapes: Optional[Tuple[int, ...]] = None
    weight_dist: str = "approx-normal"
    cache_size: int = 0
    access_counts: bool = False
    precomputed_cores: Optional[tuple] = None
    batch_count: int = 131072   # TT lookup chunk size (--batch-count)
    grouped: bool = False       # Efficient_TT prefix-dedup lookup (--emb-name eff)
    device_freq: bool = False   # in-step LFU counting (puregpu + cache)
    # --bf16: conv tower in bfloat16 (params f32, activations bf16) — the
    # fanout-level activations dominate step HBM traffic at products scale
    bf16: bool = False
    # --bf16-mean-f32: under bf16, accumulate the fanout means with an f32
    # reduce accumulator (output cast back to bf16).  This is NOT the
    # round-3 input-upcast trap (which materialized the biggest level as a
    # 307 MB f32 copy): lax.reduce with dtype=f32 fuses the convert into
    # the reduction, so only the accumulator is wide.  Candidate fix for
    # the bf16 convergence lag if the tower half is responsible.
    mean_acc_f32: bool = False
    # bf16 tower-ceiling mechanism probes (round-5): run the LAST conv
    # (logits head — tiny (B,1,H) activations, so ~zero HBM cost) or the
    # FIRST conv (biggest fanout levels — f32 input promotion is the
    # round-3 copy cost, acceptable for an 8-epoch mechanism probe) in
    # f32 while the rest of the tower stays bf16.
    bf16_f32_head: bool = False
    bf16_f32_first: bool = False

    def setup(self):
        self.embed_layer = make_embed_layer(
            self.num_nodes, self.in_dim, self.use_tt, self.tt_ranks,
            self.p_shapes, self.q_shapes, self.weight_dist, self.cache_size,
            self.access_counts, self.precomputed_cores,
            batch_count=self.batch_count, grouped=self.grouped,
            device_freq=self.device_freq)
        dims = [self.hidden_dim] * (self.num_layers - 1) + [self.num_classes]
        cdt = jnp.bfloat16 if self.bf16 else None

        def layer_dtype(i):
            if self.bf16_f32_head and i == len(dims) - 1:
                return None  # flax promotes bf16 inputs to the f32 params
            if self.bf16_f32_first and i == 0:
                return None
            return cdt

        self.convs = [SAGEConv(d, name=f"conv_{i}", dtype=layer_dtype(i))
                      for i, d in enumerate(dims)]
        self.dropout_layer = nn.Dropout(self.dropout)

    def embed_nodes(self, ids: jax.Array, count_accesses: bool = True) -> jax.Array:
        return self.embed_layer(ids.reshape(-1), None, count_accesses).reshape(
            (*ids.shape, self.in_dim))

    def __call__(self, seeds: jax.Array, layers: Sequence[jax.Array],
                 train: bool = False) -> jax.Array:
        """Dense-fanout forward.

        seeds (B,); layers[l] (B, F_{l+1}) node ids, innermost level last
        (the sampler's SampledBatch.layers).  One embedding lookup covers
        every level — maximizing TT group-dedup and cache hits, mirroring
        the reference's single lookup over block input nodes
        (`gnn_model.py:196-204`).
        """
        all_ids, sizes, B = collect_level_ids(seeds, layers)
        h_all = self.embed_layer(all_ids, None, train)
        hs = self._split_levels(h_all, sizes, B)
        return self._conv_tower(hs, train)

    def _split_levels(self, h_all: jax.Array, sizes: Sequence[int],
                      B: int) -> List[jax.Array]:
        hs, off = [], 0
        for sz in sizes:
            hs.append(h_all[off:off + sz * B].reshape(B, sz, self.in_dim))
            off += sz * B
        return hs

    def _conv_tower(self, hs: List[jax.Array], train: bool) -> jax.Array:
        B = hs[0].shape[0]
        if self.bf16:
            # bf16 activations end-to-end through the tower: halves the
            # HBM bytes of the (B*prod(fanouts), D) level tensors — the
            # conv/dropout bucket of the step is bandwidth-bound, not
            # MXU-bound.  Params stay f32; logits are cast back below.
            hs = [h.astype(jnp.bfloat16) for h in hs]
        for li, conv in enumerate(self.convs):
            new_hs = []
            for lev in range(len(hs) - 1):
                f = hs[lev + 1].shape[1] // hs[lev].shape[1]
                d = hs[lev].shape[-1]
                # dtype pin: jnp.mean silently upcasts bf16 inputs to f32
                # for accumulation, materializing the biggest fanout level
                # as an f32 copy (307 MB at products scale — measured
                # 3.8 ms/step of convert+copy+reshape; round-3 log lost to
                # a container reset — re-capture: logs/r5_puregpu_trace.log).
                # Under --bf16 the ~1e-2 accumulation error over <=15 terms
                # is within the opt-in's precision contract.
                acc_dt = (jnp.float32 if (self.mean_acc_f32
                                          and hs[lev + 1].dtype
                                          == jnp.bfloat16)
                          else hs[lev + 1].dtype)
                h_neigh = (hs[lev + 1]
                           .reshape(B, hs[lev].shape[1], f, d)
                           .mean(axis=2, dtype=acc_dt)
                           .astype(hs[lev + 1].dtype))
                h = conv(hs[lev], h_neigh)
                if li < self.num_layers - 1:
                    h = nn.relu(h)
                    h = self.dropout_layer(h, deterministic=not train)
                new_hs.append(h)
            hs = new_hs
        return hs[0][:, 0, :].astype(jnp.float32)  # (B, num_classes)

    def forward_from_embeddings(self, h_all: jax.Array, seeds: jax.Array,
                                layers: Sequence[jax.Array],
                                train: bool = False) -> jax.Array:
        """Forward with the embedding lookup hoisted out: ``h_all`` is the
        (sum(levels)*B, in_dim) embedding block for ``collect_level_ids``'s
        id order.  Used by the fused-sparse train step, which runs the
        lookup + in-kernel SGD core update outside autograd (the functional
        analog of `Fused_Efficient_TT_backward_sgd_cuda`, ecu:718-904)."""
        _, sizes, B = collect_level_ids(seeds, layers)
        hs = self._split_levels(h_all, sizes, B)
        return self._conv_tower(hs, train)

    def forward_full_graph(self, src: jax.Array, dst: jax.Array,
                           in_deg: jax.Array, train: bool = False,
                           chunk: int = 1 << 22) -> jax.Array:
        """Full-neighbor TRAINING forward (`--full-neighbor`): exact
        aggregation over every edge — the TPU-native formulation of the
        reference's full-neighbor sampler (`graphloader.py:245-251`, README
        NoTT-FullNeighbor rows).  Instead of per-batch bipartite blocks
        with dynamic shapes, one differentiable full-graph propagation
        produces logits for ALL nodes; the caller takes its minibatch rows.
        Same math (each seed's logit depends on its exact L-hop
        neighborhood), static shapes, one SpMM per layer instead of one
        per batch."""
        ids = jnp.arange(self.num_nodes, dtype=jnp.int32)
        h = self.embed_layer(ids, None, train)
        for li, conv in enumerate(self.convs):
            h_neigh = spmm_mean(h, src, dst, self.num_nodes, in_deg,
                                chunk=chunk, sorted_dst=True)
            h = conv(h, h_neigh)
            if li < self.num_layers - 1:
                h = nn.relu(h)
                h = self.dropout_layer(h, deterministic=not train)
        return h  # (N, num_classes)

    def apply_conv(self, h_dst: jax.Array, h_neigh: jax.Array,
                   layer_idx: int) -> jax.Array:
        """One conv layer given pre-aggregated neighbor features — the
        row-parallel piece of node-sharded layer-wise inference
        (parallel/node_sharding.py), no communication inside."""
        h = self.convs[layer_idx](h_dst=h_dst, h_neigh=h_neigh)
        if layer_idx < self.num_layers - 1:
            h = nn.relu(h)
        return h

    def forward_full(self, h: jax.Array, src: jax.Array, dst: jax.Array,
                     in_deg: jax.Array, num_nodes: int,
                     layer_idx: int, chunk: int = 1 << 22) -> jax.Array:
        """One conv layer over the full graph (layer-wise inference,
        `gnn_model.py:236-252`).  Called once per layer by the inference
        driver with the previous layer's full (N, D) activations."""
        # callers pass CSRGraph.to_coo() edges — dst is non-decreasing
        h_neigh = spmm_mean(h, src, dst, num_nodes, in_deg, chunk=chunk,
                            sorted_dst=True)
        return self.apply_conv(h, h_neigh, layer_idx)

    def materialize_features(self, node_ids: jax.Array) -> jax.Array:
        """Chunk of the full feature table via TT reconstruction
        (`gnn_model.py:228-234`)."""
        return self.embed_layer(node_ids, None, False)
