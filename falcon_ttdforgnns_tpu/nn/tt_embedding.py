"""TTEmbeddingBag — the framework's flagship module.

Functional flax re-design of the reference's ``TTEmbeddingBag`` /
``TableBatchedTTEmbeddingBag`` (`FBTT/tt_embeddings_ops.py:432-965`) and
``Eff_TTEmbedding`` (`Efficient_TT/efficient_tt.py:75-307`):

- TT cores are flax params (shape ``(p, r, q, r')`` per core);
- lookup uses the grouped (Efficient_TT-dedup) forward with the
  unique-reduced custom-VJP backward (ops/tt_lookup.py);
- the LFU hot-row cache lives in a mutable ``ttcache`` variable collection
  with the reference's warmup -> populate -> cached-serving lifecycle
  (SURVEY.md §3.5);
- ``num_tables`` batching is expressed with ``nn.vmap`` when needed
  (the GNN drivers only ever use one table).

The in-kernel fused sparse optimizers of the reference (SGD applied inside
backward, returning None grads — `tt_embeddings_ops.py:288-312`) are
deliberately NOT replicated mechanically: JAX is functional, so "fused
sparse update" means the train step routes TT-core grads through a
dedicated optax transform (see train/optim.py) while everything stays
differentiable.  Semantics preserved, double-lr bug (Adam over cores *and*
in-kernel SGD) not replicated (SURVEY.md §7 watch-items).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cache as cache_ops
from ..ops.tt_lookup import tt_embedding_bag, tt_lookup, tt_lookup_batched, tt_to_full
from ..ops.tt_pallas import tt_lookup_fused
from ..ops.tt_shapes import TTShapes, make_tt_shapes
from ..ops import tt_init


@functools.lru_cache(maxsize=64)
def _cores_for(shapes: TTShapes, weight_dist: str, seed: int):
    """Memoized host-side init per (shapes, dist, seed): flax re-runs param
    init fns (module re-construction, eval_shape validation), so without
    the cache each re-run pays the full T-core numpy construction."""
    return tuple(tt_init.init_tt_cores(shapes, weight_dist, seed=seed))


def _core_init(shapes: TTShapes, weight_dist: str, k: int, seed: int) -> Callable:
    # NOTE: the rng key is ignored — flax re-runs param init fns under
    # jax.eval_shape to validate shapes during apply, so the init must be
    # traceable; the host-side numpy init draws from a static seed instead.
    # The per-core seed offset is load-bearing: it pins the round-1/2
    # initialization stream that every seeded accuracy baseline was
    # measured against.
    def init(key, shape=None, dtype=jnp.float32):
        return jnp.asarray(
            _cores_for(shapes, weight_dist, seed + 7919 * k)[k], dtype=dtype)

    return init


def _pool(rows: jax.Array, offsets: jax.Array) -> jax.Array:
    """EmbeddingBag sum-pooling: segment the looked-up rows by bag
    boundaries (`reduce_output_kernel` semantics, cu:923-965)."""
    num_bags = offsets.shape[0] - 1
    positions = jnp.arange(rows.shape[0], dtype=jnp.int32)
    rowidx = jnp.searchsorted(offsets[1:-1].astype(jnp.int32), positions,
                              "right")
    return jax.ops.segment_sum(rows, rowidx, num_segments=num_bags)


class TTEmbeddingBag(nn.Module):
    """TT-compressed embedding bag with optional LFU row cache.

    Args mirror the reference constructor
    (`FBTT/tt_embeddings_ops.py:465-530`): num_embeddings, embedding_dim,
    ranks, p/q shapes, weight_dist, cache_size.  ``precomputed_cores``
    allows the ortho/eigen/dortho init schemes (host numpy arrays,
    `gnn_model.py:129-178`).
    """

    num_embeddings: int
    embedding_dim: int
    tt_ranks: Tuple[int, ...] = (16, 16)
    p_shapes: Optional[Tuple[int, ...]] = None
    q_shapes: Optional[Tuple[int, ...]] = None
    weight_dist: str = "approx-normal"
    cache_size: int = 0
    # grouped (Efficient_TT prefix dedup) costs a device sort; measured on
    # v5e the sort dominates the tiny TT arithmetic, so gather is the
    # default and grouped is opt-in for extremely duplicated batches.
    grouped: bool = False
    precomputed_cores: Optional[Tuple[np.ndarray, ...]] = None
    init_seed: int = 0
    batch_count: int = 131072  # lookup chunk size (cu:1027 analog)
    # kernel: 'auto' uses the fused Pallas path on TPU for 2-4 core TT
    # (~100x the XLA gather path on v5e), XLA elsewhere.
    kernel: str = "auto"
    pallas_block: int = 1024
    # LFU counting on-device is a scatter-add over every looked-up id —
    # a TPU anti-pattern in the hot loop.  Default: the host sampler tracks
    # frequencies (NeighborLoader.freq); flip on for device-side parity.
    device_freq: bool = False

    def _use_pallas(self) -> bool:
        if self.kernel == "pallas":
            return True
        # grouped dedup only exists on the XLA path; under kernel='auto' the
        # opt-in must win over the Pallas default or the flag is a no-op
        if self.kernel == "xla" or self.grouped:
            return False
        return jax.default_backend() == "tpu" and self.shapes.ndim in (2, 3, 4)

    def _lookup(self, indices: jax.Array) -> jax.Array:
        if self._use_pallas():
            return tt_lookup_fused(self.shapes, self.pallas_block, self.cores,
                                   indices)
        return tt_lookup_batched(self.shapes, self.cores, indices,
                                 self.grouped, self.batch_count)

    @property
    def shapes(self) -> TTShapes:
        return make_tt_shapes(self.num_embeddings, self.embedding_dim,
                              self.tt_ranks, self.p_shapes, self.q_shapes)

    def setup(self):
        shapes = self.shapes
        if self.precomputed_cores is not None:
            self.cores = tuple(
                self.param(f"tt_core_{k}", lambda key, c=c: jnp.asarray(c, jnp.float32))
                for k, c in enumerate(self.precomputed_cores)
            )
        else:
            self.cores = tuple(
                self.param(f"tt_core_{k}",
                           _core_init(shapes, self.weight_dist, k, self.init_seed),
                           shapes.core_shape(k))
                for k in range(shapes.ndim)
            )
        if self.cache_size > 0:
            self.cache_weight = self.param(
                "cache_weight", nn.initializers.zeros,
                (self.cache_size, self.embedding_dim))
            self.cache_meta = self.variable(
                "ttcache", "meta",
                lambda: cache_ops.init_meta(self.num_embeddings, self.cache_size))

    def __call__(self, indices: jax.Array, offsets: Optional[jax.Array] = None,
                 count_accesses: bool = True) -> jax.Array:
        """indices (B,) -> (B, D) (or (num_bags, D) with offsets).

        Forward lifecycle parity with `tt_embeddings_ops.py:837-903`:
        update LFU counters, split cached/TT indices, TT-reconstruct,
        merge cached rows.
        """
        shapes = self.shapes
        if self.cache_size > 0:
            meta = self.cache_meta.value
            if self.device_freq and count_accesses and not self.is_initializing():
                meta = cache_ops.update_freq(meta, indices)
                self.cache_meta.value = meta
            tt_idx, hit, slot = cache_ops.split_indices(meta, indices)
            rows = self._lookup(tt_idx)
            rows = cache_ops.cached_forward(self.cache_weight, rows, hit, slot)
        else:
            rows = self._lookup(indices.astype(jnp.int32))
        if offsets is not None:
            rows = _pool(rows, offsets)
        return rows

    def full_weight(self) -> jax.Array:
        """Materialize the entire table (`tt_embeddings_ops.py:617`;
        used by layer-wise inference, `gnn_model.py:228-234`)."""
        return tt_to_full(self.shapes, self.cores)

    def cache_populate(self) -> None:
        """Top-K populate (`sage_dgl_partition.py:359-361`): refresh the id
        table from LFU counters and materialize rows.  NOTE: mutates the
        ``ttcache`` collection but the refreshed rows land in the
        ``cache_weight`` *param* — call through
        :func:`falcon_ttdforgnns_tpu.train.optim.cache_populate_apply`
        which installs both functionally at the train-loop level."""
        if self.cache_size <= 0:
            raise ValueError("cache_size == 0: no cache to populate")
        meta, weight = cache_ops.populate(self.shapes, self.cores,
                                          self.cache_meta.value, self.cache_size)
        self.cache_meta.value = meta
        self.sow("ttcache_populate", "weight", weight)


class DenseEmbedding(nn.Module):
    """Plain dense embedding table — the no-TT baseline
    (`nn.Embedding` path at `gnn_model.py:188-190`), with the same call
    signature as TTEmbeddingBag."""

    num_embeddings: int
    embedding_dim: int

    @nn.compact
    def __call__(self, indices: jax.Array, offsets: Optional[jax.Array] = None,
                 count_accesses: bool = True) -> jax.Array:
        table = self.param("weight", nn.initializers.normal(0.1),
                           (self.num_embeddings, self.embedding_dim))
        rows = jnp.take(table, indices, axis=0)
        if offsets is not None:
            rows = _pool(rows, offsets)
        return rows

    def full_weight(self) -> jax.Array:
        return self.variables["params"]["weight"]


class AccessCountingEmbedding(nn.Module):
    """Dense embedding that records per-row access counts — parity with
    ``LoggingEmbedding`` (`gnn_model.py:32-47`), feeding the access-CDF
    analytics (utils/analytics.py)."""

    num_embeddings: int
    embedding_dim: int

    @nn.compact
    def __call__(self, indices: jax.Array, offsets: Optional[jax.Array] = None,
                 count_accesses: bool = True) -> jax.Array:
        counts = self.variable("access_counts", "counts",
                               lambda: jnp.zeros((self.num_embeddings,), jnp.int32))
        if count_accesses and not self.is_initializing():
            counts.value = counts.value.at[indices].add(1)
        return DenseEmbedding(self.num_embeddings, self.embedding_dim,
                              name="table")(indices, offsets)


class TableBatchedTTEmbeddingBag(nn.Module):
    """num_tables > 1 variant (parity with ``TableBatchedTTEmbeddingBag``,
    `FBTT/tt_embeddings_ops.py:432-915`): one module, per-table TT cores,
    vmapped lookup.  ``indices``/``offsets`` follow the reference's
    table-batched contract: indices (num_tables, B) -> (num_tables, B, D).
    The GNN drivers only ever use one table; this exists for embedding-
    table workloads (DLRM-style).

    Cache semantics match the reference exactly: the LFU cache path is
    **disabled whenever num_tables > 1** — `preprocess_indices_sync_cuda`
    only takes the cache branch under ``num_tables == 1``
    (`FBTT/tt_embeddings_cuda.cu:1447-1449`), so batched tables always run
    the pure-TT path there too.  ``cache_size`` is accepted for
    constructor parity and ignored with num_tables > 1."""

    num_tables: int
    num_embeddings: int
    embedding_dim: int
    tt_ranks: Tuple[int, ...] = (16, 16)
    p_shapes: Optional[Tuple[int, ...]] = None
    q_shapes: Optional[Tuple[int, ...]] = None
    weight_dist: str = "approx-normal"
    cache_size: int = 0
    init_seed: int = 0
    batch_count: int = 131072

    @nn.compact
    def __call__(self, indices: jax.Array,
                 offsets: Optional[jax.Array] = None) -> jax.Array:
        if self.num_tables == 1:
            # delegate: keeps the full single-table feature set (cache etc.)
            bag = TTEmbeddingBag(
                num_embeddings=self.num_embeddings,
                embedding_dim=self.embedding_dim,
                tt_ranks=self.tt_ranks, p_shapes=self.p_shapes,
                q_shapes=self.q_shapes, weight_dist=self.weight_dist,
                cache_size=self.cache_size, init_seed=self.init_seed,
                batch_count=self.batch_count, name="tables")
            out = bag(indices[0], offsets[0] if offsets is not None else None)
            return out[None]

        shapes = make_tt_shapes(self.num_embeddings, self.embedding_dim,
                                self.tt_ranks, self.p_shapes, self.q_shapes)

        def stacked(k):
            # distinct host-numpy seed per (core, table) — the flax rng is
            # unusable here, see _core_init; _cores_for memoizes re-runs
            def init(key, shape=None, dtype=jnp.float32):
                return jnp.stack([
                    jnp.asarray(_cores_for(
                        shapes, self.weight_dist,
                        self.init_seed + 7919 * k + 104729 * t)[k],
                        dtype=dtype)
                    for t in range(self.num_tables)])
            return init

        cores = tuple(
            self.param(f"tt_core_{k}", stacked(k),
                       (self.num_tables,) + shapes.core_shape(k))
            for k in range(shapes.ndim))

        def one(cores_t, idx_t, off_t):
            return tt_embedding_bag(shapes, cores_t, idx_t, off_t,
                                    batch_count=self.batch_count)

        if offsets is None:
            return jax.vmap(lambda c, i: one(c, i, None))(cores, indices)
        return jax.vmap(one)(cores, indices, offsets)


class FixedFeatureEmbedding(nn.Module):
    """Non-trainable feature lookup — the reference's DDP path trains on
    real prefetched node features rather than learned embeddings
    (`sage_dgl_partition.py:141-176` prefetch_node_feats); features live in
    a frozen 'constants' collection (HBM-resident, excluded from grads)."""

    features: np.ndarray  # (N, D) host array captured at construction

    @nn.compact
    def __call__(self, indices: jax.Array, offsets: Optional[jax.Array] = None,
                 count_accesses: bool = True) -> jax.Array:
        feats = self.variable("constants", "feats",
                              lambda: jnp.asarray(self.features, jnp.float32))
        rows = jnp.take(feats.value, indices, axis=0)
        if offsets is not None:
            rows = _pool(rows, offsets)
        return rows

    def full_weight(self) -> jax.Array:
        return self.variables["constants"]["feats"]
