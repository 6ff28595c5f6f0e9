"""Software-managed hot-row embedding cache (LFU).

FALCON's third contribution (`FBTT/tt_embeddings_cuda.cu:1083-1507`,
`FBTT/tt_embeddings_ops.py:559-615`): track access frequencies of node
ids, keep the top-K fully-materialized rows on-device, and serve those
rows without TT reconstruction.

TPU-native redesign (SURVEY.md §7): the GPU open-addressing hash table +
CUB radix sort + stream-synced three-way partition become
  - frequency tracking: deterministic ``.at[].add`` scatter (vs atomicAdd),
  - populate: ``jax.lax.top_k`` over the dense frequency vector
    (vs radix sort of hash-table entries),
  - lookup: binary-search membership in a *sorted* id table
    (vs MurmurHash probing — XLA has no atomics; sorted-array
    ``searchsorted`` is the idiom),
  - the cached/TT index split: masked dual-path select with static shapes
    (vs ``DevicePartition`` + D2H size sync on the critical path,
    `cu:1492-1499` — that sync does not exist here at all).

State split (functional design): the cache *rows* (``weight``,
(K, D)) are a differentiable parameter owned by the module — gradient
routing to cores vs cached rows falls out of the forward select; the
*metadata* (freq counters, sorted id table, adagrad accumulator, ready
flag) is non-differentiable mutable state.  ``populate`` is a pure
function applied between epochs at the train-loop level
(`sage_dgl_partition.py:359-361` lifecycle).

Cached rows still save the dominant *prefix* stage of the grouped TT
lookup: hit indices are remapped to index 0 before the TT path, collapsing
them into one group (`tt_lookup_grouped` computes unique prefixes only).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .tt_shapes import TTShapes
from .tt_lookup import Cores, tt_lookup_gather


class CacheMeta(NamedTuple):
    """Non-differentiable cache metadata (mutable 'ttcache' collection).

    freq:  (N,) int32   LFU access counters (hashtbl+cache_freq analog)
    ids:   (K,) int32   sorted cached node ids; -1 = empty slot
    ready: ()  bool     False during warmup (before first populate,
                        `tt_embeddings_ops.py:615` warmup flag)

    The cached rows' optimizer state (the reference's
    ``cache_optimizer_state``, `cu:1746-1846`) is NOT held here: gradients
    to ``cache_weight`` flow functionally and ``train/optim.py``'s routed
    ``rowwise_adagrad`` owns the per-slot accumulator (reset at populate
    by ``reset_cache_opt_state`` — slot→id assignments change)."""

    freq: jax.Array
    ids: jax.Array
    ready: jax.Array


def init_meta(num_embeddings: int, cache_size: int) -> CacheMeta:
    return CacheMeta(
        freq=jnp.zeros((num_embeddings,), dtype=jnp.int32),
        ids=jnp.full((cache_size,), -1, dtype=jnp.int32),
        ready=jnp.zeros((), dtype=jnp.bool_),
    )


def update_freq(meta: CacheMeta, indices: jax.Array) -> CacheMeta:
    """LFU accounting for one batch (`update_cache_state_cuda`,
    `cu:1083-1119`). Deterministic scatter-add."""
    return meta._replace(freq=meta.freq.at[indices.astype(jnp.int32)].add(1))


def populate(shapes: TTShapes, cores: Cores, meta: CacheMeta,
             cache_size: int, chunk: int = 8192) -> Tuple[CacheMeta, jax.Array]:
    """Select the top-K hottest ids and materialize their rows via the TT
    chain (`cache_populate_cuda`, `cu:1270-1347`).  Returns (new_meta,
    new_weight); the caller installs new_weight into the module's
    ``cache_weight`` param.  Evicted rows are dropped (their training
    signal lives in the TT cores)."""
    K = cache_size
    top_freq, top_ids = jax.lax.top_k(meta.freq, K)
    ids = jnp.where(top_freq > 0, top_ids.astype(jnp.int32), -1)
    ids = jnp.sort(ids)  # sorted table -> binary-search membership
    safe = jnp.maximum(ids, 0)

    n_chunks = -(-K // chunk)
    pad = n_chunks * chunk - K
    safe_p = jnp.pad(safe, (0, pad)).reshape(n_chunks, min(chunk, n_chunks * chunk))

    def body(_, idx_chunk):
        return None, tt_lookup_gather(shapes, cores, idx_chunk)

    _, rows = jax.lax.scan(body, None, safe_p)
    weight = rows.reshape(-1, shapes.embedding_dim)[:K]
    weight = jnp.where((ids >= 0)[:, None], weight, 0.0)
    new_meta = meta._replace(
        ids=ids,
        ready=jnp.ones((), dtype=jnp.bool_),
    )
    return new_meta, weight


def lookup(meta: CacheMeta, indices: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(hit_mask (B,), slot (B,)) — binary search in the sorted id table
    (replaces ``cache_lookup_kernel`` hash probing, `cu:1367-1386`)."""
    idx = indices.astype(jnp.int32)
    pos = jnp.searchsorted(meta.ids, idx)
    pos = jnp.clip(pos, 0, meta.ids.shape[0] - 1)
    hit = (meta.ids[pos] == idx) & meta.ready
    return hit, pos


def split_indices(meta: CacheMeta, indices: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Masked analog of ``preprocess_indices_sync`` (`cu:1388-1507`): returns
    (tt_indices, hit, slot) where tt_indices has hits remapped to 0 so the
    grouped TT lookup collapses them into a single unique prefix — the
    static-shape way to "skip" cached rows' reconstruction."""
    hit, slot = lookup(meta, indices)
    tt_indices = jnp.where(hit, 0, indices.astype(jnp.int32))
    return tt_indices, hit, slot


def cached_forward(cache_weight: jax.Array, tt_rows: jax.Array, hit: jax.Array,
                   slot: jax.Array) -> jax.Array:
    """Merge TT-reconstructed rows with cached rows (``cache_forward``,
    `cu:1509-1583`).  Differentiable in both ``tt_rows`` and
    ``cache_weight`` — gradient routing to cores vs cache falls out of the
    select, no bespoke backward kernels needed."""
    cached = jnp.take(cache_weight, slot, axis=0)
    return jnp.where(hit[:, None], cached, tt_rows)


def reset(meta: CacheMeta) -> CacheMeta:
    """Forget frequencies and contents (`tt_embeddings_ops.py:810-814`)."""
    return init_meta(meta.freq.shape[0], meta.ids.shape[0])
