"""TT-embedding lookup: the compute core of the framework.

TPU-native re-design of the reference CUDA kernels:

- forward chain of batched small GEMMs over gathered core rows
  (reference: `FBTT/tt_embeddings_cuda.cu:967-1081`) becomes gather +
  ``jnp.einsum`` contractions that XLA maps onto the MXU;
- the Efficient_TT *group de-duplication* forward
  (`Efficient_TT/efficient_tt_cuda.cu:159-377`: compute the first
  two-core partial product once per unique (i1,i2) prefix) becomes a
  sort-based ``jnp.unique(size=B)`` + contraction over unique groups —
  static shapes, no atomics, deterministic;
- the unique-reduced fused backward
  (`Efficient_TT/efficient_tt_cuda.cu:1011-1247`
  ``Fused_Extra_Efficient_TT_backward_sgd_cuda``) becomes a
  ``segment_sum`` of d_output over duplicate indices followed by the
  standard TT chain-rule GEMMs and a deterministic ``.at[].add`` scatter
  (XLA scatter-add is deterministic; the reference needed atomicAdd).

All shapes are static: ``indices`` always has a fixed length B (callers
pad with a sentinel and mask).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .tt_shapes import TTShapes

Cores = Tuple[jax.Array, ...]  # core k: (p_k, r_k, q_k, r_{k+1})


# ---------------------------------------------------------------------------
# digit decomposition
# ---------------------------------------------------------------------------

def tt_digits(shapes: TTShapes, indices: jax.Array) -> Tuple[jax.Array, ...]:
    """Row-major TT digits of each index: digit_k = (idx // stride_k) % p_k.

    Vectorized equivalent of the per-thread decomposition in
    `FBTT/tt_embeddings_cuda.cu:757-851` (``colidx/L[0]`` etc.).
    """
    idx = indices.astype(jnp.int32)
    return tuple(
        (idx // s) % p for s, p in zip(shapes.strides, shapes.p_shapes)
    )


# ---------------------------------------------------------------------------
# full-table reconstruction (testing / layerwise inference / cache populate)
# ---------------------------------------------------------------------------

def tt_to_full(shapes: TTShapes, cores: Cores) -> jax.Array:
    """Materialize the full (num_embeddings, embedding_dim) table.

    Parity with `FBTT/tt_embeddings_ops.py:80-127` ``tt_matrix_to_full``.
    """
    T = shapes.ndim
    # F: (P, Q, r) running kron-chain
    f = cores[0].reshape(shapes.p_shapes[0], shapes.q_shapes[0], -1)
    for k in range(1, T):
        c = cores[k]  # (p, r, q, r')
        f = jnp.einsum("PQr,prqs->PpQqs", f, c, preferred_element_type=jnp.float32)
        P = f.shape[0] * f.shape[1]
        Q = f.shape[2] * f.shape[3]
        f = f.reshape(P, Q, -1)
    full = f.reshape(f.shape[0], f.shape[1])
    return full[: shapes.num_embeddings, : shapes.embedding_dim]


def tt_materialize_rows(shapes: TTShapes, cores: Cores, indices: jax.Array) -> jax.Array:
    """Reconstruct an arbitrary batch of rows (used by cache populate,
    `FBTT/tt_embeddings_cuda.cu:1166-1268` ``prefetch_cached_weights``)."""
    return tt_lookup_gather(shapes, cores, indices)


# ---------------------------------------------------------------------------
# forward paths
# ---------------------------------------------------------------------------

def _chain(shapes: TTShapes, cores: Cores, digits: Sequence[jax.Array],
           start: int, stop: int) -> jax.Array:
    """Contract cores[start:stop] gathered at the given digits.

    Returns (B, prod(q_{start..stop-1}), r_stop) with leading rank folded in
    (r_start must be 1 when start == 0).
    """
    g = jnp.take(cores[start], digits[start], axis=0)  # (B, r, q, r')
    B = g.shape[0]
    g = g.reshape(B, g.shape[1] * g.shape[2], g.shape[3])
    for k in range(start + 1, stop):
        c = jnp.take(cores[k], digits[k], axis=0)  # (B, r, q, r')
        c = c.reshape(B, c.shape[1], c.shape[2] * c.shape[3])
        g = jnp.einsum("bdr,brm->bdm", g, c, preferred_element_type=jnp.float32)
        g = g.reshape(B, -1, cores[k].shape[3])
    return g


def tt_lookup_gather(shapes: TTShapes, cores: Cores, indices: jax.Array) -> jax.Array:
    """Plain FBTT-style forward: gather rows of each core, contract the chain.

    Reference semantics: `FBTT/tt_embeddings_cuda.cu:967-1081`.
    """
    digits = tt_digits(shapes, indices)
    g = _chain(shapes, cores, digits, 0, shapes.ndim)
    return g.reshape(indices.shape[0], shapes.embedding_dim)


def _grouped_core(shapes: TTShapes, cores: Cores, last: jax.Array,
                  ugroups: jax.Array, inv: jax.Array) -> jax.Array:
    """Shared tail of the grouped forward: unique-prefix chain + broadcast
    + last-core contraction.  ``ugroups``/``inv`` come from either a device
    ``jnp.unique`` (unsorted input) or a compare+cumsum (sorted input)."""
    B = last.shape[0]
    # prefix partial for each unique group: (B, q0*..*q_{T-2}, r_{T-1})
    udigits = tuple(
        (ugroups // (s // shapes.p_last)) % p
        for s, p in zip(shapes.strides[:-1], shapes.p_shapes[:-1])
    )
    prefix = _chain(shapes, cores, udigits, 0, shapes.ndim - 1)
    prefix = jnp.take(prefix, inv, axis=0)  # broadcast back to batch

    tail = jnp.take(cores[-1], last, axis=0)  # (B, r, q, 1)
    tail = tail.reshape(B, tail.shape[1], -1)
    out = jnp.einsum("bdr,brq->bdq", prefix, tail, preferred_element_type=jnp.float32)
    return out.reshape(B, shapes.embedding_dim)


def tt_lookup_grouped(shapes: TTShapes, cores: Cores, indices: jax.Array) -> jax.Array:
    """Efficient_TT-style forward with group de-duplication.

    group = idx // p_last identifies the shared prefix (i_0..i_{T-2}); the
    prefix partial product is computed once per *unique* group in the batch
    and broadcast back (`Efficient_TT/efficient_tt_cuda.cu:159-241`).
    Static shapes: unique is padded to B.
    """
    idx = indices.astype(jnp.int32)
    B = idx.shape[0]
    group = idx // shapes.p_last
    ugroups, inv = jnp.unique(group, size=B, fill_value=0, return_inverse=True)
    return _grouped_core(shapes, cores, idx % shapes.p_last, ugroups, inv)


def _sorted_unique(values: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(uvals, inv) by *run* dedup without a device sort: a neighbor
    compare + cumsum ranks each run of equal adjacent values, and a scatter
    collects one representative per run.  Padded slots (beyond the number
    of runs) hold 0.  For a sorted input this equals
    ``jnp.unique(size=B, fill_value=0)``; for arbitrary input it is still
    *correct* downstream (every element's slot holds exactly its own value;
    distinct values never share a slot) — it merely dedups only adjacent
    duplicates.  O(B) VPU work vs the O(B log B) device sort that made
    grouped lose on TPU (docs/PERFORMANCE.md round-1 table)."""
    B = values.shape[0]
    is_new = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (values[1:] != values[:-1]).astype(jnp.int32)])
    inv = jnp.cumsum(is_new) - 1  # (B,) slot of each element's run
    # all writers of a slot carry the same value -> max is deterministic
    uvals = jnp.zeros((B,), values.dtype).at[inv].max(values)
    return uvals, inv


def tt_lookup_grouped_sorted(shapes: TTShapes, cores: Cores,
                             indices: jax.Array,
                             ucap: Optional[int] = None) -> jax.Array:
    """Grouped forward for *host-sorted* indices: the sampler-side sorted
    emission revives the Efficient_TT prefix dedup on TPU by replacing the
    device sort (`jnp.unique`) with a compare+cumsum over the already-
    sorted batch.  Callers are responsible for the sort (host-side, where
    it overlaps device compute via prefetch) and for un-sorting the output
    if positional order matters (one (B, D) gather).

    ``ucap`` is the static unique-group capacity, the actual FLOP lever:
    for a sorted batch the number of prefix runs is bounded by
    prod(p[:-1]) — 17,500 for the products shapes vs B=918K — so the
    prefix chain runs over ``ucap`` slots instead of B (the sort-based
    :func:`tt_lookup_grouped` must pad unique to B because it cannot bound
    the run count of arbitrary input).  With ``ucap=None`` the capacity is
    B (always safe).  A batch with more than ``ucap`` runs (only possible
    when the input is NOT sorted) clamps the overflow into the last slot —
    wrong values, so callers passing ucap must honor the sorted contract;
    without ucap, results match :func:`tt_lookup_grouped` for ANY input
    (run-dedup is unconditionally correct — see :func:`_sorted_unique`).
    """
    idx = indices.astype(jnp.int32)
    B = idx.shape[0]
    group = idx // shapes.p_last
    if ucap is None or ucap >= B:
        ugroups, inv = _sorted_unique(group)
    else:
        is_new = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            (group[1:] != group[:-1]).astype(jnp.int32)])
        inv = jnp.minimum(jnp.cumsum(is_new) - 1, ucap - 1)
        ugroups = jnp.zeros((ucap,), group.dtype).at[inv].max(group)
    return _grouped_core(shapes, cores, idx % shapes.p_last, ugroups, inv)


def grouped_ucap(shapes: TTShapes, block: int = 8) -> int:
    """Safe static unique-prefix capacity for sorted batches:
    prod(p[:-1]) rounded up to ``block`` (sublane alignment)."""
    cap = 1
    for p in shapes.p_shapes[:-1]:
        cap *= p
    return -(-cap // block) * block


# ---------------------------------------------------------------------------
# backward (chain rule partials)
# ---------------------------------------------------------------------------

def _partials(shapes: TTShapes, cores: Cores, digits: Sequence[jax.Array]):
    """Left/right partial chains for every core position.

    left[k]:  (B, L_k, r_k)   contraction of cores 0..k-1   (L_0 = 1)
    right[k]: (B, r_{k+1}, R_k) contraction of cores k+1..T-1 (R_{T-1} = 1)
    """
    T = shapes.ndim
    B = digits[0].shape[0]
    fr = shapes.full_ranks

    # incremental O(T): each prefix/suffix extends the previous one (the
    # naive per-k _chain(0,k)/_chain(k+1,T) re-contracts shared products —
    # ~2x the GEMM work at T=4 in the hot backward path)
    lefts: List[jax.Array] = [jnp.ones((B, 1, 1), dtype=cores[0].dtype)]
    if T > 1:
        g = jnp.take(cores[0], digits[0], axis=0).reshape(B, -1, fr[1])
        lefts.append(g)
        for k in range(1, T - 1):
            c = jnp.take(cores[k], digits[k], axis=0)
            c = c.reshape(B, fr[k], -1)
            g = jnp.einsum("bdr,brm->bdm", lefts[-1], c,
                           preferred_element_type=jnp.float32)
            lefts.append(g.reshape(B, -1, fr[k + 1]))

    rights: List[jax.Array] = [None] * T  # type: ignore
    rights[T - 1] = jnp.ones((B, 1, 1), dtype=cores[0].dtype)
    for k in range(T - 2, -1, -1):
        c = jnp.take(cores[k + 1], digits[k + 1], axis=0)  # (B, r, q, r')
        g = jnp.einsum("brqs,bsR->brqR", c, rights[k + 1],
                       preferred_element_type=jnp.float32)
        rights[k] = g.reshape(B, c.shape[1], -1)
    return lefts, rights


def tt_core_grads(shapes: TTShapes, cores: Cores, indices: jax.Array,
                  d_out: jax.Array, dedup: bool = True,
                  sorted_hint: bool = False) -> Tuple[jax.Array, ...]:
    """Dense per-core gradients of a TT lookup.

    With ``dedup=True``, d_out is first segment-summed over duplicate
    indices (the reference's ``Fused_Extra`` unique-gradient reduction,
    `Efficient_TT/efficient_tt_cuda.cu:970-987`), then the standard two
    transposed GEMMs per core (`FBTT/tt_embeddings_cuda.cu:421-654`) are
    applied on unique indices and scatter-added deterministically.

    ``sorted_hint=True`` asserts the indices are ascending (sampler-side
    sorted emission): the unique-reduce then uses a compare+cumsum instead
    of the device sort inside ``jnp.unique``.
    """
    idx = indices.astype(jnp.int32)
    B = idx.shape[0]

    if dedup:
        if sorted_hint:
            uidx, inv = _sorted_unique(idx)
        else:
            uidx, inv = jnp.unique(idx, size=B, fill_value=0,
                                   return_inverse=True)
        d_red = jax.ops.segment_sum(d_out, inv, num_segments=B)
        # padded unique slots receive zero gradient; scatters of zeros are no-ops
        idx, d_out = uidx, d_red

    digits = tt_digits(shapes, idx)
    lefts, rights = _partials(shapes, cores, digits)
    T = shapes.ndim
    fr = shapes.full_ranks

    grads = []
    for k in range(T):
        Lk = lefts[k].shape[1]
        Rk = rights[k].shape[2]
        qk = shapes.q_shapes[k]
        d = d_out.reshape(B, Lk, qk, Rk)
        # d_core[b, r, q, s] = sum_{l,R} left[b,l,r] d[b,l,q,R] right[b,s,R]
        t = jnp.einsum("blr,blqR->brqR", lefts[k], d, preferred_element_type=jnp.float32)
        t = jnp.einsum("brqR,bsR->brqs", t, rights[k], preferred_element_type=jnp.float32)
        g = jnp.zeros((shapes.p_shapes[k], fr[k], qk, fr[k + 1]), dtype=t.dtype)
        g = g.at[digits[k]].add(t)
        grads.append(g)
    return tuple(grads)


# ---------------------------------------------------------------------------
# differentiable lookup (custom VJP)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def tt_lookup(shapes: TTShapes, grouped, cores: Cores, indices: jax.Array) -> jax.Array:
    """Differentiable TT row lookup: (B,) int32 -> (B, D).

    ``grouped`` selects the forward: ``False`` plain gather chain, ``True``
    the Efficient_TT group-dedup forward (device sort), ``"sorted"`` the
    group-dedup forward for host-sorted batches (no device sort — forward
    AND backward dedup run on compare+cumsum).  The custom VJP implements
    the unique-reduced backward; ``indices`` gets no gradient.
    """
    if grouped == "sorted":
        return tt_lookup_grouped_sorted(shapes, cores, indices)
    if grouped:
        return tt_lookup_grouped(shapes, cores, indices)
    return tt_lookup_gather(shapes, cores, indices)


def _tt_lookup_fwd(shapes, grouped, cores, indices):
    out = tt_lookup(shapes, grouped, cores, indices)
    return out, (cores, indices)


def _tt_lookup_bwd(shapes, grouped, res, d_out):
    cores, indices = res
    grads = tt_core_grads(shapes, cores, indices, d_out, dedup=True,
                          sorted_hint=grouped == "sorted")
    return grads, None


tt_lookup.defvjp(_tt_lookup_fwd, _tt_lookup_bwd)


def tt_lookup_batched(shapes: TTShapes, cores: Cores, indices: jax.Array,
                      grouped: bool = False,
                      batch_count: int = 131072) -> jax.Array:
    """Chunked differentiable lookup for very large nnz.

    The TPU analog of the reference's ``batch_count`` GEMM chunking
    (`FBTT/tt_embeddings_cuda.cu:1027`): without it XLA materializes the
    (B, r, q, r') gathered-core intermediates at once — at products scale
    (918K indices per step) that is >2 GB of payload inflated ~8x by TPU
    tile padding (trailing dims ≪ 128), which OOMs HBM.  ``lax.map`` over
    fixed-size chunks bounds the working set; gradients flow through the
    scan, so the backward is chunked too.
    """
    B = indices.shape[0]
    if B <= batch_count:
        return tt_lookup(shapes, grouped, cores, indices)
    n_chunks = -(-B // batch_count)
    pad = n_chunks * batch_count - B
    idx = jnp.pad(indices, (0, pad)).reshape(n_chunks, batch_count)
    out = jax.lax.map(lambda i: tt_lookup(shapes, grouped, cores, i), idx)
    return out.reshape(n_chunks * batch_count, shapes.embedding_dim)[:B]


# ---------------------------------------------------------------------------
# EmbeddingBag pooling
# ---------------------------------------------------------------------------

def tt_embedding_bag(
    shapes: TTShapes,
    cores: Cores,
    indices: jax.Array,
    offsets: Optional[jax.Array] = None,
    num_bags: Optional[int] = None,
    grouped: bool = False,
    batch_count: int = 131072,
) -> jax.Array:
    """EmbeddingBag-style sum pooling over CSR ``offsets`` segments.

    Preserves the reference's bag contract
    (`FBTT/tt_embeddings_cuda.cu:923-965` ``reduce_output_kernel``) while
    optimizing the unary case (offsets == arange(B+1), the only case the GNN
    drivers use — `gnn_model.py:199`): pass ``offsets=None`` for a pure
    lookup with no pooling reduction.
    """
    rows = tt_lookup_batched(shapes, cores, indices, grouped, batch_count)
    if offsets is None:
        return rows
    if num_bags is None:
        num_bags = offsets.shape[0] - 1
    # rowidx[j] = bag of element j  (vectorized `compute_rowidx_kernel`,
    # `FBTT/tt_embeddings_cuda.cu:1349-1365`)
    nnz = indices.shape[0]
    positions = jnp.arange(nnz, dtype=jnp.int32)
    rowidx = jnp.searchsorted(offsets[1:-1].astype(jnp.int32), positions, side="right")
    return jax.ops.segment_sum(rows, rowidx, num_segments=num_bags)
