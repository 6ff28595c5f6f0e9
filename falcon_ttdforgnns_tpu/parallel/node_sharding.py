"""Node-space sharding for papers100M-scale graphs.

The reference never scales past one host (SURVEY.md §2.3); its papers100M
recipe leans on TT compression + cache on a single GPU
(`run_script.sh:408-430`).  The TPU framework adds the missing axis: shard
the *node space* across the 'node' mesh axis so that

  - full-table layer-wise inference holds only N/S rows of activations
    per device (papers100M: 111M x 128 fp32 = 57 GB total — must shard);
  - aggregation over the full edge list runs as a **ring SpMM**: each
    device owns an activation block and the edge sub-lists grouped by
    (src-block, dst-block); blocks rotate around the ring via
    ``ppermute`` over ICI while each device accumulates messages into its
    resident dst rows.  Compute overlaps the rotation; every edge is
    processed exactly once; no device ever materializes the full table.

Two host-side edge layouts exist:

- ``partition_edges_by_block`` pads each of the S^2 (src, dst) buckets to
  the hottest bucket's size — simple, but O(S^2 * E_max) memory, which on
  power-law graphs without a balancing reorder can be several x E (the
  round-2 measured blowup; kept as the small-S reference layout).
- ``partition_edges_ragged`` (the default production layout): per dst
  shard, buckets are concatenated in rotation order and padded only to a
  chunk multiple, so memory is **O(E + S^2 * chunk)**.  Per-shard edge
  totals are balanced by a degree-aware snake assignment of rows to
  shards (row ownership is free for the ring: every block visits every
  device anyway), so the bound holds even on skewed (RMAT) graphs where
  the dense bucket layout warns.  ``ring_spmm_ragged`` consumes it with
  one ``dynamic_slice``d chunk scan per rotation step.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def partition_edges_by_block(src: np.ndarray, dst: np.ndarray, num_nodes: int,
                             num_shards: int,
                             pad_multiple: int = 1024):
    """Group edges into (src_block, dst_block) buckets, padded to a common
    static size.

    Returns (src_b, dst_b, w_b) with shape (S, S, E_max): bucket [s, d]
    holds edges whose src lives in block s and dst in block d, with
    *block-local* src/dst indices; w is 1.0 for real edges, 0.0 padding.
    Layout [d][s] is row-major by dst shard so shard d's slice is
    (S, E_max) — one bucket per rotation step.
    """
    block = -(-num_nodes // num_shards)
    sb = (src // block).astype(np.int32)
    db = (dst // block).astype(np.int32)
    order = np.lexsort((sb, db))
    src_s, dst_s = src[order], dst[order]

    counts = np.bincount((db[order].astype(np.int64) * num_shards
                          + sb[order]),
                         minlength=num_shards * num_shards)
    e_max = int(np.ceil(counts.max() / pad_multiple) * pad_multiple) if counts.max() else pad_multiple

    # all S^2 buckets pad to the hottest bucket: on skewed (power-law)
    # graphs without a balancing reorder the waste can be several x E —
    # surface it rather than silently allocate
    pad_ratio = num_shards * num_shards * e_max / max(len(src), 1)
    # tiny graphs inflate the ratio via pad_multiple rounding alone — only
    # warn when the waste is real memory
    if pad_ratio > 4.0 and len(src) > 1_000_000:
        import warnings
        warnings.warn(
            f"ring-SpMM bucket padding is {pad_ratio:.1f}x the edge count "
            f"(hottest bucket {int(counts.max())} of {len(src)} edges); a "
            f"balancing reorder (--partition) shrinks the skew")

    src_b = np.zeros((num_shards, num_shards, e_max), np.int32)
    dst_b = np.zeros((num_shards, num_shards, e_max), np.int32)
    w_b = np.zeros((num_shards, num_shards, e_max), np.float32)
    offs = np.cumsum(counts)
    start = 0
    for d in range(num_shards):
        for s in range(num_shards):
            end = offs[d * num_shards + s]
            n = end - start
            if n > 0:
                src_b[d, s, :n] = src_s[start:end] - s * block
                dst_b[d, s, :n] = dst_s[start:end] - d * block
                w_b[d, s, :n] = 1.0
            start = end
    return src_b, dst_b, w_b, block


def ring_spmm(mesh: Mesh, h: jax.Array, src_b: jax.Array, dst_b: jax.Array,
              w_b: jax.Array, axis: str = "node") -> jax.Array:
    """out[v] = sum_{(u->v)} w * h[u] with h row-sharded over ``axis``.

    h: (N_pad, D) sharded (axis, None); src_b/dst_b/w_b: (S, S, E) sharded
    (axis, None, None) — shard d holds its dst-row buckets for every src
    block.  S-1 ``ppermute`` rotations move activation blocks around the
    ring; each device accumulates into its resident dst rows only.
    """
    S = mesh.shape[axis]

    def body(h_blk, my_src, my_dst, my_w):
        # h_blk: (block, D) this device's activation rows
        # my_src/my_dst/my_w arrive as (1, S, E) (shard_map keeps the
        # sharded axis, size 1) — squeeze to (S, E) buckets by src block id
        my_src, my_dst, my_w = my_src[0], my_dst[0], my_w[0]
        me = jax.lax.axis_index(axis)

        def accum(acc, rot, blk_id):
            s = jnp.take(my_src, blk_id, axis=0)
            d = jnp.take(my_dst, blk_id, axis=0)
            w = jnp.take(my_w, blk_id, axis=0)
            return acc.at[d].add(jnp.take(rot, s, axis=0) * w[:, None])

        # local block first, then S-1 rotate-and-accumulate steps — a final
        # S-th rotation would move every device's full (block, D) tensor one
        # hop only to discard it (and again in the transposed backward)
        acc = accum(jnp.zeros_like(h_blk), h_blk, me)

        def step(carry, i):
            acc, rot = carry
            # rotate: receive block (me + i) % S from the right neighbor
            rot = jax.lax.ppermute(
                rot, axis, [(j, (j - 1) % S) for j in range(S)])
            acc = accum(acc, rot, (me + i) % S)
            return (acc, rot), None

        (acc, _), _ = jax.lax.scan(step, (acc, h_blk), jnp.arange(1, S))
        return acc

    shard_map = jax.shard_map

    f = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None, None),
                  P(axis, None, None)),
        out_specs=P(axis, None))
    return f(h, src_b, dst_b, w_b)


@dataclass(frozen=True)
class RaggedRingLayout:
    """Host-side ragged edge layout for :func:`ring_spmm_ragged`.

    ``src_r``/``dst_r`` are (S, E_pad): row d holds dst-shard d's
    edges, grouped by src block in ROTATION order (src block (d+i) % S at
    chunk offsets [chunk_offs[d, i], chunk_offs[d, i+1])), each bucket
    padded to a ``chunk`` multiple; the final chunk of every row is the
    redirect target for shards with fewer chunks at a step.  ``nreal``
    (S, S) holds each (dst-shard, rotation) bucket's REAL edge count —
    the in-kernel mask `pos < nreal` replaces a round-2 (S, E_pad) f32
    0/1 weight array that cost O(E) extra host+device memory (6.7 GB at
    papers100M scale) purely to zero the tail padding.  Indices are
    block-local storage rows.  ``row_of[v]`` is node v's storage row
    (shard = row // block); ``node_at[r]`` inverts it (pad rows clamped
    to 0).  ``max_chunks[i]`` is the static (max over shards) chunk
    count of rotation step i.
    """

    src_r: np.ndarray
    dst_r: np.ndarray
    nreal: np.ndarray
    chunk_offs: np.ndarray
    max_chunks: Tuple[int, ...]
    chunk: int
    block: int
    num_shards: int
    num_edges: int
    row_of: np.ndarray
    node_at: np.ndarray

    @property
    def num_rows_padded(self) -> int:
        return self.block * self.num_shards

    @property
    def memory_ratio(self) -> float:
        """Stored index elements per real edge (per index array)."""
        return self.src_r.size / max(self.num_edges, 1)


def balanced_row_assignment(in_deg: np.ndarray, num_shards: int
                            ) -> Tuple[np.ndarray, int]:
    """Assign nodes to shards balancing per-shard in-degree sums: sort by
    in-degree descending, deal in snake order (0..S-1, S-1..0, ...) — LPT-
    style, so per-shard edge totals stay ~E/S even on power-law graphs.
    Returns (row_of, block): node v is stored at row ``row_of[v]`` and
    owned by shard ``row_of[v] // block``."""
    n = len(in_deg)
    order = np.argsort(-in_deg, kind="stable")
    block = -(-n // num_shards)
    fwd = np.arange(num_shards)
    snake = np.concatenate([fwd, fwd[::-1]])
    shard_of_rank = np.tile(snake, n // (2 * num_shards) + 1)[:n]
    slot_of_rank = np.zeros(n, np.int64)
    for s in range(num_shards):
        m = shard_of_rank == s
        slot_of_rank[m] = np.arange(int(m.sum()))
    row_of = np.empty(n, np.int64)
    row_of[order] = shard_of_rank.astype(np.int64) * block + slot_of_rank
    return row_of, block


def partition_edges_ragged(src: np.ndarray, dst: np.ndarray, num_nodes: int,
                           num_shards: int, chunk: Optional[int] = None,
                           balance: bool = True) -> RaggedRingLayout:
    """Ragged per-shard edge layout: O(E + S^2 * chunk) memory (VERDICT r2
    item 2) instead of the dense bucket layout's O(S^2 * E_max).

    With ``balance`` (default) rows are assigned to shards by
    :func:`balanced_row_assignment`, which keeps every shard's edge count
    near E/S regardless of degree skew — the dense layout's "several x E"
    warning case (unreordered RMAT) stays within ~1.1x here.

    ``chunk=None`` auto-sizes the chunk so per-bucket rounding waste stays
    a small fraction of E (power of two in [8, 2048])."""
    E = len(src)
    S = num_shards
    if chunk is None:
        chunk = int(min(2048, max(8, 2 ** int(np.ceil(np.log2(
            max(E // (S * S * 4), 1)))))))
    if balance:
        in_deg = np.bincount(dst, minlength=num_nodes).astype(np.int64)
        row_of, block = balanced_row_assignment(in_deg, S)
    else:
        row_of = np.arange(num_nodes, dtype=np.int64)
        block = -(-num_nodes // S)
    # Memory discipline: every O(E) temporary is dropped as soon as its
    # narrow successor exists — at papers100M full scale (3.3B directed
    # edges) the round-3 formulation held ~9 int64 E-length arrays at once
    # (~240 GB); this keeps peak E-bytes near (caller's src,dst 16) +
    # (block-local int32 pair 8) + (int32 key 4) + (argsort order 8) = 36/E,
    # validated past 2^31 edges by tests/test_papers_scale.py
    # (FALCON_BIG_TESTS=1).
    r = row_of[src]
    src_l = (r % block).astype(np.int32)
    sb = (r // block).astype(np.int32)
    del r
    r = row_of[dst]
    dst_l = (r % block).astype(np.int32)
    db = (r // block).astype(np.int32)
    del r
    # bucket key: dst shard major, then src block in that shard's ROTATION
    # order ((sb - db) mod S) — so each shard's buckets concatenate in the
    # order the ring delivers them
    sb -= db
    sb %= S           # in-place: sb becomes the rotation index
    db *= S
    db += sb          # db becomes the int32 bucket key
    del sb
    key = db
    order = np.argsort(key, kind="stable")
    counts = np.bincount(key, minlength=S * S).reshape(S, S)
    del key, db
    src_l = src_l[order]
    dst_l = dst_l[order]
    del order
    nchunks = -(-counts // chunk)  # ceil; 0 for empty buckets
    row_len = (nchunks.sum(axis=1) * chunk).max() if E else 0
    e_pad = int(row_len) + chunk  # final all-zero chunk = redirect target
    # int32 ceilings the device kernel relies on: per-shard padded edge
    # counts index src_r rows via int32 `(start + j) * chunk` arithmetic,
    # and nreal ships as int32.  GLOBAL edge counts past 2^31 are fine
    # (tests/test_papers_scale.py big test); a single shard/bucket past
    # 2^31 means too few shards for the graph — say so instead of wrapping.
    if e_pad >= 2 ** 31 or int(counts.max()) >= 2 ** 31:
        raise ValueError(
            f"per-shard edge block too large for int32 device indexing "
            f"(e_pad={e_pad}, max bucket={int(counts.max())}); raise "
            f"num_shards above {S}")

    src_r = np.zeros((S, e_pad), np.int32)
    dst_r = np.zeros((S, e_pad), np.int32)
    chunk_offs = np.zeros((S, S + 1), np.int32)
    bucket_starts = np.concatenate([[0], np.cumsum(counts.reshape(-1))])
    for d in range(S):
        pos = 0
        for i in range(S):
            b = d * S + i
            n = counts[d, i]
            if n:
                src_r[d, pos:pos + n] = src_l[bucket_starts[b]:bucket_starts[b + 1]]
                dst_r[d, pos:pos + n] = dst_l[bucket_starts[b]:bucket_starts[b + 1]]
            pos += int(nchunks[d, i]) * chunk
            chunk_offs[d, i + 1] = pos // chunk
    max_chunks = tuple(int(c) for c in nchunks.max(axis=0))
    node_at = np.zeros(S * block, np.int32)
    node_at[row_of] = np.arange(num_nodes, dtype=np.int32)
    return RaggedRingLayout(src_r, dst_r, counts.astype(np.int32),
                            chunk_offs, max_chunks,
                            chunk, block, S, E, row_of, node_at)


def ring_spmm_ragged(mesh: Mesh, h: jax.Array, src_r: jax.Array,
                     dst_r: jax.Array, nreal: jax.Array,
                     chunk_offs: jax.Array,
                     max_chunks: Tuple[int, ...], chunk: int,
                     axis: str = "node") -> jax.Array:
    """out[r] = sum_{(u->v): row_of[v]=r} h[row_of[u]] over the ragged
    layout; h is (S*block, D) row-sharded over ``axis``.

    Same ring as :func:`ring_spmm` (local block first, then S-1
    ``ppermute`` rotations), but each step consumes its shard's bucket as
    ``max_chunks[i]`` fixed-size chunks via ``dynamic_slice``: shards with
    fewer real chunks at a step redirect the excess reads to the final
    padding chunk, and an in-kernel ``pos < nreal[i]`` iota mask zeroes
    the tail padding (``nreal`` is the tiny (S, S) per-bucket real-edge
    count — NOT an O(E) weight array).  SPMD-uniform and reverse-mode
    differentiable (scan + gather/scatter-add, no while_loop)."""
    S = mesh.shape[axis]
    e_pad = src_r.shape[-1]
    zero_off = e_pad - chunk
    pos_iota = jnp.arange(chunk, dtype=jnp.int32)

    def body(h_blk, my_src, my_dst, my_nreal, my_offs):
        my_src, my_dst = my_src[0], my_dst[0]
        my_nreal = my_nreal[0]
        my_offs = my_offs[0]

        def consume(acc, rot, i):
            n_static = max_chunks[i]
            if n_static == 0:
                return acc
            start = my_offs[i]
            n_mine = my_offs[i + 1] - start
            n_real = my_nreal[i]

            def one(acc, j):
                off = jnp.where(j < n_mine, (start + j) * chunk, zero_off)
                s = jax.lax.dynamic_slice(my_src, (off,), (chunk,))
                d = jax.lax.dynamic_slice(my_dst, (off,), (chunk,))
                # tail-padding mask; redirected chunks (j >= n_mine) have
                # j*chunk >= n_real so the mask is all-false there too
                valid = (j * chunk + pos_iota) < n_real
                acc = acc.at[d].add(jnp.where(valid[:, None],
                                              jnp.take(rot, s, axis=0), 0.0))
                return acc, None

            acc, _ = jax.lax.scan(one, acc, jnp.arange(n_static, dtype=jnp.int32))
            return acc

        acc = consume(jnp.zeros_like(h_blk), h_blk, 0)
        rot = h_blk
        for i in range(1, S):
            rot = jax.lax.ppermute(
                rot, axis, [(j, (j - 1) % S) for j in range(S)])
            acc = consume(acc, rot, i)
        return acc

    # manual only over the ring axis: on a hybrid (data x node) mesh the
    # other axes stay automatic, so batch-sharded losses can differentiate
    # through the ring (their data-varying cotangents are XLA's problem,
    # not the body's)
    f = jax.shard_map(
        body, mesh=mesh, axis_names={axis},
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None)),
        out_specs=P(axis, None))
    return f(h, src_r, dst_r, nreal, chunk_offs)


def sharded_layerwise_inference(mesh: Mesh, model_apply, variables,
                                h0: jax.Array, src_b, dst_b, w_b,
                                in_deg: jax.Array, num_layers: int,
                                axis: str = "node"):
    """Layer-wise full-neighbor inference with node-sharded activations:
    each layer = ring SpMM (mean) + the layer's dense transform (which is
    row-parallel, no communication)."""
    h = h0
    deg = jnp.maximum(in_deg, 1.0)[:, None]
    for li in range(num_layers):
        agg = ring_spmm(mesh, h, src_b, dst_b, w_b, axis) / deg
        h = model_apply(variables, h, agg, li)
    return h


def sharded_layerwise_inference_ragged(mesh: Mesh, model_apply, variables,
                                       h0: jax.Array, src_r, dst_r, nreal,
                                       chunk_offs,
                                       max_chunks: Tuple[int, ...],
                                       chunk: int, in_deg: jax.Array,
                                       num_layers: int, axis: str = "node"):
    """Layer-wise inference over the ragged layout (storage-row order:
    permute h0/in_deg by ``layout.row_of`` before, un-permute after)."""
    h = h0
    deg = jnp.maximum(in_deg, 1.0)[:, None]
    for li in range(num_layers):
        agg = ring_spmm_ragged(mesh, h, src_r, dst_r, nreal, chunk_offs,
                               max_chunks, chunk, axis) / deg
        h = model_apply(variables, h, agg, li)
    return h


def make_node_sharded_full_step(model, tx, mesh: Mesh, num_layers: int,
                                max_chunks: Tuple[int, ...], chunk: int,
                                axis: str = "node",
                                data_axis: Optional[str] = None):
    """Node-sharded full-neighbor TRAINING step (papers100M regime): the
    (N, D) activation tensors never exist on one device — features are
    TT-materialized row-sharded (cores replicated, each shard looks up its
    own rows), every layer aggregates via the differentiable ragged ring
    SpMM (ppermute transposes to the reverse rotation in backward), conv
    transforms stay row-parallel, and the loss reads the minibatch seeds'
    logits.  Gradients of the replicated params are psum'd by XLA.

    Everything runs in STORAGE-ROW order (the balanced assignment of
    :func:`partition_edges_ragged`): ``node_at`` maps rows back to node
    ids for feature materialization, and callers pass ``seed_rows`` =
    ``layout.row_of[seeds]``.

    With ``data_axis`` set (the hybrid DCN(data) x ICI(node) layout of
    SURVEY §2.4), the minibatch seeds/labels are additionally sharded over
    that mesh axis: each data group evaluates the loss on its own seed
    slice while sharing the node-sharded propagation (replicated over
    'data', manual only over 'node' in the ring), and the global batch
    mean makes XLA psum the gradients over BOTH axes.  Numerically
    identical to the unsharded batch — same loss, same updates.

    TPU-native counterpart of training at a scale the reference could
    not reach (SURVEY §2.4 / §5.7: node-space sharding is the missing
    axis); semantics match SAGE.forward_full_graph exactly
    (tests/test_parallel.py parity)."""
    import optax

    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(axis, None))

    def step(variables, opt_state, src_r, dst_r, nreal, chunk_offs, node_at,
             in_deg, seed_rows, labels, rng):
        params = variables["params"]
        aux = {k: v for k, v in variables.items() if k != "params"}
        deg = jnp.maximum(in_deg, 1.0)[:, None]

        def loss_fn(p):
            h = model.apply({"params": p, **aux}, node_at,
                            method=type(model).materialize_features)
            h = jax.lax.with_sharding_constraint(h, rows)
            for li in range(num_layers):
                agg = ring_spmm_ragged(mesh, h, src_r, dst_r, nreal,
                                       chunk_offs, max_chunks, chunk,
                                       axis) / deg
                h = model.apply({"params": p, **aux}, h, agg, li,
                                method=type(model).apply_conv)
                h = jax.lax.with_sharding_constraint(h, rows)
            logits = jnp.take(h, seed_rows, axis=0)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, new_opt = tx.update(grads, opt_state, params, value=loss)
        new_params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return {"params": new_params, **aux}, new_opt, loss, acc

    ragged = NamedSharding(mesh, P(axis, None))
    vec = NamedSharding(mesh, P(axis))
    seedspec = (NamedSharding(mesh, P(data_axis)) if data_axis else repl)
    return jax.jit(
        step,
        in_shardings=(repl, repl, ragged, ragged, ragged, ragged, vec, vec,
                      seedspec, seedspec, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1),
    )
