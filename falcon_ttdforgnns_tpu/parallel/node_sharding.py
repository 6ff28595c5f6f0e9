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

Host-side preparation (``partition_edges_by_block``) pads each (s, d)
edge bucket to a common static size — XLA-friendly, deterministic.
"""

from __future__ import annotations

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


def make_node_sharded_full_step(model, tx, mesh: Mesh, num_nodes: int,
                                num_nodes_pad: int, num_layers: int,
                                axis: str = "node"):
    """Node-sharded full-neighbor TRAINING step (papers100M regime): the
    (N, D) activation tensors never exist on one device — features are
    TT-materialized row-sharded (cores replicated, each shard looks up its
    own rows), every layer aggregates via the differentiable ring SpMM
    (ppermute transposes to the reverse rotation in backward), conv
    transforms stay row-parallel, and the loss reads the minibatch seeds'
    logits.  Gradients of the replicated params are psum'd by XLA.

    TPU-native counterpart of training at a scale the reference could
    not reach (SURVEY §2.4 / §5.7: node-space sharding is the missing
    axis); semantics match SAGE.forward_full_graph exactly
    (tests/test_parallel.py parity)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(axis, None))

    def step(variables, opt_state, src_b, dst_b, w_b, in_deg, seeds, labels,
             rng):
        params = variables["params"]
        aux = {k: v for k, v in variables.items() if k != "params"}
        deg = jnp.maximum(in_deg, 1.0)[:, None]

        def loss_fn(p):
            ids = jnp.minimum(jnp.arange(num_nodes_pad, dtype=jnp.int32),
                              num_nodes - 1)  # pad rows: clamped, edgeless
            ids = jax.lax.with_sharding_constraint(
                ids, NamedSharding(mesh, P(axis)))
            h = model.apply({"params": p, **aux}, ids,
                            method=type(model).materialize_features)
            h = jax.lax.with_sharding_constraint(h, rows)
            for li in range(num_layers):
                agg = ring_spmm(mesh, h, src_b, dst_b, w_b, axis) / deg
                h = model.apply({"params": p, **aux}, h, agg, li,
                                method=type(model).apply_conv)
                h = jax.lax.with_sharding_constraint(h, rows)
            logits = jnp.take(h, seeds, axis=0)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, new_opt = tx.update(grads, opt_state, params, value=loss)
        new_params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return {"params": new_params, **aux}, new_opt, loss, acc

    bspec = NamedSharding(mesh, P(axis, None, None))
    vec = NamedSharding(mesh, P(axis))
    return jax.jit(
        step,
        in_shardings=(repl, repl, bspec, bspec, bspec, vec, repl, repl, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1),
    )
