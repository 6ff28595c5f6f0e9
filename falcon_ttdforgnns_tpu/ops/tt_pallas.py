"""Fused Pallas TT-lookup kernel (3-core path — the shipped config).

The XLA path (ops/tt_lookup.py) materializes per-index gathered core rows
and chain intermediates in HBM between fused regions; measured at products
scale that costs ~10 ms per 65K lookups on v5e (tile-padded (B, q, r)
intermediates).  This kernel keeps the whole per-block pipeline in VMEM.

Layout strategy (the part that makes Mosaic happy AND fast): everything is
**transposed** — features live in sublanes, batch lives in lanes:

  ohT[p, b]      one-hot of digit           (iota == idx broadcast)
  gT  = c0T @ ohT          (q1*r1, block)   MXU row-select
  c1rT = c1T @ ohT2        (r1*q2*r2, block) MXU
  c2rT = c2T @ ohT3        (r2*q3, block)   MXU
  contraction over r1: 64 sublane-broadcast FMAs on (q2*r2, block)
  contraction over r2: 320 sublane-broadcast FMAs on (q3, block)

No lane-crossing reshapes (Mosaic "unsupported shape cast"), no strided
lane slices; per-index scalars broadcast from single sublane rows.  The
kernel writes the output transposed (D, B); the caller transposes once.

Reference semantics: `FBTT/tt_embeddings_cuda.cu:967-1081` (forward chain)
— re-architected for the MXU/VPU rather than translated.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tt_shapes import TTShapes

Cores = Tuple[jax.Array, ...]


def _kernel2(shapes: TTShapes, block: int, compute_dtype,
             idx_ref, c0_ref, c1_ref, out_ref):
    """2-core variant: out[b] = c0[i1] (q1, r1) @ c1[i2] (r1, q2)."""
    p1, p2 = shapes.p_shapes
    q1, q2 = shapes.q_shapes
    (r1,) = shapes.ranks
    s1, _ = shapes.strides

    idx = idx_ref[:]
    i1 = idx // s1
    i2 = idx % p2

    def onehot_t(d, p):
        rows = jax.lax.broadcasted_iota(jnp.int32, (p, block), 0)
        return (rows == d[None, :]).astype(compute_dtype)

    gT = jnp.dot(c0_ref[:], onehot_t(i1, p1),
                 preferred_element_type=jnp.float32)      # (q1*r1, block)
    c1rT = jnp.dot(c1_ref[:], onehot_t(i2, p2),
                   preferred_element_type=jnp.float32)    # (r1*q2, block)
    for q in range(q1):
        seg = gT[q * r1, :][None, :] * c1rT[0:q2, :]
        for r in range(1, r1):
            seg = seg + gT[q * r1 + r, :][None, :] * c1rT[r * q2:(r + 1) * q2, :]
        out_ref[q * q2:(q + 1) * q2, :] = seg


def _kernel(shapes: TTShapes, block: int, compute_dtype,
            idx_ref, c0_ref, c1_ref, c2_ref, out_ref):
    p1, p2, p3 = shapes.p_shapes
    q1, q2, q3 = shapes.q_shapes
    r1, r2 = shapes.ranks
    s1, s2, _ = shapes.strides

    idx = idx_ref[:]  # (block,) int32
    i1 = idx // s1
    i2 = (idx // s2) % p2
    i3 = idx % p3

    def onehot_t(d, p):
        rows = jax.lax.broadcasted_iota(jnp.int32, (p, block), 0)
        return (rows == d[None, :]).astype(compute_dtype)

    # MXU row-select matmuls, transposed: (F, p) @ (p, block) -> (F, block)
    gT = jnp.dot(c0_ref[:], onehot_t(i1, p1),
                 preferred_element_type=jnp.float32)      # (q1*r1, block)
    c1rT = jnp.dot(c1_ref[:], onehot_t(i2, p2),
                   preferred_element_type=jnp.float32)    # (r1*q2*r2, block)
    c2rT = jnp.dot(c2_ref[:], onehot_t(i3, p3),
                   preferred_element_type=jnp.float32)    # (r2*q3, block)

    # contract r1: acc[(q1,q2,r2), b] = sum_r gT[(q1,r), b] * c1rT[(r,q2,r2), b]
    m = q2 * r2
    segs = []
    for q in range(q1):
        seg = gT[q * r1, :][None, :] * c1rT[0:m, :]
        for r in range(1, r1):
            seg = seg + gT[q * r1 + r, :][None, :] * c1rT[r * m:(r + 1) * m, :]
        segs.append(seg)  # (q2*r2, block)

    # contract r2: out[(q1,q2,q3), b] = sum_s acc[(q1,q2,s), b] * c2rT[(s,q3), b]
    for q in range(q1):
        for u in range(q2):
            d = q * q2 + u
            seg = segs[q][u * r2, :][None, :] * c2rT[0:q3, :]
            for s in range(1, r2):
                seg = seg + segs[q][u * r2 + s, :][None, :] * \
                    c2rT[s * q3:(s + 1) * q3, :]
            out_ref[d * q3:(d + 1) * q3, :] = seg


def _resolve(compute_dtype, interpret):
    """bf16 MXU compute on real TPUs; f32 in interpret mode (CPU XLA has
    no bf16xbf16->f32 dot thunk) unless the caller pinned a dtype."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compute_dtype is None:
        compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    return compute_dtype, interpret


def tt_lookup_pallas(shapes: TTShapes, cores: Cores, indices: jax.Array,
                     block: int = 1024,
                     compute_dtype=None,
                     interpret: Optional[bool] = None) -> jax.Array:
    """Fused forward lookup: (B,) int32 -> (B, D).  B must be a multiple of
    ``block`` (callers pad).  3-core TT only (the shipped config).
    ``interpret`` defaults to True off-TPU (tests on CPU)."""
    compute_dtype, interpret = _resolve(compute_dtype, interpret)
    if shapes.ndim not in (2, 3):
        raise ValueError("pallas kernel supports 2/3-core TT (use the XLA path)")
    B = indices.shape[0]
    if B % block != 0:
        raise ValueError(f"B={B} must be a multiple of block={block}")
    n_blocks = B // block

    idx1 = indices.astype(jnp.int32)
    common = dict(
        grid=(n_blocks,),
        out_specs=pl.BlockSpec((shapes.embedding_dim, block),
                               lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((shapes.embedding_dim, B), jnp.float32),
        interpret=interpret,
    )
    if shapes.ndim == 2:
        p1, p2 = shapes.p_shapes
        q1, q2 = shapes.q_shapes
        (r1,) = shapes.ranks
        c0 = cores[0].reshape(p1, q1 * r1).T.astype(compute_dtype)
        c1 = cores[1].reshape(p2, r1 * q2).T.astype(compute_dtype)
        outT = pl.pallas_call(
            functools.partial(_kernel2, shapes, block, compute_dtype),
            in_specs=[
                pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * (p1 * q1 * r1 + p2 * r1 * q2 + q1 * r1 * q2),
                bytes_accessed=B * 4 + B * shapes.embedding_dim * 4,
                transcendentals=0),
            **common,
        )(idx1, c0, c1)
        return outT.T

    p1, p2, p3 = shapes.p_shapes
    q1, q2, q3 = shapes.q_shapes
    r1, r2 = shapes.ranks
    # transposed core unfoldings: (F, p)
    c0 = cores[0].reshape(p1, q1 * r1).T.astype(compute_dtype)
    c1 = cores[1].reshape(p2, r1 * q2 * r2).T.astype(compute_dtype)
    c2 = cores[2].reshape(p3, r2 * q3).T.astype(compute_dtype)

    kernel = functools.partial(_kernel, shapes, block, compute_dtype)
    flops = 2 * B * (p1 * q1 * r1 + p2 * r1 * q2 * r2 + p3 * r2 * q3
                     + q1 * r1 * q2 * r2 + q1 * q2 * r2 * q3)
    outT = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c0T resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c1T resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c2T resident
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * 4 + B * shapes.embedding_dim * 4,
            transcendentals=0),
        **common,
    )(idx1, c0, c1, c2)
    return outT.T


def tt_lookup_pallas_padded(shapes: TTShapes, cores: Cores,
                            indices: jax.Array, block: int = 1024,
                            compute_dtype=None,
                            interpret: Optional[bool] = None) -> jax.Array:
    """Arbitrary-length wrapper: pads B up to a block multiple."""
    B = indices.shape[0]
    pad = (-B) % block
    idx = jnp.pad(indices, (0, pad)) if pad else indices
    out = tt_lookup_pallas(shapes, cores, idx, block, compute_dtype, interpret)
    return out[:B]


# ---------------------------------------------------------------------------
# fused backward: recompute forward partials in VMEM, produce dense core
# gradients via transposed one-hot MXU matmuls accumulated across the grid
# (replaces `tt_embeddings_backward_cuda`'s recompute + transposed GEMM
# pairs + atomicAdd scatter, `FBTT/tt_embeddings_cuda.cu:421-654` — the
# one-hot-transpose matmul IS the deterministic scatter).
# ---------------------------------------------------------------------------

def _bwd_kernel(shapes: TTShapes, block: int, compute_dtype,
                idx_ref, dout_ref, c0_ref, c1_ref, c2_ref,
                d0_ref, d1_ref, d2_ref):
    p1, p2, p3 = shapes.p_shapes
    q1, q2, q3 = shapes.q_shapes
    r1, r2 = shapes.ranks
    s1, s2, _ = shapes.strides
    m = q2 * r2

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        d0_ref[:, :] = jnp.zeros_like(d0_ref)
        d1_ref[:, :] = jnp.zeros_like(d1_ref)
        d2_ref[:, :] = jnp.zeros_like(d2_ref)

    idx = idx_ref[:]
    i1 = idx // s1
    i2 = (idx // s2) % p2
    i3 = idx % p3

    def onehot_t(d, p):
        rows = jax.lax.broadcasted_iota(jnp.int32, (p, block), 0)
        return (rows == d[None, :]).astype(compute_dtype)

    oh1 = onehot_t(i1, p1)
    oh2 = onehot_t(i2, p2)
    oh3 = onehot_t(i3, p3)

    # --- recompute forward partials (same as _kernel) ---
    gT = jnp.dot(c0_ref[:], oh1, preferred_element_type=jnp.float32)
    c1rT = jnp.dot(c1_ref[:], oh2, preferred_element_type=jnp.float32)
    c2rT = jnp.dot(c2_ref[:], oh3, preferred_element_type=jnp.float32)

    segs = []  # acc[(q1), (q2,r2), block]
    for q in range(q1):
        seg = gT[q * r1, :][None, :] * c1rT[0:m, :]
        for r in range(1, r1):
            seg = seg + gT[q * r1 + r, :][None, :] * c1rT[r * m:(r + 1) * m, :]
        segs.append(seg)

    dout = dout_ref[:, :]  # (D, block) transposed cotangent

    # --- d_c2rT[(s,q3), b] = sum_d acc[(d,s), b] * dout[(d,q3), b] ---
    dc2_rows = []
    for s in range(r2):
        acc0 = segs[0][0 * r2 + s, :][None, :]
        seg = acc0 * dout[0:q3, :]
        first = True
        for q in range(q1):
            for u in range(q2):
                if q == 0 and u == 0:
                    continue
                d = q * q2 + u
                seg = seg + segs[q][u * r2 + s, :][None, :] * \
                    dout[d * q3:(d + 1) * q3, :]
        dc2_rows.append(seg)
    dc2 = jnp.concatenate(dc2_rows, axis=0)  # (r2*q3, block)
    d2_ref[:, :] += jnp.dot(dc2.astype(compute_dtype),
                            oh3.T,
                            preferred_element_type=jnp.float32)

    # --- d_acc[(q,u,s), b] = sum_j dout[(q,u,j), b] * c2rT[(s,j), b] ---
    dacc = [None] * q1
    for q in range(q1):
        rows = []
        for u in range(q2):
            d = q * q2 + u
            drow = dout[d * q3:(d + 1) * q3, :]  # (q3, block)
            for s in range(r2):
                prod = drow * c2rT[s * q3:(s + 1) * q3, :]
                rows.append(jnp.sum(prod, axis=0, keepdims=True))
        dacc[q] = jnp.concatenate(rows, axis=0)  # (q2*r2, block) rows (u, s)

    # --- d_c1rT[(r,q2,r2), b] = sum_q gT[(q,r), b] * d_acc[q][(q2,r2), b] ---
    dc1_rows = []
    for r in range(r1):
        seg = gT[0 * r1 + r, :][None, :] * dacc[0]
        for q in range(1, q1):
            seg = seg + gT[q * r1 + r, :][None, :] * dacc[q]
        dc1_rows.append(seg)  # (m, block)
    dc1 = jnp.concatenate(dc1_rows, axis=0)  # (r1*q2*r2, block)
    d1_ref[:, :] += jnp.dot(dc1.astype(compute_dtype),
                            oh2.T,
                            preferred_element_type=jnp.float32)

    # --- d_gT[(q,r), b] = sum_{(q2,r2)} c1rT[(r,·), b] * d_acc[q][·, b] ---
    dg_rows = []
    for q in range(q1):
        for r in range(r1):
            prod = c1rT[r * m:(r + 1) * m, :] * dacc[q]
            dg_rows.append(jnp.sum(prod, axis=0, keepdims=True))
    dg = jnp.concatenate(dg_rows, axis=0)  # (q1*r1, block)
    d0_ref[:, :] += jnp.dot(dg.astype(compute_dtype),
                            oh1.T,
                            preferred_element_type=jnp.float32)


def tt_grads_pallas(shapes: TTShapes, cores: Cores, indices: jax.Array,
                    d_out: jax.Array, block: int = 1024,
                    compute_dtype=None,
                    interpret: Optional[bool] = None) -> Cores:
    """Fused dense core gradients: (B,), (B, D) -> per-core grads.

    Returns grads in the native (p, r, q, r') layout.  B must be a multiple
    of ``block``; duplicates accumulate exactly (matmul accumulation ==
    deterministic scatter-add).
    """
    compute_dtype, interpret = _resolve(compute_dtype, interpret)
    if shapes.ndim != 3:
        raise ValueError("pallas backward supports 3-core TT")
    B = indices.shape[0]
    if B % block != 0:
        raise ValueError(f"B={B} must be a multiple of block={block}")
    n_blocks = B // block

    p1, p2, p3 = shapes.p_shapes
    q1, q2, q3 = shapes.q_shapes
    r1, r2 = shapes.ranks
    c0 = cores[0].reshape(p1, q1 * r1).T.astype(compute_dtype)
    c1 = cores[1].reshape(p2, r1 * q2 * r2).T.astype(compute_dtype)
    c2 = cores[2].reshape(p3, r2 * q3).T.astype(compute_dtype)
    doutT = d_out.T.astype(jnp.float32)  # (D, B)

    kernel = functools.partial(_bwd_kernel, shapes, block, compute_dtype)
    d0T, d1T, d2T = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((shapes.embedding_dim, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q1 * r1, p1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r1 * q2 * r2, p2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r2 * q3, p3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q1 * r1, p1), jnp.float32),
            jax.ShapeDtypeStruct((r1 * q2 * r2, p2), jnp.float32),
            jax.ShapeDtypeStruct((r2 * q3, p3), jnp.float32),
        ),
        interpret=interpret,
    )(indices.astype(jnp.int32), doutT, c0, c1, c2)
    # back to the native (p, r, q, r') layout
    g0 = d0T.T.reshape(p1, 1, q1, r1)
    g1 = d1T.T.reshape(p2, r1, q2, r2)
    g2 = d2T.T.reshape(p3, r2, q3, 1)
    return (g0, g1, g2)


# ---------------------------------------------------------------------------
# differentiable fused lookup (custom VJP over the two kernels)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def tt_lookup_fused(shapes: TTShapes, block: int, cores: Cores,
                    indices: jax.Array) -> jax.Array:
    """Differentiable Pallas TT lookup: (B,) -> (B, D), any B (padded
    internally).  Forward and backward each run as one fused kernel; the
    grid streams arbitrarily large B with a bounded VMEM working set (the
    reference needed the ``batch_count`` chunk loop for this,
    `cu:1027`)."""
    return tt_lookup_pallas_padded(shapes, cores, indices, block)


def _fused_fwd(shapes, block, cores, indices):
    return tt_lookup_fused(shapes, block, cores, indices), (cores, indices)


def _fused_bwd(shapes, block, res, d_out):
    cores, indices = res
    B = indices.shape[0]
    pad = (-B) % block
    if pad:
        indices = jnp.pad(indices, (0, pad))
        d_out = jnp.pad(d_out, ((0, pad), (0, 0)))  # zero cotangent for pads
    grads = tt_grads_pallas(shapes, cores, indices, d_out, block)
    return grads, None


tt_lookup_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# fused in-kernel SGD: recompute-backward + core update in one kernel pass
# (the reference's fused sparse optimizer, `update_tt_cores_sgd_kernel` +
# `Fused_Efficient_TT_backward_sgd_cuda`, cu:381-397 / ecu:718-904 —
# functional form: returns updated cores; buffers alias in-place on TPU).
# ---------------------------------------------------------------------------

def _sgd_kernel(shapes: TTShapes, block: int, compute_dtype, lr: float,
                idx_ref, dout_ref, c0_ref, c1_ref, c2_ref,
                o0_ref, o1_ref, o2_ref):
    p1, p2, p3 = shapes.p_shapes
    q1, q2, q3 = shapes.q_shapes
    r1, r2 = shapes.ranks
    s1, s2, _ = shapes.strides
    m = q2 * r2
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        o0_ref[:, :] = c0_ref[:].astype(jnp.float32)
        o1_ref[:, :] = c1_ref[:].astype(jnp.float32)
        o2_ref[:, :] = c2_ref[:].astype(jnp.float32)

    idx = idx_ref[:]
    i1 = idx // s1
    i2 = (idx // s2) % p2
    i3 = idx % p3

    def onehot_t(d, p):
        rows = jax.lax.broadcasted_iota(jnp.int32, (p, block), 0)
        return (rows == d[None, :]).astype(compute_dtype)

    oh1 = onehot_t(i1, p1)
    oh2 = onehot_t(i2, p2)
    oh3 = onehot_t(i3, p3)
    gT = jnp.dot(c0_ref[:], oh1, preferred_element_type=jnp.float32)
    c1rT = jnp.dot(c1_ref[:], oh2, preferred_element_type=jnp.float32)
    c2rT = jnp.dot(c2_ref[:], oh3, preferred_element_type=jnp.float32)

    segs = []
    for q in range(q1):
        seg = gT[q * r1, :][None, :] * c1rT[0:m, :]
        for r in range(1, r1):
            seg = seg + gT[q * r1 + r, :][None, :] * c1rT[r * m:(r + 1) * m, :]
        segs.append(seg)

    dout = dout_ref[:, :]

    dc2_rows = []
    for s in range(r2):
        seg = segs[0][s, :][None, :] * dout[0:q3, :]
        for q in range(q1):
            for u in range(q2):
                if q == 0 and u == 0:
                    continue
                d = q * q2 + u
                seg = seg + segs[q][u * r2 + s, :][None, :] * \
                    dout[d * q3:(d + 1) * q3, :]
        dc2_rows.append(seg)
    dc2 = jnp.concatenate(dc2_rows, axis=0)
    o2_ref[:, :] += (-lr) * jnp.dot(dc2.astype(compute_dtype), oh3.T,
                                    preferred_element_type=jnp.float32)

    dacc = [None] * q1
    for q in range(q1):
        rows = []
        for u in range(q2):
            d = q * q2 + u
            drow = dout[d * q3:(d + 1) * q3, :]
            for s in range(r2):
                prod = drow * c2rT[s * q3:(s + 1) * q3, :]
                rows.append(jnp.sum(prod, axis=0, keepdims=True))
        dacc[q] = jnp.concatenate(rows, axis=0)

    dc1_rows = []
    for r in range(r1):
        seg = gT[r, :][None, :] * dacc[0]
        for q in range(1, q1):
            seg = seg + gT[q * r1 + r, :][None, :] * dacc[q]
        dc1_rows.append(seg)
    dc1 = jnp.concatenate(dc1_rows, axis=0)
    o1_ref[:, :] += (-lr) * jnp.dot(dc1.astype(compute_dtype), oh2.T,
                                    preferred_element_type=jnp.float32)

    dg_rows = []
    for q in range(q1):
        for r in range(r1):
            prod = c1rT[r * m:(r + 1) * m, :] * dacc[q]
            dg_rows.append(jnp.sum(prod, axis=0, keepdims=True))
    dg = jnp.concatenate(dg_rows, axis=0)
    o0_ref[:, :] += (-lr) * jnp.dot(dg.astype(compute_dtype), oh1.T,
                                    preferred_element_type=jnp.float32)


def tt_fused_sgd_pallas(shapes: TTShapes, cores: Cores, indices: jax.Array,
                        d_out: jax.Array, lr: float, block: int = 1024,
                        compute_dtype=None,
                        interpret: Optional[bool] = None) -> Cores:
    """One fused pass: recompute forward partials, backprop, apply SGD to
    the cores; returns the updated cores.  Gradient uses the pre-step core
    values throughout (exact SGD semantics; the reference's in-kernel
    update reads partially-updated cores — a race it tolerates)."""
    compute_dtype, interpret = _resolve(compute_dtype, interpret)
    if shapes.ndim != 3:
        raise ValueError("fused sgd supports 3-core TT")
    B = indices.shape[0]
    pad = (-B) % block
    if pad:
        indices = jnp.pad(indices, (0, pad))
        d_out = jnp.pad(d_out, ((0, pad), (0, 0)))
    B = indices.shape[0]
    n_blocks = B // block

    p1, p2, p3 = shapes.p_shapes
    q1, q2, q3 = shapes.q_shapes
    r1, r2 = shapes.ranks
    c0 = cores[0].reshape(p1, q1 * r1).T.astype(compute_dtype)
    c1 = cores[1].reshape(p2, r1 * q2 * r2).T.astype(compute_dtype)
    c2 = cores[2].reshape(p3, r2 * q3).T.astype(compute_dtype)
    doutT = d_out.T.astype(jnp.float32)

    kernel = functools.partial(_sgd_kernel, shapes, block, compute_dtype, lr)
    o0, o1, o2 = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((shapes.embedding_dim, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q1 * r1, p1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r1 * q2 * r2, p2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r2 * q3, p3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q1 * r1, p1), jnp.float32),
            jax.ShapeDtypeStruct((r1 * q2 * r2, p2), jnp.float32),
            jax.ShapeDtypeStruct((r2 * q3, p3), jnp.float32),
        ),
        interpret=interpret,
    )(indices.astype(jnp.int32), doutT, c0, c1, c2)
    return (o0.T.reshape(p1, 1, q1, r1),
            o1.T.reshape(p2, r1, q2, r2),
            o2.T.reshape(p3, r2, q3, 1))
