"""SpMM design probe: measure the candidate aggregation primitives on the
real chip before building the kernel (profile-first, per VERDICT item 1).

Candidates for out[v] = sum_{u->v} h[u]:
  gather        jnp.take(h, src) alone                  (read E*D)
  segsum        segment_sum(msgs, dst, sorted)           (the XLA idiom)
  scatter       acc.at[dst].add(msgs, sorted)            (current chunked path)
  fused         take+segment_sum in one jit              (current spmm_sum)
  padded        h[nbr (N,w)] .sum(1)  gather-only padded-CSR (no scatter)

Timing: K data-dependent iterations inside one jitted fori_loop per host
readback (the axon relay lies under block_until_ready for single ops).
"""

import os, sys, time
import numpy as np

import jax
import jax.numpy as jnp

K = int(os.environ.get("PROBE_K", "8"))


def timed(name, fn, *args, flops=None, bytes_=None):
    """fn must be jittable: (carry, *args) -> carry-like (data dependence)."""
    @jax.jit
    def loop(x, args):
        def body(i, c):
            return fn(c, *args)
        return jax.lax.fori_loop(0, K, body, x)

    carry = fn(None, *args)
    carry = jax.block_until_ready(carry)
    # warm the loop
    out = jax.block_until_ready(loop(carry, args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(out, args))
    dt = (time.perf_counter() - t0) / K
    msg = f"{name:28s} {dt*1e3:9.3f} ms"
    if bytes_:
        msg += f"  {bytes_/dt/1e9:8.1f} GB/s"
    if flops:
        msg += f"  {flops/dt/1e12:6.2f} TFLOP/s"
    print(msg, flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    N, D = 2_449_029, 256
    E = 8_000_000  # edge slice for the E-shaped probes
    h = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    dst_sorted = jnp.asarray(np.sort(rng.integers(0, N, E).astype(np.int32)))

    # 1. pure gather
    def gather(c, h, src):
        hh = h if c is None else h + (c[0, 0] * 0)
        return jnp.take(hh, src, axis=0)
    timed("gather E rows", gather, h, src, bytes_=E * D * 4)

    msgs = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))

    # 2. segment-sum sorted
    def segsum(c, msgs, dst):
        mm = msgs if c is None else msgs + (c[0, 0] * 0)
        return jax.ops.segment_sum(mm, dst, num_segments=N,
                                   indices_are_sorted=True)
    timed("segment_sum sorted", segsum, msgs, dst_sorted, bytes_=E * D * 4 + N * D * 4)

    # 2b. segment-sum unsorted flag
    def segsum_u(c, msgs, dst):
        mm = msgs if c is None else msgs + (c[0, 0] * 0)
        return jax.ops.segment_sum(mm, dst, num_segments=N,
                                   indices_are_sorted=False)
    timed("segment_sum unsorted-flag", segsum_u, msgs, dst_sorted, bytes_=E * D * 4 + N * D * 4)

    # 3. scatter-add
    def scat(c, msgs, dst):
        mm = msgs if c is None else msgs + (c[0, 0] * 0)
        acc = jnp.zeros((N, D), jnp.float32)
        return acc.at[dst].add(mm, indices_are_sorted=True)
    timed("scatter .at[].add sorted", scat, msgs, dst_sorted, bytes_=E * D * 4 + N * D * 4)

    # 4. fused gather+segsum (spmm_sum shape)
    def fused(c, h, src, dst):
        hh = h if c is None else h + (c[0, 0] * 0)
        return jax.ops.segment_sum(jnp.take(hh, src, axis=0), dst,
                                   num_segments=N, indices_are_sorted=True)
    timed("gather+segsum fused", fused, h, src, dst_sorted, bytes_=2 * E * D * 4)

    # 5. padded-CSR gather-only: (Nb, w) neighbor matrix
    Nb, w = 131072, 64
    nbr = jnp.asarray(rng.integers(0, N, (Nb, w)).astype(np.int32))
    mask = jnp.asarray((rng.random((Nb, w)) < 0.8).astype(np.float32))

    def padded(c, h, nbr, mask):
        hh = h if c is None else h + (c[0, 0] * 0)
        rows = jnp.take(hh, nbr.reshape(-1), axis=0).reshape(Nb, w, D)
        return (rows * mask[:, :, None]).sum(axis=1)
    timed(f"padded ({Nb}x{w}) gather+sum", padded, h, nbr, mask,
          bytes_=Nb * w * D * 4)

    # 6. one-shot spmm_sum vs chunked on a real-ish sorted COO
    from falcon_ttdforgnns_tpu.ops.segment import spmm_sum, spmm_sum_chunked

    def oneshot(c, h, src, dst):
        hh = h if c is None else h + (c[0, 0] * 0)
        return spmm_sum(hh, src, dst, N, sorted_dst=True)
    timed("spmm_sum (one-shot)", oneshot, h, src, dst_sorted, bytes_=2 * E * D * 4)

    def chunked(c, h, src, dst):
        hh = h if c is None else h + (c[0, 0] * 0)
        return spmm_sum_chunked(hh, src, dst, N, chunk=1 << 21, sorted_dst=True)
    timed("spmm_sum_chunked 2M", chunked, h, src, dst_sorted, bytes_=2 * E * D * 4)


if __name__ == "__main__":
    main()
