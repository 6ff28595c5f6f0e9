"""SpMM design probe: measure the candidate aggregation primitives on the
real chip before building the kernel (profile-first, per VERDICT item 1).

Candidates for out[v] = sum_{u->v} h[u]:
  gather        jnp.take(h, src) alone                  (read E*D)
  segsum        segment_sum(msgs, dst, sorted)           (the XLA idiom)
  scatter       acc.at[dst].add(msgs, sorted)            (current chunked path)
  fused         take+segment_sum in one jit              (current spmm_sum)
  padded        h[nbr (N,w)] .sum(1)  gather-only padded-CSR (no scatter)

Timing: K iterations inside one jitted fori_loop; every iteration's
indices depend on an evolving carry offset (loop-invariant code motion
cannot hoist the body; the axon relay lies under block_until_ready for
single ops)."""

import os, sys, time
import numpy as np

import jax
import jax.numpy as jnp

K = int(os.environ.get("PROBE_K", "8"))


def timed(name, fn, flops=None, bytes_=None):
    """fn(offset:int32 scalar) -> array; executed K times with evolving
    offset, output folded into a scalar carry."""
    @jax.jit
    def loop(off0):
        def body(i, carry):
            s, off = carry
            out = fn(off)
            # full-output reduction: a single-element fold would let XLA
            # DCE most of a pure gather
            return (s + out.sum(), off + 1)
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), off0))
        return s

    out = jax.block_until_ready(loop(jnp.int32(0)))   # compile+warm
    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(jnp.int32(1)))
    dt = (time.perf_counter() - t0) / K
    msg = f"{name:30s} {dt*1e3:9.3f} ms"
    if bytes_:
        msg += f"  {bytes_/dt/1e9:8.1f} GB/s"
    if flops:
        msg += f"  {flops/dt/1e12:6.2f} TFLOP/s"
    print(msg, flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    N, D = 2_449_029, 256
    E = 4_000_000
    # generate ON DEVICE — multi-GB host->device transfers through the
    # axon relay take minutes and are not what we're measuring
    @jax.jit
    def gen(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        h = jax.random.normal(k1, (N, D), jnp.float32)
        src = jax.random.randint(k2, (E,), 0, N, jnp.int32)
        dst = jnp.sort(jax.random.randint(k3, (E,), 0, N, jnp.int32))
        msgs = jax.random.normal(k4, (E, D), jnp.float32)
        return h, src, dst, msgs
    h, src, dst_sorted, msgs = jax.block_until_ready(gen(jax.random.PRNGKey(0)))
    print("data generated", flush=True)

    timed("gather E rows",
          lambda off: jnp.take(h, (src + off) % N, axis=0),
          bytes_=E * D * 4)

    timed("segment_sum sorted",
          lambda off: jax.ops.segment_sum(
              msgs * (1.0 + 1e-12 * off), dst_sorted, num_segments=N,
              indices_are_sorted=True),
          bytes_=E * D * 4 + N * D * 4)

    timed("segment_sum unsorted-flag",
          lambda off: jax.ops.segment_sum(
              msgs * (1.0 + 1e-12 * off), dst_sorted, num_segments=N,
              indices_are_sorted=False),
          bytes_=E * D * 4 + N * D * 4)

    timed("scatter .at[].add sorted",
          lambda off: jnp.zeros((N, D), jnp.float32).at[dst_sorted].add(
              msgs * (1.0 + 1e-12 * off), indices_are_sorted=True),
          bytes_=E * D * 4 + N * D * 4)

    timed("gather+segsum fused",
          lambda off: jax.ops.segment_sum(
              jnp.take(h, (src + off) % N, axis=0), dst_sorted,
              num_segments=N, indices_are_sorted=True),
          bytes_=2 * E * D * 4)

    Nb, w = 131072, 64
    @jax.jit
    def gen2(key):
        k1, k2 = jax.random.split(key)
        nbr = jax.random.randint(k1, (Nb, w), 0, N, jnp.int32)
        mask = (jax.random.uniform(k2, (Nb, w)) < 0.8).astype(jnp.float32)
        return nbr, mask
    nbr, mask = jax.block_until_ready(gen2(jax.random.PRNGKey(9)))

    timed(f"padded ({Nb}x{w}) gather+sum",
          lambda off: (jnp.take(h, ((nbr + off) % N).reshape(-1), axis=0)
                       .reshape(Nb, w, D) * mask[:, :, None]).sum(axis=1),
          bytes_=Nb * w * D * 4)

    # chunked scatter path (current spmm_sum_chunked shape)
    from falcon_ttdforgnns_tpu.ops.segment import spmm_sum_chunked
    timed("spmm_sum_chunked 2M",
          lambda off: spmm_sum_chunked(h, (src + off) % N, dst_sorted, N,
                                       chunk=1 << 21, sorted_dst=True),
          bytes_=2 * E * D * 4)


if __name__ == "__main__":
    main()
