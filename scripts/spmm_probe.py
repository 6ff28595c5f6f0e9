"""SpMM design probe: measure the candidate aggregation primitives on the
real chip before building the kernel (profile-first, per VERDICT item 1).

Candidates for out[v] = sum_{u->v} h[u]:
  gather        jnp.take(h, src) alone                  (read E*D)
  segsum        segment_sum(msgs, dst, sorted)           (the XLA idiom)
  scatter       acc.at[dst].add(msgs, sorted)            (current chunked path)
  fused         take+segment_sum in one jit              (current spmm_sum)
  padded        h[nbr (N,w)] .sum(1)  gather-only padded-CSR (no scatter)

Methodology notes (each cost hours to learn — keep):
  - data is generated ON DEVICE (multi-GB host->device through the axon
    relay takes minutes);
  - arrays are passed as jit ARGUMENTS — a closure would bake them into
    the program as constants and re-upload GBs per candidate;
  - K iterations inside one jitted fori_loop with an evolving index
    offset and a full-output sum fold (loop-invariant code motion and
    elementwise DCE both defeated).
"""

import os, sys, time
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import numpy as np

import jax
import jax.numpy as jnp

K = int(os.environ.get("PROBE_K", "32"))
N, D = 2_449_029, 256
E = 4_000_000


def timed(name, fn, args, flops=None, bytes_=None):
    @jax.jit
    def loop(off0, args):
        def body(i, carry):
            s, off = carry
            out = fn(off, *args)
            return (s + out.sum(), off + 1)
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), off0))
        return s

    float(loop(jnp.int32(0), args))   # compile + warm; float() forces the
    # host readback — the relay's block_until_ready can return early
    t0 = time.perf_counter()
    float(loop(jnp.int32(1), args))
    dt = (time.perf_counter() - t0) / K
    msg = f"{name:30s} {dt*1e3:9.3f} ms"
    if bytes_:
        msg += f"  {bytes_/dt/1e9:8.1f} GB/s"
    if flops:
        msg += f"  {flops/dt/1e12:6.2f} TFLOP/s"
    print(msg, flush=True)
    return dt


def c_gather(off, h, src):
    return jnp.take(h, (src + off) % N, axis=0)


def c_segsum(off, msgs, dst):
    return jax.ops.segment_sum(msgs * (1.0 + 1e-12 * off), dst,
                               num_segments=N, indices_are_sorted=True)


def c_segsum_unsorted(off, msgs, dst):
    return jax.ops.segment_sum(msgs * (1.0 + 1e-12 * off), dst,
                               num_segments=N, indices_are_sorted=False)


def c_scatter(off, msgs, dst):
    return jnp.zeros((N, D), jnp.float32).at[dst].add(
        msgs * (1.0 + 1e-12 * off), indices_are_sorted=True)


def c_fused(off, h, src, dst):
    return jax.ops.segment_sum(jnp.take(h, (src + off) % N, axis=0), dst,
                               num_segments=N, indices_are_sorted=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)

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

    timed("gather E rows", c_gather, (h, src), bytes_=E * D * 4)
    timed("segment_sum sorted", c_segsum, (msgs, dst_sorted),
          bytes_=E * D * 4 + N * D * 4)
    timed("segment_sum unsorted-flag", c_segsum_unsorted, (msgs, dst_sorted),
          bytes_=E * D * 4 + N * D * 4)
    timed("scatter .at[].add sorted", c_scatter, (msgs, dst_sorted),
          bytes_=E * D * 4 + N * D * 4)
    timed("gather+segsum fused", c_fused, (h, src, dst_sorted),
          bytes_=2 * E * D * 4)

    Nb, w = 131072, 64

    @jax.jit
    def gen2(key):
        k1, k2 = jax.random.split(key)
        nbr = jax.random.randint(k1, (Nb, w), 0, N, jnp.int32)
        mask = (jax.random.uniform(k2, (Nb, w)) < 0.8).astype(jnp.float32)
        return nbr, mask
    nbr, mask = jax.block_until_ready(gen2(jax.random.PRNGKey(9)))

    def c_padded(off, h, nbr, mask):
        rows = jnp.take(h, ((nbr + off) % N).reshape(-1), axis=0)
        return (rows.reshape(Nb, w, D) * mask[:, :, None]).sum(axis=1)

    timed(f"padded ({Nb}x{w}) gather+sum", c_padded, (h, nbr, mask),
          bytes_=Nb * w * D * 4)

    from falcon_ttdforgnns_tpu.ops.segment import spmm_sum_chunked

    def c_chunked(off, h, src, dst):
        return spmm_sum_chunked(h, (src + off) % N, dst, N,
                                chunk=1 << 21, sorted_dst=True)

    timed("spmm_sum_chunked 2M", c_chunked, (h, src, dst_sorted),
          bytes_=2 * E * D * 4)


if __name__ == "__main__":
    main()
