"""Scatter-add ceiling probe: time acc.at[dd].add(msgs) alone at the
blocked-SpMM's chunk shapes (products scale, bucket-sorted dst)."""
import time
import numpy as np
import jax, jax.numpy as jnp

N, D = 2_449_029, 256
SLOTS = 34304 * 4096            # padded slots from the measured tiling
NC = 67                          # chunks
CS = SLOTS // NC // 4096 * 4096  # slots per chunk
K = 4

rng = np.random.default_rng(0)
# bucket-sorted dst like the real tiling: 16 coarse dst ranges
b = np.sort(rng.integers(0, 16, size=CS))
dst = (b * (N // 16) + rng.integers(0, N // 16, size=CS)).astype(np.int32)
dd = jnp.asarray(dst)

@jax.jit
def loop(dd):
    msgs = jnp.ones((CS, D), jnp.float32)
    def body(i, acc):
        return acc.at[dd].add(msgs + i)
    acc = jax.lax.fori_loop(0, K * NC, body, jnp.zeros((N, D), jnp.float32))
    return acc.sum()

print("backend:", jax.default_backend(), "CS:", CS, flush=True)
t0 = time.time(); chk = float(loop(dd)); print(f"compile+1st {time.time()-t0:.0f}s chk {chk:.3e}", flush=True)
t0 = time.time(); chk = float(loop(dd))
per_pass = (time.time() - t0) / K
print(f"scatter-add alone: {per_pass*1e3:.0f} ms/pass ({NC} chunks x {CS} slots)", flush=True)
