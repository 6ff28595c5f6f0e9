"""Mosaic dynamic-gather support probe (round-2 blocked-SpMM close-out).

Verifies the ONE expressible form on this libtpu: same-shape
`take_along_axis` whose source fits a single vreg along the gather
dimension — here a (D, 128) window gathered along lanes.  The
(4096, D) sublane-dim window gather the blocked SpMM wanted fails with
"Not implemented: Multiple source vregs along gather dimension"
(docs/PERFORMANCE.md "window-blocked SpMM: measured dead end")."""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
import numpy as np

D, W = 256, 128

def kern(win_ref, idx_ref, o_ref):
    win = win_ref[:, :]                       # (D, W)
    idx2d = jnp.broadcast_to(idx_ref[:][None, :], (D, W))
    o_ref[:, :] = jnp.take_along_axis(win, idx2d, axis=1)

@jax.jit
def run(win, idx):
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((D, W), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(win, idx)

win = jnp.arange(D * W, dtype=jnp.float32).reshape(D, W)
idx = (jnp.arange(W, dtype=jnp.int32) * 7) % W
out = run(win, idx)
ref = np.take_along_axis(np.asarray(win),
                         np.broadcast_to(np.asarray(idx)[None, :], (D, W)),
                         axis=1)
print("lane-gather same-shape OK, allclose:",
      np.allclose(np.asarray(out), ref))
