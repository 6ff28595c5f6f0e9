"""On-device neighbor sampling (`--mode puregpu`).

The reference's ``--mode`` flag picks graph placement: ``mixed`` keeps the
graph in host RAM with UVA sampling, ``puregpu`` moves it to the device
(`sage_dgl_partition.py:211,238`).  The TPU-native analog: ``mixed`` =
host-side numpy/C++ sampling (graph/sampler.py), ``puregpu`` = the CSR
arrays live in HBM and each train step SAMPLES INSIDE THE JIT with
``jax.random`` — the fanout tree is three gathers and a randint, pure
XLA, and the per-step host->device transfer shrinks from the whole packed
fanout tree (B * (2 + sum(F)) int32, ~4 MB/step at products config) to
just seeds+labels (B * 2).  Under a remote-attached TPU that transfer is
the epoch bottleneck, so this is a first-class fast path, not a port of
UVA mechanics.

Sampling semantics match the host sampler exactly: uniform over
in-neighbors with replacement, isolated nodes self-loop.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def device_sample_neighbors(indptr: jax.Array, indices: jax.Array,
                            nodes: jax.Array, fanout: int,
                            key: jax.Array) -> jax.Array:
    """(M,) nodes -> (M, fanout) uniform in-neighbors (with replacement;
    self-loop for isolated nodes).  Mirrors ``_sample_neighbors``
    (graph/sampler.py) / the reference's neighbor sampler semantics
    (`graphloader.py:245-251`)."""
    nodes = nodes.astype(jnp.int32)
    start = jnp.take(indptr, nodes)
    deg = jnp.take(indptr, nodes + 1) - start
    offs = jax.random.randint(key, (nodes.shape[0], fanout), 0,
                              jnp.maximum(deg, 1)[:, None])
    gather = jnp.minimum(start[:, None] + offs, indices.shape[0] - 1)
    flat = jnp.take(indices, gather)
    return jnp.where(deg[:, None] > 0, flat, nodes[:, None]).astype(jnp.int32)


def device_sample_block(indptr: jax.Array, indices: jax.Array,
                        seeds: jax.Array, fanouts: Sequence[int],
                        key: jax.Array) -> List[jax.Array]:
    """Recursive fanout tree on device: returns layers[l] of shape
    (B, prod(rev_fanouts[:l+1])) int32 — the same contract as
    ``sample_block`` (graph/sampler.py).  ``fanouts`` is innermost-first
    like ``--fan-out 5,10,15``."""
    rev = list(reversed(list(fanouts)))
    B = seeds.shape[0]
    layers: List[jax.Array] = []
    frontier = seeds.astype(jnp.int32)
    for li, f in enumerate(rev):
        key, sub = jax.random.split(key)
        nbrs = device_sample_neighbors(indptr, indices, frontier.reshape(-1),
                                       f, sub)
        frontier = nbrs.reshape(B, -1)
        layers.append(frontier)
    return layers
