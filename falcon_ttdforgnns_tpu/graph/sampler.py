"""Host-side neighbor sampling with static output shapes.

TPU-first redesign of DGL's ``MultiLayerNeighborSampler`` + CPU worker
DataLoader (`graphloader.py:237-275`).  Instead of variable-size bipartite
"blocks" with deduplicated input nodes (dynamic shapes — poison for XLA),
we use the dense recursive-fanout formulation:

  layer 0 seeds:        (B,)
  layer 1 neighbors:    (B, f1)
  layer 2 neighbors:    (B, f1, f2)   ... etc.

Every tensor has a static shape; duplicated node ids are allowed and are
exactly what the TT group-dedup lookup and the hot-row cache exploit.
Aggregation over sampled neighborhoods becomes a reshape + mean — no
segment ops, no sorting, pure VPU/MXU work.

Sampling is with replacement (uniform over in-neighbors); isolated nodes
self-loop.  A C++ fast path lives in ``csrc/`` (threaded xorshift
sampling); numpy fallback here is vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .csr import CSRGraph

try:  # optional native fast path
    from . import _native  # type: ignore
except Exception:  # pragma: no cover
    _native = None


@dataclass
class SampledBatch:
    """One training minibatch: seeds + per-layer dense neighbor tensors.

    ``layers[l]`` has shape (B, f_1*...*f_{l+1}) int32, flattened fan-out
    tree level l+1; ``all_nodes`` is the concatenation [seeds, layers...]
    = every node id needing an embedding lookup (with duplicates).
    """

    seeds: np.ndarray                 # (B,)
    layers: List[np.ndarray]          # level l: (B, prod(fanouts[:l+1]))
    labels: Optional[np.ndarray] = None

    @property
    def all_nodes(self) -> np.ndarray:
        return np.concatenate([self.seeds] + [l.reshape(-1) for l in self.layers])


def _sample_neighbors(graph: CSRGraph, nodes: np.ndarray, fanout: int,
                      rng: np.random.Generator) -> np.ndarray:
    """(M,) nodes -> (M, fanout) sampled in-neighbors (with replacement;
    self-loop for isolated nodes)."""
    if _native is not None:
        return _native.sample_neighbors(graph.indptr, graph.indices, nodes, fanout,
                                        int(rng.integers(1, 2**31 - 1)))
    deg = graph.indptr[nodes + 1] - graph.indptr[nodes]          # (M,)
    offs = rng.integers(0, np.maximum(deg, 1)[:, None], size=(len(nodes), fanout))
    flat = graph.indices[np.minimum(graph.indptr[nodes][:, None] + offs,
                                    len(graph.indices) - 1)]
    # isolated nodes: self-loop
    return np.where(deg[:, None] > 0, flat, nodes[:, None]).astype(np.int32)


def sample_block(graph: CSRGraph, seeds: np.ndarray, fanouts: Sequence[int],
                 rng: np.random.Generator) -> SampledBatch:
    """Recursive fanout sampling.  ``fanouts`` is listed innermost-layer
    first like the reference's ``--fan-out 5,10,15``
    (`graphloader.py:245-251` reverses for sampling: the *last* fanout is
    used for the seeds' direct neighbors)."""
    rev = list(reversed(list(fanouts)))
    if _native is not None:
        layers = _native.sample_block_multi(
            graph.indptr, graph.indices, seeds.astype(np.int64), rev,
            int(rng.integers(1, 2**63 - 1)))
        return SampledBatch(seeds=seeds.astype(np.int32), layers=layers)
    layers: List[np.ndarray] = []
    frontier = seeds.astype(np.int32)
    B = len(seeds)
    for f in rev:
        nbrs = _sample_neighbors(graph, frontier.reshape(-1), f, rng)
        frontier = nbrs.reshape(B, -1)
        layers.append(frontier)
    return SampledBatch(seeds=seeds.astype(np.int32), layers=layers)


class NeighborLoader:
    """Minibatch iterator: shuffled seed batches -> SampledBatch.

    Parity with the reference train DataLoader (`graphloader.py:254-261`);
    ``drop_last`` semantics are forced (static batch) with the final ragged
    batch wrapped around — every step sees exactly ``batch_size`` seeds.
    """

    def __init__(self, graph: CSRGraph, seed_nodes: np.ndarray, labels: np.ndarray,
                 fanouts: Sequence[int], batch_size: int, shuffle: bool = True,
                 seed: int = 0, track_freq: bool = True, num_workers: int = 1):
        self.graph = graph
        self.seed_nodes = np.asarray(seed_nodes, dtype=np.int64)
        self.labels = labels
        self.fanouts = tuple(fanouts)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        # `--num-workers` parity (`graphloader.py:261` CPU sampler workers):
        # batches are sampled by a thread pool (numpy/native sampling
        # releases the GIL) and yielded in order.
        self.num_workers = max(1, int(num_workers))
        # Host-side LFU accounting (`update_cache_state_cuda` analog,
        # cu:1083-1119): the sampler already touches every id, so counting
        # here is ~free and keeps the device hot loop scatter-free.
        self.track_freq = track_freq
        self.freq = np.zeros(graph.num_nodes, dtype=np.int64) if track_freq else None

    def __len__(self) -> int:
        return max(1, len(self.seed_nodes) // self.batch_size)

    def _batch_seeds(self, order: np.ndarray, b: int) -> np.ndarray:
        pick = order[b * self.batch_size:(b + 1) * self.batch_size]
        if len(pick) < self.batch_size:  # wrap the ragged tail (cyclically,
            # so batches stay full-size even when the whole seed set is
            # smaller than one batch — the jitted step's shape contract)
            pick = np.resize(np.concatenate([pick, order]), self.batch_size)
        return self.seed_nodes[pick]

    def _make_batch(self, seeds: np.ndarray, rng: np.random.Generator) -> SampledBatch:
        batch = sample_block(self.graph, seeds, self.fanouts, rng)
        batch.labels = self.labels[seeds].astype(np.int32)
        return batch

    def __iter__(self) -> Iterator[SampledBatch]:
        order = self.rng.permutation(len(self.seed_nodes)) if self.shuffle \
            else np.arange(len(self.seed_nodes))
        n_batches = len(self)
        if self.num_workers <= 1:
            for b in range(n_batches):
                batch = self._make_batch(self._batch_seeds(order, b), self.rng)
                if self.track_freq:
                    np.add.at(self.freq, batch.all_nodes, 1)
                yield batch
            return
        # parallel: per-batch child rngs keep determinism regardless of
        # completion order; freq update stays in the consuming thread.
        import concurrent.futures as _cf
        from collections import deque
        child = self.rng.spawn(n_batches)
        with _cf.ThreadPoolExecutor(self.num_workers) as pool:
            pending: deque = deque()
            depth = self.num_workers + 2
            b_next = 0
            while b_next < n_batches or pending:
                while b_next < n_batches and len(pending) < depth:
                    pending.append(pool.submit(
                        self._make_batch, self._batch_seeds(order, b_next),
                        child[b_next]))
                    b_next += 1
                batch = pending.popleft().result()
                if self.track_freq:
                    np.add.at(self.freq, batch.all_nodes, 1)
                yield batch


def full_neighbor_chunks(num_nodes: int, chunk_size: int) -> Iterator[np.ndarray]:
    """Node-id chunks for layer-wise full-neighbor inference
    (`gnn_model.py:220-253`): each chunk is padded to ``chunk_size`` by
    clamping so shapes stay static."""
    for start in range(0, num_nodes, chunk_size):
        idx = np.arange(start, min(start + chunk_size, num_nodes), dtype=np.int64)
        if len(idx) < chunk_size:
            idx = np.concatenate([idx, np.full(chunk_size - len(idx), num_nodes - 1, dtype=np.int64)])
        yield idx


def pad_csr_rows(graph: CSRGraph, nodes: np.ndarray, max_degree: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static-width neighbor matrix for full-neighbor aggregation: returns
    (nbrs (M, max_degree) int32, mask (M, max_degree) bool).  Rows with
    degree > max_degree are truncated (callers pick max_degree >= graph max
    degree for exactness)."""
    deg = (graph.indptr[nodes + 1] - graph.indptr[nodes]).astype(np.int64)
    cols = np.arange(max_degree, dtype=np.int64)[None, :]
    mask = cols < np.minimum(deg, max_degree)[:, None]
    gather = np.minimum(graph.indptr[nodes][:, None] + cols, len(graph.indices) - 1)
    nbrs = graph.indices[gather]
    nbrs = np.where(mask, nbrs, 0)
    return nbrs.astype(np.int32), mask
