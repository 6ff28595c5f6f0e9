"""Micro-benchmark & profiling harness.

Re-design of `sage_profiler.py`: the synthetic sparse-feature generator
(`:71-100`), the TTEmbeddingBag micro-bench class (`:246-500`,
``TestTTEmbeddingBag`` — with the correctness assertions the reference
left commented out actually enabled here), and the one-step runners
(`:599-787`).  TPU tracing via jax.profiler replaces ncu.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import make_tt_shapes, tt_init
from .ops.tt_lookup import (tt_embedding_bag, tt_lookup_batched,
                            tt_lookup_gather, tt_lookup_grouped, tt_to_full,
                            tt_lookup)
from .ops.tt_shapes import TTShapes


def generate_sparse_feature(
    batch_size: int,
    num_embeddings: int,
    pooling_factor: float = 10.0,
    pooling_factor_std: float = 2.0,
    unique: bool = False,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Synthetic EmbeddingBag input: Gaussian bag lengths, random ids
    (`sage_profiler.py:71-100`).  Returns (indices, offsets)."""
    rng = np.random.default_rng(seed)
    lengths = np.maximum(
        rng.normal(pooling_factor, pooling_factor_std, batch_size), 1
    ).astype(np.int64)
    total = int(lengths.sum())
    indices = rng.choice(num_embeddings, size=total, replace=not unique)
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    return indices.astype(np.int64), offsets


@dataclass
class BenchResult:
    name: str
    forward_ms: float
    backward_ms: Optional[float] = None
    max_err: Optional[float] = None


class TTEmbeddingBenchmark:
    """Forward/backward latency of the TT lookup vs a dense table, with
    dense-reference correctness checks (the assertions at
    `sage_profiler.py:303-305, 365-367, 425-426` — enabled)."""

    def __init__(self, batch_size: int = 1024,
                 p_shapes: Sequence[int] = (125, 140, 140),
                 q_shapes: Sequence[int] = (5, 5, 4),
                 ranks: Sequence[int] = (16, 16), seed: int = 0):
        self.shapes = make_tt_shapes(int(np.prod(p_shapes)), int(np.prod(q_shapes)),
                                     tuple(ranks), tuple(p_shapes), tuple(q_shapes))
        self.cores = tuple(jnp.asarray(c) for c in
                           tt_init.init_tt_cores(self.shapes, "normal", seed))
        self.batch_size = batch_size
        rng = np.random.default_rng(seed)
        self.idx = jnp.asarray(
            rng.integers(0, self.shapes.num_embeddings, batch_size).astype(np.int32))

    def _time(self, fn, *args, warmup: int = 10, reps: int = 50) -> float:
        """Warmup + repeated timing with a single trailing block (the
        reference's gpu_timing shape, `utils.py:196-220`).  NOTE: on
        remote-attached TPUs prefer a chained fori_loop measurement
        (see bench.py) — async dispatch can under-report here."""
        out = fn(*args)
        jax.block_until_ready(out)
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        return wall

    def check_forward(self, atol: float = 1e-3) -> float:
        """Lookup vs materialized full table — the commented-out assertion."""
        full = tt_to_full(self.shapes, self.cores)
        ref = jnp.take(full, self.idx, axis=0)
        out = tt_lookup_gather(self.shapes, self.cores, self.idx)
        err = float(jnp.max(jnp.abs(out - ref)))
        assert err < atol, f"forward mismatch {err}"
        out2 = tt_lookup_grouped(self.shapes, self.cores, self.idx)
        err2 = float(jnp.max(jnp.abs(out2 - ref)))
        assert err2 < atol, f"grouped forward mismatch {err2}"
        return max(err, err2)

    def bench_forward(self) -> Dict[str, BenchResult]:
        err = self.check_forward()
        out = {}
        for name, fn in [("gather", tt_lookup_gather),
                         ("grouped", tt_lookup_grouped)]:
            f = jax.jit(lambda c, i, fn=fn: fn(self.shapes, c, i))
            out[name] = BenchResult(name, self._time(f, self.cores, self.idx),
                                    max_err=err)
        return out

    def bench_backward(self) -> BenchResult:
        g = jnp.ones((self.batch_size, self.shapes.embedding_dim), jnp.float32)

        def loss(c, i):
            return jnp.sum(tt_lookup(self.shapes, True, c, i) * g)

        f = jax.jit(jax.grad(loss))
        ms = self._time(f, self.cores, self.idx)
        return BenchResult("fwd+bwd", ms)

    def bench_dense_reference(self) -> BenchResult:
        table = jnp.asarray(np.random.default_rng(0).normal(
            size=(self.shapes.num_embeddings, self.shapes.embedding_dim)
        ).astype(np.float32))
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        return BenchResult("dense", self._time(f, table, self.idx))


def profile_training_step(trainer, out_dir: str, steps: int = 5) -> None:
    """jax.profiler trace of a few real train steps (ncu analog,
    SURVEY.md §5.1)."""
    import itertools
    batches = list(itertools.islice(iter(trainer.loader), steps))
    rng = jax.random.PRNGKey(0)
    with jax.profiler.trace(out_dir):
        for b in batches:
            rng, sub = jax.random.split(rng)
            trainer.variables, trainer.opt_state, loss, _ = trainer._step_fn(
                trainer.variables, trainer.opt_state,
                jnp.asarray(b.seeds), [jnp.asarray(l) for l in b.layers],
                jnp.asarray(b.labels), sub)
        jax.block_until_ready(loss)
