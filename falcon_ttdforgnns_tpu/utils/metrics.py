"""Observability helpers: throughput / memory / access analytics.

Parity with `utils.py:21-51` (memory_usage, count_nnz, give_throughput),
`utils.py:162-194` (access-percentage CDF analytics — the empirical
justification for the LFU cache), `utils.py:196-220` (gpu_timing →
device_timing here), and `sage_dgl_partition.py:96-112` step metrics.
TPU tracing uses jax.profiler (ncu analog, SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import numpy as np


def device_timing(fn: Callable, *args, warmup: int = 10, reps: int = 100) -> float:
    """Mean latency (ms) of a jitted callable (gpu_timing semantics,
    `utils.py:196-220`: 10 warmup, 100 timed reps)."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def model_size_mb(params) -> float:
    """Parameter memory in MB (`utils.py:34-44` memory_usage)."""
    leaves = jax.tree.leaves(params)
    return sum(l.size * l.dtype.itemsize for l in leaves) / 1e6


def device_memory_stats() -> Dict[str, float]:
    """Live/peak HBM bytes per device when the backend exposes them
    (`th.cuda.max_memory_allocated` analog, `sage_dgl_partition.py:112`)."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 1e6,
                "peak_bytes_mb": stats.get("peak_bytes_in_use", 0) / 1e6,
            }
    return out


def throughput(num_samples: int, seconds: float) -> float:
    return num_samples / max(seconds, 1e-9)


def edges_per_second(num_edges_processed: int, seconds: float) -> float:
    """The BASELINE.json scaling metric."""
    return num_edges_processed / max(seconds, 1e-9)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context (Perfetto/XProf; the ncu analog)."""
    if log_dir:
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield


# ---------------------------------------------------------------------------
# access-pattern analytics (`utils.py:162-194`)
# ---------------------------------------------------------------------------

def access_percentages(access_counts: np.ndarray,
                       top_fracs: Tuple[float, ...] = (0.01, 0.05, 0.1, 0.2, 0.5),
                       ) -> Dict[float, float]:
    """Fraction of total accesses served by the top-x%% hottest rows —
    the skew measurement motivating the LFU cache."""
    counts = np.sort(np.asarray(access_counts))[::-1].astype(np.float64)
    total = counts.sum()
    if total == 0:
        return {f: 0.0 for f in top_fracs}
    cum = np.cumsum(counts)
    n = len(counts)
    return {f: float(cum[max(1, int(f * n)) - 1] / total) for f in top_fracs}


def cumulative_access_curve(access_counts: np.ndarray, points: int = 100
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """(fraction_of_rows, fraction_of_accesses) CDF suitable for plotting
    (plot_cumulative_access_percentages parity)."""
    counts = np.sort(np.asarray(access_counts))[::-1].astype(np.float64)
    total = max(counts.sum(), 1.0)
    cum = np.cumsum(counts) / total
    xs = np.linspace(0, 1, points)
    idx = np.clip((xs * len(counts)).astype(int), 0, len(counts) - 1)
    return xs, cum[idx]


def plot_access_cdf(access_counts: np.ndarray, path: str) -> None:
    """Matplotlib CDF figure (`utils.py:176-194`); gated on matplotlib."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    xs, ys = cumulative_access_curve(access_counts)
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(xs * 100, ys * 100)
    ax.set_xlabel("top % of rows")
    ax.set_ylabel("% of accesses")
    ax.set_title("embedding access skew")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def degree_histogram(degrees: np.ndarray, bins: int = 50):
    """Log-binned degree distribution (graphloader.py:188-207 parity)."""
    degrees = np.asarray(degrees)
    dmax = max(int(degrees.max()), 1)
    edges = np.unique(np.round(np.logspace(0, np.log10(dmax + 1), bins)).astype(np.int64))
    hist, _ = np.histogram(degrees, bins=edges)
    return edges, hist


def plot_degree_distribution(degrees: np.ndarray, path: str) -> None:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    edges, hist = degree_histogram(degrees)
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.loglog(edges[:-1] + 1, hist + 1)
    ax.set_xlabel("degree")
    ax.set_ylabel("#nodes")
    ax.set_title("degree distribution")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def count_nnz(indices: np.ndarray) -> Dict[str, int]:
    """Batch sparsity stats (`utils.py:21-33` count_nnz parity): total ids,
    unique ids, duplication factor — the dedup-opportunity measurement."""
    idx = np.asarray(indices).reshape(-1)
    uniq = np.unique(idx)
    return {"nnz": int(idx.size), "unique": int(uniq.size),
            "dup_factor": float(idx.size / max(uniq.size, 1))}


def max_batch_size(num_nodes: int, feat_dim: int, hidden_dim: int,
                   fanouts, hbm_bytes: int = 16 << 30,
                   dtype_bytes: int = 4, safety: float = 0.5) -> int:
    """Estimate the largest seed batch that fits HBM for the dense-fanout
    trainer (`utils.py:45-51` parity, re-derived for this memory model):
    activations dominate — sum over levels of prod(fanouts[:l]) rows of
    max(feat, hidden) floats, x2 for backward."""
    per_seed_rows = 1
    rows = 1
    for f in reversed(list(fanouts)):
        rows *= f
        per_seed_rows += rows
    width = max(feat_dim, hidden_dim)
    bytes_per_seed = per_seed_rows * width * dtype_bytes * 2
    return max(1, int(hbm_bytes * safety / bytes_per_seed))
