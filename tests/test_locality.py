"""Locality PROOF tests (VERDICT r1 item 7): the reorder's entire point is
TT-digit locality — measure it directly.

1. cut quality on a graph that HAS good cuts (planted partition — RMAT is
   expander-like, so round-1's 0.93 cut there said little);
2. TT-prefix dedup factor of sampled training batches before/after
   reorder (what the Efficient_TT group-dedup kernel exploits,
   `Efficient_TT/efficient_tt_cuda.cu:159-215`);
3. LFU cache hit-rate on a skewed workload (what the hot-row cache
   exploits; invariant under relabeling, so measured against cache size).
"""

import numpy as np
import pytest

from falcon_ttdforgnns_tpu.graph import hard_synthetic_dataset
from falcon_ttdforgnns_tpu.graph.reorder import (partition_graph,
                                                 partition_reorder,
                                                 random_permutation)
from falcon_ttdforgnns_tpu.graph.sampler import NeighborLoader
from falcon_ttdforgnns_tpu.ops import make_tt_shapes

K_PARTS = 8


@pytest.fixture(scope="module")
def ds():
    return hard_synthetic_dataset(num_nodes=6000, avg_degree=10,
                                  num_classes=K_PARTS, feat_dim=32, seed=1,
                                  homophily=0.9)


def _cut_fraction(graph, part):
    src, dst = graph.to_coo()
    return float((part[src] != part[dst]).mean())


def test_partitioner_cut_quality(ds):
    """On a plantable graph the multilevel partitioner must find the
    communities: cut far below random's (k-1)/k ~ 0.875."""
    part = partition_graph(ds.graph, K_PARTS, seed=0)
    cut = _cut_fraction(ds.graph, part)
    rand_part = np.random.default_rng(0).integers(0, K_PARTS, ds.num_nodes)
    rand_cut = _cut_fraction(ds.graph, rand_part)
    assert rand_cut > 0.8
    # round 3: label-prop initial partition + V-cycles reach the IDEAL cut
    # (the planted noise fraction, ~0.087 here); the bar leaves seed room
    assert cut < 0.12, f"cut {cut:.3f} vs random {rand_cut:.3f}"
    # balance: no part more than 2x the ideal size
    sizes = np.bincount(part, minlength=K_PARTS)
    assert sizes.max() <= 2 * ds.num_nodes / K_PARTS


def _prefix_dedup_factor(ds, shapes, n_batches=3, seed=0):
    """Mean per-seed (unique two-digit prefixes / neighborhood size):
    the Efficient_TT 'group' is idx // p_last (`ecu:167`), and the reuse
    the reorder creates lives at the granularity of one seed's sampled
    L-hop neighborhood.  Lower = more reuse of first-two-core partial
    products."""
    loader = NeighborLoader(ds.graph, ds.train_idx, ds.labels, (5, 5), 256,
                            seed=seed, track_freq=False)
    group_stride = shapes.strides[-2]  # == p_last for 3-core
    ratios = []
    for b, batch in zip(range(n_batches), loader):
        B = len(batch.seeds)
        for i in range(B):
            ids = np.concatenate(
                [batch.seeds[i:i + 1]] + [l[i] for l in batch.layers])
            groups = ids // group_stride
            ratios.append(len(np.unique(groups)) / len(ids))
    return float(np.mean(ratios))


def test_reorder_improves_prefix_dedup(ds):
    """The contribution-1 locality claim, measured: after the TT-shape-
    matched recursive reorder (`graphloader.py:358-372` semantics),
    co-sampled nodes share TT index prefixes materially more often.
    Measured on this fixture: random 0.818, recursive 0.670 (ratio 0.82);
    the bar (0.88) is a regression guard with seed headroom."""
    from falcon_ttdforgnns_tpu.graph.reorder import recursive_partition_reorder
    shapes = make_tt_shapes(ds.num_nodes, 32, (8, 8), None, None)
    ds_rand = ds.permute(random_permutation(ds.graph, seed=3))
    ds_reord = ds.permute(
        recursive_partition_reorder(ds.graph, shapes.p_shapes, seed=0))
    f_rand = _prefix_dedup_factor(ds_rand, shapes)
    f_reord = _prefix_dedup_factor(ds_reord, shapes)
    assert f_reord < 0.88 * f_rand, (
        f"reorder should shrink unique-prefix ratio: {f_reord:.3f} vs "
        f"random {f_rand:.3f}")


def test_cache_hit_rate_on_skewed_workload():
    """Hot-row cache premise: on the sampler's actual id stream over a
    POWER-LAW graph (planted-partition degrees are near-uniform, no skew
    there), a top-K cache catches a large share of lookups."""
    from falcon_ttdforgnns_tpu.graph import synthetic_dataset
    ds = synthetic_dataset(num_nodes=6000, avg_degree=10, num_classes=8,
                           feat_dim=32, seed=0)
    loader = NeighborLoader(ds.graph, ds.train_idx, ds.labels, (5, 5), 256,
                            seed=0, track_freq=True)
    streams = []
    for b, batch in zip(range(10), loader):
        streams.append(batch.all_nodes)
    stream = np.concatenate(streams)
    freq = np.bincount(stream, minlength=ds.num_nodes)
    hit_rates = {}
    for k in (ds.num_nodes // 100, ds.num_nodes // 10):
        hot = np.argsort(freq)[::-1][:k]
        hot_set = np.zeros(ds.num_nodes, bool)
        hot_set[hot] = True
        hit_rates[k] = float(hot_set[stream].mean())
    ks = sorted(hit_rates)
    # skew: top-10% of rows must catch well over 10% of accesses
    assert hit_rates[ks[1]] > 0.3
    assert hit_rates[ks[1]] > hit_rates[ks[0]]
    # loader's own LFU counters agree with the ground-truth frequencies
    top_true = set(np.argsort(freq)[::-1][:50].tolist())
    top_loader = set(np.argsort(loader.freq)[::-1][:50].tolist())
    assert len(top_true & top_loader) >= 35
