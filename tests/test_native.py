"""Native (C++) host runtime vs numpy fallback parity."""

import numpy as np
import pytest

from falcon_ttdforgnns_tpu.graph import CSRGraph, rmat_edges, partition_graph

_native = pytest.importorskip("falcon_ttdforgnns_tpu.graph._native")


@pytest.fixture(scope="module")
def graph():
    src, dst = rmat_edges(2000, 12000, seed=3)
    return CSRGraph.from_edges(src, dst, 2000, add_reverse=True)


class TestNativeCSR:
    def test_build_matches_numpy(self):
        rng = np.random.default_rng(0)
        src = rng.integers(0, 500, 3000)
        dst = rng.integers(0, 500, 3000)
        indptr, indices = _native.build_csr(src, dst, 500, True)
        ref = CSRGraph.from_edges(src, dst, 500, add_reverse=True)
        np.testing.assert_array_equal(indptr, ref.indptr)
        # same multiset of neighbors per row
        for v in range(500):
            a = np.sort(indices[indptr[v]:indptr[v + 1]])
            b = np.sort(ref.indices[ref.indptr[v]:ref.indptr[v + 1]])
            np.testing.assert_array_equal(a, b)


class TestNativeSampler:
    def test_samples_are_neighbors(self, graph):
        nodes = np.arange(200, dtype=np.int64)
        out = _native.sample_neighbors(graph.indptr, graph.indices, nodes, 5, 123)
        assert out.shape == (200, 5)
        for i, u in enumerate(nodes):
            nbrs = set(graph.indices[graph.indptr[u]:graph.indptr[u + 1]].tolist()) | {int(u)}
            assert set(out[i].tolist()) <= nbrs

    def test_multi_level_shapes(self, graph):
        seeds = np.arange(16, dtype=np.int64)
        levels = _native.sample_block_multi(graph.indptr, graph.indices,
                                            seeds, [3, 4], 9)
        assert [l.shape for l in levels] == [(16, 3), (16, 12)]
        # level-1 children of seed i are neighbors of level-0 entries
        for i in range(16):
            parents = levels[0][i]
            kids = levels[1][i].reshape(3, 4)
            for p, row in zip(parents, kids):
                nbrs = set(graph.indices[graph.indptr[p]:graph.indptr[p + 1]].tolist()) | {int(p)}
                assert set(row.tolist()) <= nbrs

    def test_deterministic_per_seed(self, graph):
        nodes = np.arange(100, dtype=np.int64)
        a = _native.sample_neighbors(graph.indptr, graph.indices, nodes, 4, 7)
        b = _native.sample_neighbors(graph.indptr, graph.indices, nodes, 4, 7)
        np.testing.assert_array_equal(a, b)


class TestNativePartition:
    def test_balance_and_quality(self, graph):
        part = _native.partition_kway(graph.indptr, graph.indices, 8, 0)
        sizes = np.bincount(part, minlength=8)
        assert sizes.min() > 0
        assert sizes.max() <= 1.6 * graph.num_nodes / 8
        # cuts fewer edges than a random assignment
        src, dst = graph.to_coo()
        cut = (part[src] != part[dst]).mean()
        rnd = np.random.default_rng(0).integers(0, 8, graph.num_nodes)
        cut_rnd = (rnd[src] != rnd[dst]).mean()
        assert cut < cut_rnd

    def test_refine_skip_valve_valid(self, graph, monkeypatch):
        """FALCON_PART_MAX_REFINE_EDGES (the papers-scale memory safety
        valve): with the cap forced below every level, owned levels are
        freed on the way down and the upward pass projects through
        without refinement — the partition must still be a valid,
        balanced k-way assignment (quality drops, validity must not)."""
        monkeypatch.setenv("FALCON_PART_MAX_REFINE_EDGES", "10")
        part = _native.partition_kway(graph.indptr, graph.indices, 8, 0)
        assert part.shape == (graph.num_nodes,)
        sizes = np.bincount(part, minlength=8)
        assert sizes.min() > 0
        assert sizes.max() <= 2.0 * graph.num_nodes / 8


def test_build_csr_deterministic_row_order():
    """The threaded builder's atomic scatter must not leak thread
    interleaving into the CSR: rows come out sorted, so two builds are
    bit-identical and seeded sampling is reproducible."""
    rng = np.random.default_rng(0)
    E = 300_000  # above the native-path threshold used by from_edges
    src = rng.integers(0, 5000, E).astype(np.int64)
    dst = rng.integers(0, 5000, E).astype(np.int64)
    p1, i1 = _native.build_csr(src, dst, 5000, True)
    p2, i2 = _native.build_csr(src, dst, 5000, True)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(i1, i2)
    for v in range(0, 5000, 617):
        row = i1[p1[v]:p1[v + 1]]
        assert (np.diff(row) >= 0).all()


def test_dedup_handles_unsorted_duplicates():
    import numpy as np
    from falcon_ttdforgnns_tpu.graph.csr import CSRGraph
    g = CSRGraph.from_edges(np.array([1, 2, 1]), np.array([5, 5, 5]), 8,
                            add_reverse=False, dedup=True)
    assert g.num_edges == 2
    assert sorted(g.indices[g.indptr[5]:g.indptr[6]].tolist()) == [1, 2]
