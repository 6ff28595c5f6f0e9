"""Graph layer tests: CSR construction, sampling, reordering."""

import numpy as np
import pytest

from falcon_ttdforgnns_tpu.graph import (
    CSRGraph, NodeDataset, synthetic_dataset, rmat_edges,
    NeighborLoader, sample_block, pad_csr_rows,
    reorder_permutation, partition_graph, rcmk_reorder, degree_reorder,
)


def small_graph(seed=0, n=200, deg=5):
    src, dst = rmat_edges(n, n * deg, seed=seed)
    return CSRGraph.from_edges(src, dst, n, add_reverse=True)


class TestCSR:
    def test_from_edges_reverse(self):
        g = CSRGraph.from_edges(np.array([0, 1]), np.array([1, 2]), 3, add_reverse=True)
        assert g.num_edges == 4
        # in-neighbors of node 1 are {0, 2}
        assert sorted(g.indices[g.indptr[1]:g.indptr[2]].tolist()) == [0, 2]

    def test_coo_roundtrip(self):
        g = small_graph()
        src, dst = g.to_coo()
        g2 = CSRGraph.from_edges(src, dst, g.num_nodes, add_reverse=False)
        np.testing.assert_array_equal(g.indptr, g2.indptr)
        np.testing.assert_array_equal(np.sort(g.indices), np.sort(g2.indices))

    def test_permute_preserves_structure(self):
        g = small_graph()
        perm = np.random.default_rng(0).permutation(g.num_nodes)
        g2 = g.permute(perm)
        assert g2.num_edges == g.num_edges
        # degree of node u in g == degree of perm[u] in g2
        np.testing.assert_array_equal(g.degrees, g2.degrees[perm])

    def test_dataset_permute(self):
        ds = synthetic_dataset(num_nodes=500, avg_degree=4, seed=1)
        perm = np.random.default_rng(1).permutation(ds.num_nodes)
        ds2 = ds.permute(perm)
        # labels travel with nodes
        np.testing.assert_array_equal(ds2.labels[perm], ds.labels)
        # splits stay disjoint and same size
        assert len(ds2.train_idx) == len(ds.train_idx)
        assert not (set(ds2.train_idx) & set(ds2.val_idx))


class TestSampler:
    def test_static_shapes(self):
        g = small_graph()
        seeds = np.arange(16)
        batch = sample_block(g, seeds, (3, 4), np.random.default_rng(0))
        assert batch.layers[0].shape == (16, 4)   # outermost fanout first sampled
        assert batch.layers[1].shape == (16, 12)
        assert batch.all_nodes.shape == (16 * (1 + 4 + 12),)

    def test_sampled_are_neighbors(self):
        g = small_graph()
        seeds = np.arange(32)
        batch = sample_block(g, seeds, (4,), np.random.default_rng(0))
        for i, s in enumerate(seeds):
            nbrs = set(g.indices[g.indptr[s]:g.indptr[s + 1]].tolist()) | {s}
            assert set(batch.layers[0][i].tolist()) <= nbrs

    def test_loader_batches(self):
        ds = synthetic_dataset(num_nodes=300, avg_degree=4, seed=2)
        loader = NeighborLoader(ds.graph, ds.train_idx, ds.labels, (3, 3), 64)
        batches = list(loader)
        assert len(batches) == len(ds.train_idx) // 64
        for b in batches:
            assert b.seeds.shape == (64,)
            assert b.labels.shape == (64,)

    def test_pad_csr_rows(self):
        g = small_graph()
        nodes = np.arange(50)
        nbrs, mask = pad_csr_rows(g, nodes, max_degree=int(g.degrees.max()))
        for i, u in enumerate(nodes):
            expect = sorted(g.indices[g.indptr[u]:g.indptr[u + 1]].tolist())
            got = sorted(nbrs[i][mask[i]].tolist())
            assert got == expect


class TestReorder:
    @pytest.mark.parametrize("partition", [4, 0, -1, -2, -3])
    def test_perm_valid(self, partition):
        g = small_graph()
        perm = reorder_permutation(g, partition, levels=[4, 4])
        assert perm is not None
        assert sorted(perm.tolist()) == list(range(g.num_nodes))

    def test_partition_balance(self):
        g = small_graph(n=400, deg=6)
        part = partition_graph(g, 4, seed=0)
        sizes = np.bincount(part, minlength=4)
        assert sizes.min() > 0
        assert sizes.max() <= 2.5 * g.num_nodes / 4

    def test_partition_locality(self):
        """A partition reorder should cut fewer edges than random."""
        g = small_graph(n=400, deg=6)
        src, dst = g.to_coo()

        def crossing(perm, k=4):
            b = lambda x: perm[x] * k // g.num_nodes
            return (b(src) != b(dst)).mean()

        p_part = reorder_permutation(g, 4)
        p_rand = reorder_permutation(g, 0)
        assert crossing(p_part) <= crossing(p_rand) + 0.05


class TestReorderCache:
    def test_cached_roundtrip(self, tmp_path):
        g = small_graph()
        p1 = __import__("falcon_ttdforgnns_tpu.graph.reorder", fromlist=["x"]) \
            .reorder_permutation_cached(g, 4, str(tmp_path))
        p2 = __import__("falcon_ttdforgnns_tpu.graph.reorder", fromlist=["x"]) \
            .reorder_permutation_cached(g, 4, str(tmp_path))
        np.testing.assert_array_equal(p1, p2)
        import os
        assert len(os.listdir(tmp_path)) == 1


class TestEigenInit:
    def test_spectral_tt_init(self):
        from falcon_ttdforgnns_tpu.ops import TTShapes, tt_init
        g = small_graph(n=300, deg=5)
        shapes = TTShapes(300, 8, (7, 7, 7), (2, 2, 2), (4, 4))
        cores = tt_init.init_eigen(shapes, g.indptr, g.indices)
        for k, c in enumerate(cores):
            assert c.shape == shapes.core_shape(k)
            assert np.isfinite(c).all()


class TestDatasetNpz:
    def test_roundtrip(self, tmp_path):
        ds = synthetic_dataset(num_nodes=300, avg_degree=4, seed=9)
        path = str(tmp_path / "ds.npz")
        ds.save_npz(path)
        from falcon_ttdforgnns_tpu.graph import NodeDataset
        ds2 = NodeDataset.load_npz(path)
        np.testing.assert_array_equal(ds.graph.indptr, ds2.graph.indptr)
        np.testing.assert_array_equal(ds.labels, ds2.labels)
        np.testing.assert_array_equal(ds.train_idx, ds2.train_idx)
        assert ds2.num_classes == ds.num_classes


class TestOgbRawLoader:
    """load_ogb_raw reads OGB's documented csv.gz on-disk layout without the
    ogb package (graphloader.py:160-235 parity, verifiable offline)."""

    def _write(self, root, name="ogbn-toy", n=20, feats=True):
        import gzip
        d = root / name.replace("-", "_")
        (d / "raw").mkdir(parents=True)
        (d / "split" / "time").mkdir(parents=True)
        rng = np.random.default_rng(3)
        edges = rng.integers(0, n, (60, 2))
        labels = rng.integers(0, 4, n)

        def w(path, arr, fmt):
            with gzip.open(path, "wt") as f:
                np.savetxt(f, arr, fmt=fmt, delimiter=",")

        w(d / "raw" / "edge.csv.gz", edges, "%d")
        w(d / "raw" / "node-label.csv.gz", labels[:, None], "%d")
        w(d / "raw" / "num-node-list.csv.gz", np.array([[n]]), "%d")
        if feats:
            w(d / "raw" / "node-feat.csv.gz",
              rng.normal(size=(n, 5)).astype(np.float32), "%.5f")
        perm = rng.permutation(n)
        for s, ids in (("train", perm[:12]), ("valid", perm[12:16]),
                       ("test", perm[16:])):
            w(d / "split" / "time" / f"{s}.csv.gz", ids[:, None], "%d")
        return edges, labels

    def test_load(self, tmp_path):
        from falcon_ttdforgnns_tpu.graph import load_ogb_raw
        edges, labels = self._write(tmp_path)
        ds = load_ogb_raw("ogbn-toy", str(tmp_path))
        assert ds.graph.num_nodes == 20
        # reverse edges added, self-loop-free dedup handled by CSRGraph
        assert ds.graph.indices.size >= len(edges)
        np.testing.assert_array_equal(ds.labels, labels)
        assert ds.num_classes == labels.max() + 1
        assert ds.feats is not None and ds.feats.shape == (20, 5)
        assert len(ds.train_idx) == 12 and len(ds.test_idx) == 4
        assert ds.feat_dim == 5

    def test_get_dataset_prefers_raw_dir(self, tmp_path):
        from falcon_ttdforgnns_tpu.graph import get_dataset
        self._write(tmp_path, feats=False)
        ds = get_dataset("ogbn-toy", root=str(tmp_path))
        assert ds.name == "ogbn-toy" and ds.graph.num_nodes == 20

    def _write_binary(self, root, name="ogbn-toybin", n=24,
                      split_style="csv"):
        """OGB's BINARY raw layout — what papers100M actually ships as
        (raw/data.npz + raw/node-label.npz; unlabeled nodes are NaN and
        the split dir is split/time/ — VERDICT r3 item 8 hardening)."""
        import gzip
        d = root / name.replace("-", "_")
        (d / "raw").mkdir(parents=True)
        (d / "split" / "time").mkdir(parents=True)
        rng = np.random.default_rng(5)
        ei = rng.integers(0, n, (2, 80)).astype(np.int64)
        feats = rng.normal(size=(n, 6)).astype(np.float32)
        labels = rng.integers(0, 7, n).astype(np.float64)
        labels[-4:] = np.nan  # papers100M: most nodes unlabeled
        np.savez(d / "raw" / "data.npz", edge_index=ei, node_feat=feats,
                 num_nodes_list=np.array([n]))
        np.savez(d / "raw" / "node-label.npz",
                 node_label=labels[:, None])
        perm = rng.permutation(n - 4)  # splits over labeled nodes only
        parts = {"train": perm[:14], "valid": perm[14:18],
                 "test": perm[18:]}
        for s, ids in parts.items():
            if split_style == "csv":
                with gzip.open(d / "split" / "time" / f"{s}.csv.gz",
                               "wt") as f:
                    np.savetxt(f, ids[:, None], fmt="%d")
            else:
                np.savez(d / "split" / "time" / f"{s}.npz", data=ids)
        return ei, labels, feats, parts

    @pytest.mark.parametrize("split_style", ["csv", "npz"])
    def test_load_binary_layout(self, tmp_path, split_style):
        from falcon_ttdforgnns_tpu.graph import load_ogb_raw
        ei, labels, feats, parts = self._write_binary(
            tmp_path, split_style=split_style)
        ds = load_ogb_raw("ogbn-toybin", str(tmp_path))
        assert ds.graph.num_nodes == 24
        assert ds.feats is not None and ds.feats.shape == (24, 6)
        assert ds.feat_dim == 6
        # NaN labels -> -1; num_classes from the labeled max
        assert (ds.labels[-4:] == -1).all()
        assert ds.num_classes == 7
        np.testing.assert_array_equal(ds.train_idx, np.sort(parts["train"]))
        np.testing.assert_array_equal(ds.test_idx, np.sort(parts["test"]))

    def test_get_dataset_hard_prefix(self):
        """'hard-<name>' routes to the planted-partition generator at
        <name>'s scale: high edge homophily, id-uninformative labels."""
        from falcon_ttdforgnns_tpu.graph import get_dataset
        ds = get_dataset("hard-ogbn-arxiv", synthetic_scale=0.05)
        assert ds.name == "hard-ogbn-arxiv"
        assert ds.num_nodes == int(169_343 * 0.05) and ds.num_classes == 40
        src, dst = ds.graph.to_coo()
        homo = (ds.labels[src] == ds.labels[dst]).mean()
        assert homo > 0.5  # planted partition, not RMAT (which measures ~0.06)
        # id high bits carry nothing: community of id-sorted halves ~uniform
        half = ds.labels[: ds.num_nodes // 2]
        counts = np.bincount(half, minlength=40) / half.size
        assert counts.max() < 0.10  # no id-block dominates a class


class TestTinySeedSets:
    def test_loader_batch_larger_than_seed_set(self):
        """Batches must stay exactly batch_size (the jitted step's shape
        contract) even when the whole seed set is smaller than one batch."""
        from falcon_ttdforgnns_tpu.graph import synthetic_dataset
        from falcon_ttdforgnns_tpu.graph.sampler import NeighborLoader
        ds = synthetic_dataset(num_nodes=300, avg_degree=4, seed=3)
        seeds = ds.train_idx[:5]
        loader = NeighborLoader(ds.graph, seeds, ds.labels, (3, 3), 64)
        batches = list(loader)
        assert len(batches) == 1
        assert batches[0].seeds.shape == (64,)
        assert set(batches[0].seeds.tolist()) <= set(ds.train_idx[:5].tolist())


def test_official_split_sizes():
    """--official-split: synthetic stand-ins at the OFFICIAL OGB split
    counts (matched per-epoch work vs the reference; csr.OFFICIAL_SPLITS)."""
    import numpy as np
    from falcon_ttdforgnns_tpu.graph import get_dataset
    from falcon_ttdforgnns_tpu.graph.csr import (hard_synthetic_dataset,
                                                 OFFICIAL_SPLITS)
    ds = get_dataset("hard-ogbn-arxiv", official_split=True)
    assert (len(ds.train_idx), len(ds.val_idx), len(ds.test_idx)) == \
        OFFICIAL_SPLITS["ogbn-arxiv"]
    ds2 = hard_synthetic_dataset(num_nodes=5000, split_counts=(1000, 200, 300))
    assert (len(ds2.train_idx), len(ds2.val_idx), len(ds2.test_idx)) == \
        (1000, 200, 300)
    assert len(np.intersect1d(ds2.train_idx, ds2.test_idx)) == 0
    import pytest
    with pytest.raises(ValueError):
        get_dataset("hard-ogbn-arxiv", official_split=True,
                    synthetic_scale=0.1)
    with pytest.raises(ValueError):
        hard_synthetic_dataset(num_nodes=100, split_counts=(90, 20, 30))
