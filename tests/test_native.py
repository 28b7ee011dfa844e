"""Native C++ geometry kernels vs their numpy references."""

import numpy as np
import pytest

from openobj_tpu import native
from openobj_tpu.ops.marching import marching_tetrahedra as mt_py
from openobj_tpu.utils.geometry import voxel_downsample as vd_py


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNativeMarching:
    def test_matches_numpy_exactly(self, lib):
        n = 40
        t = np.linspace(-1, 1, n)
        g = np.stack(np.meshgrid(t, t, t, indexing="ij"), -1)
        occ = 1 / (1 + np.exp(30 * (np.linalg.norm(g, axis=-1) - 0.55)))
        vc, fc = native.marching_tetrahedra(occ, 0.5)
        vp, fp = mt_py(occ, 0.5)
        assert vc.shape == vp.shape and fc.shape == fp.shape
        # same surface: both give radius ~0.55 after [0,1]->[-1,1]
        rc = np.linalg.norm(vc * 2 - 1, axis=-1)
        assert abs(rc.mean() - 0.55) < 0.01
        # watertight
        e = np.sort(np.concatenate([fc[:, [0, 1]], fc[:, [1, 2]], fc[:, [2, 0]]]), 1)
        _, cnt = np.unique(e, axis=0, return_counts=True)
        assert (cnt == 2).all()

    def test_empty(self, lib):
        assert native.marching_tetrahedra(np.zeros((6, 6, 6)), 0.5) is None

    def test_anisotropic_grid(self, lib):
        vals = np.zeros((10, 20, 30), np.float32)
        vals[4:7, 8:14, 10:22] = 1.0
        out = native.marching_tetrahedra(vals, 0.5)
        assert out is not None
        v, f = out
        assert v.min() >= 0 and v.max() <= 1.0


class TestNativeVoxel:
    def test_matches_numpy(self, lib, rng):
        pts = rng.uniform(-2, 2, (5000, 3))
        a = native.voxel_downsample(pts, 0.25)
        b = vd_py(pts, 0.25)
        assert a.shape == b.shape
        # same voxel means, order-independent
        a_s = a[np.lexsort(a.T)]
        b_s = b[np.lexsort(b.T)]
        np.testing.assert_allclose(a_s, b_s, atol=1e-9)


class TestNativeDbscan:
    def test_largest_cluster(self, lib, rng):
        big = rng.normal(0, 0.05, (3000, 3))
        small = rng.normal(5, 0.05, (200, 3))
        noise = rng.uniform(-20, 20, (50, 3))
        pts = np.concatenate([big, small, noise])
        kept, mask = native.dbscan_largest_cluster(pts, 0.2, 10)
        assert mask[:3000].all()
        assert not mask[3000:3200].any()
        assert not mask[3200:].any()

    def test_no_cluster_keeps_all(self, lib, rng):
        pts = rng.uniform(-100, 100, (50, 3))  # all isolated
        assert native.dbscan_largest_raw(pts, 0.1, 10) is None
        kept, mask = native.dbscan_largest_cluster(pts, 0.1, 10)
        assert mask.all()


class TestNativeLouvain:
    def _modularity(self, ii, jj, ww, labels, n):
        import networkx as nx
        g = nx.Graph()
        g.add_nodes_from(range(n))
        g.add_weighted_edges_from(zip(ii.tolist(), jj.tolist(), ww.tolist()))
        comms = {}
        for u, l in enumerate(labels):
            comms.setdefault(l, set()).add(u)
        return nx.community.modularity(g, comms.values(), weight="weight")

    def test_two_cliques_separate(self):
        from openobj_tpu import native
        if native.load_louvain() is None:
            pytest.skip("native louvain unavailable")
        # two 5-cliques joined by one weak edge
        edges = []
        for base in (0, 5):
            for a in range(5):
                for b in range(a + 1, 5):
                    edges.append((base + a, base + b, 1.0))
        edges.append((0, 5, 0.01))
        ii, jj, ww = (np.asarray(x) for x in zip(*edges))
        labels = native.louvain_labels(ii, jj, ww, 10)
        assert len(set(labels[:5])) == 1
        assert len(set(labels[5:])) == 1
        assert labels[0] != labels[5]

    def test_modularity_competitive_with_networkx(self):
        from openobj_tpu import native
        from openobj_tpu.perception import graph as G
        if native.load_louvain() is None:
            pytest.skip("native louvain unavailable")
        rng = np.random.default_rng(0)
        # planted partition: 4 groups of 20, p_in=0.5, p_out=0.03
        n, k = 80, 4
        gt = np.repeat(np.arange(k), n // k)
        edges = []
        for a in range(n):
            for b in range(a + 1, n):
                p = 0.5 if gt[a] == gt[b] else 0.03
                if rng.random() < p:
                    edges.append((a, b, rng.uniform(0.5, 1.5)))
        ii, jj, ww = (np.asarray(x) for x in zip(*edges))
        labels = native.louvain_labels(ii, jj, ww, n)
        q_native = self._modularity(ii, jj, ww, labels, n)

        adj = np.zeros((n, n), bool)
        wmat = np.zeros((n, n))
        adj[ii, jj] = adj[jj, ii] = True
        wmat[ii, jj] = wmat[jj, ii] = ww
        nx_labels = G.louvain_cluster(adj, wmat, use_native=False)
        q_nx = self._modularity(ii, jj, ww, np.asarray(nx_labels), n)
        assert q_native >= 0.95 * q_nx
        assert q_native > 0.3

    def test_deterministic(self):
        from openobj_tpu import native
        if native.load_louvain() is None:
            pytest.skip("native louvain unavailable")
        rng = np.random.default_rng(1)
        ii = rng.integers(0, 30, 200)
        jj = rng.integers(0, 30, 200)
        ww = rng.uniform(0.1, 1.0, 200)
        a = native.louvain_labels(ii, jj, ww, 30, seed=5)
        b = native.louvain_labels(ii, jj, ww, 30, seed=5)
        np.testing.assert_array_equal(a, b)

    def test_isolated_nodes(self):
        from openobj_tpu import native
        if native.load_louvain() is None:
            pytest.skip("native louvain unavailable")
        labels = native.louvain_labels(
            np.asarray([0, 1]), np.asarray([1, 2]), np.asarray([1.0, 1.0]), 6
        )
        assert len(labels) == 6
        # nodes 3..5 isolated: own communities
        assert len({labels[3], labels[4], labels[5]}) == 3

    def test_graph_module_uses_native(self):
        from openobj_tpu import native
        from openobj_tpu.perception import graph as G
        if native.load_louvain() is None:
            pytest.skip("native louvain unavailable")
        adj = np.zeros((6, 6), bool)
        w = np.zeros((6, 6))
        for a, b in [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]:
            adj[a, b] = adj[b, a] = True
            w[a, b] = w[b, a] = 2.0
        ids = G.louvain_cluster(adj, w)
        assert ids[0] == ids[1] == ids[2]
        assert ids[3] == ids[4] == ids[5]
        assert ids[0] != ids[3]


class TestFelzUnionFind:
    def test_matches_python_partition(self):
        """Native felz_union_find produces the identical segmentation
        partition as the pure-Python fallback on a textured RGB-D frame."""
        from openobj_tpu import native
        from openobj_tpu.perception import segmentation as seg

        if native.load() is None:
            pytest.skip("native geometry unavailable")
        rng = np.random.default_rng(3)
        h, w = 60, 80
        rgb = (rng.uniform(0, 255, (h, w, 3)) * 0.2 + 120).astype(np.uint8)
        rgb[20:35, 25:50] = [200, 40, 40]
        yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                             indexing="ij")
        depth = (2.0 + 2.0 * np.hypot(yy, xx)).astype(np.float32)
        depth[20:35, 25:50] = 1.0

        lab_native = seg.felzenszwalb_rgbd(rgb, depth, 3.0, 48)
        orig = native.felz_union_find
        native.felz_union_find = lambda *a, **k: None  # force Python path
        try:
            lab_py = seg.felzenszwalb_rgbd(rgb, depth, 3.0, 48)
        finally:
            native.felz_union_find = orig

        def canon(lab):
            _, inv = np.unique(lab, return_inverse=True)
            return inv.reshape(lab.shape)

        assert np.array_equal(canon(lab_native), canon(lab_py))

    def test_direct_call_simple_chain(self):
        from openobj_tpu import native

        if native.load() is None:
            pytest.skip("native geometry unavailable")
        # 4 pixels, chain edges: 0-1 (w 0), 1-2 (w 0), 2-3 (w 10); k=1 so
        # the cheap edges merge and the expensive one does not; min_size=1
        labels = native.felz_union_find(
            np.asarray([0, 1, 2]), np.asarray([1, 2, 3]),
            np.asarray([0.0, 0.0, 10.0]), 4, 1.0, 1,
        )
        assert labels is not None
        assert labels[0] == labels[1] == labels[2]
        assert labels[3] != labels[0]


class TestVoxelFloodLargest:
    def test_matches_exact_dbscan_on_speckle(self):
        """The O(n) large-cloud voxel flood fill keeps the same surface and
        drops the same speckle as the exact grid DBSCAN."""
        from openobj_tpu import native

        if native.load() is None:
            pytest.skip("native geometry unavailable")
        rng = np.random.default_rng(7)
        pts = rng.normal(size=(30_000, 3)) * 0.02 + [0, 0, 1.0]
        pts[:50] += [0, 0, 8.0]                 # depth-bleed speckle
        flood = native.dbscan_largest_raw(pts, 0.05, 100, large_n=1_000)
        exact = native.dbscan_largest_raw(pts, 0.05, 100, large_n=10**12)
        assert flood is not None and exact is not None
        assert np.array_equal(flood, exact)
        assert not flood[:50].any()
        assert flood[50:].all()

    def test_no_cluster_returns_none(self):
        from openobj_tpu import native

        if native.load() is None:
            pytest.skip("native geometry unavailable")
        rng = np.random.default_rng(8)
        # points spread over a huge volume: nothing reaches min_points
        pts = rng.uniform(-500, 500, (20_000, 3))
        assert native.dbscan_largest_raw(pts, 1e-4, 50_000,
                                         large_n=1_000) is None
