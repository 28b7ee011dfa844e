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
