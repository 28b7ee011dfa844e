"""Reprojection healing (perception.healing): the global 3D map fixing
per-frame 2D label misses. Synthetic single-frame geometry — a flat wall
at z=3 with a small box surface at z=1 — exercises every safety rule."""

import numpy as np
import pytest

from openobj_tpu.perception import healing

H, W = 48, 64
FX = FY = 40.0
CX, CY = W / 2.0, H / 2.0


def _depth_scene():
    """Wall at z=3 everywhere; a 10x10 'box' patch at z=1 in the middle."""
    depth = np.full((H, W), 3.0, np.float32)
    box = np.zeros((H, W), bool)
    box[20:30, 28:38] = True
    depth[box] = 1.0
    return depth, box


def _backproject(depth, mask, t_wc=None):
    v, u = np.nonzero(mask)
    z = depth[v, u]
    pts = np.stack([(u - CX) * z / FX, (v - CY) * z / FY, z], -1)
    if t_wc is not None:
        pts = pts @ t_wc[:3, :3].T + t_wc[:3, 3]
    return pts


@pytest.mark.quick
class TestSupportMap:
    def test_depth_consistent_points_count(self):
        depth, box = _depth_scene()
        pts = _backproject(depth, box)
        sup = healing._support_map(pts, np.eye(4), depth,
                                   FX, FY, CX, CY, tol=0.02)
        assert sup[box].sum() == box.sum()
        assert sup[~box].sum() == 0

    def test_occluded_points_never_match(self):
        depth, box = _depth_scene()
        # points ON the wall BEHIND the box: measured depth is 1.0 there,
        # point depth 3.0 -> no support
        v, u = np.nonzero(box)
        z = np.full(len(v), 3.0)
        pts = np.stack([(u - CX) * z / FX, (v - CY) * z / FY, z], -1)
        sup = healing._support_map(pts, np.eye(4), depth,
                                   FX, FY, CX, CY, tol=0.05)
        assert sup.sum() == 0

    def test_weights_carried(self):
        depth, box = _depth_scene()
        pts = _backproject(depth, box)
        w = np.full(len(pts), 5.0, np.float32)
        sup = healing._support_map(pts, np.eye(4), depth,
                                   FX, FY, CX, CY, tol=0.02, weights=w)
        assert sup[box].sum() == pytest.approx(5.0 * box.sum())


@pytest.mark.quick
class TestHealInstanceImages:
    def test_claims_unlabeled_pixels(self):
        depth, box = _depth_scene()
        pts = _backproject(depth, box)
        img = np.zeros((H, W), np.int32)         # box entirely unlabeled
        # weight 3/point: in production the weighted voxel clouds carry
        # multi-frame observation counts; one point of weight 1 stays
        # below min_support=2 by design (see test_no_support_no_claim)
        healed, stats = healing.heal_instance_images(
            [img], {4: (pts, np.full(len(pts), 3.0, np.float32))},
            [depth], [np.eye(4, dtype=np.float64)],
            FX, FY, CX, CY)
        assert (healed[0][box] == 4).all()
        assert (healed[0][~box] == 0).all()
        assert stats["claimed_px"] == box.sum()

    def test_incumbent_with_geometry_not_overturned(self):
        depth, box = _depth_scene()
        pts = _backproject(depth, box)
        img = np.zeros((H, W), np.int32)
        img[box] = 5                              # another object owns it...
        # ...and BACKS it with equal geometry
        healed, _ = healing.heal_instance_images(
            [img], {4: pts, 5: pts.copy()}, [depth],
            [np.eye(4, dtype=np.float64)], FX, FY, CX, CY)
        assert (healed[0][box] == 5).all()

    def test_weighted_majority_overturns_swallow(self):
        depth, box = _depth_scene()
        pts = _backproject(depth, box)
        img = np.zeros((H, W), np.int32)
        img[box] = 5                              # swallower holds the label
        # claimant has 16 observations per voxel, incumbent only 2
        healed, stats = healing.heal_instance_images(
            [img],
            {4: (pts, np.full(len(pts), 16.0, np.float32)),
             5: (pts.copy(), np.full(len(pts), 2.0, np.float32))},
            [depth], [np.eye(4, dtype=np.float64)], FX, FY, CX, CY)
        assert (healed[0][box] == 4).all()
        assert stats["relabeled_px"] == box.sum()

    def test_clean_scene_untouched(self):
        depth, box = _depth_scene()
        pts = _backproject(depth, box)
        img = np.zeros((H, W), np.int32)
        img[box] = 4                              # already correct
        healed, stats = healing.heal_instance_images(
            [img], {4: pts}, [depth], [np.eye(4, dtype=np.float64)],
            FX, FY, CX, CY)
        assert (healed[0] == img).all()
        assert stats["relabeled_px"] == 0

    def test_no_support_no_claim(self):
        depth, box = _depth_scene()
        # claimant's points are 30 cm off the measured surface
        pts = _backproject(depth, box)
        pts[:, 2] += 0.3
        img = np.zeros((H, W), np.int32)
        healed, stats = healing.heal_instance_images(
            [img], {4: pts}, [depth], [np.eye(4, dtype=np.float64)],
            FX, FY, CX, CY)
        assert stats["claimed_px"] == 0
        assert (healed[0] == 0).all()


@pytest.mark.quick
class TestWeightedVoxelClouds:
    def test_counts_accumulate_across_masks(self):
        p = np.zeros((10, 3))
        out = healing.weighted_voxel_clouds({4: [p, p.copy()]})
        pts, w = out[4]
        assert pts.shape == (1, 3)
        assert w[0] == 20.0

    def test_distinct_voxels_stay_distinct(self):
        p = np.asarray([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
        pts, w = healing.weighted_voxel_clouds({4: [p]})[4]
        assert pts.shape == (2, 3)
        assert (w == 1.0).all()
