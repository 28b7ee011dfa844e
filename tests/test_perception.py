"""Perception/association tests: projection, similarity matrices, graph
clustering, global merge, and the end-to-end associate() on a synthetic
two-object multi-view scene."""

import numpy as np
import pytest

from openobj_tpu.data import synthetic
from openobj_tpu.ops import sampling
from openobj_tpu.perception import graph, merge, partfeat, pipeline, projection, similarity


def _unit(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


class TestProjection:
    def test_simple_mask(self):
        h, w = 40, 60
        depth = np.full((h, w), 2.0, np.float32)
        rgb = np.full((h, w, 3), 128, np.uint8)
        mask = np.zeros((h, w), bool)
        mask[10:30, 20:40] = True
        evs, ok = projection.project_masks(
            [mask], depth, rgb, np.eye(4), 30, 30, 30, 20,
            min_component_px=50, dbscan_min_points=20,
        )
        assert ok[0] and len(evs) == 1
        ev = evs[0]
        assert ev.points.shape[1] == 3
        np.testing.assert_allclose(ev.points[:, 2], 2.0)
        assert ev.color_hist.shape == (96,)
        assert ev.color_hist.sum() == 3 * mask.sum()  # one count per channel

    def test_small_or_invalid_masks_dropped(self):
        h, w = 20, 20
        depth = np.zeros((h, w), np.float32)  # all invalid
        rgb = np.zeros((h, w, 3), np.uint8)
        mask = np.ones((h, w), bool)
        evs, ok = projection.project_masks(
            [mask], depth, rgb, np.eye(4), 10, 10, 10, 10
        )
        assert not ok[0] and len(evs) == 0

    def test_component_split_filters_specks(self):
        h, w = 60, 60
        depth = np.full((h, w), 1.0, np.float32)
        rgb = np.zeros((h, w, 3), np.uint8)
        mask = np.zeros((h, w), bool)
        mask[5:35, 5:35] = True    # big component
        mask[50:52, 50:52] = True  # 4-px speck -> dropped, erased from mask
        evs, ok = projection.project_masks(
            [mask], depth, rgb, np.eye(4), 30, 30, 30, 30,
            min_component_px=100, dbscan_min_points=20,
        )
        assert ok[0]
        assert not evs[0].mask[50, 50]

    def test_invalid_depth_pixels_restored_when_connected(self):
        # sensor-dropout holes INSIDE a surviving surface stay in the 2D
        # mask (restore_invalid_depth, default on); disconnected
        # invalid-depth islands and the 3D evidence itself are unchanged
        h, w = 60, 60
        depth = np.full((h, w), 1.5, np.float32)
        rgb = np.zeros((h, w, 3), np.uint8)
        mask = np.zeros((h, w), bool)
        mask[10:40, 10:40] = True     # object surface
        mask[50:56, 50:56] = True     # separate component, all-invalid depth
        depth[20:24, 20:24] = 0.0     # interior dropout hole
        depth[10:40, 10] = 0.0        # boundary dropout column
        depth[50:56, 50:56] = 0.0
        evs, ok = projection.project_masks(
            [mask], depth, rgb, np.eye(4), 30, 30, 30, 30,
            min_component_px=100, dbscan_min_points=20,
        )
        assert ok[0]
        ev = evs[0]
        assert ev.mask[21, 21] and ev.mask[20, 10]   # restored
        assert not ev.mask[52, 52]                   # island: no evidence
        # restored pixels contribute no 3D points (all at valid z=1.5)
        np.testing.assert_allclose(ev.points[:, 2], 1.5)
        evs_off, _ = projection.project_masks(
            [mask], depth, rgb, np.eye(4), 30, 30, 30, 30,
            min_component_px=100, dbscan_min_points=20,
            restore_invalid_depth=False,
        )
        assert not evs_off[0].mask[21, 21]           # reference behavior


class TestSimilarity:
    def test_iou3d_smaller_volume_normalized(self):
        # small box fully inside big box -> similarity 1.0 (not union IoU)
        boxes = np.array(
            [[0, 0, 0, 1, 1, 1], [0.2, 0.2, 0.2, 0.4, 0.4, 0.4]], np.float64
        )
        m = similarity.iou3d_matrix(boxes)
        np.testing.assert_allclose(m[0, 1], 1.0, atol=1e-6)
        np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-6)

    def test_cosine_matrix(self):
        f = np.array([[1.0, 0], [0, 2.0], [1.0, 0]])
        m = similarity.cosine_matrix(f)
        np.testing.assert_allclose(m[0, 2], 1.0, atol=1e-6)
        np.testing.assert_allclose(m[0, 1], 0.0, atol=1e-6)

    def test_projected_iou2d(self):
        # two identical AABBs must have projected IoU 1; disjoint distant ~0
        boxes = np.array(
            [
                [-0.5, -0.5, 1.5, 0.5, 0.5, 2.5],
                [-0.5, -0.5, 1.5, 0.5, 0.5, 2.5],
                [5.0, 5.0, 9.0, 6.0, 6.0, 9.5],
            ]
        )
        depth = np.full((60, 80), 2.0, np.float32)
        m = similarity.projected_iou2d_matrix(
            [depth], np.eye(4)[None], 40, 40, 40, 30, boxes, skip=10
        )
        np.testing.assert_allclose(m[0, 1], 1.0, atol=1e-6)
        assert m[0, 2] < 0.2


class TestGraph:
    def test_weighted_edges_and_louvain(self):
        n = 6
        geo = np.eye(n)
        # masks 0-2 one object, 3-5 another: high mutual similarity
        for grp in ((0, 1, 2), (3, 4, 5)):
            for i in grp:
                for j in grp:
                    geo[i, j] = 1.0
        cap = geo.copy()
        clip = geo.copy()
        color = geo.copy()
        adj, weighted = graph.build_adjacency(geo, cap, clip, color)
        assert adj[0, 1] and not adj[0, 3]
        ids = graph.louvain_cluster(adj, weighted)
        assert ids[0] == ids[1] == ids[2]
        assert ids[3] == ids[4] == ids[5]
        assert ids[0] != ids[3]

    def test_filter_rare(self):
        ids = [1, 1, 1, 2]
        out = graph.filter_rare_ids(ids, 1)
        assert out == [1, 1, 1, graph.JUNK_ID]

    def test_alternative_clustering_methods(self):
        """Greedy and GNewman (reference mask_cluster alternatives,
        mask_graph.py:99-121) recover the same two-community split."""
        n = 6
        geo = np.eye(n)
        for grp in ((0, 1, 2), (3, 4, 5)):
            for i in grp:
                for j in grp:
                    geo[i, j] = 1.0
        # one bridge edge between the groups: girvan_newman only yields
        # once the component count grows, so its first level on a
        # disconnected graph would split a clique instead
        geo[2, 3] = geo[3, 2] = 1.0
        adj, weighted = graph.build_adjacency(geo, geo, geo, geo)
        for method in ("Greedy", "GNewman"):
            ids = graph.louvain_cluster(adj, weighted, method=method)
            assert ids[0] == ids[1] == ids[2]
            assert ids[3] == ids[4] == ids[5]
            assert ids[0] != ids[3]


class TestMerge:
    def test_overlap_ratio(self, rng):
        pc = rng.uniform(-1, 1, (500, 3))
        assert merge.overlap_ratio(pc, pc + 0.001) > 0.9
        assert merge.overlap_ratio(pc, pc + 10.0) == 0.0

    def test_second_stage_merges_overlapping(self, rng):
        pc = rng.uniform(-1, 1, (400, 3))
        f1, f2 = _unit(rng.normal(size=384)), _unit(rng.normal(size=384))
        c1 = _unit(np.abs(rng.normal(size=96)))
        pcs = {10: pc, 11: pc + 0.001, 12: pc + 50.0}
        caps = {10: f1, 11: f1, 12: f2}
        cols = {10: c1, 11: c1, 12: c1}
        mapping, n = merge.second_stage_mapping(
            pcs, caps, cols, bg_feats={}, weight_pc=0.6,
            weight_caption=0.3, weight_color=0.6,
        )
        assert mapping[10] == mapping[11]
        assert mapping[12] != mapping[10]
        assert mapping[graph.JUNK_ID] == 0

    def test_second_stage_transitive_chain(self, rng):
        """A ~ B and B ~ C must put A, B, C in ONE object even when A and
        C themselves never overlap (deliberate deviation from the
        reference's pairwise index-order assignment, which breaks the
        chain — measured: an orbit's front-half and back-half clusters of
        one box, bridged by its top-face strips, came out as two
        objects). Regression for the touching-boxes archetype."""
        f = _unit(rng.normal(size=384))
        c = _unit(np.abs(rng.normal(size=96)))
        # A and C disjoint slabs; B overlaps both heavily
        a = rng.uniform(0.0, 1.0, (300, 3)) * [1, 1, 0.01]
        cpc = a + [0, 0, 1.0]
        b = np.concatenate([a, cpc])
        pcs = {20: a, 21: cpc, 22: b}
        caps = {k: f for k in pcs}
        cols = {k: c for k in pcs}
        mapping, _ = merge.second_stage_mapping(
            pcs, caps, cols, bg_feats={}, weight_pc=0.6,
            weight_caption=0.3, weight_color=0.6,
        )
        assert mapping[20] == mapping[21] == mapping[22]

    def test_second_stage_bg_never_absorbed_into_chain(self, rng):
        """A background-anchored cluster overlapping an object chain must
        keep its reserved id and must NOT pull the objects to it."""
        wall = _unit(rng.normal(size=384))
        f_obj = _unit(rng.normal(size=384))
        c = _unit(np.abs(rng.normal(size=96)))
        a = rng.uniform(0, 1, (300, 3))
        pcs = {7: a, 8: a + 0.001, 9: a + 0.002}
        caps = {7: f_obj, 8: f_obj, 9: wall}
        cols = {k: c for k in pcs}
        mapping, _ = merge.second_stage_mapping(
            pcs, caps, cols, bg_feats={"wall": wall[None]},
            weight_pc=0.6, weight_caption=0.3, weight_color=0.6,
        )
        assert mapping[9] == 1
        assert mapping[7] == mapping[8] >= 4

    def test_second_stage_contact_part_of_tier(self, rng):
        """contact_pc > 0: a leg-like cluster (thin column, in contact,
        same caption/color, footprint nested inside the big cluster's)
        merges; a same-contact cluster with a DIFFERENT caption (an
        object resting on the table) and a same-caption cluster OUTSIDE
        the footprint (adjacent furniture) both stay separate."""
        f_tab = _unit(rng.normal(size=384))
        f_obj = _unit(rng.normal(size=384))
        c = _unit(np.abs(rng.normal(size=96)))
        # table top: thin slab z ~ 0, footprint [0,1]x[0,1]
        top = rng.uniform(0, 1, (600, 3)) * [1, 1, 0.02]
        # leg: thin column inside the footprint, touching the top
        leg = rng.uniform(0, 1, (200, 3)) * [0.06, 0.06, 0.5] + [0.2, 0.2, 0.0]
        # resting object: same contact geometry, different caption
        ball = rng.uniform(0, 1, (200, 3)) * [0.1, 0.1, 0.1] + [0.6, 0.6, -0.1]
        # neighbor: same caption, in contact at the edge, footprint OUTSIDE
        nb = rng.uniform(0, 1, (300, 3)) * [0.5, 1, 0.02] + [1.0, 0, 0]
        pcs = {1: top, 2: leg, 3: ball, 4: nb}
        caps = {1: f_tab, 2: f_tab, 3: f_obj, 4: f_tab}
        cols = {k: c for k in pcs}
        kw = dict(bg_feats={}, dis_thre=0.05, weight_pc=0.4,
                  weight_caption=0.3, weight_color=0.6,
                  contact_pc=0.02, contact_cap=0.9, up_axis=2)
        mapping, _ = merge.second_stage_mapping(pcs, caps, cols, **kw)
        assert mapping[2] == mapping[1]          # leg joins the top
        assert mapping[3] != mapping[1]          # resting object does not
        assert mapping[4] != mapping[1]          # adjacent furniture does not
        # tier off -> reference behavior: leg stays separate
        kw["contact_pc"] = 0.0
        mapping0, _ = merge.second_stage_mapping(pcs, caps, cols, **kw)
        assert mapping0[2] != mapping0[1]

    def test_bridge_gate_blocks_single_view_weld(self, rng):
        """Noise-tier regression (tabletop sphere+torus weld): a 1-view
        boundary sliver overlapping TWO distinct cores above every gate
        must not weld them through the transitive closure — it attaches
        to its better side. Without view counts (n_views=None) the old
        closure welds: the gate is what separates the behaviors."""
        f1, f2 = _unit(rng.normal(size=384)), _unit(rng.normal(size=384))
        c1 = _unit(np.abs(rng.normal(size=96)))
        c2 = _unit(np.abs(rng.normal(size=96)))
        a = rng.uniform(0, 1, (3000, 3)) * [0.3, 0.3, 0.3]
        b = a + [0.30, 0, 0]                      # object in contact
        # mixed-pixel sliver: a thin strip AT the interface — every
        # point within dis_thre of BOTH dense clouds (ungated pc > 0.9)
        sliver = (rng.uniform(0, 1, (40, 3)) * [0.02, 0.3, 0.3]
                  + [0.29, 0, 0])
        pcs = {1: a, 2: b, 3: sliver}
        caps = {1: f1, 2: f2, 3: f1}
        cols = {1: c1, 2: c2, 3: c1}
        kw = dict(bg_feats={}, dis_thre=0.05, weight_pc=0.4,
                  weight_caption=0.3, weight_color=0.6)
        welded, _ = merge.second_stage_mapping(pcs, caps, cols, **kw)
        assert welded[1] == welded[2] == welded[3]   # the measured failure
        mapping, _ = merge.second_stage_mapping(
            pcs, caps, cols, n_views={1: 10, 2: 10, 3: 1}, **kw)
        assert mapping[1] != mapping[2]              # cores stay apart
        assert mapping[3] in (mapping[1], mapping[2])  # sliver attaches

    def test_leaf_group_heals_fragmented_object(self, rng):
        """A fully fragmented object (every view its own 1-mask cluster,
        consecutive views chain-overlapping) must still close into ONE
        object: leaves union among themselves (grazing-archetype noise
        regression), they just cannot weld two multi-view cores."""
        f = _unit(rng.normal(size=384))
        c = _unit(np.abs(rng.normal(size=96)))
        base = rng.uniform(0, 1, (1500, 3)) * [0.2, 1, 0.2]
        pcs = {k: base + [0.08 * k, 0, 0] for k in range(1, 5)}
        caps = {k: f for k in pcs}
        cols = {k: c for k in pcs}
        mapping, _ = merge.second_stage_mapping(
            pcs, caps, cols, bg_feats={}, dis_thre=0.05, weight_pc=0.4,
            weight_caption=0.3, weight_color=0.6,
            n_views={k: 1 for k in pcs})
        assert len({mapping[k] for k in pcs}) == 1

    def test_appearance_twin_tier(self, rng):
        """Noise-tier regression (touching middle box split): two
        multi-view cores with near-DISJOINT opposite-face slab clouds
        merge iff captions AND colors are near-identical AND the
        inter-slab gap is small relative to their union extent. Clones
        (same appearance, gap ~ their own size) and different-color
        neighbors stay separate."""
        f = _unit(rng.normal(size=384))
        c = _unit(np.abs(rng.normal(size=96)))
        c_other = _unit(np.abs(rng.normal(size=96)))
        slab = rng.uniform(0, 1, (300, 3)) * [0.6, 0.2, 0.6]
        kw = dict(bg_feats={}, dis_thre=0.02, weight_pc=0.4,
                  weight_caption=0.3, weight_color=0.6, contact_cap=0.9)
        # halves: gap 0.1 in a union of ~0.5 along y -> twin merge
        pcs = {1: slab, 2: slab + [0, 0.3, 0]}
        m, _ = merge.second_stage_mapping(
            pcs, {1: f, 2: f}, {1: c, 2: c}, n_views={1: 7, 2: 7}, **kw)
        assert m[1] == m[2]
        # same appearance, clone-scale gap (~1.2x extent) -> separate
        pcs = {1: slab, 2: slab + [0, 0.45, 0]}
        m, _ = merge.second_stage_mapping(
            pcs, {1: f, 2: f}, {1: c, 2: c}, n_views={1: 7, 2: 7}, **kw)
        assert m[1] != m[2]
        # small gap but different color -> separate
        pcs = {1: slab, 2: slab + [0, 0.3, 0]}
        m, _ = merge.second_stage_mapping(
            pcs, {1: f, 2: f}, {1: c, 2: c_other},
            n_views={1: 7, 2: 7}, **kw)
        assert m[1] != m[2]
        # n_views absent -> tier off (old behavior preserved)
        m, _ = merge.second_stage_mapping(
            pcs | {}, {1: f, 2: f}, {1: c, 2: c}, **kw)
        assert m[1] != m[2]

    def test_bg_caption_reserved_ids(self, rng):
        wall = _unit(rng.normal(size=384))
        f_obj = _unit(rng.normal(size=384))
        pc = rng.uniform(-1, 1, (100, 3))
        pcs = {5: pc, 6: pc + 30}
        caps = {5: wall, 6: f_obj}
        cols = {5: _unit(np.ones(96)), 6: _unit(np.ones(96))}
        mapping, _ = merge.second_stage_mapping(
            pcs, caps, cols, bg_feats={"wall": wall[None]},
        )
        assert mapping[5] == 1  # reserved wall id
        assert mapping[6] >= 4

    def test_majority_cluster_mean(self, rng):
        tight = rng.normal(size=384) * 0.01 + 1.0
        vecs = np.stack([tight + rng.normal(size=384) * 0.01 for _ in range(8)]
                        + [rng.normal(size=384) * 5 for _ in range(2)])
        m = merge.majority_cluster_mean(vecs, eps=0.5)
        assert np.abs(m - 1.0).mean() < 0.1  # outliers excluded


class TestPartFeat:
    def test_last_writer_wins(self):
        h, w, c = 20, 20, 8
        m1 = np.zeros((h, w), bool)
        m1[:10] = True
        m2 = np.zeros((h, w), bool)
        m2[5:15] = True
        f1, f2 = np.ones(c), np.full(c, 2.0)
        pf = partfeat.build_part_feature_map([m1, m2], [f1, f2], down=2)
        assert pf.shape == (10, 10, 8)
        assert pf[1, 0, 0] == 1.0   # only m1
        assert pf[3, 0, 0] == 2.0   # overlap -> later mask wins
        assert pf[9, 0, 0] == 0.0   # neither... row 18 -> m2? no: 18>=15 -> 0

    def test_stability_scaling(self):
        m = np.ones((4, 4), bool)
        pf = partfeat.build_part_feature_map([m], [np.ones(2)], [0.5], down=1)
        np.testing.assert_allclose(pf, 0.5)


class TestEncoderHelpers:
    def test_split_mask_groups_nearby(self):
        from openobj_tpu.perception.encoders import split_mask

        mask = np.zeros((100, 100), bool)
        mask[10:30, 10:30] = True     # blob A
        mask[10:30, 32:50] = True     # blob B, 2px gap -> same group
        mask[80:98, 80:98] = True     # blob C, far -> own group
        out = split_mask(mask, min_px=50, eps_factor=0.1)
        assert len(out) == 2
        sizes = sorted(m.sum() for m in out)
        assert sizes[1] > sizes[0]

    def test_crop_with_padding_clips(self):
        from openobj_tpu.perception.encoders import crop_with_padding

        img = np.arange(100).reshape(10, 10)
        crop = crop_with_padding(img, (0, 5, 0, 5), pad=20)
        assert crop.shape == (10, 10)  # clipped to image


class TestAssociateEndToEnd:
    def test_two_object_scene(self, rng):
        """Multi-view synthetic scene: per-frame masks of 2 spheres + bg wall
        must cluster into consistent global ids across frames."""
        cam = {"fx": 40.0, "fy": 40.0, "cx": 32.0, "cy": 24.0}
        dirs = np.asarray(
            sampling.camera_ray_dirs(64, 48, cam["fx"], cam["fy"], cam["cx"], cam["cy"])
        )
        scene = synthetic.default_scene(n_spheres=2)
        f_obj1, f_obj2 = _unit(rng.normal(size=384)), _unit(rng.normal(size=384))
        wall_ft = _unit(rng.normal(size=384))
        c_obj1, c_obj2 = _unit(rng.normal(size=512)), _unit(rng.normal(size=512))
        # limited arc (correlated viewpoints like a real walkthrough): a full
        # 360-degree orbit yields opposite hemispheres with ~0 3D overlap,
        # which no association cue can bridge at this tiny resolution
        frames = []
        views = [
            scene.render(synthetic.orbit_pose(a), dirs) + (synthetic.orbit_pose(a),)
            for a in np.linspace(-0.5, 0.5, 6)
        ]
        for i, (rgb, depth, inst, t_wc) in enumerate(views):
            masks, caps, capfts, clipfts = [], [], [], []
            for oid, cap, capft, clipft in (
                (4, "a red ball", f_obj1, c_obj1),
                (5, "a blue ball", f_obj2, c_obj2),
                (0, "a wall", wall_ft, _unit(rng.normal(size=512))),
            ):
                m = inst == oid
                if m.sum() < 30:
                    continue
                masks.append(m)
                caps.append(cap)
                capfts.append(capft + rng.normal(size=384) * 0.01)
                clipfts.append(clipft + rng.normal(size=512) * 0.01)
            frames.append(
                pipeline.FrameInput(
                    masks=masks, captions=caps, capfeats=capfts,
                    clipfeats=clipfts, depth=depth, rgb=rgb, t_wc=t_wc,
                )
            )
        # low-res test scene: pixel footprint at 2.5 m with fx=40 is ~6 cm,
        # so the denoise eps must scale up accordingly
        cfg = pipeline.AssociationConfig(
            **cam, min_component_px=20, dbscan_min_points=10,
            dbscan_eps=0.25, use_geo2d=True,
        )
        out = pipeline.associate(frames, bg_feats={"wall": wall_ft[None]}, cfg=cfg)

        # each caption maps to ONE consistent global id across all frames
        ids_of = {}
        for caps, fids in zip(out["captions"], out["final_ids"]):
            for cap, gid in zip(caps, fids):
                ids_of.setdefault(cap, set()).add(gid)
        assert len(ids_of["a red ball"]) == 1, ids_of
        assert len(ids_of["a blue ball"]) == 1, ids_of
        assert ids_of["a red ball"] != ids_of["a blue ball"]
        assert ids_of["a wall"] == {1}  # reserved wall id

    def test_write_artifacts_roundtrip(self, tmp_path, rng):
        from openobj_tpu.perception.encoders import load_object_features
        import cv2

        h, w = 20, 30
        m = np.zeros((h, w), bool)
        m[5:15, 5:15] = True
        merge.write_artifacts(
            str(tmp_path), [[m]], [[4]],
            [[rng.normal(size=512)]], [[rng.normal(size=384)]], [["a chair"]],
            (h, w),
        )
        img = cv2.imread(str(tmp_path / "instance_our/semantic_instance_0.png"), -1)
        assert img.dtype == np.uint16
        assert (img[m] == 4).all() and (img[~m] == 0).all()
        feats = load_object_features(str(tmp_path))
        assert feats["caption"][0][4] == "a chair"
        assert feats["clipfeat"][0][4].shape == (512,)


class TestGeoBgAnchor:
    """classify_bg_hull: weights-free wall/floor/ceiling anchoring."""

    AABB = np.asarray([-3.0, -3.0, -2.0, 3.0, 3.0, 2.0])

    def _grid2d(self, n=400, lo=-3, hi=3, rng=None):
        rng = rng or np.random.default_rng(0)
        return rng.uniform(lo, hi, (n, 2))

    def test_floor_and_ceiling(self):
        uv = self._grid2d()
        floor = np.column_stack([uv, np.full(len(uv), -2.0)])
        ceil = np.column_stack([uv, np.full(len(uv), 2.0)])
        assert merge.classify_bg_hull(floor, self.AABB) == "floor"
        assert merge.classify_bg_hull(ceil, self.AABB) == "ceiling"

    def test_wall(self):
        rng = np.random.default_rng(1)
        yz = np.column_stack([rng.uniform(-3, 3, 400), rng.uniform(-2, 2, 400)])
        wall = np.column_stack([np.full(len(yz), 3.0), yz])
        assert merge.classify_bg_hull(wall, self.AABB) == "wall"

    def test_corner_union_of_two_walls_is_wall(self):
        # a Louvain cluster spanning two adjoining walls fails any single
        # plane fit but still sits on the boundary shell
        rng = np.random.default_rng(2)
        a = np.column_stack([np.full(200, 3.0), rng.uniform(0, 3, 200),
                             rng.uniform(-2, 2, 200)])
        b = np.column_stack([rng.uniform(0, 3, 200), np.full(200, 3.0),
                             rng.uniform(-2, 2, 200)])
        assert merge.classify_bg_hull(np.concatenate([a, b]),
                                      self.AABB) == "wall"

    def test_interior_object_rejected(self):
        rng = np.random.default_rng(3)
        ball = rng.normal(size=(300, 3)) * 0.5          # centered blob
        assert merge.classify_bg_hull(ball, self.AABB) is None

    def test_sofa_against_wall_rejected(self):
        # 2m-long sofa whose back touches x=3: the front face sits ~0.8 m
        # inside the room, so the near-shell fraction fails
        rng = np.random.default_rng(4)
        sofa = np.column_stack([
            rng.uniform(2.2, 3.0, 500),   # depth off the wall
            rng.uniform(-1.0, 1.0, 500),
            rng.uniform(-2.0, -1.2, 500),
        ])
        assert merge.classify_bg_hull(sofa, self.AABB) is None

    def test_small_fixture_rejected_by_extent(self):
        # a thin 0.5 m picture frame flat on the wall: on the shell but
        # below min_extent
        rng = np.random.default_rng(5)
        pic = np.column_stack([
            np.full(200, 3.0),
            rng.uniform(0.0, 0.5, 200),
            rng.uniform(0.0, 0.4, 200),
        ])
        assert merge.classify_bg_hull(pic, self.AABB) is None


class TestAdaptiveEps:
    def test_grazing_surface_survives(self):
        """A slanted plane whose 3D pixel spacing exceeds a fixed DBSCAN
        eps must survive projection intact with adaptive_eps (default)."""
        h, w = 24, 32
        fx = fy = 20.0
        cx, cy = (w - 1) / 2, (h - 1) / 2
        uu, vv = np.meshgrid(np.arange(w), np.arange(h))
        # plane sweeping depth 2 -> 8 m across the image: ~0.2 m/px steps
        depth = (2.0 + 6.0 * uu / (w - 1)).astype(np.float32)
        rgb = np.full((h, w, 3), 128, np.uint8)
        mask = np.ones((h, w), bool)
        evs, ok = projection.project_masks(
            [mask], depth, rgb, np.eye(4, dtype=np.float32),
            fx, fy, cx, cy, max_depth=10.0, min_component_px=10,
            dbscan_min_points=10, dbscan_eps=0.05,
        )
        assert ok[0]
        # the whole plane survives (fixed eps=0.05 would shred it)
        assert evs[0].mask.sum() > 0.9 * mask.sum()

    def test_fixed_eps_still_available(self):
        h, w = 24, 32
        fx = fy = 20.0
        cx, cy = (w - 1) / 2, (h - 1) / 2
        uu, _ = np.meshgrid(np.arange(w), np.arange(h))
        depth = (2.0 + 6.0 * uu / (w - 1)).astype(np.float32)
        rgb = np.full((h, w, 3), 128, np.uint8)
        mask = np.ones((h, w), bool)
        evs, ok = projection.project_masks(
            [mask], depth, rgb, np.eye(4, dtype=np.float32),
            fx, fy, cx, cy, max_depth=10.0, min_component_px=10,
            dbscan_min_points=10, dbscan_eps=0.05, adaptive_eps=False,
        )
        # fixed tiny eps keeps at most a narrow depth band
        kept = evs[0].mask.sum() if ok[0] else 0
        assert kept < 0.9 * mask.sum()

    def test_outlier_speckle_still_removed(self):
        """Adaptive eps must not grow so large that true depth speckle
        (a far-away blob inside the mask) survives the denoise."""
        h, w = 24, 32
        fx = fy = 200.0                        # fine spacing: ~5 mm/px
        cx, cy = (w - 1) / 2, (h - 1) / 2
        depth = np.full((h, w), 1.0, np.float32)
        depth[2:4, 2:4] = 9.0                  # speckle 8 m behind
        rgb = np.full((h, w, 3), 128, np.uint8)
        mask = np.ones((h, w), bool)
        evs, ok = projection.project_masks(
            [mask], depth, rgb, np.eye(4, dtype=np.float32),
            fx, fy, cx, cy, max_depth=10.0, min_component_px=10,
            dbscan_min_points=10, dbscan_eps=0.01,
        )
        assert ok[0]
        assert not evs[0].mask[2:4, 2:4].any()
        # the plane survives (minus the speckle and a small min_samples
        # ring around the hole)
        assert evs[0].mask.sum() >= 0.95 * mask.sum()
