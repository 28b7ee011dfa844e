"""Stage-1 mask generation driver + online (live-mode) instance tracking."""

import numpy as np
import pytest

from openobj_tpu.perception import mask_generation as MG
from openobj_tpu.perception.encoders import caption_subject
from openobj_tpu.perception.tracking import OnlineInstanceTracker


def _fake_models(clip_dim=16, sbert_dim=8):
    def segmenter(rgb):
        h, w = rgb.shape[:2]
        m1 = np.zeros((h, w), bool); m1[5:20, 5:20] = True
        m2 = np.zeros((h, w), bool); m2[10:30, 25:45] = True
        m3 = np.zeros((h, w), bool); m3[0:3, 0:3] = True     # tiny -> dropped
        m4 = np.zeros((h, w), bool); m4[15:18, 15:18] = True  # low score
        return np.stack([m1, m2, m3, m4]), np.array([0.9, 0.8, 0.95, 0.2])

    def captioner(rgb, bboxes):
        return [f"a red box number {i} on the floor" for i in range(len(bboxes))]

    def clip_enc(crops):
        return np.stack([
            np.full(clip_dim, 1.0 + c.mean() / 255.0) for c in crops
        ])

    def sbert_enc(texts):
        return np.stack([np.full(sbert_dim, 1.0 + len(t)) for t in texts])

    return segmenter, captioner, clip_enc, sbert_enc


class TestCaptionSubject:
    def test_leading_noun_chunk_heuristic(self):
        assert caption_subject("a wooden chair with four legs") == "a wooden chair"
        assert caption_subject("the red mug on the table") == "the red mug"
        assert caption_subject("sofa") == "sofa"


class TestMaskGeneration:
    def test_frame_schema_and_filters(self):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 255, (40, 50, 3)).astype(np.uint8)
        out = MG.generate_frame_masks(rgb, *_fake_models())
        # tiny (m3) and low-score (m4) masks dropped -> 2 survive
        assert len(out["mask"]) == 2
        assert set(out) == {"mask", "bbox", "caption", "capfeat", "clipfeat"}
        for m, bb, cf, pf in zip(out["mask"], out["bbox"], out["capfeat"],
                                 out["clipfeat"]):
            assert m.dtype == bool and m.shape == (40, 50)
            r0, r1, c0, c1 = bb
            assert m[r0:r1, c0:c1].any() and not np.delete(
                m.reshape(-1), 0).all()
            np.testing.assert_allclose(np.linalg.norm(cf), 1.0, rtol=1e-5)
            np.testing.assert_allclose(np.linalg.norm(pf), 1.0, rtol=1e-5)
        # caption reduced to its leading noun chunk
        assert all(c == "a red box number" or c.startswith("a red box")
                   for c in out["caption"])

    def test_rank_order_overlap_resolution(self):
        h = w = 20
        m1 = np.zeros((h, w), bool); m1[2:12, 2:12] = True
        m2 = np.zeros((h, w), bool); m2[8:18, 8:18] = True
        masks, kept = MG.rank_order_masks(
            np.stack([m1, m2]), np.array([0.9, 0.5])
        )
        # reference paint order (mask_gen.py:291-296): highest score FIRST,
        # lower scores overwrite -> the LOWEST-score mask keeps the overlap
        areas = {k: m.sum() for k, m in zip(kept, masks)}
        assert areas[1] == 100          # full m2 (lower score, painted last)
        assert areas[0] == 100 - 16     # m1 minus the overlap

    def test_multi_frame_driver(self, tmp_path):
        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 255, (40, 50, 3)).astype(np.uint8)
                  for _ in range(3)]
        mi = MG.generate_masks(frames, *_fake_models(), frame_ids=[0, 10, 20])
        assert sorted(mi) == [0, 10, 20]
        path = str(tmp_path / "mask_init_all.pkl")
        MG.save_mask_init(path, mi)
        from openobj_tpu.perception.encoders import load_mask_init

        assert sorted(load_mask_init(path)) == [0, 10, 20]


class TestOnlineTracker:
    def _frame(self, offset=0.0):
        """A synthetic box on a flat background at depth 2, box at ~1 m
        (slightly non-planar — a perfectly flat surface is a degenerate
        convex hull, the reference's skip path)."""
        h, w = 60, 80
        rng = np.random.default_rng(3)
        depth = np.full((h, w), 2.0, np.float32)
        mask = np.zeros((h, w), bool)
        mask[20:40, 30 + int(offset):55 + int(offset)] = True
        depth[mask] = 1.0 + rng.uniform(0, 0.05, int(mask.sum())).astype(np.float32)
        return depth, mask

    def _tracker(self):
        return OnlineInstanceTracker(
            fx=60.0, fy=60.0, cx=40.0, cy=30.0,
            min_pixels=50, min_points=10, voxel_size=0.01,
        )

    def test_new_instance_created_and_reobserved(self):
        tr = self._tracker()
        depth, mask = self._frame()
        img = tr.ingest([mask], [7], depth, np.eye(4))
        assert 7 in tr.instances
        assert (img == 7).sum() > 0
        # reobserve slightly shifted: merged, still id 7
        depth2, mask2 = self._frame(offset=2)
        img2 = tr.ingest([mask2], [7], depth2, np.eye(4))
        assert (img2 == 7).sum() > 0
        assert tr.instances[7].merge_cnt == 1

    def test_mismatched_reobservation_is_unsure(self):
        tr = self._tracker()
        depth, mask = self._frame()
        tr.ingest([mask], [7], depth, np.eye(4))
        # same id but a totally different depth -> all points outside box
        depth2 = np.full_like(depth, 5.0)
        img2 = tr.ingest([mask], [7], depth2, np.eye(4))
        assert (img2[mask] == -1).all()

    def test_small_detection_is_background(self):
        tr = self._tracker()
        depth, _ = self._frame()
        tiny = np.zeros_like(depth, bool)
        tiny[5:9, 5:9] = True
        img = tr.ingest([tiny], [3], depth, np.eye(4))
        assert 3 not in tr.instances
        assert (img == 3).sum() == 0

    def test_zero_id_skipped(self):
        tr = self._tracker()
        depth, mask = self._frame()
        img = tr.ingest([mask], [0], depth, np.eye(4))
        assert (img == 0).all()


class TestClassFeatures:
    """--class-features npz production (reference train.py:109-150)."""

    def test_from_render_config_yaml(self, tmp_path):
        from openobj_tpu.perception import class_features as CF

        y = tmp_path / "render_config.yaml"
        y.write_text(
            "classes:\n- name: wall\n- name: floor\n- name: chair\n"
        )
        assert CF.class_names_from_render_config(str(y)) == [
            "wall", "floor", "chair"
        ]

    def test_from_scannet_tsv_unique_in_order(self, tmp_path):
        from openobj_tpu.perception import class_features as CF

        t = tmp_path / "labels.tsv"
        t.write_text(
            "id\tnyu40class\n1\twall\n2\tfloor\n3\twall\n4\tchair\n"
        )
        assert CF.class_names_from_scannet_tsv(str(t)) == [
            "wall", "floor", "chair"
        ]

    def test_cli_end_to_end_and_train_consumes(self, tmp_path):
        from openobj_tpu.perception import class_features as CF
        from openobj_tpu.train import load_class_features

        out = str(tmp_path / "cf.npz")
        CF.main(["--names", "wall, floor ,chair", out])
        feats = load_class_features(out)
        assert feats["names"] == ["wall", "floor", "chair"]
        assert feats["clipfeat"].shape == (3, 512)
        assert feats["capfeat"].shape == (3, 384)
        np.testing.assert_allclose(
            np.linalg.norm(feats["clipfeat"], axis=-1), 1.0, rtol=1e-5
        )


class TestGraphSegmenter:
    """First-party RGB-D entity segmentation (perception.segmentation) —
    the weights-free default for the stage-1 segmenter slot."""

    def _scene(self, h=60, w=80):
        """Two objects in front of a far wall: a red box at 1 m, a green
        box at 1.5 m; background flat at 3 m."""
        rgb = np.full((h, w, 3), 180, np.uint8)
        depth = np.full((h, w), 3.0, np.float32)
        rgb[10:30, 10:35] = [200, 40, 40]
        depth[10:30, 10:35] = 1.0
        rgb[35:55, 45:70] = [40, 180, 40]
        depth[35:55, 45:70] = 1.5
        return rgb, depth

    @staticmethod
    def _best_iou(masks, gt):
        best = 0.0
        for m in masks:
            i = (m & gt).sum()
            u = (m | gt).sum()
            best = max(best, i / max(u, 1))
        return best

    def test_recovers_depth_separated_objects(self):
        from openobj_tpu.perception.segmentation import GraphSegmenter

        rgb, depth = self._scene()
        masks, scores = GraphSegmenter(stride=1, min_size=30)(rgb, depth)
        assert masks.shape[0] >= 3        # two objects + background
        assert len(scores) == masks.shape[0]
        # masks are disjoint and cover the frame (a partition)
        total = masks.sum(0)
        assert total.max() <= 1
        gt1 = np.zeros(rgb.shape[:2], bool); gt1[10:30, 10:35] = True
        gt2 = np.zeros(rgb.shape[:2], bool); gt2[35:55, 45:70] = True
        assert self._best_iou(masks, gt1) > 0.85
        assert self._best_iou(masks, gt2) > 0.85

    def test_color_splits_flush_objects(self):
        """A book lying flat on a desk: identical depth, different color —
        the color term must separate what depth cannot."""
        from openobj_tpu.perception.segmentation import GraphSegmenter

        h, w = 40, 60
        rgb = np.full((h, w, 3), 120, np.uint8)
        rgb[10:30, 20:45] = [230, 220, 30]
        depth = np.full((h, w), 1.2, np.float32)
        masks, _ = GraphSegmenter(stride=1, min_size=20)(rgb, depth)
        gt = np.zeros((h, w), bool); gt[10:30, 20:45] = True
        assert self._best_iou(masks, gt) > 0.85

    def test_striped_object_heals_with_intrinsics(self):
        """A striped (red/yellow/red/yellow) box face in front of a far
        wall: without intrinsics the color edges split it into bands;
        with fx given, the head-on depth-continuity + color-repetition
        merge re-fuses the bands into one entity while the box-wall
        occlusion step keeps the box separate from the wall."""
        from openobj_tpu.perception.segmentation import GraphSegmenter

        h, w = 60, 80
        rgb = np.full((h, w, 3), 170, np.uint8)
        depth = np.full((h, w), 3.0, np.float32)
        gt = np.zeros((h, w), bool)
        gt[12:48, 20:60] = True
        depth[gt] = 1.2
        for i, y0 in enumerate(range(12, 48, 9)):     # 4 bands, 9 px each
            rgb[y0:y0 + 9, 20:60] = (
                [210, 40, 40] if i % 2 == 0 else [230, 210, 40])
        split_masks, _ = GraphSegmenter(stride=1, min_size=20)(rgb, depth)
        heal_masks, _ = GraphSegmenter(stride=1, min_size=20, fx=60.0)(
            rgb, depth)
        assert self._best_iou(split_masks, gt) < 0.6    # bands split it
        assert self._best_iou(heal_masks, gt) > 0.9     # repetition heals

    def test_flush_book_still_splits_with_intrinsics(self):
        """The book-flat-on-a-desk case must survive the texture-band
        merge: a single flush color patch has no color repetition
        (component of 2), so it keeps its identity even though its seam
        is perfectly depth-continuous."""
        from openobj_tpu.perception.segmentation import GraphSegmenter

        h, w = 40, 60
        rgb = np.full((h, w, 3), 120, np.uint8)
        rgb[10:30, 20:45] = [230, 220, 30]
        depth = np.full((h, w), 1.2, np.float32)
        masks, _ = GraphSegmenter(stride=1, min_size=20, fx=60.0)(rgb, depth)
        gt = np.zeros((h, w), bool)
        gt[10:30, 20:45] = True
        assert self._best_iou(masks, gt) > 0.85

    def test_touching_offset_boxes_still_split_with_intrinsics(self):
        """Two different-colored boxes in image-contact whose front faces
        are offset ~25 mm in depth: the offset exceeds the continuity
        threshold (0.35 x pixel footprint) and there is no color repeat,
        so they stay two entities."""
        from openobj_tpu.perception.segmentation import GraphSegmenter

        h, w = 40, 60
        rgb = np.full((h, w, 3), 150, np.uint8)
        depth = np.full((h, w), 3.0, np.float32)
        rgb[10:30, 10:30] = [210, 50, 50]
        depth[10:30, 10:30] = 1.2
        rgb[10:30, 30:50] = [50, 60, 210]
        depth[10:30, 30:50] = 1.225
        masks, _ = GraphSegmenter(stride=1, min_size=20, fx=60.0)(rgb, depth)
        g1 = np.zeros((h, w), bool); g1[10:30, 10:30] = True
        g2 = np.zeros((h, w), bool); g2[10:30, 30:50] = True
        assert self._best_iou(masks, g1) > 0.85
        assert self._best_iou(masks, g2) > 0.85

    def test_invalid_depth_falls_back_to_color(self):
        from openobj_tpu.perception.segmentation import GraphSegmenter

        rgb, _ = self._scene()
        depth = np.zeros(rgb.shape[:2], np.float32)   # all invalid
        masks, _ = GraphSegmenter(stride=1, min_size=30)(rgb, depth)
        gt1 = np.zeros(rgb.shape[:2], bool); gt1[10:30, 10:35] = True
        assert self._best_iou(masks, gt1) > 0.85

    def test_stride_upsamples_to_full_res(self):
        from openobj_tpu.perception.segmentation import GraphSegmenter

        rgb, depth = self._scene(h=61, w=81)          # odd dims
        masks, _ = GraphSegmenter(stride=2, min_size=20)(rgb, depth)
        assert masks.shape[1:] == (61, 81)
        gt1 = np.zeros((61, 81), bool); gt1[10:30, 10:35] = True
        assert self._best_iou(masks, gt1) > 0.7       # boundary quantized

    def test_end_to_end_stage1(self):
        """GraphSegmenter through the full stage-1 driver with depth routed
        via the new depth= parameter."""
        from openobj_tpu.perception.segmentation import GraphSegmenter

        rgb, depth = self._scene()
        _, captioner, clip_enc, sbert_enc = _fake_models()
        out = MG.generate_frame_masks(
            rgb, GraphSegmenter(stride=1, min_size=30), captioner,
            clip_enc, sbert_enc, min_px=100, depth=depth,
        )
        assert len(out["mask"]) >= 2
        assert all(m.sum() >= 100 for m in out["mask"])
        assert len(out["clipfeat"]) == len(out["mask"])


class TestProposeIds:
    def _tracker(self):
        return OnlineInstanceTracker(fx=40.0, fy=40.0, cx=31.5, cy=23.5,
                                     min_pixels=40, min_points=10,
                                     erode_size=3, erode_iters=1)

    def _frame(self, cx_px):
        """A square object at depth 1 m on a far background."""
        h, w = 48, 64
        depth = np.full((h, w), 5.0, np.float32)
        mask = np.zeros((h, w), bool)
        mask[16:32, cx_px - 8 : cx_px + 8] = True
        rng = np.random.default_rng(0)
        depth[mask] = 1.0 + rng.uniform(0, 0.03, int(mask.sum()))
        return depth, mask

    def test_new_then_matched(self):
        tr = self._tracker()
        depth, mask = self._frame(24)
        ids = tr.propose_ids([mask], depth, np.eye(4))
        assert ids == [4]                       # fresh ids start at 4
        tr.ingest([mask], ids, depth, np.eye(4))
        # same object, slightly moved: matched to the tracked box
        depth2, mask2 = self._frame(26)
        ids2 = tr.propose_ids([mask2], depth2, np.eye(4))
        assert ids2 == [4]

    def test_two_masks_one_frame_get_distinct_fresh_ids(self):
        tr = self._tracker()
        h, w = 48, 64
        depth = np.full((h, w), 5.0, np.float32)
        m1 = np.zeros((h, w), bool); m1[10:26, 8:24] = True
        m2 = np.zeros((h, w), bool); m2[10:26, 40:56] = True
        depth[m1] = 1.0
        depth[m2] = 2.0
        ids = tr.propose_ids([m1, m2], depth, np.eye(4))
        assert sorted(ids) == [4, 5]

    def test_bg_test_routes_to_zero(self):
        tr = self._tracker()
        depth, mask = self._frame(24)
        ids = tr.propose_ids([mask], depth, np.eye(4),
                             bg_test=lambda pts: True)
        assert ids == [0]

    def test_one_tracked_id_claims_one_mask(self):
        """Two overlapping-in-3D detections in one frame: only the better
        match keeps the tracked id; the other gets a fresh id."""
        tr = self._tracker()
        depth, mask = self._frame(24)
        tr.ingest([mask], tr.propose_ids([mask], depth, np.eye(4)),
                  depth, np.eye(4))
        d2, m_full = self._frame(24)
        # a sloppy detection: half the object + a slab of off-box points
        m_noisy = m_full.copy()
        m_noisy[:, :24] = False                # right half of the object
        m_noisy[36:46, 40:60] = True           # plus off-object area...
        d2[36:46, 40:60] = 3.0                 # ...outside the tracked box
        ids = tr.propose_ids([m_noisy, m_full], d2, np.eye(4))
        assert ids[1] == 4                     # clean mask: larger overlap
        assert ids[0] not in (0, 4)
