"""Perception stress-matrix machinery: archetype scenes, the matched
instance-mIoU scorer, the sequence-scaled keyframe stride, and the
segmenter's texture guard (gate + shifted-window min).

The full 6-archetype matrix (scripts/perception_matrix.py) is a ~10-min
CPU run whose tracked numbers live in BASELINE.md; these tests pin the
pieces it is built from at unit scale.
"""

import numpy as np
import pytest

from openobj_tpu.data import synthetic
from openobj_tpu.eval import matched_instance_miou
from openobj_tpu.perception.auto import keyframe_skip
from openobj_tpu.perception.segmentation import felzenszwalb_rgbd


class TestArchetypes:
    def test_every_archetype_renders_with_gt_ids(self):
        from openobj_tpu.ops import sampling

        w, h = 48, 36
        dirs = np.asarray(
            sampling.camera_ray_dirs(w, h, 0.65 * w, 0.65 * w, w / 2, h / 2)
        )
        for name in synthetic.ARCHETYPES:
            scene, orbit = synthetic.archetype_scene(name)
            pose = synthetic.orbit_pose(0.7, **orbit)
            rgb, depth, inst = scene.render(pose, dirs)
            assert rgb.shape == (h, w, 3) and rgb.dtype == np.uint8
            assert depth.shape == (h, w) and (depth > 0).all()
            ids = set(np.unique(inst).tolist())
            assert 0 in ids, name                    # background visible
            # foreground ids are the scene's declared instances
            fg = ids - {0}
            declared = {o.inst_id for o in scene.all_objects}
            assert fg <= declared, (name, fg, declared)

    def test_nonconvex_l_shape_one_instance(self):
        scene, _ = synthetic.archetype_scene("nonconvex")
        ids = [o.inst_id for o in scene.objects]
        assert ids.count(5) == 2  # two boxes, one instance id

    def test_unknown_archetype_raises(self):
        with pytest.raises(KeyError):
            synthetic.archetype_scene("nope")


class TestMatchedInstanceMiou:
    def test_perfect_match_different_id_spaces(self):
        gt = np.zeros((8, 8), np.int32)
        gt[2:5, 2:5] = 4
        gt[5:7, 5:7] = 5
        pred = np.zeros_like(gt)
        pred[gt == 4] = 17
        pred[gt == 5] = 23
        s = matched_instance_miou([pred], [gt])
        assert s["inst_miou"] == pytest.approx(1.0)
        assert s["matches"] == {4: 17, 5: 23}
        assert s["bg_iou"] == pytest.approx(1.0)

    def test_unmatched_gt_scores_zero(self):
        gt = np.zeros((8, 8), np.int32)
        gt[1:4, 1:4] = 4
        gt[5:8, 5:8] = 5
        pred = np.zeros_like(gt)
        pred[1:4, 1:4] = 9          # only one object found
        s = matched_instance_miou([pred], [gt])
        assert s["per_gt_iou"][4] == pytest.approx(1.0)
        assert s["per_gt_iou"][5] == 0.0
        assert s["matches"][5] is None
        assert s["inst_miou"] == pytest.approx(0.5)

    def test_one_to_one_matching_is_optimal(self):
        # one pred blob overlapping both GT blobs must be assigned to at
        # most ONE of them (Hungarian), not double-counted
        gt = np.zeros((4, 10), np.int32)
        gt[:, 0:4] = 4
        gt[:, 4:8] = 5
        pred = np.zeros_like(gt)
        pred[:, 0:8] = 7
        s = matched_instance_miou([pred], [gt])
        matched = [g for g, p in s["matches"].items() if p == 7]
        assert len(matched) == 1

    def test_sequence_level_consistency_rewarded(self):
        # an id that stays stable across frames beats per-frame relabeling
        gt = np.zeros((6, 6), np.int32)
        gt[2:5, 2:5] = 4
        pred_stable = [np.where(gt == 4, 9, 0) for _ in range(3)]
        pred_flaky = [np.where(gt == 4, 9 + i, 0) for i in range(3)]
        s_stable = matched_instance_miou(pred_stable, [gt] * 3)
        s_flaky = matched_instance_miou(pred_flaky, [gt] * 3)
        assert s_stable["inst_miou"] == pytest.approx(1.0)
        assert s_flaky["inst_miou"] < 0.5

    def test_junk_id_is_background(self):
        gt = np.zeros((6, 6), np.int32)
        pred = np.zeros_like(gt)
        pred[0, 0] = 999            # junk id must not count as an instance
        s = matched_instance_miou([pred], [gt])
        assert s["n_pred_instances"] == 0


class TestKeyframeSkip:
    def test_reference_regime_keeps_skip_10(self):
        assert keyframe_skip(2000) == 10

    def test_short_fixture_targets_10_keyframes(self):
        # constrained to divisors of the train stride: the trainer maps
        # frame -> artifact by integer division, so skip must divide it
        assert keyframe_skip(40) == 2
        assert keyframe_skip(50) == 5
        assert keyframe_skip(100) == 10

    def test_skip_always_divides_train_stride(self):
        for n in (0, 3, 17, 40, 55, 99, 100, 2000):
            for t in (1, 4, 10, 12):
                assert t % keyframe_skip(n, train_stride=t) == 0, (n, t)

    def test_tiny_sequence_never_zero(self):
        assert keyframe_skip(3) == 1
        assert keyframe_skip(0) == 1


class TestInferAssocStride:
    def _write(self, tmp_path, n_assoc):
        d = tmp_path / "instance_our"
        d.mkdir(exist_ok=True)
        for i in range(n_assoc):
            (d / f"semantic_instance_{i}.png").write_bytes(b"x")
        return str(d)

    def test_infers_short_scene_stride(self, tmp_path):
        from openobj_tpu.data.loaders import infer_assoc_stride

        # 40 raw frames, artifacts written at skip 2 -> 20 files
        assert infer_assoc_stride(self._write(tmp_path, 20), 40) == 2

    def test_infers_reference_stride(self, tmp_path):
        from openobj_tpu.data.loaders import infer_assoc_stride

        assert infer_assoc_stride(self._write(tmp_path, 200), 2000) == 10

    def test_missing_dir_falls_back(self, tmp_path):
        from openobj_tpu.data.loaders import infer_assoc_stride

        assert infer_assoc_stride(str(tmp_path / "nope"), 40) == 10

    def test_roundtrips_every_writer_skip(self, tmp_path):
        from openobj_tpu.data.loaders import infer_assoc_stride

        # whatever skip the writer used (frames 0, s, 2s, ...; always a
        # divisor of the train stride, per keyframe_skip), the inference
        # must recover it exactly
        for n_raw in (20, 40, 55, 100, 2000):
            for s, t in ((1, 10), (2, 10), (4, 4), (4, 12), (5, 10), (10, 10)):
                n_assoc = -(-n_raw // s)
                d = tmp_path / f"case_{n_raw}_{s}_{t}" / "instance_our"
                d.mkdir(parents=True)
                for i in range(n_assoc):
                    (d / f"semantic_instance_{i}.png").write_bytes(b"x")
                got = infer_assoc_stride(str(d), n_raw, train_stride=t)
                assert got == s, (n_raw, s, t)

    def test_corrupt_mount_falls_back_not_misinfers(self, tmp_path):
        from openobj_tpu.data.loaders import infer_assoc_stride

        # 40 raw frames at skip 10 -> 4 artifacts; delete one and the
        # count "looks like" stride 14 (3 files cover 40 frames), but 14
        # divides no sane train stride — inference must fall back to the
        # default so preflight existence checks still probe frames 10/30
        d = tmp_path / "instance_our"
        d.mkdir()
        for i in (0, 2, 3):   # artifact 1 missing
            (d / f"semantic_instance_{i}.png").write_bytes(b"x")
        assert infer_assoc_stride(str(d), 40, train_stride=10) == 10


class TestTextureGuard:
    """The union-find color cue: raw contrast between small solid objects
    must survive; fine repeating texture must not fragment."""

    def _two_solid_boxes(self):
        # two adjacent solid-colored rectangles on a flat background,
        # constant depth (no depth cue at the seam)
        rgb = np.full((40, 60, 3), 150, np.uint8)
        rgb[14:26, 14:28] = (220, 40, 40)      # red
        rgb[14:26, 28:42] = (230, 200, 40)     # yellow, touching red
        depth = np.full((40, 60), 2.0)
        return rgb, depth

    def test_adjacent_solid_objects_stay_separate(self):
        rgb, depth = self._two_solid_boxes()
        lab = felzenszwalb_rgbd(rgb, depth, min_size=16)
        red = np.unique(lab[16:24, 16:26])
        yel = np.unique(lab[16:24, 30:40])
        assert len(red) == 1 and len(yel) == 1
        assert red[0] != yel[0]

    def test_fine_stripes_stay_one_segment(self):
        # 2-px alternating bands across a 24-px-wide object: without the
        # texture guard every band boundary is a strong color edge
        rgb = np.full((40, 60, 3), 150, np.uint8)
        for i, r in enumerate(range(10, 30)):
            c = (220, 40, 40) if (i // 2) % 2 == 0 else (230, 200, 40)
            rgb[r, 18:42] = c
        depth = np.full((40, 60), 2.0)
        lab = felzenszwalb_rgbd(rgb, depth, min_size=16)
        interior = lab[16:24, 24:36]
        ids, counts = np.unique(interior, return_counts=True)
        # dominant label covers the striped interior (rim rows may split:
        # the guard deliberately releases within a window-diameter of the
        # silhouette — see segmentation.py gate comment)
        assert counts.max() / interior.size > 0.8

    def test_guard_disabled_reverts_to_raw(self):
        rgb = np.full((40, 60, 3), 150, np.uint8)
        for i, r in enumerate(range(10, 30)):
            c = (220, 40, 40) if (i // 2) % 2 == 0 else (230, 200, 40)
            rgb[r, 18:42] = c
        depth = np.full((40, 60), 2.0)
        lab_off = felzenszwalb_rgbd(rgb, depth, min_size=16,
                                    texture_window=0)
        interior = lab_off[14:26, 24:36]
        # raw color fragments the stripes into multiple bands
        assert len(np.unique(interior)) > 2


class TestSensorNoise:
    """The noise tier's physics: z^2-scaled depth sigma, boundary +
    grazing dropout, exposure/WB jitter, autocorrelated pose error
    (synthetic.apply_sensor_noise / perturb_pose)."""

    def _flat(self, z0=2.0, h=60, w=80):
        rgb = np.full((h, w, 3), 128, np.uint8)
        depth = np.full((h, w), z0)
        return rgb, depth

    def test_depth_sigma_grows_quadratically(self):
        rng = np.random.default_rng(0)
        sig = {}
        for z0 in (1.0, 3.0):
            _, d = self._flat(z0, 200, 200)
            _, dn = synthetic.apply_sensor_noise(self._flat(z0)[0][:0], d,
                                                 rng)  # rgb unused shape ok
            sig[z0] = float(np.std(dn[dn > 0] - z0))
        # model: 1.2mm + 1.9mm*(z-0.4)^2 -> ~1.9mm @1m, ~14.1mm @3m
        assert 0.0012 < sig[1.0] < 0.004
        assert 0.009 < sig[3.0] < 0.02

    def test_occlusion_boundary_holes(self):
        rng = np.random.default_rng(0)
        rgb, depth = self._flat(2.0)
        depth[:, 40:] = 3.0  # 1 m step edge at column 40
        _, dn = synthetic.apply_sensor_noise(rgb, depth, rng, level=2.0)
        edge_holes = (dn[:, 38:42] == 0).mean()
        interior_holes = (dn[:, 5:30] == 0).mean()
        assert edge_holes > 0.1
        assert interior_holes < 0.01

    def test_grazing_incidence_holes_need_fx(self):
        rng = np.random.default_rng(0)
        h, w, fx = 30, 40, 200.0
        rgb = np.full((h, w, 3), 128, np.uint8)
        # constant ~80-deg incidence: dz/dcol = 5.5 * z/fx everywhere
        # (exponential in column, since the footprint grows with z)
        col = np.arange(w)
        depth = 2.0 * np.exp(5.5 * col / fx)[None, :] * np.ones((h, 1))
        _, dn_nofx = synthetic.apply_sensor_noise(rgb, depth.copy(), rng,
                                                  level=1.0)
        rng = np.random.default_rng(0)
        _, dn_fx = synthetic.apply_sensor_noise(rgb, depth.copy(), rng,
                                                level=1.0, fx=fx)
        # median-based boundary test ignores planar ramps; grazing term
        # (fx-aware) drops a large fraction
        assert (dn_nofx == 0).mean() < 0.02
        assert (dn_fx == 0).mean() > 0.2

    def test_exposure_and_wb_jitter_changes_frames_differently(self):
        rng = np.random.default_rng(3)
        rgb, depth = self._flat()
        m = []
        for _ in range(6):
            rn, _ = synthetic.apply_sensor_noise(rgb, depth, rng, level=2.0)
            m.append(rn.reshape(-1, 3).mean(axis=0))
        m = np.stack(m)
        # per-frame gains: frame means spread well beyond additive noise
        assert m.mean(axis=0).std() < 20
        assert m.std(axis=0).max() > 1.5

    def test_pose_perturbation_small_and_autocorrelated(self):
        rng = np.random.default_rng(5)
        t = synthetic.orbit_pose(0.4)
        drift = None
        errs = []
        for _ in range(30):
            tp, drift = synthetic.perturb_pose(t, rng, 1.0, drift)
            errs.append(np.linalg.norm(tp[:3, 3] - t[:3, 3]))
            r = tp[:3, :3] @ t[:3, :3].T
            ang = np.degrees(np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1)))
            assert ang < 2.0  # rotations stay sub-2-degree over 30 frames
        errs = np.asarray(errs)
        assert errs.max() < 0.05           # translation stays sub-5cm
        # random walk: late-window error exceeds early-window error on
        # average (autocorrelated drift, not white jitter)
        assert errs[20:].mean() > errs[:5].mean() * 0.5

    def test_gt_maps_stay_clean_and_traj_is_perturbed(self, tmp_path):
        from openobj_tpu.ops import sampling

        w, h = 32, 24
        dirs = np.asarray(
            sampling.camera_ray_dirs(w, h, 0.65 * w, 0.65 * w, w / 2, h / 2)
        )
        scene, orbit = synthetic.archetype_scene("spheres")
        root = str(tmp_path)
        synthetic.write_raw_scene(root, scene, dirs, n_frames=4,
                                  orbit_kwargs=orbit, assoc_stride=2,
                                  noise_level=1.0)
        traj = np.loadtxt(root + "/traj_w_c.txt")
        clean = [synthetic.orbit_pose(2 * np.pi * i / 4, **orbit).reshape(-1)
                 for i in range(4)]
        deltas = [np.abs(traj[i] - clean[i]).max() for i in range(4)]
        assert max(deltas) > 1e-5   # traj lies
        assert max(deltas) < 0.05   # ...by millimetres, not metres


class TestAdversarialArchetypes:
    """Geometry contracts of the round-4 adversarial rows: the clones'
    cue collision and the occlusion gap (scripts/perception_matrix.py
    scores the full stack on them; these pin the scene constructions)."""

    def test_clones_are_identical_in_all_nongeometric_cues(self):
        scene, _ = synthetic.archetype_scene("clones")
        spheres = scene.objects
        assert len(spheres) == 4
        assert len({o.inst_id for o in spheres}) == 4
        assert len({float(o.radius) for o in spheres}) == 1
        colors = {tuple(np.round(o.color, 6)) for o in spheres}
        assert len(colors) == 1          # color histograms collide
        centers = np.stack([o.center for o in spheres])
        d = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
        # gaps >> radius: geometry CAN separate them
        assert d[~np.eye(4, dtype=bool)].min() > 3 * float(spheres[0].radius)

    def test_occlusion_gap_is_contiguous_and_long(self):
        from openobj_tpu.ops import sampling

        w, h = 96, 72
        dirs = np.asarray(
            sampling.camera_ray_dirs(w, h, 0.65 * w, 0.65 * w, w / 2, h / 2)
        )
        scene, orbit = synthetic.archetype_scene("occlusion")
        hidden = []
        for i in range(40):
            pose = synthetic.orbit_pose(2 * np.pi * i / 40, **orbit)
            _, _, inst = scene.render(pose, dirs)
            if (inst == 5).sum() == 0:
                hidden.append(i)
        assert len(hidden) >= 11
        # one contiguous run (full occlusion + return, not flicker)
        assert hidden == list(range(hidden[0], hidden[-1] + 1))
