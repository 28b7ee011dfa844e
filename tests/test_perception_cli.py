"""Perception-stage CLIs (openobj-maskgen / -associate / -partfeat) +
weights-free stand-in encoders: the reference's three pre-training
programs (mask_gen.py, mask_graph.py, sam_clip_dir.py) run end-to-end on a
reference-format on-disk scene with zero third-party weights, producing
the exact artifact contracts the training loader consumes."""

import os
import pickle
import shutil

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from openobj_tpu.perception import cli as pcli
from openobj_tpu.perception.encoders import (
    ColorNameCaptioner, HashingTextEncoder, VisualDescriptorEncoder,
)
from test_dataset_cli import H, W, write_replica_dataset


class TestHashingTextEncoder:
    def test_identity_shared_disjoint(self):
        e = HashingTextEncoder(dim=384)
        f = e.encode_texts(["a red ball", "a red ball", "a red box", "wall"])
        np.testing.assert_allclose(np.linalg.norm(f, axis=-1), 1.0, rtol=1e-6)
        assert f[0] @ f[1] == pytest.approx(1.0)
        assert 0.3 < f[0] @ f[2] < 1.0          # shares 'a red'
        assert abs(f[0] @ f[3]) < 0.2           # disjoint tokens

    def test_deterministic_across_instances(self):
        a = HashingTextEncoder().encode_texts(["wall"])
        b = HashingTextEncoder().encode_texts(["wall"])
        np.testing.assert_array_equal(a, b)


class TestVisualDescriptorEncoder:
    def test_similarity_structure(self):
        rng = np.random.default_rng(0)
        e = VisualDescriptorEncoder(dim=64)
        red = np.zeros((24, 30, 3), np.uint8)
        red[..., 0] = 200
        red_noisy = np.clip(
            red.astype(int) + rng.integers(-8, 8, red.shape), 0, 255
        ).astype(np.uint8)
        blue = np.zeros((24, 30, 3), np.uint8)
        blue[..., 2] = 200
        f = e.encode_images([red, red_noisy, blue])
        np.testing.assert_allclose(np.linalg.norm(f, axis=-1), 1.0, rtol=1e-5)
        assert f[0] @ f[1] > 0.9                # same surface, noise
        assert f[0] @ f[1] > f[0] @ f[2] + 0.1  # different color is farther

    def test_deterministic(self):
        im = np.arange(24 * 30 * 3, dtype=np.uint8).reshape(24, 30, 3)
        a = VisualDescriptorEncoder(dim=32).encode_images([im])
        b = VisualDescriptorEncoder(dim=32).encode_images([im])
        np.testing.assert_array_equal(a, b)


class TestColorNameCaptioner:
    def test_dominant_color_names(self):
        img = np.zeros((40, 40, 3), np.uint8)
        img[:, :20] = (200, 40, 40)    # red
        img[:, 20:] = (50, 80, 200)    # blue
        caps = ColorNameCaptioner()(img, [(0, 40, 0, 20), (0, 40, 20, 40)])
        assert caps == ["a red object", "a blue object"]


class TestAssocYaml:
    def test_reference_schema_roundtrip(self, tmp_path):
        yaml = pytest.importorskip("yaml")
        y = {
            "skip": 10, "graph_method": "weighted", "if_bg": 1,
            "gt_wall_id": 93, "gt_floor_id": 40, "gt_ceiling_id": 31,
            "captions_wall": ["wall"],
            "weight_geo": 0.30, "weight_cap": 0.20, "weight_clip": 0.30,
            "weight_color": 0.20, "weight_geo_2d": 0.60,
            "cap_thre": 0.85, "weight_pc": 0.6, "dis_thre": 0.05,
            "weightcaption": 0.3, "weightcolor": 0.6,
            "image_W": 1200, "image_H": 680, "depth_scale": 1000,
            "fx": 600, "fy": 600, "cx": 599.5, "cy": 339.5,
        }
        p = tmp_path / "room_0.yaml"
        p.write_text(yaml.safe_dump(y))
        cfg = pcli._assoc_config_from_yaml(pcli.load_assoc_yaml(str(p)))
        assert cfg.fx == 600 and cfg.cy == 339.5
        assert cfg.weights == {
            "geo": 0.30, "cap": 0.20, "clip": 0.30,
            "color": 0.20, "geo2d": 0.60,
        }
        assert cfg.gt_bg_ids == {"wall": 93, "floor": 40, "ceiling": 31}
        assert cfg.cap_thre == 0.85 and cfg.weight_caption == 0.3

    def test_threshold_mode_uses_thresholds(self):
        y = dict(pcli._YAML_DEFAULTS, graph_method="threshold")
        cfg = pcli._assoc_config_from_yaml(y)
        assert cfg.graph_method == "threshold"
        assert cfg.weights["geo"] == y["threshold_geo"]
        assert not cfg.use_geo2d


class TestFullWorkflow:
    """rgb/depth/traj on disk -> maskgen -> associate -> partfeat -> the
    training loader reads the regenerated artifacts. No model weights."""

    @pytest.fixture(scope="class")
    def scene(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("ws") / "scene")
        write_replica_dataset(root, n_raw_frames=40)
        # stash the fixture's GT instance images as the GT-semantic input
        # (the associate stage will overwrite instance_our with its own)
        gt_dir = os.path.join(root, "gt_semantic")
        shutil.copytree(os.path.join(root, "instance_our"), gt_dir)
        return root

    @pytest.fixture(scope="class")
    def ran_maskgen(self, scene):
        rc = pcli.maskgen_main([
            scene, "--skip", "10", "--min-px", "30",
            "--seg-min-size", "16", "--clip-dim", "64", "--crop-pad", "4",
        ])
        assert rc == 0
        return scene

    def test_maskgen_contract(self, ran_maskgen):
        from openobj_tpu.perception.encoders import load_mask_init

        # on disk: the reference's field-major layout + our frame_idx
        with open(os.path.join(ran_maskgen, "mask_init_all.pkl"), "rb") as f:
            raw = pickle.load(f)
        assert set(raw) == {"mask", "bbox", "caption", "capfeat",
                            "clipfeat", "frame_idx"}
        assert raw["frame_idx"] == [0, 10, 20, 30]
        # in memory: frame-major keyed by RAW frame index
        mi = load_mask_init(os.path.join(ran_maskgen, "mask_init_all.pkl"))
        assert set(mi) == {0, 10, 20, 30}
        fm = mi[0]
        assert set(fm) == {"mask", "bbox", "caption", "capfeat", "clipfeat"}
        assert len(fm["mask"]) >= 2            # wall + at least one sphere
        assert fm["mask"][0].shape == (H, W) and fm["mask"][0].dtype == bool
        # masks are disjoint (rank-ordered id image)
        total = np.zeros((H, W), int)
        for m in fm["mask"]:
            total += m
        assert total.max() == 1
        assert all(c.endswith("object") for c in fm["caption"])
        assert np.allclose(
            np.linalg.norm(np.stack(fm["clipfeat"]), axis=-1), 1.0, rtol=1e-5
        )

    @pytest.fixture(scope="class")
    def ran_associate(self, ran_maskgen, tmp_path_factory):
        yaml = pytest.importorskip("yaml")
        ycfg = {
            "skip": 10, "graph_method": "weighted", "if_bg": 1,
            "gt_wall_id": 1, "captions_wall": ["wall"],
            "depth_scale": 1000,
            "fx": 40.0, "fy": 40.0, "cx": 32.0, "cy": 24.0,
            "cap_thre": 0.85,
        }
        p = tmp_path_factory.mktemp("cfg") / "scene.yaml"
        p.write_text(yaml.safe_dump(ycfg))
        rc = pcli.associate_main([
            ran_maskgen, "--config", str(p),
            "--gt-semantic-glob",
            os.path.join(ran_maskgen, "gt_semantic", "*.png"),
            "--dbscan-min-points", "10", "--dbscan-eps", "0.2",
            "--min-component-px", "20",
            "--debug-overlays", os.path.join(ran_maskgen, "graph_vis"),
        ])
        assert rc == 0
        return ran_maskgen

    def test_associate_artifacts(self, ran_associate):
        root = ran_associate
        imgs = [
            cv2.imread(
                os.path.join(root, "instance_our",
                             f"semantic_instance_{i}.png"),
                cv2.IMREAD_UNCHANGED,
            )
            for i in range(4)
        ]
        assert all(im is not None and im.shape == (H, W) for im in imgs)
        with open(os.path.join(root, "object_clipfeat.pkl"), "rb") as f:
            clip_pkl = pickle.load(f)
        with open(os.path.join(root, "object_caption.pkl"), "rb") as f:
            cap_pkl = pickle.load(f)
        assert len(clip_pkl) == 4
        # GT bg anchoring: the wall cluster took reserved id 1 and it
        # dominates every frame (mask_graph.py:854-855,1112-1135)
        for im in imgs:
            vals, counts = np.unique(im, return_counts=True)
            assert vals[np.argmax(counts)] == 1
        # association consistency: some non-bg global id persists across
        # at least 2 frames with a consistent feature key
        obj_ids = [set(d) - {1, 2, 3} for d in clip_pkl]
        persistent = set.intersection(*obj_ids[:2])
        assert persistent, f"no persistent object ids: {obj_ids}"
        assert all(isinstance(c, str) for d in cap_pkl for c in d.values())

    def test_debug_overlays(self, ran_associate):
        """--debug-overlays writes the before/after QA trees
        (reference mask_graph.py:1204-1238) as RGB PNGs."""
        for sub in ("before", "after"):
            p = os.path.join(ran_associate, "graph_vis", sub, "inst_0.png")
            im = cv2.imread(p, cv2.IMREAD_UNCHANGED)
            assert im is not None and im.shape == (H, W, 3)
        # the after overlay paints every non-bg-0 mask: the persistent
        # object must appear as a non-black region
        im = cv2.imread(
            os.path.join(ran_associate, "graph_vis", "after", "inst_0.png"))
        assert (im.sum(-1) > 0).sum() > 50

    @pytest.fixture(scope="class")
    def ran_partfeat(self, ran_associate):
        rc = pcli.partfeat_main([
            ran_associate, "--skip", "10", "--down", "5",
            "--clip-dim", "8", "--seg-min-size", "16",
        ])
        assert rc == 0
        return ran_associate

    def test_partfeat_contract(self, ran_partfeat):
        pf = np.load(os.path.join(ran_partfeat, "partlevel", "0.npy"))
        assert pf.shape == (H // 5, W // 5, 8)
        assert np.isfinite(pf).all() and np.abs(pf).max() > 0

    def test_run_scenes_perception_auto(self, tmp_path):
        """run_scenes --perception auto: a scene dir holding ONLY raw
        rgb/depth/traj trains end-to-end — the driver detects the missing
        association artifacts, generates them with the weights-free
        perception stages, then trains/exports/evals as usual. This is
        the complete reference workflow (README.md:72-118) in one
        command with zero third-party weights."""
        import json
        import sys

        sys.path.insert(0, "scripts")
        import run_scenes

        from test_dataset_cli import _config_json

        scene_root = tmp_path / "data" / "sceneA"
        write_replica_dataset(str(scene_root), n_raw_frames=20)
        # strip everything the perception stages are supposed to produce
        for d in ("instance_our", "class_our", "partlevel"):
            shutil.rmtree(scene_root / d)
        for f in ("object_clipfeat.pkl", "object_capfeat.pkl"):
            os.remove(scene_root / f)

        cfg_dir = tmp_path / "configs"
        os.makedirs(cfg_dir)
        cfg_path = _config_json(str(scene_root), tmp_path)
        cfg = json.load(open(cfg_path))
        cfg["render"]["iters_per_frame"] = 15
        cfg["vis"]["if_render"] = 1
        json.dump(cfg, open(cfg_dir / "sceneA.json", "w"))

        out = tmp_path / "runs"
        run_scenes.main([str(cfg_dir), "--out", str(out), "--eval",
                         "--n-classes", "8", "--perception", "auto"])
        summary = json.load(open(out / "summary.json"))
        assert summary["sceneA"]["status"] == "ok"
        assert summary["sceneA"]["objects"] >= 1
        # regenerated artifacts exist and match the loader contract
        assert os.path.exists(scene_root / "object_clipfeat.pkl")
        assert os.path.exists(scene_root / "instance_our"
                              / "semantic_instance_0.png")
        assert os.path.exists(scene_root / "partlevel" / "0.npy")
        ev = summary["sceneA"]["eval"]
        assert ev["psnr"] > 12          # reconstruction is real
        assert ev["depth_l1"] < 2.0
        # instance association is real: GT spheres recovered as coherent
        # cross-frame objects (not fragments); bar set at ~60% of the
        # measured 0.55 to absorb training-run variance
        assert ev["inst_miou"] > 0.33

    def test_loader_reads_regenerated_artifacts(self, ran_partfeat):
        from openobj_tpu.data.loaders import Replica

        ds = Replica(ran_partfeat, stride=10, part_mode=True, part_down=5)
        assert len(ds) == 4
        s = ds[0]
        assert s.rgb.shape == (H, W, 3)
        assert s.part_feat.shape == (H // 5, W // 5, 8)
        # bg slot present (wall -> 0) and at least one object instance
        assert 0 in s.bboxes
        assert (s.inst > 3).any()


def write_scannet_raw(root, n_raw_frames=20):
    """ScanNet raw contract only — color/<i>.jpg, depth/<i>.png,
    intrinsic/intrinsic_depth.txt, traj_w_c.txt — rendered from the same
    analytic scene as the Replica fixture. No association artifacts: the
    perception stages must produce them."""
    from openobj_tpu.data import synthetic
    from openobj_tpu.ops import sampling
    from test_dataset_cli import FX, FY, CX, CY

    for d in ("color", "depth", "intrinsic"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    dirs = np.asarray(sampling.camera_ray_dirs(W, H, FX, FY, CX, CY))
    scene = synthetic.default_scene(n_spheres=2)
    poses = []
    for i in range(n_raw_frames):
        t_wc = synthetic.orbit_pose(np.pi / 2 - 0.6 + 1.2 * i / n_raw_frames)
        poses.append(t_wc.reshape(-1))
        rgb, depth, _ = scene.render(t_wc, dirs)
        cv2.imwrite(os.path.join(root, "color", f"{i}.jpg"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        cv2.imwrite(os.path.join(root, "depth", f"{i}.png"),
                    (depth * 1000).astype(np.uint16))
    np.savetxt(os.path.join(root, "traj_w_c.txt"), np.stack(poses),
               delimiter=" ")
    k = np.eye(4)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = FX, FY, CX, CY
    np.savetxt(os.path.join(root, "intrinsic", "intrinsic_depth.txt"), k)


class TestScanNetPerceptionAuto:
    def test_scannet_raw_to_artifacts(self, tmp_path):
        """--perception auto on the ScanNet raw contract: maskgen and
        associate must read color/*.jpg via the ScanNet RawFrames layout
        (regression: associate used to be invoked without --format and
        crashed looking for rgb/rgb_<i>.png)."""
        import json
        import sys

        sys.path.insert(0, "scripts")
        import run_scenes

        scan = tmp_path / "scan"
        write_scannet_raw(str(scan), n_raw_frames=20)
        cfg = {
            "dataset": {"path": str(scan), "format": "ScanNet"},
            "optimizer": {"args": {"lr": 1e-3, "weight_decay": 0.013}},
            "trainer": {"stride": 10, "scale": 1000.0, "part_mode": 0},
            "render": {"depth_range": [0.0, 8.0], "n_bins": 9,
                       "n_bins_cam2surface": 1, "n_bins_cam2surface_bg": 5,
                       "iters_per_frame": 10, "n_per_optim": 24,
                       "n_per_optim_bg": 24},
            "model": {"n_unidir_funcs": 5, "obj_scale": 2.0, "bg_scale": 5.0,
                      "surface_eps": 0.1, "other_eps": 0.05,
                      "keyframe_buffer_size": 4, "keyframe_step": 25,
                      "keyframe_step_bg": 50, "window_size": 2,
                      "window_size_bg": 2, "hidden_feature_size": 8,
                      "hidden_feature_size_bg": 8,
                      "clip_point_feature_size": 8},
            "camera": {"w": W, "h": H, "mw": 0, "mh": 0},
            "vis": {"if_render": 0},
        }
        cfg_dir = tmp_path / "configs"
        os.makedirs(cfg_dir)
        json.dump(cfg, open(cfg_dir / "scan.json", "w"))
        out = tmp_path / "runs"
        run_scenes.main([str(cfg_dir), "--out", str(out),
                         "--perception", "auto"])
        summary = json.load(open(out / "summary.json"))
        assert summary["scan"]["status"] == "ok"
        assert summary["scan"]["objects"] >= 1
        assert os.path.exists(scan / "object_clipfeat.pkl")
        assert os.path.exists(scan / "instance_our" /
                              "semantic_instance_0.png")


class TestReferencePklInterop:
    def test_field_major_pkl_without_frame_idx(self, tmp_path):
        """A mask_init_all.pkl in the reference's exact field-major layout
        (mask_gen.py:534-550, NO frame_idx) loads and pairs positionally
        with the association frames — the interop the CLI advertises."""
        from openobj_tpu.perception.encoders import load_mask_init

        root = str(tmp_path / "scene")
        write_replica_dataset(root, n_raw_frames=20)
        # build a reference-layout pickle from our own maskgen output
        pcli.maskgen_main([root, "--skip", "10", "--min-px", "30",
                           "--seg-min-size", "48", "--seg-stride", "1",
                           "--crop-pad", "2", "--clip-dim", "64"])
        mi = load_mask_init(os.path.join(root, "mask_init_all.pkl"))
        keys = sorted(mi)
        assert keys == [0, 10]          # first-party: raw-index keys
        ref_layout = {
            f: [mi[k][f] for k in keys]
            for f in ("mask", "bbox", "caption", "capfeat", "clipfeat")
        }
        with open(os.path.join(root, "mask_init_all.pkl"), "wb") as f:
            pickle.dump(ref_layout, f)   # reference pickle: no frame_idx
        mi2 = load_mask_init(os.path.join(root, "mask_init_all.pkl"))
        assert sorted(mi2) == [0, 1]     # dense ordinals (positional)

        yaml = pytest.importorskip("yaml")
        ycfg = {"skip": 10, "graph_method": "weighted", "depth_scale": 1000,
                "fx": 40.0, "fy": 40.0, "cx": 32.0, "cy": 24.0}
        yp = tmp_path / "assoc.yaml"
        yp.write_text(yaml.safe_dump(ycfg))
        rc = pcli.associate_main([
            root, "--config", str(yp), "--max-depth", "8.0",
            "--min-component-px", "30", "--dbscan-min-points", "10",
            "--dbscan-eps", "0.2", "--geo-bg",
        ])
        assert rc == 0
        assert os.path.exists(os.path.join(root, "object_clipfeat.pkl"))

    def test_start_skip_mismatch_detected(self, tmp_path):
        """First-party pickles are keyed by raw index: an associate run
        whose start/skip selects raw frames maskgen never processed fails
        loudly instead of pairing masks with the wrong depth/pose."""
        root = str(tmp_path / "scene")
        write_replica_dataset(root, n_raw_frames=20)
        pcli.maskgen_main([root, "--skip", "10", "--min-px", "30",
                           "--seg-min-size", "48", "--seg-stride", "1",
                           "--crop-pad", "2", "--clip-dim", "64"])
        yaml = pytest.importorskip("yaml")
        ycfg = {"skip": 7, "graph_method": "weighted", "depth_scale": 1000,
                "fx": 40.0, "fy": 40.0, "cx": 32.0, "cy": 24.0}
        yp = tmp_path / "assoc.yaml"
        yp.write_text(yaml.safe_dump(ycfg))
        with pytest.raises(KeyError, match="raw frame"):
            pcli.associate_main([
                root, "--config", str(yp), "--max-depth", "8.0",
                "--min-component-px", "30", "--dbscan-min-points", "10",
                "--dbscan-eps", "0.2",
            ])
