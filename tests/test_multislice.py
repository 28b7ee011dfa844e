"""Scene-level scale-out across device groups (parallel.multislice)."""

import json
import os
import sys

import jax
import numpy as np
import pytest

from openobj_tpu.parallel import multislice

from test_dataset_cli import write_replica_dataset, _config_json


class TestDeviceGroups:
    def test_even_split(self):
        groups = multislice.device_groups(2)
        assert len(groups) == 2
        assert [len(g) for g in groups] == [4, 4]
        ids = [d.id for g in groups for d in g]
        assert ids == sorted(ids)  # contiguous by id

    def test_uneven_split(self):
        groups = multislice.device_groups(3)
        assert [len(g) for g in groups] == [3, 3, 2]

    def test_bounds(self):
        with pytest.raises(ValueError):
            multislice.device_groups(0)
        with pytest.raises(ValueError):
            multislice.device_groups(9)


class TestSceneShard:
    def test_round_robin(self):
        scenes = list("abcdef")
        assert multislice.shard_scene_list(scenes, "0:2") == ["a", "c", "e"]
        assert multislice.shard_scene_list(scenes, "1:2") == ["b", "d", "f"]
        assert multislice.shard_scene_list(scenes, "2:4") == ["c"]

    def test_bad_shard(self):
        with pytest.raises(ValueError):
            multislice.shard_scene_list([], "3:2")


class TestRunParallel:
    def test_tasks_pinned_to_groups(self):
        """Each task's computation lands on its group's first device."""
        groups = multislice.device_groups(4)

        def task(devices):
            x = jax.numpy.ones((4,)) * 2.0
            return (float(x.sum()), next(iter(x.devices())).id,
                    [d.id for d in devices])

        results = multislice.run_parallel(
            [(f"t{i}", task) for i in range(4)], groups=groups
        )
        assert all(r.ok for r in results)
        landed = sorted(r.result[1] for r in results)
        expected = sorted(g[0].id for g in groups)
        assert landed == expected
        assert all(r.result[0] == 8.0 for r in results)

    def test_more_tasks_than_groups_queue(self):
        groups = multislice.device_groups(2)
        results = multislice.run_parallel(
            [(f"t{i}", lambda devs, i=i: i * 10) for i in range(5)],
            groups=groups,
        )
        assert [r.result for r in results] == [0, 10, 20, 30, 40]

    def test_exception_isolated(self):
        def boom(devices):
            raise RuntimeError("scene exploded")

        results = multislice.run_parallel(
            [("bad", boom), ("good", lambda devs: 1)],
            groups=multislice.device_groups(2),
        )
        assert not results[0].ok and "exploded" in str(results[0].error)
        assert results[1].ok and results[1].result == 1


class TestParallelScenesDriver:
    def test_two_scenes_concurrently(self, tmp_path):
        """run_scenes --parallel 2: two scenes train concurrently on
        disjoint device groups, both produce full artifacts."""
        sys.path.insert(0, "scripts")
        import run_scenes

        cfg_dir = tmp_path / "configs"
        os.makedirs(cfg_dir)
        for name, seed in (("sceneA", 0), ("sceneB", 1)):
            root = tmp_path / "data" / name
            write_replica_dataset(
                str(root), n_raw_frames=20, rng=np.random.default_rng(seed)
            )
            cfg_path = _config_json(str(root), tmp_path)
            cfg = json.load(open(cfg_path))
            cfg["render"]["iters_per_frame"] = 3
            cfg["vis"]["if_render"] = 0
            cfg["vis"]["if_obj"] = 0
            json.dump(cfg, open(cfg_dir / f"{name}.json", "w"))

        out = tmp_path / "runs"
        run_scenes.main([str(cfg_dir), "--out", str(out), "--parallel", "2",
                         "--max-frames", "2"])
        summary = json.load(open(out / "summary.json"))
        for name in ("sceneA", "sceneB"):
            assert summary[name]["status"] == "ok", summary[name]
            assert summary[name]["objects"] >= 1
            assert os.path.exists(out / name / "map_vis.pkl.gz")
        # thread-local profiling: each scene recorded its own frame timings
        for name in ("sceneA", "sceneB"):
            assert "timing" in summary[name]
            assert any(k.startswith("frame") for k in summary[name]["timing"])

    def test_scene_shard_cli(self, tmp_path):
        """--scene-shard limits this launch to its slice of the list."""
        sys.path.insert(0, "scripts")
        import run_scenes

        cfg_dir = tmp_path / "configs"
        os.makedirs(cfg_dir)
        root = tmp_path / "data" / "sceneA"
        write_replica_dataset(str(root), n_raw_frames=20)
        cfg_path = _config_json(str(root), tmp_path)
        cfg = json.load(open(cfg_path))
        cfg["render"]["iters_per_frame"] = 3
        cfg["vis"]["if_render"] = 0
        cfg["vis"]["if_obj"] = 0
        # two configs; shard 1:2 must pick only the second
        json.dump(cfg, open(cfg_dir / "sceneA.json", "w"))
        json.dump(cfg, open(cfg_dir / "sceneB.json", "w"))

        out = tmp_path / "runs"
        run_scenes.main([str(cfg_dir), "--out", str(out),
                         "--scene-shard", "1:2", "--max-frames", "1",
                         "--skip-export"])
        summary = json.load(open(out / "summary.json"))
        assert list(summary.keys()) == ["sceneB"]
