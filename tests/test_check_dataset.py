"""scripts/check_dataset.py — the real-dataset preflight must pass a
contract-complete mount and fail (with named rows) a broken one."""

import os
import runpy
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, os.path.dirname(__file__))
from test_dataset_cli import _config_json, write_replica_dataset  # noqa: E402

SCRIPT = os.path.join(
    os.path.dirname(__file__), "..", "scripts", "check_dataset.py"
)


def run_preflight(argv):
    old_argv = sys.argv
    sys.argv = ["check_dataset.py"] + argv
    try:
        runpy.run_path(SCRIPT, run_name="__main__")
        raise AssertionError("preflight did not sys.exit")
    except SystemExit as e:
        return int(e.code or 0)
    finally:
        sys.argv = old_argv


@pytest.fixture
def scene(tmp_path):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    write_replica_dataset(root)
    cfg = _config_json(root, tmp_path)
    return root, cfg


class TestPreflight:
    def test_ready_on_contract_complete_mount(self, scene, capsys):
        root, cfg = scene
        assert run_preflight([cfg]) == 0
        out = capsys.readouterr().out
        assert "READY" in out
        assert "FAIL" not in out.replace("0 fail", "")

    def test_root_override(self, scene, tmp_path):
        root, cfg = scene
        # config points at the right place already; an override to an empty
        # dir must fail fast
        empty = str(tmp_path / "empty")
        os.makedirs(empty)
        assert run_preflight([cfg, "--root", empty]) == 1

    def test_fails_on_missing_feature_pkl(self, scene, capsys):
        root, cfg = scene
        os.remove(os.path.join(root, "object_clipfeat.pkl"))
        assert run_preflight([cfg]) == 1
        assert "object_clipfeat.pkl" in capsys.readouterr().out

    def test_fails_on_truncated_poses(self, scene, capsys):
        root, cfg = scene
        t = np.loadtxt(os.path.join(root, "traj_w_c.txt"), delimiter=" ")
        np.savetxt(os.path.join(root, "traj_w_c.txt"), t[:3], delimiter=" ")
        assert run_preflight([cfg]) == 1
        out = capsys.readouterr().out
        assert "pose count" in out

    def test_fails_on_missing_instance_frame(self, scene, capsys):
        root, cfg = scene
        os.remove(
            os.path.join(root, "instance_our", "semantic_instance_1.png")
        )
        assert run_preflight([cfg]) == 1
        assert "instance image" in capsys.readouterr().out
