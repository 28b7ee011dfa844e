"""Viewer HTML/PLY generation + color utilities + CLI."""

import gzip
import os
import pickle

import numpy as np
import pytest

from openobj_tpu.viz import colors as C
from openobj_tpu.viz import viewer


@pytest.fixture
def bundle(tmp_path):
    rng = np.random.default_rng(0)
    b = {}
    for oid in (4, 7):
        v = rng.normal(size=(20, 3)).astype(np.float32)
        f = rng.integers(0, 20, (12, 3)).astype(np.int32)
        clip = rng.normal(size=(3, 512)).astype(np.float32)
        cap = rng.normal(size=(3, 384)).astype(np.float32)
        b[oid] = {
            "mesh": {"vertices": v, "faces": f},
            "color": rng.integers(0, 255, (20, 3)).astype(np.uint8),
            "part_feat": rng.normal(size=(20, 512)).astype(np.float32),
            "clip_feat": clip / np.linalg.norm(clip, axis=-1, keepdims=True),
            "caption_feat": cap / np.linalg.norm(cap, axis=-1, keepdims=True),
            "class_id": oid % 3,
        }
    path = str(tmp_path / "map_vis.pkl.gz")
    with gzip.open(path, "wb") as f:
        pickle.dump(b, f)
    return b, path


class TestColors:
    def test_distinct_colors_deterministic(self):
        a = C.distinct_colors(16)
        b = C.distinct_colors(16)
        np.testing.assert_array_equal(a, b)
        # all distinct
        assert len({tuple(c) for c in a}) == 16

    def test_rainbow_endpoints(self):
        cols = C.rainbow_colormap(np.array([0.0, 1.0]))
        assert cols[0, 2] > 200 and cols[0, 0] < 60   # low -> blue
        assert cols[1, 0] > 200 and cols[1, 2] < 60   # high -> red

    def test_class_color_map_yaml(self, tmp_path):
        yaml_path = tmp_path / "colors.yaml"
        yaml_path.write_text(
            "mapping: {0: 0, 1: 1, 2: 1}\n"
            "mapped_class: {0: unknown, 1: chair}\n"
            "mapped_colors: {0: [0, 0, 0], 1: [1.0, 0.5, 0.0]}\n"
        )
        cm = C.ClassColorMap.from_yaml(str(yaml_path))
        np.testing.assert_array_equal(cm.color_of(1), [255, 128, 0])
        np.testing.assert_array_equal(cm.color_of(2), [255, 128, 0])  # merged
        assert cm.name_of(2) == "chair"
        gen = C.ClassColorMap.generated(["a", "b", "c"])
        assert gen.name_of(1) == "b"


class TestFakeEncoders:
    def test_cross_process_deterministic(self):
        """The fake hashing encoders must not depend on PYTHONHASHSEED —
        artifacts baked in one process must match queries from another."""
        import subprocess
        import sys

        code = (
            "from openobj_tpu.viz.viewer import make_encoders;"
            "clip, _ = make_encoders('fake');"
            "print(repr(float(clip(['chair'])[0, 0])))"
        )
        outs = set()
        for seed in ("1", "2"):
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                env={**__import__('os').environ, "PYTHONHASHSEED": seed,
                     "JAX_PLATFORMS": "cpu"},
                check=True,
            )
            outs.add(r.stdout.strip())
        assert len(outs) == 1, outs
        clip, _ = viewer.make_encoders("fake")
        assert repr(float(clip(["chair"])[0, 0])) in outs


class TestViewer:
    def test_bundle_colorings(self, bundle):
        b, _ = bundle
        modes = viewer.bundle_colorings(b)
        assert set(modes) == {"rgb", "instance", "class", "partpca"}
        for mode in modes.values():
            for oid, e in b.items():
                assert mode[oid].shape == (20, 3)
                assert mode[oid].dtype == np.uint8
        # instance colors differ between objects
        assert not np.array_equal(modes["instance"][4][0], modes["instance"][7][0])

    def test_build_html(self, bundle, tmp_path):
        b, _ = bundle
        out = str(tmp_path / "viewer.html")
        viewer.build_html(b, out, scores={4: 0.9, 7: 0.2})
        html = open(out).read()
        # truly self-contained: embedded WebGL2 renderer, no external scripts
        assert "webgl2" in html and "createShader" in html.replace(" ", "")
        assert "http" not in html.split("</title>")[1]  # no CDN/script URLs
        assert "rgb" in html and "partpca" in html
        assert os.path.getsize(out) > 1000

    def test_cli_query_roundtrip(self, bundle, tmp_path, capsys):
        _, path = bundle
        out = str(tmp_path / "v.html")
        ply_dir = str(tmp_path / "plys")
        viewer.main([
            path, "--out-html", out, "--query", "a red chair",
            "--encoders", "fake", "--ply-dir", ply_dir,
        ])
        captured = capsys.readouterr().out
        assert "query 'a red chair'" in captured
        assert os.path.exists(out)
        assert sorted(os.listdir(ply_dir)) == ["obj_4.ply", "obj_7.ply"]

    def test_cli_part_query(self, bundle, tmp_path):
        _, path = bundle
        out = str(tmp_path / "v.html")
        viewer.main([
            path, "--out-html", out, "--query", "chair",
            "--part-query", "backrest", "--encoders", "fake",
        ])
        assert "part_query" in open(out).read()

    def test_fake_encoders_deterministic(self):
        clip, sbert = viewer.make_encoders("fake")
        a, b = clip(["chair"]), clip(["chair"])
        np.testing.assert_array_equal(a, b)
        assert a.shape == (1, 512) and sbert(["x"]).shape == (1, 384)

    def test_vocab_encoders(self, tmp_path):
        vocab = tmp_path / "vocab.npz"
        np.savez(
            vocab, terms=np.array(["chair", "table"]),
            clip=np.eye(2, 512, dtype=np.float32),
            sbert=np.eye(2, 384, dtype=np.float32),
        )
        clip, sbert = viewer.make_encoders("vocab", str(vocab))
        np.testing.assert_array_equal(clip(["table"])[0][:2], [0, 1])
