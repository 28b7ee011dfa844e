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


class TestShippedClassTables:
    """First-party Replica/ScanNet class tables (viz.class_tables) — the
    reference ships these as replica_color.yaml (523 L) /
    scannet_color.yaml (799 L); parity facts encoded below come from the
    public dataset vocabularies."""

    def test_replica_merge_numbering(self):
        from openobj_tpu.viz import class_tables as ct

        m = ct.for_dataset("replica")
        assert len(m.names) == 83           # 102 raw -> 83 merged classes
        assert m.names[0] == "unknown"
        assert m.names[82] == "bag"
        # synonym merges land on the first-appearance merged id
        assert m.name_of(14) == "cup"       # bottle -> cup
        assert m.name_of(16) == "cup"       # bowl -> cup
        assert m.mapping[14] == m.mapping[16] == m.mapping[28] == 14
        assert m.name_of(48) == "computer"  # laptop
        assert m.name_of(82) == "computer"  # tablet
        assert m.name_of(61) == "cushion"   # pillow
        # wall/floor/ceiling (the association pipeline's anchored classes)
        assert m.name_of(93) == "wall"
        assert m.name_of(40) == "floor"
        assert m.name_of(31) == "ceiling"

    def test_replica_strict_reference_mode(self):
        """strict_reference=True reproduces the reference's numbering
        bit-for-bit INCLUDING its verified self-inconsistency: raw 83
        (tissue-paper) -> 42 ('appliance', replica_color.yaml:85 vs its
        own comment). Default mode emits the self-consistent 50."""
        from openobj_tpu.viz import class_tables as ct

        default = ct.for_dataset("replica")
        strict = ct.for_dataset("replica", strict_reference=True)
        assert default.mapping[83] == 50 and default.names[50] == "tissue-paper"
        assert strict.mapping[83] == 42 and strict.names[42] == "appliance"
        # the quirk is the ONLY divergence between the modes
        diffs = {
            r for r in default.mapping
            if default.mapping[r] != strict.mapping[r]
        }
        assert diffs == {83}
        assert strict.names == default.names
        # both modes agree with the shipped YAML numbering everywhere else
        import os

        import openobj_tpu
        from openobj_tpu.viz import colors as C

        shipped = C.ClassColorMap.from_yaml(
            os.path.join(os.path.dirname(openobj_tpu.__file__),
                         "configs", "colors", "replica_classes.yaml")
        )
        for raw, merged in shipped.mapping.items():
            if raw != 83:
                assert strict.mapping[raw] == merged

    def test_scannet_nyu40(self):
        from openobj_tpu.viz import class_tables as ct

        m = ct.for_dataset("scannet")
        assert len(m.names) == 41          # unknown + NYU40
        assert m.names[1] == "wall" and m.names[2] == "floor"
        assert m.names[40] == "otherprop"
        np.testing.assert_array_equal(m.color_of(1), [174, 199, 232])
        assert len(ct.class_names("scannet")) == 41

    def test_shipped_yaml_files_load(self):
        import os

        import openobj_tpu
        from openobj_tpu.viz import class_tables as ct

        root = os.path.join(os.path.dirname(openobj_tpu.__file__),
                            "configs", "colors")
        for name in ("replica", "scannet"):
            cm = C.ClassColorMap.from_yaml(
                os.path.join(root, f"{name}_classes.yaml")
            )
            live = ct.for_dataset(name)
            assert cm.mapping == live.mapping
            assert cm.names == live.names

    def test_viewer_s_mode_uses_class_colors(self, bundle):
        """'S' class mode: with the first-party vocabulary (unknown at
        index 0) semantic ids ARE raw table ids — no offset; the
        reference's render_config convention (mapping[class_id + 1],
        vis_interaction.py:284) is available via class_id_offset=1."""
        from openobj_tpu.viz import class_tables as ct

        b, _ = bundle
        m = ct.for_dataset("replica")
        for oid, e in b.items():
            e["class_id"] = 20  # raw id 20 = chair in the shipped table
        modes = viewer.bundle_colorings(b, class_colors=m)
        expect = m.color_of(20)
        for oid in b:
            np.testing.assert_array_equal(modes["class"][oid][0], expect)
        # reference convention: ids shifted down by one, offset restores
        for oid, e in b.items():
            e["class_id"] = 19
        modes = viewer.bundle_colorings(b, class_colors=m, class_id_offset=1)
        for oid in b:
            np.testing.assert_array_equal(modes["class"][oid][0], expect)

    def test_eval_class_mapping(self):
        """mIoU protocol with merged ids: raw GT/pred ids that merge to the
        same class must score as one class."""
        from openobj_tpu.eval import evaluate_semantic_maps
        from openobj_tpu.viz import class_tables as ct

        m = ct.for_dataset("replica")
        lut = np.zeros(max(m.mapping) + 1, np.int64)
        for raw, merged in m.mapping.items():
            lut[raw] = merged
        gt = np.array([[14, 16], [28, 20]])    # bottle, bowl, cup, chair
        pred = np.array([[28, 28], [14, 20]])  # all cups + chair
        out = evaluate_semantic_maps(
            [lut[pred]], [lut[gt]], n_classes=len(m.names)
        )
        assert out["miou"] == 1.0  # merged view: predictions are perfect


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
