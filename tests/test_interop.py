"""Reference torch-checkpoint interop: import/export/convert round trips
plus numerical forward parity against a spec-built torch twin of the
reference model (OccupancyMap + UniDirsEmbed, model.py:16-103 /
embedding.py:4-55). The twin is constructed HERE from the documented spec
so the test never imports /root/reference."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from openobj_tpu import interop
from openobj_tpu.models import object_field
from openobj_tpu.utils.geometry import OrientedBox

HIDDEN, CLIP, MAX_DEG = 16, 8, 5
EMB1, EMB2 = 87, 42


def _fc_block(i, o):
    return torch.nn.Sequential(torch.nn.Linear(i, o), torch.nn.ReLU())


class TorchOccupancyMap(torch.nn.Module):
    """Reference OccupancyMap per spec (model.py:16-103): Linear+ReLU
    blocks, skip concat after mid1, x10 alpha, sigmoid color, linear
    clip head; key layout in_layer.0 / mid1.0.0 / cat_layer.0 / ..."""

    def __init__(self, h=HIDDEN, clip=CLIP):
        super().__init__()
        self.in_layer = _fc_block(EMB1, h)
        self.mid1 = torch.nn.Sequential(_fc_block(h, h))
        self.cat_layer = _fc_block(h + EMB1, h)
        self.mid2 = torch.nn.Sequential(_fc_block(h, h))
        self.out_alpha = torch.nn.Linear(h, 1)
        self.color_linear = _fc_block(EMB2 + h, h)
        self.out_color = torch.nn.Linear(h, 3)
        self.clip_linear = _fc_block(EMB2 + h, h)
        self.out_clip = torch.nn.Linear(h, clip)

    def forward(self, x):
        fc1 = self.in_layer(x[..., :EMB1])
        fc2 = self.mid1(fc1)
        fc3 = self.cat_layer(torch.cat((fc2, x[..., :EMB1]), dim=-1))
        fc4 = self.mid2(fc3)
        alpha = self.out_alpha(fc4) * 10.0
        color = torch.sigmoid(
            self.out_color(self.color_linear(
                torch.cat((fc4, x[..., EMB1:]), dim=-1)))
        )
        clip = self.out_clip(self.clip_linear(
            torch.cat((fc4, x[..., EMB1:]), dim=-1)))
        return alpha, color, clip


class TorchUniDirsEmbed(torch.nn.Module):
    """Reference UniDirsEmbed per spec (embedding.py:4-55)."""

    def __init__(self, scale=2.0, max_deg=MAX_DEG):
        super().__init__()
        from openobj_tpu.ops.embedding import ICOSPHERE_DIRS

        self.B_layer = torch.nn.Linear(3, 21, bias=False)
        self.B_layer.weight.data = torch.from_numpy(ICOSPHERE_DIRS.copy())
        bands = 2.0 ** torch.linspace(0, max_deg, max_deg + 1)
        self.register_buffer("frequency_bands", bands, persistent=False)
        self.register_buffer("scale", torch.tensor(scale), persistent=True)

    def forward(self, x):
        t = x / self.scale
        proj = self.B_layer(t)
        xb = (proj[..., None, :]
              * self.frequency_bands[None, None, :, None])
        xb = xb.reshape(list(proj.shape[:-1]) + [-1])
        return torch.cat([t, torch.sin(xb * np.pi)], dim=-1)


def _save_reference_pth(path, fc, pe, obj_id=7, with_bbox=True):
    """torch.save with the reference's exact dict layout; the bbox is an
    instance of a class from a module that does NOT exist on this side
    (exercises the tolerant unpickler), created by registering a fake
    module during pickling only."""
    import types as _types

    bbox = None
    if with_bbox:
        fake = _types.ModuleType("objnerf_fake_utils")

        class BoundingBox:  # the reference's custom bbox class
            pass

        BoundingBox.__module__ = "objnerf_fake_utils"
        BoundingBox.__qualname__ = "BoundingBox"
        fake.BoundingBox = BoundingBox
        sys.modules["objnerf_fake_utils"] = fake
        bbox = BoundingBox()
        bbox.center = np.array([0.1, 0.2, 0.3])
        bbox.R = np.eye(3)
        bbox.extent = np.array([1.0, 2.0, 0.5])
    try:
        torch.save(
            {
                "epoch": 3,
                "FC_state_dict": fc.state_dict(),
                "PE_state_dict": pe.state_dict(),
                "obj_id": obj_id,
                "bbox": bbox,
                "obj_scale": float(pe.scale),
                "clip_feat": torch.randn(4, CLIP),
                "caption_feat": torch.randn(4, 5),
                "semantic_id": 12,
            },
            path,
        )
    finally:
        sys.modules.pop("objnerf_fake_utils", None)


def test_import_forward_parity(tmp_path):
    torch.manual_seed(0)
    fc, pe = TorchOccupancyMap(), TorchUniDirsEmbed(scale=2.0)
    p = tmp_path / "obj_7.pth"
    _save_reference_pth(str(p), fc, pe)

    info = interop.import_torch_checkpoint(str(p))
    assert info["obj_id"] == 7
    assert info["hidden"] == HIDDEN
    assert info["clip_size"] == CLIP
    assert info["max_deg"] == MAX_DEG
    assert info["semantic_id"] == 12
    assert info["epoch"] == 3
    assert info["obj_scale"] == pytest.approx(2.0)
    assert info["clip_feats"].shape == (4, CLIP)
    assert isinstance(info["bbox"], OrientedBox)
    np.testing.assert_allclose(info["bbox"].extent, [1.0, 2.0, 0.5])

    pts = np.random.default_rng(1).normal(size=(33, 3)).astype(np.float32)
    with torch.no_grad():
        a_t, c_t, f_t = fc(pe(torch.from_numpy(pts)))
    a_j, c_j, f_j = object_field.field_apply(
        info["params"], pts, max_deg=MAX_DEG
    )
    np.testing.assert_allclose(np.asarray(a_j), a_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_j), f_t.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_export_loads_into_torch_twin(tmp_path):
    import jax

    params = object_field.init_field_params(
        jax.random.PRNGKey(3), hidden=HIDDEN, clip_size=CLIP, scale=5.0
    )
    params = jax.tree.map(np.asarray, params)
    p = tmp_path / "obj_0.pth"
    interop.export_torch_checkpoint(
        str(p), 0, params,
        bbox3d=OrientedBox(np.zeros(3), np.eye(3), np.ones(3)),
        semantic_id=2,
    )
    ck = torch.load(str(p), map_location="cpu", weights_only=False)
    fc, pe = TorchOccupancyMap(), TorchUniDirsEmbed(scale=5.0)
    fc.load_state_dict(ck["FC_state_dict"])   # strict: exact key parity
    pe.load_state_dict(ck["PE_state_dict"])
    assert float(pe.scale) == pytest.approx(5.0)
    assert ck["bbox"].extent.shape == (3,)

    pts = np.random.default_rng(2).normal(size=(17, 3)).astype(np.float32)
    a_j, c_j, f_j = object_field.field_apply(params, pts)
    with torch.no_grad():
        a_t, c_t, f_t = fc(pe(torch.from_numpy(pts)))
    np.testing.assert_allclose(a_t.numpy(), np.asarray(a_j),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(f_t.numpy(), np.asarray(f_j),
                               rtol=1e-4, atol=1e-4)


def test_convert_dir_round_trip(tmp_path):
    torch.manual_seed(1)
    src = tmp_path / "ref_ckpt"
    for oid in (0, 4):
        fc, pe = TorchOccupancyMap(), TorchUniDirsEmbed(
            scale=5.0 if oid == 0 else 2.0
        )
        d = src / str(oid)
        d.mkdir(parents=True)
        _save_reference_pth(str(d / f"obj_{oid}.pth"), fc, pe, obj_id=oid)

    npz_dir = tmp_path / "npz"
    written = interop.convert_checkpoint_dir(str(src), str(npz_dir))
    assert len(written) == 2

    # the converted tree is consumable by our checkpoint loader
    from openobj_tpu.core import checkpoint as ckpt

    info = interop.import_torch_checkpoint(str(src / "4" / "obj_4.pth"))
    loaded = ckpt.load_object_checkpoint(
        str(npz_dir / "4" / "obj_4.npz"), info["params"]
    )
    for k in ("in_layer", "out_clip"):
        np.testing.assert_array_equal(
            np.asarray(loaded["params"]["mlp"][k]["w"]),
            info["params"]["mlp"][k]["w"],
        )
    assert loaded["semantic_id"] == 12
    assert loaded["bbox"] is not None

    # and back out to .pth (reverse) — params survive bit-exactly
    back = tmp_path / "back"
    interop.convert_checkpoint_dir(str(npz_dir), str(back), reverse=True)
    info2 = interop.import_torch_checkpoint(str(back / "4" / "obj_4.pth"))
    np.testing.assert_array_equal(
        info2["params"]["mlp"]["cat_layer"]["w"],
        info["params"]["mlp"]["cat_layer"]["w"],
    )
    assert info2["obj_scale"] == pytest.approx(2.0)


def test_cli(tmp_path, capsys):
    torch.manual_seed(2)
    fc, pe = TorchOccupancyMap(), TorchUniDirsEmbed()
    d = tmp_path / "ckpt" / "5"
    d.mkdir(parents=True)
    _save_reference_pth(str(d / "obj_5.pth"), fc, pe, obj_id=5,
                        with_bbox=False)
    interop.main([str(tmp_path / "ckpt"), str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert "converted 1 object checkpoints" in out
    assert (tmp_path / "out" / "5" / "obj_5.npz").exists()


def test_reference_map_vis_bundle_loads(tmp_path):
    """A reference-written map_vis.pkl.gz (gen_map_vis.py:128-146: trimesh
    mesh objects, RGBA uint8 colors, raw torch feature tensors) loads and
    drives the full serving stack. The mesh class lives in a module that
    doesn't exist at load time (like trimesh here) -> attribute-bag path."""
    import gzip
    import pickle
    import types as _types

    from openobj_tpu.viz import export as viz_export
    from openobj_tpu.viz import query as viz_query
    from openobj_tpu.viz import viewer as viz_viewer

    fake = _types.ModuleType("trimesh_fake")

    class Trimesh:
        pass

    Trimesh.__module__ = "trimesh_fake"
    Trimesh.__qualname__ = "Trimesh"
    fake.Trimesh = Trimesh
    sys.modules["trimesh_fake"] = fake

    rng = np.random.default_rng(0)
    bundle = {}
    try:
        for oid in (4, 5):
            mesh = Trimesh()
            mesh.vertices = rng.normal(size=(12, 3))
            mesh.faces = rng.integers(0, 12, (8, 3))
            bundle[oid] = {
                "mesh": mesh,
                "color": rng.integers(0, 255, (12, 4)).astype(np.uint8),
                "part_feat": torch.randn(12, 6),
                "clip_feat": torch.randn(3, 6),      # stacked per-keyframe
                "caption_feat": torch.randn(3, 5),
                "class_id": torch.tensor(9) if oid == 4 else 9,
            }
        p = tmp_path / "map_vis.pkl.gz"
        with gzip.open(p, "wb") as f:
            pickle.dump(bundle, f)
    finally:
        sys.modules.pop("trimesh_fake", None)

    loaded = viz_export.load_map_bundle(str(p))
    for oid in (4, 5):
        e = loaded[oid]
        assert e["mesh"]["vertices"].shape == (12, 3)
        assert e["mesh"]["faces"].dtype == np.uint32
        assert e["color"].shape == (12, 3) and e["color"].dtype == np.uint8
        assert e["clip_feat"].shape == (3, 6)
        assert isinstance(e["part_feat"], np.ndarray)
        assert e["class_id"] == 9

    # full serve path on the normalized bundle: query + colorings + HTML
    def enc6(texts):
        return np.asarray(
            [np.sin(np.arange(6) + len(t)) for t in texts], np.float32)

    def enc5(texts):
        return np.asarray(
            [np.cos(np.arange(5) + len(t)) for t in texts], np.float32)

    scores = viz_query.query_objects("a chair", loaded, enc6, enc5)
    assert set(scores) == {4, 5}
    colorings = viz_viewer.bundle_colorings(loaded)
    assert colorings["rgb"][4].shape == (12, 3)
    html = tmp_path / "v.html"
    viz_viewer.build_html(loaded, str(html),
                          colorings={"query": viz_viewer.bake_object_query(
                              loaded, scores)}, scores=scores)
    assert html.stat().st_size > 1000


def test_bundle_mesh_without_vertices_raises(tmp_path):
    import gzip
    import pickle

    from openobj_tpu.viz import export as viz_export

    with gzip.open(tmp_path / "b.pkl.gz", "wb") as f:
        pickle.dump({1: {"mesh": object()}}, f)
    with pytest.raises(ValueError, match="vertices"):
        viz_export.load_map_bundle(str(tmp_path / "b.pkl.gz"))


def test_export_from_reference_pth_tree(tmp_path):
    """viz.export.export_from_checkpoints on a raw reference .pth tree:
    auto-converts and meshes (the gen_map_vis.py migration one-liner)."""
    import jax

    from openobj_tpu.utils.geometry import OrientedBox
    from openobj_tpu.viz import export as viz_export

    params = object_field.init_field_params(
        jax.random.PRNGKey(5), hidden=HIDDEN, clip_size=CLIP, scale=2.0
    )
    d = tmp_path / "ckpt" / "4"
    d.mkdir(parents=True)
    interop.export_torch_checkpoint(
        str(d / "obj_4.pth"), 4, jax.tree.map(np.asarray, params),
        bbox3d=OrientedBox(np.zeros(3), np.eye(3), np.ones(3) * 0.4),
        clip_feats=np.random.default_rng(0).normal(
            size=(2, CLIP)).astype(np.float32),
        caption_feats=np.random.default_rng(1).normal(
            size=(2, 5)).astype(np.float32),
        semantic_id=3,
    )
    bundle = viz_export.export_from_checkpoints(
        str(tmp_path / "ckpt"), str(tmp_path / "map.pkl.gz"),
        hidden=HIDDEN, clip_size=CLIP, grid_dim=16,
    )
    # random-init fields may produce no level-0.5 surface; the contract
    # here is the conversion path + a loadable bundle file
    loaded = viz_export.load_map_bundle(str(tmp_path / "map.pkl.gz"))
    assert set(loaded) == set(bundle)
    for e in loaded.values():
        assert e["mesh"]["vertices"].shape[1] == 3
        assert e["class_id"] == 3
