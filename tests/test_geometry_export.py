"""Geometry, meshing, rendering-to-image, and checkpoint tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openobj_tpu.core import checkpoint, meshing, renderer
from openobj_tpu.models import object_field
from openobj_tpu.ops import marching
from openobj_tpu.utils import geometry


class TestOrientedBounds:
    def test_axis_aligned_box(self, rng):
        pts = rng.uniform(-1, 1, (500, 3)) * np.array([2.0, 1.0, 0.5])
        obb = geometry.oriented_bounds(pts)
        assert obb.volume <= 4.0 * 2.0 * 1.0 * 1.05
        assert obb.contains(pts).all()

    def test_rotated_box_recovered(self, rng):
        ang = 0.7
        r = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]]
        )
        pts = rng.uniform(-1, 1, (800, 3)) * np.array([3.0, 0.5, 0.2])
        pts = pts @ r.T + np.array([5.0, -2.0, 1.0])
        obb = geometry.oriented_bounds(pts)
        # min-volume OBB must be close to the generating box volume
        assert obb.volume <= 6.0 * 1.0 * 0.4 * 1.10
        assert obb.contains(pts).all()
        np.testing.assert_allclose(obb.center, [5.0, -2.0, 1.0], atol=0.1)

    def test_degenerate_raises(self):
        pts = np.zeros((10, 3))  # all identical -> Qhull failure path
        with pytest.raises(Exception):
            geometry.oriented_bounds(pts)

    def test_min_extent_floor(self, rng):
        pts = rng.uniform(-1, 1, (100, 3)) * np.array([1.0, 1.0, 0.001])
        obb = geometry.oriented_bounds(pts, min_extent=0.10)
        assert obb.extent.min() >= 0.10


class TestBackprojection:
    def test_roundtrip(self):
        h, w = 24, 32
        fx = fy = 20.0
        cx, cy = 16.0, 12.0
        depth = np.full((h, w), 2.0, np.float32)
        pts = geometry.backproject_depth(depth, fx, fy, cx, cy)
        assert pts.shape == (h * w, 3)
        np.testing.assert_allclose(pts[:, 2], 2.0)
        # center pixel maps to the optical axis
        center = pts.reshape(h, w, 3)[12, 16]
        np.testing.assert_allclose(center[:2], [0, 0], atol=1e-6)

    def test_mask_and_invalid(self):
        depth = np.array([[1.0, 0.0], [2.0, 3.0]], np.float32)
        mask = np.array([[1, 1], [0, 1]], bool)
        pts = geometry.backproject_depth(depth, 1, 1, 0, 0, mask=mask)
        assert len(pts) == 2  # invalid-depth and masked-out pixels dropped

    def test_world_transform(self):
        depth = np.ones((2, 2), np.float32)
        t = np.eye(4)
        t[:3, 3] = [10, 0, 0]
        pts = geometry.backproject_depth(depth, 1, 1, 0, 0, t_wc=t)
        assert (pts[:, 0] >= 10).all()


class TestVoxelDownsample:
    def test_merges(self):
        pts = np.array([[0.0, 0, 0], [0.001, 0, 0], [1.0, 1, 1]])
        out = geometry.voxel_downsample(pts, 0.1)
        assert len(out) == 2


class TestMarchingTetrahedra:
    def test_sphere_radius_and_watertight(self):
        n = 32
        t = np.linspace(-1, 1, n)
        g = np.stack(np.meshgrid(t, t, t, indexing="ij"), -1)
        r = np.linalg.norm(g, axis=-1)
        occ = 1.0 / (1.0 + np.exp(40 * (r - 0.6)))
        verts, faces = marching.marching_tetrahedra(occ, 0.5)
        w = verts * 2 - 1
        rr = np.linalg.norm(w, axis=-1)
        assert abs(rr.mean() - 0.6) < 0.01
        edges = np.sort(
            np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]),
            axis=1,
        )
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all()  # watertight

    def test_empty_surface(self):
        assert marching.marching_tetrahedra(np.zeros((8, 8, 8)), 0.5) is None
        assert marching.marching_tetrahedra(np.ones((8, 8, 8)), 0.5) is None


def _sphere_field_params(key, radius=0.5, color=(0.9, 0.1, 0.2)):
    """Train a tiny field to a sphere analytically — cheap direct supervision
    on occupancy/color at random points."""
    import optax  # available in env; quick fit for test fixtures

    params = object_field.init_field_params(key, hidden=32, clip_size=4, scale=2.0)
    opt = optax.adam(3e-3)
    ost = opt.init(params)
    col = jnp.asarray(color)

    @jax.jit
    def step(p, o, k):
        pts = jax.random.uniform(k, (4096, 3), minval=-1.0, maxval=1.0)
        r = jnp.linalg.norm(pts, axis=-1)
        target_occ = (r < radius).astype(jnp.float32)

        def loss(p):
            a, c, _ = object_field.field_apply(p, pts, do_clip=False)
            occ = jax.nn.sigmoid(a[..., 0])
            lo = ((occ - target_occ) ** 2).mean()
            lc = ((c - col) ** 2).mean()
            return lo + lc

        l, g = jax.value_and_grad(loss)(p)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, l

    k = key
    for _ in range(300):
        k, sk = jax.random.split(k)
        params, ost, l = step(params, ost, sk)
    return params


class TestMeshing:
    def test_mesh_object_world_coords(self, key):
        params = _sphere_field_params(key)
        obb = geometry.OrientedBox(
            center=np.zeros(3), r=np.eye(3), extent=np.array([1.4, 1.4, 1.4])
        )
        mesh = meshing.mesh_object(
            params, obb, np.zeros(3), grid_dim=48, with_color=True
        )
        assert mesh is not None
        rr = np.linalg.norm(mesh.vertices, axis=-1)
        assert abs(rr.mean() - 0.5) < 0.05, rr.mean()
        assert mesh.vertex_colors is not None
        # dominant channel red
        assert mesh.vertex_colors[:, 0].mean() > 150

    def test_obj_center_offset(self, key):
        """A field trained object-centered must mesh back at the world
        position when obj_center is supplied."""
        params = _sphere_field_params(key)
        center = np.array([3.0, 1.0, 0.0], np.float32)
        obb = geometry.OrientedBox(
            center=center.astype(np.float64), r=np.eye(3),
            extent=np.array([1.4, 1.4, 1.4]),
        )
        mesh = meshing.mesh_object(
            params, obb, center, grid_dim=40, with_color=False
        )
        assert mesh is not None
        np.testing.assert_allclose(mesh.vertices.mean(0), center, atol=0.1)

    def test_empty_field_returns_none(self, key):
        params = object_field.init_field_params(key, hidden=8, clip_size=4)
        # a fresh field is ~0.5 occupancy everywhere... force alpha very low
        params["mlp"]["out_alpha"]["b"] = params["mlp"]["out_alpha"]["b"] - 100.0
        obb = geometry.OrientedBox(np.zeros(3), np.eye(3), np.ones(3))
        assert meshing.mesh_object(params, obb, np.zeros(3), grid_dim=16) is None

    def test_coarse_to_fine_exact_on_sphere(self, key):
        """Empty-space skipping reproduces the full evaluation's mesh bit-
        for-bit on a compact (trained sphere) field: every level crossing
        happens in an active block, and active blocks are evaluated at full
        resolution."""
        params = _sphere_field_params(key)
        obb = geometry.OrientedBox(np.zeros(3), np.eye(3), np.array([1.4] * 3))
        m1 = meshing.mesh_object(
            params, obb, np.zeros(3), grid_dim=48, with_color=False
        )
        m2 = meshing.mesh_object(
            params, obb, np.zeros(3), grid_dim=48, with_color=False,
            coarse_to_fine=True, block=8,
        )
        assert m1 is not None and m2 is not None
        assert len(m1.vertices) == len(m2.vertices)
        np.testing.assert_allclose(m1.vertices, m2.vertices, atol=1e-5)
        np.testing.assert_array_equal(m1.faces, m2.faces)

    def test_coarse_to_fine_sign_agreement_random_field(self, key):
        """On a non-compact random field (surface everywhere — the adverse
        case), the occupancy sign still agrees voxel-for-voxel."""
        params = object_field.init_field_params(key, hidden=16, clip_size=4)
        params["mlp"]["out_alpha"]["w"] = params["mlp"]["out_alpha"]["w"] * 30.0
        scale = np.ones(3, np.float32)
        tr = np.eye(4, dtype=np.float32)
        o1 = meshing.eval_grid_occupancy(params, scale, tr, np.zeros(3), 32)
        o2 = meshing.eval_grid_occupancy(
            params, scale, tr, np.zeros(3), 32, coarse_to_fine=True, block=8
        )
        assert ((o1 > 0.5) == (o2 > 0.5)).all()

    def test_coarse_to_fine_empty_field(self, key):
        params = object_field.init_field_params(key, hidden=8, clip_size=4)
        params["mlp"]["out_alpha"]["b"] = params["mlp"]["out_alpha"]["b"] - 100.0
        occ = meshing.eval_grid_occupancy(
            params, np.ones(3, np.float32), np.eye(4, dtype=np.float32),
            np.zeros(3), 32, coarse_to_fine=True, block=8,
        )
        assert (occ == 0.0).all()

    def test_coarse_to_fine_indivisible_falls_back(self, key):
        """grid_dim not divisible by block -> silently uses the exact full
        path."""
        params = _sphere_field_params(key)
        scale = np.full(3, 1.4 / 1.8, np.float32)
        tr = np.eye(4, dtype=np.float32)
        o1 = meshing.eval_grid_occupancy(params, scale, tr, np.zeros(3), 30)
        o2 = meshing.eval_grid_occupancy(
            params, scale, tr, np.zeros(3), 30, coarse_to_fine=True, block=8
        )
        np.testing.assert_array_equal(o1, o2)

    def test_export_roundtrip(self, key, tmp_path):
        params = _sphere_field_params(key)
        obb = geometry.OrientedBox(np.zeros(3), np.eye(3), np.array([1.4] * 3))
        mesh = meshing.mesh_object(params, obb, np.zeros(3), grid_dim=32)
        p_obj = str(tmp_path / "m.obj")
        p_ply = str(tmp_path / "m.ply")
        mesh.export_obj(p_obj)
        mesh.export_ply(p_ply)
        assert os.path.getsize(p_obj) > 100
        assert os.path.getsize(p_ply) > 100
        # obj has V vertex lines and F face lines
        txt = open(p_obj).read().splitlines()
        assert sum(1 for l in txt if l.startswith("v ")) == len(mesh.vertices)
        assert sum(1 for l in txt if l.startswith("f ")) == len(mesh.faces)


class TestRenderer:
    def test_render_object_view_sphere(self, key):
        params = _sphere_field_params(key)
        obb = geometry.OrientedBox(np.zeros(3), np.eye(3), np.array([1.2] * 3))
        t_wc = np.eye(4)
        t_wc[:3, 3] = [0, 0, -2.5]  # camera looking +z at the sphere
        from openobj_tpu.ops.sampling import camera_ray_dirs
        dirs = camera_ray_dirs(32, 24, 30.0, 30.0, 16.0, 12.0)
        out = renderer.render_object_view(
            params, obb, np.zeros(3), t_wc, dirs, key, n_bins=64, chunk_size=256
        )
        assert out["hit"].shape == (24, 32)
        center_hit = out["hit"][10:14, 14:18]
        assert center_hit.any()
        d = out["depth"][12, 16]
        assert abs(d - 2.0) < 0.1, d  # sphere front face at z = -0.5

    def test_composite_zbuffer(self):
        h, w = 4, 4
        mk = lambda depth, col: {
            "hit": np.ones((h, w), bool),
            "depth": np.full((h, w), depth, np.float32),
            "color": np.full((h, w, 3), col, np.float32),
        }
        views = {4: mk(2.0, 0.5), 5: mk(1.0, 1.0)}
        out = renderer.composite_views(views, {4: 7, 5: 9}, h, w)
        assert (out["rgb"] == 255).all()       # nearer object wins
        assert (out["maskid"] == 9).all()
        assert (out["instid"] == 5).all()

    def test_composite_bg_never_occludes(self):
        h, w = 2, 2
        views = {
            0: {"hit": np.ones((h, w), bool), "depth": np.full((h, w), 0.5, np.float32),
                "color": np.zeros((h, w, 3), np.float32)},
            4: {"hit": np.ones((h, w), bool), "depth": np.full((h, w), 2.0, np.float32),
                "color": np.ones((h, w, 3), np.float32)},
        }
        out = renderer.composite_views(views, {0: 1, 4: 7}, h, w, bg_ids=(0,))
        # bg painted first but excluded from depth buffer -> obj 4 overwrites
        assert (out["instid"] == 4).all()


class TestCheckpoint:
    def test_object_roundtrip(self, key, tmp_path):
        params = object_field.init_field_params(key, hidden=16, clip_size=4)
        obb = geometry.OrientedBox(np.ones(3), np.eye(3), np.array([1.0, 2.0, 3.0]))
        p = str(tmp_path / "obj_4.npz")
        checkpoint.save_object_checkpoint(
            p, 4, params, obj_scale=2.0, bbox3d=obb,
            clip_feats=np.ones((3, 4), np.float32), semantic_id=11,
        )
        tmpl = object_field.init_field_params(jax.random.PRNGKey(9), hidden=16, clip_size=4)
        out = checkpoint.load_object_checkpoint(p, tmpl)
        assert out["obj_id"] == 4 and out["semantic_id"] == 11
        np.testing.assert_allclose(out["bbox"].extent, [1.0, 2.0, 3.0])
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(out["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_scene_roundtrip(self, tmp_path):
        from openobj_tpu.core import trainer as T
        from openobj_tpu.core.scene import Camera, SceneMapper
        from openobj_tpu.data import synthetic

        cfg = T.TrainConfig(
            n_iters_per_frame=2, win_size=2, n_samples_per_frame=8,
            win_size_bg=2, n_samples_per_frame_bg=8,
            hidden=16, hidden_bg=16, clip_size=4,
        )
        cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
        scene = synthetic.default_scene(n_spheres=1)
        m1 = SceneMapper(cam, cfg, frame_capacity=8, initial_bucket=4)
        dirs = np.asarray(cam.ray_dirs())
        for rgb, depth, inst, t_wc in synthetic.make_sequence(scene, dirs, 3):
            m1.process_frame(rgb, depth, inst, t_wc)
        checkpoint.save_scene(str(tmp_path), m1)

        m2 = SceneMapper(cam, cfg, frame_capacity=8, initial_bucket=4)
        checkpoint.load_scene(str(tmp_path), m2)
        assert m2.n_objects == m1.n_objects
        for a, b in zip(
            jax.tree.leaves(m1.state.fg_params), jax.tree.leaves(m2.state.fg_params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert m2.registry.inst_to_slot == m1.registry.inst_to_slot

    def test_scene_sharded_roundtrip(self, tmp_path):
        """orbax snapshot from an object-sharded mapper restores DIRECTLY
        into another mesh placement: values bit-equal, shards on the mesh."""
        from openobj_tpu.core import trainer as T
        from openobj_tpu.core.scene import Camera, SceneMapper
        from openobj_tpu.data import synthetic
        from openobj_tpu.parallel import sharding

        if len(jax.devices()) < 4:
            pytest.skip("needs virtual devices")
        cfg = T.TrainConfig(
            n_iters_per_frame=2, win_size=2, n_samples_per_frame=8,
            win_size_bg=2, n_samples_per_frame_bg=8,
            hidden=16, hidden_bg=16, clip_size=4,
        )
        cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
        scene = synthetic.default_scene(n_spheres=1)
        m1 = SceneMapper(cam, cfg, frame_capacity=8, initial_bucket=4)
        dirs = np.asarray(cam.ray_dirs())
        for rgb, depth, inst, t_wc in synthetic.make_sequence(scene, dirs, 3):
            m1.process_frame(rgb, depth, inst, t_wc)

        mesh = sharding.make_mesh(jax.devices()[:4], ("object",))
        m1.state, _ = sharding.shard_scene(mesh, m1.state, {})
        checkpoint.save_scene_sharded(str(tmp_path / "snap"), m1)

        m2 = SceneMapper(cam, cfg, frame_capacity=8, initial_bucket=4)
        m2.state, _ = sharding.shard_scene(mesh, m2.state, {})
        checkpoint.load_scene_sharded(str(tmp_path / "snap"), m2)
        assert m2.n_objects == m1.n_objects
        assert m2.registry.inst_to_slot == m1.registry.inst_to_slot
        for a, b in zip(
            jax.tree.leaves(m1.state.fg_params), jax.tree.leaves(m2.state.fg_params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored leaves carry the mesh sharding (no host-resident fallback)
        leaf = jax.tree.leaves(m2.state.fg_params)[0]
        assert len(leaf.sharding.device_set) == 4

    def test_restore_into_larger_bucket_rejected(self, tmp_path):
        """A mapper whose bucket already outgrew the snapshot cannot
        restore (shrinking buckets is not supported) — clear error, not a
        negative-shape crash."""
        from openobj_tpu.core import trainer as T
        from openobj_tpu.core.scene import Camera, SceneMapper
        from openobj_tpu.data import synthetic

        cfg = T.TrainConfig(
            n_iters_per_frame=2, win_size=2, n_samples_per_frame=8,
            win_size_bg=2, n_samples_per_frame_bg=8,
            hidden=16, hidden_bg=16, clip_size=4,
        )
        cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
        scene = synthetic.default_scene(n_spheres=1)
        m1 = SceneMapper(cam, cfg, frame_capacity=8, initial_bucket=4)
        dirs = np.asarray(cam.ray_dirs())
        for rgb, depth, inst, t_wc in synthetic.make_sequence(scene, dirs, 2):
            m1.process_frame(rgb, depth, inst, t_wc)
        checkpoint.save_scene(str(tmp_path), m1)
        m2 = SceneMapper(cam, cfg, frame_capacity=8, initial_bucket=8)
        with pytest.raises(ValueError, match="initial_bucket"):
            checkpoint.load_scene(str(tmp_path), m2)

    def test_sharded_snapshot_into_unsharded_mapper(self, tmp_path):
        """The same snapshot restores into a plain single-device mapper."""
        from openobj_tpu.core import trainer as T
        from openobj_tpu.core.scene import Camera, SceneMapper
        from openobj_tpu.data import synthetic

        cfg = T.TrainConfig(
            n_iters_per_frame=2, win_size=2, n_samples_per_frame=8,
            win_size_bg=2, n_samples_per_frame_bg=8,
            hidden=16, hidden_bg=16, clip_size=4,
        )
        cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
        scene = synthetic.default_scene(n_spheres=1)
        m1 = SceneMapper(cam, cfg, frame_capacity=8, initial_bucket=4)
        dirs = np.asarray(cam.ray_dirs())
        for rgb, depth, inst, t_wc in synthetic.make_sequence(scene, dirs, 3):
            m1.process_frame(rgb, depth, inst, t_wc)
        checkpoint.save_scene_sharded(str(tmp_path / "snap"), m1)

        m2 = SceneMapper(cam, cfg, frame_capacity=8, initial_bucket=4)
        checkpoint.load_scene_sharded(str(tmp_path / "snap"), m2)
        for a, b in zip(
            jax.tree.leaves(m1.state.fg_params), jax.tree.leaves(m2.state.fg_params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
