"""Runtime tests: frame store, keyframe policy, optimizer slots, and the
end-to-end jitted per-frame trainer on a synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openobj_tpu.core import optim, trainer
from openobj_tpu.core.frame_store import append_frame, init_frame_store
from openobj_tpu.core.registry import ObjectRegistry
from openobj_tpu.core.scene import Camera, SceneMapper
from openobj_tpu.data import synthetic
from openobj_tpu.data.transforms import instance_bboxes, scale_depth
from openobj_tpu.models import object_field
from openobj_tpu.ops import rendering


class TestTransforms:
    def test_scale_depth(self):
        d = np.array([[1000, 9000], [0, 4000]], np.uint16)
        out = scale_depth(d, 1e-3, 8.0)
        np.testing.assert_allclose(out, [[1.0, 0.0], [0.0, 4.0]])

    def test_instance_bboxes(self):
        inst = np.zeros((40, 60), np.int32)
        inst[10:25, 20:40] = 5      # 15x20 object
        inst[0:3, 0:3] = 7          # too small -> dropped
        inst[30:32, :] = -1         # unknown strip
        bb = instance_bboxes(inst, enlarge=1.0, min_side=10)
        assert bb[0] == (0, 40, 0, 60)          # bg = full frame
        assert bb[5] == (10, 25, 20, 40)
        assert 7 not in bb and -1 not in bb

    def test_bbox_enlarge(self):
        inst = np.zeros((100, 100), np.int32)
        inst[40:60, 40:60] = 4
        bb = instance_bboxes(inst, enlarge=1.2, min_side=10)[4]
        assert bb[0] <= 38 and bb[1] >= 62  # grew ~x1.2 about center


class TestFrameStore:
    def test_append_and_capacity(self):
        s = init_frame_store(2, 8, 10)
        rgb = np.full((8, 10, 3), 7, np.uint8)
        depth = np.ones((8, 10), np.float32)
        inst = np.zeros((8, 10), np.int32)
        s, i0 = append_frame(s, rgb, depth, inst, np.eye(4))
        s, i1 = append_frame(s, rgb * 2, depth, inst, np.eye(4))
        assert (i0, i1) == (0, 1)
        assert int(s.rgb[1, 0, 0, 0]) == 14
        with pytest.raises(ValueError):
            append_frame(s, rgb, depth, inst, np.eye(4))

    def test_hazard_bit_patterns_roundtrip(self):
        """The packed carrier is uint32 BECAUSE these patterns are NaN
        payloads under a float32 carrier (inst=-1 is 0xFFFFFFFF; 0xFF RGB
        bytes form sNaN/qNaN payloads) and XLA makes no guarantee about
        NaN payload preservation through stack/gather/dynamic-update.
        Round-trip every hazard class bit-exactly, through BOTH the full
        decode views and the trainer's random-pixel gather path."""
        import jax as _jax
        from openobj_tpu.core import frame_store as FS

        h, w = 4, 6
        rgb = np.full((h, w, 3), 0xFF, np.uint8)      # all-ones bytes
        rgb[0, 0] = [0, 0, 0]
        rgb[1, 1] = [0x7F, 0xC0, 0xFF]               # qNaN-ish pattern
        depth = np.full((h, w), np.nan, np.float32)   # worst-case depth
        depth[0, :] = 1.5
        inst = np.full((h, w), -1, np.int32)          # 0xFFFFFFFF
        inst[2, :] = np.int32(0x7F800001)             # sNaN payload as id
        s = init_frame_store(1, h, w)
        s, _ = append_frame(s, rgb, depth, inst, np.eye(4))
        assert s.packed.dtype == jnp.uint32
        np.testing.assert_array_equal(np.asarray(s.rgb[0]), rgb)
        np.testing.assert_array_equal(np.asarray(s.inst[0]), inst)
        np.testing.assert_array_equal(
            np.asarray(s.depth[0]).view(np.uint32),
            depth.view(np.uint32),
        )
        # the trainer's flat row-gather (jnp.take over the planes)
        lin = jnp.arange(h * w)
        px = _jax.jit(
            lambda p: jnp.take(p.reshape(3, -1), lin, axis=1)
        )(s.packed)
        np.testing.assert_array_equal(
            np.asarray(FS.unpack_inst(px)).reshape(h, w), inst
        )
        np.testing.assert_array_equal(
            np.asarray(FS.unpack_rgb(px)).reshape(h, w, 3), rgb
        )

    def test_partfeat_store(self):
        """Default int8 store keeps unit-DIRECTION exactly (the cosine loss
        normalizes, so only the direction matters — frame_store docstring)."""
        s = init_frame_store(2, 10, 10, part_feat_dim=16, part_down=5)
        assert s.partfeat.shape == (2, 2, 2, 16)
        assert s.partfeat.dtype == jnp.int8
        pf = np.ones((2, 2, 16), np.float32) * 3.0  # scale must not matter
        s, _ = append_frame(
            s, np.zeros((10, 10, 3), np.uint8), np.zeros((10, 10), np.float32),
            np.zeros((10, 10), np.int32), np.eye(4), partfeat=pf,
        )
        got = np.asarray(s.partfeat[0], np.float32)
        got = got / np.linalg.norm(got, axis=-1, keepdims=True)
        np.testing.assert_allclose(got, 1.0 / 4.0, atol=1e-2)  # unit 16-vec

    def test_partfeat_store_bf16_option(self):
        s = init_frame_store(
            2, 10, 10, part_feat_dim=16, part_down=5, part_dtype="bf16"
        )
        assert s.partfeat.dtype == jnp.bfloat16
        pf = np.ones((2, 2, 16), np.float32)
        s, _ = append_frame(
            s, np.zeros((10, 10, 3), np.uint8), np.zeros((10, 10), np.float32),
            np.zeros((10, 10), np.int32), np.eye(4), partfeat=pf,
        )
        assert float(s.partfeat[0].astype(jnp.float32).sum()) == 64.0


class TestFrameEviction:
    """Long sequences train in CONSTANT device memory: when the store fills,
    SceneMapper recycles slots no keyframe ring references (the reference's
    analog: fixed 20-slot per-object buffers with random pruning,
    vmap.py:187-257)."""

    def _run_stream(self, n_frames, capacity, K=4, step=2):
        cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
        cfg = trainer.TrainConfig(
            n_iters_per_frame=4, win_size=2, n_samples_per_frame=8,
            win_size_bg=2, n_samples_per_frame_bg=16,
            hidden=16, hidden_bg=16, clip_size=4,
        )
        m = SceneMapper(cam, cfg, frame_capacity=capacity, initial_bucket=4,
                        keyframe_buffer_size=K, keyframe_step=step,
                        keyframe_step_bg=step)
        scene = synthetic.default_scene(n_spheres=1)
        dirs = np.asarray(cam.ray_dirs())
        poses = []
        for rgb, depth, inst, t_wc in synthetic.make_sequence(
            scene, dirs, n_frames
        ):
            m.process_frame(rgb, depth, inst, t_wc)
            poses.append(t_wc)
        m.finish()
        return m, poses

    def test_long_stream_constant_memory(self):
        n_frames, capacity = 24, 8
        m, poses = self._run_stream(n_frames, capacity)
        assert m.store.capacity == capacity          # never grew
        assert len(m.frame_slots) == n_frames
        assert max(m.frame_slots) < capacity         # slots recycled
        assert len(set(m.frame_slots)) <= capacity
        assert all(np.isfinite(v) for v in m.loss_history)
        # store content = last temporal frame written at each slot
        last_at = {}
        for i, s in enumerate(m.frame_slots):
            last_at[s] = i
        for s, i in last_at.items():
            np.testing.assert_allclose(
                np.asarray(m.store.t_wc[s]), poses[i], atol=1e-6
            )

    def test_rings_never_reference_recycled_slots(self):
        """Sampling parity under eviction: every keyframe-ring entry must
        point at a store slot whose CURRENT occupant is the temporal frame
        the ring intended when the entry was written (an evicted-under-the-
        ring slot would silently train on wrong pixels)."""
        n_frames, capacity, K = 30, 8, 4
        cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
        cfg = trainer.TrainConfig(
            n_iters_per_frame=4, win_size=2, n_samples_per_frame=8,
            win_size_bg=2, n_samples_per_frame_bg=16,
            hidden=16, hidden_bg=16, clip_size=4,
        )
        m = SceneMapper(cam, cfg, frame_capacity=capacity, initial_bucket=4,
                        keyframe_buffer_size=K, keyframe_step=3,
                        keyframe_step_bg=3)
        scene = synthetic.default_scene(n_spheres=1)
        dirs = np.asarray(cam.ray_dirs())
        r = m.registry
        intent = {}      # (ring row id, entry) -> temporal frame intended
        bg_intent = {}
        for i, (rgb, depth, inst, t_wc) in enumerate(
            synthetic.make_sequence(scene, dirs, n_frames)
        ):
            prev = r.kf_frames.copy()
            prev_bg = r.bg_kf_frames.copy()
            m.process_frame(rgb, depth, inst, t_wc)
            for slot, e in zip(*np.nonzero(prev != r.kf_frames)):
                intent[(int(slot), int(e))] = i
            for (e,) in zip(*[np.nonzero(prev_bg != r.bg_kf_frames)[0]]):
                bg_intent[int(e)] = i
        m.finish()
        last_at = {}
        for i, s in enumerate(m.frame_slots):
            last_at[s] = i
        # unwritten entries hold store slot 0 with implied temporal 0; slot
        # 0 is pinned by those references, so intent defaults to 0
        for slot in r.slots:
            for e in range(K):
                fs = int(r.kf_frames[slot, e])
                assert last_at.get(fs, 0) == intent.get((slot, e), 0), (
                    slot, e, fs
                )
        for e in range(K):
            fs = int(r.bg_kf_frames[e])
            assert last_at.get(fs, 0) == bg_intent.get(e, 0), (e, fs)

    def test_exhaustion_raises(self):
        """All slots referenced -> clear error, not silent corruption."""
        with pytest.raises(RuntimeError, match="frame store exhausted"):
            self._run_stream(20, capacity=2, K=6, step=1)

    def test_checkpoint_replay_reproduces_store(self, tmp_path):
        """save_scene records frame_slots; replaying appends at those slots
        reproduces the final (evicted) store bit-exactly — the resume
        contract in train.py."""
        from openobj_tpu.core.checkpoint import load_scene, save_scene

        n_frames, capacity = 20, 6
        m, poses = self._run_stream(n_frames, capacity)
        save_scene(str(tmp_path), m)

        cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
        m2 = SceneMapper(cam, m.cfg, frame_capacity=capacity, initial_bucket=4,
                         keyframe_buffer_size=4, keyframe_step=2,
                         keyframe_step_bg=2)
        load_scene(str(tmp_path), m2)
        assert m2.frame_slots == m.frame_slots
        scene = synthetic.default_scene(n_spheres=1)
        dirs = np.asarray(cam.ray_dirs())
        for i, (rgb, depth, inst, t_wc) in enumerate(
            synthetic.make_sequence(scene, dirs, n_frames)
        ):
            m2.store, _ = append_frame(
                m2.store, rgb, depth, inst, t_wc, at=m2.frame_slots[i]
            )
        np.testing.assert_array_equal(
            np.asarray(m2.store.packed), np.asarray(m.store.packed)
        )

    def test_restore_rebuilds_smaller_store(self, tmp_path):
        """Resuming with a smaller --frame-capacity than the run was trained
        with must not die mid-replay: load_scene rebuilds the store at the
        snapshot's recorded capacity."""
        from openobj_tpu.core.checkpoint import load_scene, save_scene

        n_frames, capacity = 20, 6
        m, poses = self._run_stream(n_frames, capacity)
        save_scene(str(tmp_path), m)

        cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
        m2 = SceneMapper(cam, m.cfg, frame_capacity=3, initial_bucket=4,
                         keyframe_buffer_size=4, keyframe_step=2,
                         keyframe_step_bg=2)
        load_scene(str(tmp_path), m2)
        assert m2.store.capacity == capacity
        scene = synthetic.default_scene(n_spheres=1)
        dirs = np.asarray(cam.ray_dirs())
        for i, (rgb, depth, inst, t_wc) in enumerate(
            synthetic.make_sequence(scene, dirs, n_frames)
        ):
            m2.store, _ = append_frame(
                m2.store, rgb, depth, inst, t_wc, at=m2.frame_slots[i]
            )
        np.testing.assert_array_equal(
            np.asarray(m2.store.packed), np.asarray(m.store.packed)
        )


class TestRegistryPolicy:
    def _mk(self, K=5, step=2):
        return ObjectRegistry(
            max_objects=8, keyframe_buffer_size=K,
            keyframe_step=step, keyframe_step_bg=step, do_bg=True,
        )

    def test_first_observation_is_keyframe(self):
        r = self._mk()
        slot = r.observe_object(4, frame_idx=0, bbox=(0, 4, 0, 4))
        assert slot == 0 and r.n_kf[0] == 1
        assert r.kf_frames[0, 0] == 0

    def test_nonkeyframe_overwrites_newest(self):
        r = self._mk(step=3)
        r.observe_object(4, 0, (0, 4, 0, 4))   # kf slot0 (first)
        r.observe_object(4, 1, (0, 4, 0, 4))   # frame_cnt=0 -> kf, appends slot1
        r.observe_object(4, 2, (0, 4, 0, 4))   # cnt=1, n_kf=2 -> not kf, overwrite slot1
        st = r.slots[0]
        assert st.n_kf == 2
        assert r.kf_frames[0, 1] == 2           # overwritten in place

    def test_buffer_full_prunes_random_not_latest(self):
        r = self._mk(K=4, step=1)  # every frame a keyframe
        for f in range(10):
            r.observe_object(4, f, (0, 4, 0, 4))
        st = r.slots[0]
        assert st.n_kf == 3  # stays at K-1
        # latest2 entries always valid slot indices
        assert set(r.latest2[0]) <= set(range(4))

    def test_bg_separate(self):
        r = self._mk()
        s = r.observe_object(0, 0, (0, 4, 0, 4))
        assert s == -1 and r.n_objects == 0 and r.bg_seen

    def test_model_cap(self):
        r = self._mk()
        for i in range(12):
            r.observe_object(10 + i, 0, (0, 4, 0, 4))
        assert r.n_objects == 8  # capped (reference train.py:231-233)
        assert r.observe_object(99, 1, (0, 4, 0, 4)) is None


class TestGrowState:
    def test_grow_preserves_and_extends(self, key):
        cfg = trainer.TrainConfig(hidden=16, hidden_bg=16, clip_size=4)
        st = trainer.init_train_state(key, cfg, n_slots=4)
        p0 = jax.tree.leaves(st.fg_params)[0].copy()
        st2 = trainer.grow_train_state(key, st, cfg, 8)
        assert st2.n_slots == 8
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(st2.fg_params)[0][:4]), np.asarray(p0)
        )
        assert int(st2.fg_opt.count.shape[0]) == 8


def _tiny_cfg(part_mode=False):
    """Small but structurally faithful config for CPU tests."""
    return trainer.TrainConfig(
        n_iters_per_frame=8, win_size=2, n_samples_per_frame=16,
        win_size_bg=2, n_samples_per_frame_bg=32,
        hidden=32, hidden_bg=32, clip_size=8,
        part_mode=part_mode, part_down=5,
    )


def _camera():
    return Camera(width=64, height=48, fx=40.0, fy=40.0, cx=32.0, cy=24.0)


class TestSceneMapperEndToEnd:
    def test_synthetic_scene_converges(self):
        """12-frame orbit around 2 spheres; the trained object fields must
        reproduce held-out depth and color (the reference's parity protocol
        in miniature — see BASELINE.md)."""
        cam = _camera()
        cfg = trainer.TrainConfig(
            n_iters_per_frame=20, win_size=2, n_samples_per_frame=24,
            win_size_bg=2, n_samples_per_frame_bg=48,
            hidden=32, hidden_bg=64, clip_size=8,
        )
        scene = synthetic.default_scene(n_spheres=2)
        mapper = SceneMapper(cam, cfg, frame_capacity=32, initial_bucket=4)
        dirs = np.asarray(cam.ray_dirs())
        for rgb, depth, inst, t_wc in synthetic.make_sequence(scene, dirs, n_frames=12):
            losses = mapper.process_frame(rgb, depth, inst, t_wc)
        assert mapper.n_objects == 2
        assert np.isfinite(losses).all()

        # held-out view: per-object rendered depth/color vs analytic truth
        t_eval = synthetic.orbit_pose(0.3)
        rgb_gt, depth_gt, inst_gt = scene.render(t_eval, dirs)
        from openobj_tpu.ops import sampling as S
        for oid in (4, 5):
            params = mapper.params_for_instance(oid)
            mask = inst_gt == oid
            assert mask.sum() > 20
            rows, cols = np.where(mask)
            d_c = jnp.asarray(dirs[rows, cols])
            o, d = S.origin_dirs_w(jnp.asarray(t_eval, jnp.float32)[None], d_c)
            z = jnp.broadcast_to(jnp.linspace(0.5, 4.5, 64), (d_c.shape[0], 64))
            pts = S.rays_to_points(o, d, z)
            a, c, _ = object_field.field_apply(params, pts)
            w = rendering.occupancy_to_termination(
                rendering.occupancy_activation(a[..., 0])
            )
            rd = np.asarray(rendering.render(w, z))
            rc = np.asarray(rendering.render(w[..., None], c, axis=-2))
            mae_d = np.abs(rd - depth_gt[rows, cols]).mean()
            mae_c = np.abs(rc - rgb_gt[rows, cols] / 255.0).mean()
            assert mae_d < 0.15, f"obj {oid} depth MAE {mae_d}"
            assert mae_c < 0.10, f"obj {oid} color MAE {mae_c}"

    def test_part_mode_runs(self):
        cam = _camera()
        cfg = _tiny_cfg(part_mode=True)
        scene = synthetic.default_scene(n_spheres=1)
        mapper = SceneMapper(cam, cfg, frame_capacity=8, initial_bucket=4)
        dirs = np.asarray(cam.ray_dirs())
        hp, wp = cam.height // 5, cam.width // 5
        for i, (rgb, depth, inst, t_wc) in enumerate(
            synthetic.make_sequence(scene, dirs, n_frames=3)
        ):
            pf = np.ones((hp, wp, 8), np.float32)
            losses = mapper.process_frame(rgb, depth, inst, t_wc, partfeat=pf)
        assert losses is not None and np.isfinite(losses).all()

    def test_new_object_no_bucket_recompile(self):
        """Objects appearing within a bucket must not change array shapes
        (the no-recompile contract)."""
        cam = _camera()
        cfg = _tiny_cfg()
        scene = synthetic.default_scene(n_spheres=3)
        mapper = SceneMapper(cam, cfg, frame_capacity=8, initial_bucket=4)
        dirs = np.asarray(cam.ray_dirs())
        shapes = set()
        for rgb, depth, inst, t_wc in synthetic.make_sequence(scene, dirs, n_frames=4):
            mapper.process_frame(rgb, depth, inst, t_wc)
            shapes.add(jax.tree.leaves(mapper.state.fg_params)[0].shape)
        assert len(shapes) == 1  # 3 objects fit the initial bucket of 4


class TestFlatAdamW:
    def test_flat_bit_equals_tree(self, key):
        """adamw_update_flat (one fused [O, K] update) is bit-identical to
        the per-leaf impl, stacked and unstacked, with active gating and
        the non-trainable PE scale leaf untouched."""
        import jax.numpy as jnp
        from openobj_tpu.models import object_field

        p = object_field.init_stacked_fields(key, 8, hidden=16, clip_size=32)
        g = jax.tree.map(
            lambda x: jax.random.normal(
                jax.random.fold_in(key, 1), x.shape) * 0.01, p)
        st = optim.AdamWState(
            mu=jax.tree.map(lambda x: jax.random.normal(
                jax.random.fold_in(key, 2), x.shape) * 1e-3, p),
            nu=jax.tree.map(lambda x: jnp.abs(jax.random.normal(
                jax.random.fold_in(key, 3), x.shape)) * 1e-3, p),
            count=jnp.arange(8, dtype=jnp.int32),
        )
        active = jnp.asarray([1, 1, 0, 1, 0, 1, 1, 0], bool)
        p1, s1 = optim.adamw_update(
            p, g, st, lr=1e-3, weight_decay=0.013, active=active)
        p2, s2 = optim.adamw_update_flat(
            p, g, st, lr=1e-3, weight_decay=0.013, active=active)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(s1.mu) + jax.tree.leaves(s1.nu),
            jax.tree.leaves(s2.mu) + jax.tree.leaves(s2.nu),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # PE scale stayed put
        np.testing.assert_array_equal(
            np.asarray(p2["pe"]["scale"]), np.asarray(p["pe"]["scale"]))
        # unstacked (bg) form
        pb = object_field.init_field_params(
            jax.random.PRNGKey(5), hidden=16, clip_size=32)
        gb = jax.tree.map(
            lambda x: jax.random.normal(
                jax.random.fold_in(key, 7), x.shape) * 0.01, pb)
        sb = optim.init_adamw_state(pb, n_slots=None)
        b1, _ = optim.adamw_update(pb, gb, sb, lr=1e-3, weight_decay=0.013)
        b2, _ = optim.adamw_update_flat(
            pb, gb, sb, lr=1e-3, weight_decay=0.013)
        for a, b in zip(jax.tree.leaves(b1), jax.tree.leaves(b2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_trainer_accepts_flat_impl(self):
        """A SceneMapper configured with optim_impl='flat' trains finitely."""
        cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
        cfg = _tiny_cfg()
        from dataclasses import replace as _replace
        cfg = _replace(cfg, optim_impl="flat")
        scene = synthetic.default_scene(n_spheres=2)
        mapper = SceneMapper(cam, cfg, frame_capacity=8, initial_bucket=4)
        dirs = np.asarray(cam.ray_dirs())
        for rgb, depth, inst, t_wc in synthetic.make_sequence(
            scene, dirs, n_frames=3
        ):
            losses = mapper.process_frame(rgb, depth, inst, t_wc)
        mapper.finish()
        assert np.isfinite(np.asarray(losses)).all()


class TestAdamWParity:
    def test_against_torch_adamw(self, key):
        """Our AdamW must match torch.optim.AdamW step-for-step (the
        reference's optimizer, train.py:78)."""
        torch = pytest.importorskip("torch")
        w0 = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
        g_seq = [
            np.random.default_rng(i + 1).normal(size=(5, 3)).astype(np.float32)
            for i in range(5)
        ]

        tw = torch.nn.Parameter(torch.tensor(w0.copy()))
        opt = torch.optim.AdamW([tw], lr=1e-3, weight_decay=0.013)
        for g in g_seq:
            opt.zero_grad()
            tw.grad = torch.tensor(g)
            opt.step()

        params = {"w": jnp.asarray(w0)}
        st = optim.init_adamw_state(params)
        for g in g_seq:
            params, st = optim.adamw_update(
                params, {"w": jnp.asarray(g)}, st, lr=1e-3, weight_decay=0.013
            )
        np.testing.assert_allclose(
            np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-7
        )


class TestLossGuard:
    def test_nonfinite_losses_raise(self, key):
        """Failure detection: a NaN frame loss raises LossExplosionError
        (the reference prints and exits, render_rays.py:109-111)."""
        from openobj_tpu.core.scene import Camera, LossExplosionError, SceneMapper
        from openobj_tpu.core import trainer as T

        cfg = T.TrainConfig(
            n_iters_per_frame=2, win_size=2, n_samples_per_frame=4,
            win_size_bg=2, n_samples_per_frame_bg=4,
            hidden=8, hidden_bg=8, clip_size=4, do_bg=False,
        )
        cam = Camera(width=16, height=12, fx=10.0, fy=10.0, cx=8.0, cy=6.0)
        m = SceneMapper(cam, cfg, frame_capacity=4, max_objects=4,
                        initial_bucket=4)
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 255, (12, 16, 3)).astype(np.uint8)
        depth = rng.uniform(0.5, 2.0, (12, 16)).astype(np.float32)
        inst = np.full((12, 16), 5, np.int32)
        m.process_frame(rgb, depth, inst, np.eye(4, dtype=np.float32))

        # poison the params so the next frame's loss is NaN; the guard is
        # one frame behind (async pipeline), so it fires at finish()
        m.state.fg_params = jax.tree.map(
            lambda x: x * jnp.nan, m.state.fg_params
        )
        m.process_frame(rgb, depth, inst, np.eye(4, dtype=np.float32))
        with pytest.raises(LossExplosionError):
            m.finish()

        # warn mode does not raise
        m2 = SceneMapper(cam, cfg, frame_capacity=4, max_objects=4,
                         initial_bucket=4, on_loss_explosion="warn")
        m2.process_frame(rgb, depth, inst, np.eye(4, dtype=np.float32))
        m2.state.fg_params = jax.tree.map(
            lambda x: x * jnp.nan, m2.state.fg_params
        )
        m2.process_frame(rgb, depth, inst, np.eye(4, dtype=np.float32))
        m2.finish()


class TestSamplePerStep:
    def test_per_step_sampling_trains(self, key):
        """cfg.sample_per_step draws rays inside the scan — losses finite
        and the state updates (memory-saving alternative path)."""
        from openobj_tpu.core import trainer as T
        from openobj_tpu.core.frame_store import append_frame, init_frame_store
        from openobj_tpu.core.scene import Camera

        cfg = T.TrainConfig(
            n_iters_per_frame=3, win_size=2, n_samples_per_frame=6,
            win_size_bg=2, n_samples_per_frame_bg=8,
            hidden=8, hidden_bg=8, clip_size=4, part_mode=True, part_down=4,
            sample_per_step=True,
        )
        cam = Camera(width=16, height=12, fx=10.0, fy=10.0, cx=8.0, cy=6.0)
        state = T.init_train_state(key, cfg, n_slots=4)
        store = init_frame_store(2, 12, 16, part_feat_dim=4, part_down=4)
        rng = np.random.default_rng(0)
        store, _ = append_frame(
            store, rng.integers(0, 255, (12, 16, 3)).astype(np.uint8),
            rng.uniform(0.5, 2.0, (12, 16)).astype(np.float32),
            rng.integers(-1, 3, (12, 16)).astype(np.int32),
            np.eye(4, dtype=np.float32),
            partfeat=rng.normal(size=(3, 4, 4)).astype(np.float32),
        )
        fg = {
            "kf_frames": jnp.zeros((4, 2), jnp.int32),
            "kf_bbox": jnp.tile(jnp.asarray([0, 12, 0, 16], jnp.float32), (4, 2, 1)),
            "n_kf": jnp.ones((4,), jnp.int32),
            "latest2": jnp.zeros((4, 2), jnp.int32),
            "active": jnp.asarray([True, True, False, False]),
            "obj_inst": jnp.arange(1, 5, dtype=jnp.int32),
            "obj_center": jnp.zeros((4, 3), jnp.float32),
        }
        bg = {"kf_frames": fg["kf_frames"][0], "kf_bbox": fg["kf_bbox"][0],
              "n_kf": jnp.asarray(1, jnp.int32), "latest2": fg["latest2"][0]}
        p_before = jax.tree.leaves(state.fg_params)[0].copy()
        state, losses = T.train_frame(
            state, store, cam.ray_dirs(), fg, bg, jax.random.PRNGKey(1), cfg
        )
        assert losses.shape == (3,)
        assert np.isfinite(np.asarray(losses)).all()
        assert not np.allclose(
            np.asarray(jax.tree.leaves(state.fg_params)[0]), np.asarray(p_before)
        )

    def test_z_per_step_trains(self, key):
        """cfg.z_per_step recomputes the z lattice inside each scan step
        from per-step keys — statistically the same 3-mode law, so a short
        train must stay finite and land near the upfront-z path's loss."""
        from openobj_tpu.core import trainer as T
        from openobj_tpu.core.frame_store import append_frame, init_frame_store
        from openobj_tpu.core.scene import Camera

        cam = Camera(width=16, height=12, fx=10.0, fy=10.0, cx=8.0, cy=6.0)
        rng = np.random.default_rng(0)
        finals = {}
        for zps in (False, True):
            cfg = T.TrainConfig(
                n_iters_per_frame=20, win_size=2, n_samples_per_frame=6,
                win_size_bg=2, n_samples_per_frame_bg=8,
                hidden=8, hidden_bg=8, clip_size=4, part_mode=True,
                part_down=4, scan_unroll=1, z_per_step=zps,
            )
            state = T.init_train_state(key, cfg, n_slots=4)
            store = init_frame_store(2, 12, 16, part_feat_dim=4, part_down=4)
            store, _ = append_frame(
                store, rng.integers(0, 255, (12, 16, 3)).astype(np.uint8),
                rng.uniform(0.5, 2.0, (12, 16)).astype(np.float32),
                rng.integers(-1, 3, (12, 16)).astype(np.int32),
                np.eye(4, dtype=np.float32),
                partfeat=rng.normal(size=(3, 4, 4)).astype(np.float32),
            )
            fg = {
                "kf_frames": jnp.zeros((4, 2), jnp.int32),
                "kf_bbox": jnp.tile(
                    jnp.asarray([0, 12, 0, 16], jnp.float32), (4, 2, 1)
                ),
                "n_kf": jnp.ones((4,), jnp.int32),
                "latest2": jnp.zeros((4, 2), jnp.int32),
                "active": jnp.asarray([True, True, False, False]),
                "obj_inst": jnp.arange(1, 5, dtype=jnp.int32),
                "obj_center": jnp.zeros((4, 3), jnp.float32),
            }
            bg = {"kf_frames": fg["kf_frames"][0], "kf_bbox": fg["kf_bbox"][0],
                  "n_kf": jnp.asarray(1, jnp.int32),
                  "latest2": fg["latest2"][0]}
            _, losses = T.train_frame(
                state, store, cam.ray_dirs(), fg, bg, jax.random.PRNGKey(1),
                cfg,
            )
            L = np.asarray(losses)
            assert np.isfinite(L).all()
            finals[zps] = float(L[-5:].mean())
        # same law, same data, same init: trailing losses agree loosely
        assert abs(finals[True] - finals[False]) < 0.5 * max(
            finals[False], 1.0
        )


class TestPartFeatureDistillation:
    def test_field_learns_part_features(self, key):
        """End-to-end distillation: give the object a constant part-CLIP
        vector in the 2D part map, train with part_mode, then check the
        RENDERED part feature of the field points the same way (cosine).
        Validates the whole path: bf16 part store -> sampling gather ->
        hidden compositing -> clip_project -> cosine loss -> optimizer."""
        from openobj_tpu.core.scene import Camera, SceneMapper
        from openobj_tpu.core import renderer, trainer as T
        from openobj_tpu.data import synthetic
        from openobj_tpu.utils.geometry import object_bound_from_keyframes

        C = 16
        rng = np.random.default_rng(0)
        target = rng.normal(size=C)
        target /= np.linalg.norm(target)
        other = rng.normal(size=C)
        other /= np.linalg.norm(other)

        cam = Camera(width=64, height=48, fx=40.0, fy=40.0, cx=32.0, cy=24.0)
        cfg = T.TrainConfig(
            n_iters_per_frame=60, win_size=2, n_samples_per_frame=32,
            win_size_bg=2, n_samples_per_frame_bg=16,
            hidden=16, hidden_bg=16, clip_size=C, part_mode=True, part_down=4,
        )
        m = SceneMapper(cam, cfg, frame_capacity=8, max_objects=4,
                        keyframe_buffer_size=6, keyframe_step=2,
                        keyframe_step_bg=2, initial_bucket=4)
        scene = synthetic.default_scene(n_spheres=1)
        dirs = np.asarray(cam.ray_dirs())
        for i in range(6):
            t_wc = synthetic.orbit_pose(2 * np.pi * i / 12)
            rgb, depth, inst = scene.render(t_wc, dirs)
            # part map: the object's pixels carry `target`, bg gets `other`
            pf = np.tile(other, (48 // 4, 64 // 4, 1)).astype(np.float32)
            inst_d = inst[::4, ::4]
            pf[inst_d >= 4] = target
            m.process_frame(rgb, depth, inst, t_wc, partfeat=pf)
        m.finish()
        assert m.n_objects == 1

        inst_id, slot = next(iter(m.registry.inst_to_slot.items()))
        st = m.registry.slots[slot]
        kfs = m.registry.kf_frames[slot][: st.n_kf]
        st.bbox3d = object_bound_from_keyframes(
            np.asarray(m.store.depth[kfs]),
            np.asarray(m.store.inst[kfs]) == inst_id,
            np.asarray(m.store.t_wc[kfs]),
            cam.fx, cam.fy, cam.cx, cam.cy,
        )
        view = renderer.render_object_view(
            m.slot_params(slot), st.bbox3d, st.obj_center,
            synthetic.orbit_pose(2 * np.pi * 7 / 12), m.cam_dirs,
            jax.random.PRNGKey(3), n_bins=40, render_part=True,
        )
        hit = view["hit"]
        assert hit.sum() > 20
        pf_r = view["partfeat"][hit]
        pf_r = pf_r / np.maximum(
            np.linalg.norm(pf_r, axis=-1, keepdims=True), 1e-9
        )
        cos = pf_r @ target
        assert np.median(cos) > 0.8, float(np.median(cos))
        # and clearly closer to the target than to the bg vector
        assert np.median(cos) > np.median(pf_r @ other) + 0.2


class TestPathologicalFrames:
    def _mapper(self, key):
        from openobj_tpu.core.scene import Camera, SceneMapper
        from openobj_tpu.core import trainer as T

        cfg = T.TrainConfig(
            n_iters_per_frame=2, win_size=2, n_samples_per_frame=4,
            win_size_bg=2, n_samples_per_frame_bg=4,
            hidden=8, hidden_bg=8, clip_size=4,
        )
        cam = Camera(width=24, height=16, fx=12.0, fy=12.0, cx=12.0, cy=8.0)
        return SceneMapper(cam, cfg, frame_capacity=8, max_objects=4,
                           initial_bucket=4)

    def test_all_unknown_frame_is_a_noop(self, key):
        m = self._mapper(key)
        inst = np.full((16, 24), -1, np.int32)
        rgb = np.zeros((16, 24, 3), np.uint8)
        depth = np.ones((16, 24), np.float32)
        out = m.process_frame(rgb, depth, inst, np.eye(4, dtype=np.float32))
        assert out is None                 # nothing to train
        assert m.n_objects == 0

    def test_zero_depth_frame_trains_finite(self, key):
        """Depth 0 everywhere = all rays invalid -> the invalid-depth z
        lattice; losses must stay finite (reference vmap.py:489-501)."""
        m = self._mapper(key)
        rng = np.random.default_rng(0)
        inst = np.zeros((16, 24), np.int32)
        inst[4:14, 6:20] = 5
        rgb = rng.integers(0, 255, (16, 24, 3)).astype(np.uint8)
        depth = np.zeros((16, 24), np.float32)
        m.process_frame(rgb, depth, inst, np.eye(4, dtype=np.float32))
        m.on_loss_explosion = "ignore"
        m.finish()
        assert np.isfinite(m.loss_history).all()

    def test_tiny_objects_dropped(self, key):
        m = self._mapper(key)
        inst = np.zeros((16, 24), np.int32)
        inst[3, 3] = 7                     # 1-px object -> dropped
        rgb = np.zeros((16, 24, 3), np.uint8)
        depth = np.ones((16, 24), np.float32)
        m.process_frame(rgb, depth, inst, np.eye(4, dtype=np.float32))
        assert 7 not in m.registry.inst_to_slot
        assert m.registry.bg_seen          # bg still observed


class TestBucketCap:
    def test_bucket_never_outgrows_max_objects(self):
        """Growing past a non-power-of-two max_objects must clamp the param
        bucket to max_objects: the registry tables are sized [max_objects],
        and a larger bucket desynchronizes state.n_slots from every sliced
        table (regression: 65 objects with max 100 -> bucket 128 vs [100])."""
        from openobj_tpu.core import trainer as T
        from openobj_tpu.core.scene import Camera, SceneMapper

        cfg = T.TrainConfig(
            n_iters_per_frame=2, win_size=2, n_samples_per_frame=4,
            win_size_bg=2, n_samples_per_frame_bg=4,
            hidden=8, hidden_bg=8, clip_size=4,
        )
        cam = Camera(width=80, height=64, fx=40.0, fy=40.0, cx=40.0, cy=32.0)
        m = SceneMapper(cam, cfg, frame_capacity=8, max_objects=6,
                        initial_bucket=4)
        rgb = np.zeros((64, 80, 3), np.uint8)
        depth = np.ones((64, 80), np.float32)
        inst = np.full((64, 80), -1, np.int32)
        # 5 distinct instances (>=12 px sides so the bbox filter keeps
        # them): bucket would round to 8 > 6 without the clamp
        for i in range(5):
            inst[12 * i : 12 * i + 12, 10 : 70] = 4 + i
        losses = m.process_frame(rgb, depth, inst,
                                 np.eye(4, dtype=np.float32))
        assert m.n_objects == 5
        assert m.state.n_slots == 6          # clamped to max_objects
        assert losses is not None
        m.finish()
        assert np.isfinite(np.asarray(m.loss_history)).all()
