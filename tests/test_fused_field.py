"""Fused Pallas field kernel vs the XLA reference path.

Runs in Pallas interpreter mode on CPU (ops.fused_field auto-selects
interpret when the backend is not TPU), so these tests exercise the exact
kernel code paths — including the multi-tile grad accumulation — without
hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openobj_tpu.models import object_field
from openobj_tpu.ops import fused_field


@pytest.fixture
def setup():
    O, N, H = 3, 40, 32
    key = jax.random.PRNGKey(0)
    params = object_field.init_stacked_fields(
        key, O, hidden=H, clip_size=64, scale=2.0
    )
    # heterogeneous per-object scales (bg=5 vs fg=2 in the real system)
    params["pe"]["scale"] = jnp.asarray([2.0, 5.0, 2.0])
    pts = jax.random.normal(jax.random.PRNGKey(1), (O, N, 3)) * 0.7
    return params, pts


def _grads_match(g0, g1, rtol=3e-5):
    for (p0, l0), (p1, l1) in zip(
        jax.tree_util.tree_flatten_with_path(g0)[0],
        jax.tree_util.tree_flatten_with_path(g1)[0],
    ):
        assert p0 == p1
        d = np.abs(np.asarray(l0 - l1)).max()
        ref = np.abs(np.asarray(l0)).max() + 1e-8
        assert d / ref < rtol, f"{jax.tree_util.keystr(p0)}: rel {d / ref:.2e}"


class TestFusedFieldParity:
    def test_forward_matches_xla(self, setup):
        params, pts = setup
        a0, c0, f0 = object_field.field_apply_stacked(
            params, pts, clip_hidden_only=True
        )
        a1, c1, f1 = fused_field.field_apply_stacked_fused(params, pts)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-5)

    def test_forward_no_clip(self, setup):
        params, pts = setup
        a0, c0, _ = object_field.field_apply_stacked(
            params, pts, do_clip=False
        )
        a1, c1, f1 = fused_field.field_apply_stacked_fused(
            params, pts, do_clip=False
        )
        assert f1 is None
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-5)

    def test_grads_match_xla(self, setup):
        params, pts = setup
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        cta = jax.random.normal(ks[0], (*pts.shape[:-1], 1))
        ctc = jax.random.normal(ks[1], (*pts.shape[:-1], 3))
        ctf = jax.random.normal(ks[2], (*pts.shape[:-1], 32))

        def loss(apply):
            def f(p):
                a, c, h = apply(p)
                return (a * cta).sum() + (c * ctc).sum() + (h * ctf).sum()
            return f

        g0 = jax.grad(loss(
            lambda p: object_field.field_apply_stacked(p, pts, clip_hidden_only=True)
        ))(params)
        g1 = jax.grad(loss(
            lambda p: fused_field.field_apply_stacked_fused(p, pts)
        ))(params)
        _grads_match(g0, g1)
        # the PE scale must stay stop-gradiented in both paths
        assert float(jnp.abs(g1["pe"]["scale"]).max()) == 0.0

    def test_multi_tile_accumulation(self, setup, monkeypatch):
        """Force several ray tiles per object so the bwd kernel's
        accumulate-across-tiles path is exercised."""
        params, pts = setup
        monkeypatch.setattr(fused_field, "_MAX_FWD_TILE", 16)
        monkeypatch.setattr(fused_field, "_MAX_BWD_TILE", 16)

        def f(p):
            a, c, h = fused_field.field_apply_stacked_fused(p, pts)
            return (a ** 2).sum() + (c * c).sum() + jnp.abs(h).sum()

        def f0(p):
            a, c, h = object_field.field_apply_stacked(p, pts, clip_hidden_only=True)
            return (a ** 2).sum() + (c * c).sum() + jnp.abs(h).sum()

        _grads_match(jax.grad(f0)(params), jax.grad(f)(params), rtol=2e-4)

    def test_single_object_wrapper(self, setup):
        params, pts = setup
        p1 = object_field.slice_slot(params, 1)
        a0, c0, f0 = object_field.field_apply(p1, pts[1], clip_hidden_only=True)
        a1, c1, f1 = fused_field.field_apply_fused(p1, pts[1])
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-5)

    def test_bf16_compute_close(self, setup):
        params, pts = setup
        a0, c0, f0 = object_field.field_apply_stacked(
            params, pts, clip_hidden_only=True
        )
        a1, c1, f1 = fused_field.field_apply_stacked_fused(
            params, pts, compute_dtype="bf16"
        )
        # bf16 matmuls with f32 accumulation: ~1e-2 relative
        assert float(jnp.abs(a1 - a0).max()) < 0.3
        assert float(jnp.abs(c1 - c0).max()) < 0.05

    def test_trainer_accepts_pallas_impl(self):
        """One tiny end-to-end train_frame with field_impl='pallas'."""
        from openobj_tpu.core import trainer
        from openobj_tpu.core.frame_store import append_frame, init_frame_store
        from openobj_tpu.core.scene import Camera

        cfg = trainer.TrainConfig(
            n_iters_per_frame=2, win_size=2, n_samples_per_frame=8,
            win_size_bg=2, n_samples_per_frame_bg=16,
            hidden=8, hidden_bg=8, clip_size=16, part_mode=True, part_down=4,
            field_impl="pallas",
        )
        cam = Camera(width=32, height=24, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
        state = trainer.init_train_state(jax.random.PRNGKey(0), cfg, n_slots=4)
        store = init_frame_store(3, 24, 32, part_feat_dim=16, part_down=4)
        rng = np.random.default_rng(0)
        for _ in range(2):
            store, _ = append_frame(
                store, rng.integers(0, 255, (24, 32, 3)).astype(np.uint8),
                rng.uniform(0.5, 3.0, (24, 32)).astype(np.float32),
                rng.integers(-1, 3, (24, 32)).astype(np.int32),
                np.eye(4, dtype=np.float32),
                partfeat=rng.normal(size=(6, 8, 16)).astype(np.float32),
            )
        fg = {
            "kf_frames": jnp.zeros((4, 3), jnp.int32).at[:, 1].set(1),
            "kf_bbox": jnp.tile(jnp.asarray([0, 24, 0, 32], jnp.float32), (4, 3, 1)),
            "n_kf": jnp.full((4,), 2, jnp.int32),
            "latest2": jnp.tile(jnp.asarray([0, 1], jnp.int32), (4, 1)),
            "active": jnp.asarray([True, True, False, False]),
            "obj_inst": jnp.arange(1, 5, dtype=jnp.int32),
            "obj_center": jnp.zeros((4, 3), jnp.float32),
        }
        bg = {
            "kf_frames": fg["kf_frames"][0], "kf_bbox": fg["kf_bbox"][0],
            "n_kf": jnp.asarray(2, jnp.int32), "latest2": fg["latest2"][0],
        }
        state, losses = trainer.train_frame(
            state, store, cam.ray_dirs(), fg, bg, jax.random.PRNGKey(1), cfg
        )
        assert np.isfinite(np.asarray(losses)).all()
