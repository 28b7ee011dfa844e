"""Batched whole-frame renderer vs the per-object path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openobj_tpu.core import renderer
from openobj_tpu.models import object_field
from openobj_tpu.ops import sampling
from openobj_tpu.utils.geometry import OrientedBox


def _solid_field(key, bias=50.0):
    """A field that is fully occupied everywhere (occ ~ 1): rays terminate
    at their first sample, so depth ~ near."""
    p = object_field.init_field_params(key, hidden=8, clip_size=4, scale=2.0)
    p["mlp"]["out_alpha"]["w"] = jnp.zeros_like(p["mlp"]["out_alpha"]["w"])
    p["mlp"]["out_alpha"]["b"] = jnp.full_like(p["mlp"]["out_alpha"]["b"], bias)
    return p


@pytest.fixture
def setup():
    h, w = 24, 32
    cam_dirs = sampling.camera_ray_dirs(w, h, fx=20.0, fy=20.0, cx=16.0, cy=12.0)
    dirs_c = jnp.asarray(cam_dirs).reshape(-1, 3)
    t = jnp.eye(4)
    origins, dirs_w = sampling.origin_dirs_w(
        jnp.broadcast_to(t, (dirs_c.shape[0], 4, 4)), dirs_c
    )
    # two axis-aligned boxes at z=2 (left) and z=3 (right), overlapping center
    boxes = [
        OrientedBox(center=np.array([-0.3, 0.0, 2.0]), r=np.eye(3),
                    extent=np.array([1.0, 1.0, 0.6])),
        OrientedBox(center=np.array([0.3, 0.0, 3.0]), r=np.eye(3),
                    extent=np.array([1.2, 1.2, 0.6])),
    ]
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    params = [_solid_field(k) for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
    t_wo = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    extents = np.zeros((2, 3), np.float32)
    for j, b in enumerate(boxes):
        t_wo[j, :3, :3] = b.r
        t_wo[j, :3, 3] = b.center
        extents[j] = b.extent
    return (h, w, origins, dirs_w, boxes, params, stacked,
            jnp.asarray(t_wo), jnp.asarray(extents))


class TestBatchedRender:
    def test_matches_per_object_compositing(self, setup):
        h, w, origins, dirs_w, boxes, params, stacked, t_wo, extents = setup
        out = renderer.render_frame_batched(
            stacked, t_wo, extents, jnp.zeros((2, 3)), jnp.ones((2,), bool),
            origins, dirs_w, jax.random.PRNGKey(1),
            n_bins=40, max_hit_rays=512, chunk=128,
        )
        win = np.asarray(out["winner"])
        zb = np.asarray(out["depth"])

        # reference composite via the per-object path
        views = {}
        for j, (p, b) in enumerate(zip(params, boxes)):
            views[j] = {
                k: np.asarray(v) for k, v in renderer.render_rays_obb(
                    p, origins, dirs_w, t_wo[j], extents[j],
                    jnp.zeros(3), jax.random.PRNGKey(2 + j), n_bins=40,
                    chunk_size=128,
                ).items()
            }
        # hit sets must match exactly (solid fields -> OBB hit == render hit)
        for j in range(2):
            np.testing.assert_array_equal(win == j, (win == j))
            both = views[j]["hit"]
            # every per-object hit is either won by j or by a nearer object
            lost = both & (win != j)
            if lost.any():
                assert (zb[lost] <= views[j]["depth"][lost] + 0.1).all()
        # where only object 0 hits, it wins; same for 1
        only0 = views[0]["hit"] & ~views[1]["hit"]
        only1 = views[1]["hit"] & ~views[0]["hit"]
        assert (win[only0] == 0).all()
        assert (win[only1] == 1).all()
        # overlap: nearer box (z=2) wins
        overlap = views[0]["hit"] & views[1]["hit"]
        if overlap.any():
            assert (win[overlap] == 0).all()
        # depths agree to within a bin width
        for j in range(2):
            sel = (win == j)
            if sel.any():
                np.testing.assert_allclose(
                    zb[sel], views[j]["depth"][sel], atol=0.08
                )
        # no-hit rays: winner -1, depth inf
        none = ~(views[0]["hit"] | views[1]["hit"])
        assert (win[none] == -1).all()
        assert np.isinf(zb[none]).all()

    def test_inactive_objects_excluded(self, setup):
        h, w, origins, dirs_w, boxes, params, stacked, t_wo, extents = setup
        out = renderer.render_frame_batched(
            stacked, t_wo, extents, jnp.zeros((2, 3)),
            jnp.asarray([True, False]),
            origins, dirs_w, jax.random.PRNGKey(1),
            n_bins=40, max_hit_rays=512, chunk=128,
        )
        assert not (np.asarray(out["winner"]) == 1).any()

    def test_hit_cap_truncates_gracefully(self, setup):
        """max_hit_rays smaller than the true hit count: renders a subset,
        still finite and well-formed — and n_hit reports the TRUE counts so
        the caller can detect the overflow."""
        h, w, origins, dirs_w, boxes, params, stacked, t_wo, extents = setup
        out = renderer.render_frame_batched(
            stacked, t_wo, extents, jnp.zeros((2, 3)), jnp.ones((2,), bool),
            origins, dirs_w, jax.random.PRNGKey(1),
            n_bins=40, max_hit_rays=64, chunk=64,
        )
        win = np.asarray(out["winner"])
        assert (win >= -1).all() and (win <= 1).all()
        assert np.isfinite(np.asarray(out["color"])).all()
        counts = np.asarray(renderer.obb_hit_counts(
            t_wo, extents, jnp.ones((2,), bool), origins, dirs_w
        ))
        np.testing.assert_array_equal(np.asarray(out["n_hit"]), counts)
        assert counts.max() > 64  # this scene DOES overflow the tiny cap

    def test_closeup_object_no_dropped_pixels(self):
        """A solid object whose box covers ~60% of the frame: when the cap
        is sized from obb_hit_counts (the render_dataset policy), every
        OBB-hit pixel renders — zero holes."""
        h, w = 48, 64
        cam_dirs = sampling.camera_ray_dirs(
            w, h, fx=30.0, fy=30.0, cx=32.0, cy=24.0
        )
        dirs_c = jnp.asarray(cam_dirs).reshape(-1, 3)
        t = jnp.eye(4)
        origins, dirs_w = sampling.origin_dirs_w(
            jnp.broadcast_to(t, (dirs_c.shape[0], 4, 4)), dirs_c
        )
        box = OrientedBox(center=np.array([0.0, 0.0, 1.5]), r=np.eye(3),
                          extent=np.array([2.4, 2.4, 0.8]))
        p = _solid_field(jax.random.PRNGKey(5))
        stacked = jax.tree.map(lambda x: x[None], p)
        t_wo = np.eye(4, dtype=np.float32)
        t_wo[:3, 3] = box.center
        t_wo = jnp.asarray(t_wo)[None]
        extents = jnp.asarray(box.extent, jnp.float32)[None]
        active = jnp.ones((1,), bool)

        counts = np.asarray(renderer.obb_hit_counts(
            t_wo, extents, active, origins, dirs_w
        ))
        frac = counts[0] / (h * w)
        assert frac > 0.5, frac  # genuinely a close-up object

        chunk = 256
        cap = -(-int(counts.max()) // chunk) * chunk
        out = renderer.render_frame_batched(
            stacked, t_wo, extents, jnp.zeros((1, 3)), active,
            origins, dirs_w, jax.random.PRNGKey(1),
            n_bins=40, max_hit_rays=cap, chunk=chunk,
        )
        win = np.asarray(out["winner"])
        # solid field: every OBB-hit ray terminates -> must be rendered
        per_obj = renderer.render_rays_obb(
            p, origins, dirs_w, t_wo[0], extents[0], jnp.zeros(3),
            jax.random.PRNGKey(2), n_bins=40, chunk_size=chunk,
        )
        hit_ref = np.asarray(per_obj["hit"])
        assert hit_ref.sum() >= counts[0] * 0.98
        dropped = hit_ref & (win != 0)
        assert dropped.sum() == 0, f"{dropped.sum()} hit pixels dropped"


class TestTwoPassRender:
    """Empty-space skipping (probe-and-tighten) parity with the one-pass
    renderer, per-object and batched."""

    def test_obb_two_pass_matches_one_pass(self, setup):
        h, w, origins, dirs_w, boxes, params, stacked, t_wo, extents = setup
        kwargs = dict(chunk_size=128)
        one = renderer.render_rays_obb(
            params[0], origins, dirs_w, t_wo[0], extents[0], jnp.zeros(3),
            jax.random.PRNGKey(1), n_bins=60, **kwargs,
        )
        two = renderer.render_rays_obb(
            params[0], origins, dirs_w, t_wo[0], extents[0], jnp.zeros(3),
            jax.random.PRNGKey(1), n_bins=24, two_pass=True, n_probe=16,
            **kwargs,
        )
        h1, h2 = np.asarray(one["hit"]), np.asarray(two["hit"])
        np.testing.assert_array_equal(h1, h2)
        d1, d2 = np.asarray(one["depth"]), np.asarray(two["depth"])
        assert np.abs(d1 - d2)[h1].max() < 0.05  # within a refine-bin width

    def test_transparent_field_unchanged(self, setup):
        """A field with occupancy ~0 everywhere: the probe finds no surface,
        the full interval is kept, and the ray stays transparent."""
        h, w, origins, dirs_w, boxes, params, stacked, t_wo, extents = setup
        p = _solid_field(jax.random.PRNGKey(3), bias=-50.0)
        for tp in (False, True):
            out = renderer.render_rays_obb(
                p, origins, dirs_w, t_wo[0], extents[0], jnp.zeros(3),
                jax.random.PRNGKey(1), n_bins=24, chunk_size=128, two_pass=tp,
                n_probe=16,
            )
            assert not np.asarray(out["hit"]).any()

    def test_batched_two_pass_matches(self, setup):
        h, w, origins, dirs_w, boxes, params, stacked, t_wo, extents = setup
        one = renderer.render_frame_batched(
            stacked, t_wo, extents, jnp.zeros((2, 3)), jnp.ones((2,), bool),
            origins, dirs_w, jax.random.PRNGKey(1),
            n_bins=60, max_hit_rays=512, chunk=128,
        )
        two = renderer.render_frame_batched(
            stacked, t_wo, extents, jnp.zeros((2, 3)), jnp.ones((2,), bool),
            origins, dirs_w, jax.random.PRNGKey(1),
            n_bins=24, max_hit_rays=512, chunk=128, two_pass=True, n_probe=16,
        )
        w1, w2 = np.asarray(one["winner"]), np.asarray(two["winner"])
        np.testing.assert_array_equal(w1, w2)
        d1, d2 = np.asarray(one["depth"]), np.asarray(two["depth"])
        sel = w1 >= 0
        assert np.abs(d1[sel] - d2[sel]).max() < 0.05  # inf depths are no-hit

    def test_bf16_eval_close_to_f32(self, setup):
        """bf16 matmul rendering stays within render tolerance of f32 on a
        non-degenerate (randomly initialized, mildly occupied) field."""
        h, w, origins, dirs_w, boxes, params, stacked, t_wo, extents = setup
        p = object_field.init_field_params(
            jax.random.PRNGKey(7), hidden=16, clip_size=4, scale=2.0
        )
        p["mlp"]["out_alpha"]["b"] = jnp.full_like(
            p["mlp"]["out_alpha"]["b"], 0.5
        )
        outs = {}
        for cdt in ("f32", "bf16"):
            outs[cdt] = renderer.render_rays_obb(
                p, origins, dirs_w, t_wo[0], extents[0], jnp.zeros(3),
                jax.random.PRNGKey(1), n_bins=40, chunk_size=128,
                compute_dtype=cdt,
            )
        hit = np.asarray(outs["f32"]["hit"]) & np.asarray(outs["bf16"]["hit"])
        if hit.any():
            d = np.abs(
                np.asarray(outs["f32"]["depth"]) - np.asarray(outs["bf16"]["depth"])
            )[hit]
            assert d.max() < 0.05
        c = np.abs(
            np.asarray(outs["f32"]["color"]) - np.asarray(outs["bf16"]["color"])
        )
        assert c.max() < 0.05


class TestBucketedRender:
    """Adaptive per-object bin counts (render_frame_bucketed)."""

    @pytest.fixture
    def mixed(self):
        """Three solid objects of very different sizes: a big box (anchor),
        a small one, and one off-screen-ish to the side."""
        h, w = 24, 32
        cam_dirs = sampling.camera_ray_dirs(
            w, h, fx=20.0, fy=20.0, cx=16.0, cy=12.0
        )
        dirs_c = jnp.asarray(cam_dirs).reshape(-1, 3)
        t = jnp.eye(4)
        origins, dirs_w = sampling.origin_dirs_w(
            jnp.broadcast_to(t, (dirs_c.shape[0], 4, 4)), dirs_c
        )
        boxes = [
            OrientedBox(center=np.array([-0.4, 0.0, 3.0]), r=np.eye(3),
                        extent=np.array([1.4, 1.4, 1.0])),
            OrientedBox(center=np.array([0.45, 0.1, 2.0]), r=np.eye(3),
                        extent=np.array([0.3, 0.3, 0.2])),
            OrientedBox(center=np.array([0.9, -0.3, 2.5]), r=np.eye(3),
                        extent=np.array([0.5, 0.5, 0.4])),
        ]
        keys = jax.random.split(jax.random.PRNGKey(5), 3)
        params = [_solid_field(k) for k in keys]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
        t_wo = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        extents = np.zeros((3, 3), np.float32)
        for j, b in enumerate(boxes):
            t_wo[j, :3, :3] = b.r
            t_wo[j, :3, 3] = b.center
            extents[j] = b.extent
        return (origins, dirs_w, stacked, jnp.asarray(t_wo),
                jnp.asarray(extents))

    def test_bucket_bin_counts(self, mixed):
        _, _, _, t_wo, extents = mixed
        active = np.ones(3, bool)
        bins = renderer.bucket_bin_counts(extents, active, 120, min_bins=24)
        assert bins[0] == 120            # anchor (largest diagonal)
        assert bins[1] < bins[0]         # small object: smaller bucket
        assert bins[1] >= 24
        # quantized to the level set {120*lv} floored at min_bins
        assert all(b in (30, 60, 120) for b in bins)
        # inactive slots keep the full count (never rendered anyway)
        bins2 = renderer.bucket_bin_counts(
            extents, np.array([True, False, True]), 120
        )
        assert bins2[1] == 120

    def test_bucketed_matches_batched(self, mixed):
        origins, dirs_w, stacked, t_wo, extents = mixed
        active = jnp.ones((3,), bool)
        centers = jnp.zeros((3, 3))
        full = renderer.render_frame_batched(
            stacked, t_wo, extents, centers, active, origins, dirs_w,
            jax.random.PRNGKey(1), n_bins=120, max_hit_rays=768, chunk=128,
        )
        buck = renderer.render_frame_bucketed(
            stacked, t_wo, extents, centers, active, origins, dirs_w,
            jax.random.PRNGKey(1), n_bins=120, max_hit_rays=768, chunk=128,
        )
        w1 = np.asarray(full["winner"])
        w2 = np.asarray(buck["winner"])
        # winner indices are GLOBAL stack indices and agree with the
        # fixed-bin render (solid fields: depth ~ near, unambiguous)
        np.testing.assert_array_equal(w1, w2)
        assert set(np.unique(w2)) <= {-1, 0, 1, 2}
        sel = w1 >= 0
        d1 = np.asarray(full["depth"])[sel]
        d2 = np.asarray(buck["depth"])[sel]
        # depth agreement within one bin width of the COARSEST bucket the
        # winning objects used (solid field terminates in the first bin)
        span = float(np.linalg.norm(np.asarray(extents), axis=1).max()) + 0.2
        tol = span / int(min(buck["bins"]))
        assert np.abs(d1 - d2).max() < tol
        np.testing.assert_array_equal(
            np.asarray(buck["n_hit"]),
            np.asarray(renderer.obb_hit_counts(
                t_wo, extents, active, origins, dirs_w)),
        )

    def test_bucketed_two_pass_composes(self, mixed):
        origins, dirs_w, stacked, t_wo, extents = mixed
        active = jnp.ones((3,), bool)
        centers = jnp.zeros((3, 3))
        full = renderer.render_frame_batched(
            stacked, t_wo, extents, centers, active, origins, dirs_w,
            jax.random.PRNGKey(1), n_bins=120, max_hit_rays=768, chunk=128,
        )
        buck = renderer.render_frame_bucketed(
            stacked, t_wo, extents, centers, active, origins, dirs_w,
            jax.random.PRNGKey(1), n_bins=120, max_hit_rays=768, chunk=128,
            two_pass=True, n_probe=16,
        )
        np.testing.assert_array_equal(
            np.asarray(full["winner"]), np.asarray(buck["winner"])
        )
