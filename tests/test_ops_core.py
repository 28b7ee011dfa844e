"""Unit tests for the math core: PE, MLP, compositing, losses.

Golden values are hand-derived from the reference formulas
(/root/reference/objnerf/{embedding,model,render_rays,loss}.py) — see each
test's docstring for the exact formula being pinned.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openobj_tpu.ops import embedding, losses, mlp, rendering, sampling


class TestEmbedding:
    def test_dims(self):
        assert embedding.embedding_dim(max_deg=5) == 129
        assert embedding.embedding_split(max_deg=5) == (87, 42)
        assert embedding.ICOSPHERE_DIRS.shape == (21, 3)

    def test_dirs_unit_norm(self):
        norms = np.linalg.norm(embedding.ICOSPHERE_DIRS, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-6)

    def test_forward_golden(self):
        """emb = [x/s, sin(pi * f_k * (x/s)·d_j)] with f = 2^0..2^5,
        frequency-major layout (reference embedding.py:46-55)."""
        pe = embedding.init_pe_params(scale=2.0)
        x = jnp.array([[0.3, -0.7, 1.1]])
        out = embedding.positional_encoding(pe, x, max_deg=5)
        assert out.shape == (1, 129)
        t = np.array([0.15, -0.35, 0.55])
        np.testing.assert_allclose(out[0, :3], t, rtol=1e-6)
        proj = embedding.ICOSPHERE_DIRS @ t  # [21]
        for k, f in enumerate([1, 2, 4, 8, 16, 32]):
            exp = np.sin(np.pi * f * proj)
            # default impl is the double-angle recurrence: ~2^F ulp of f32
            # drift vs the analytic sine (see positional_encoding docstring)
            np.testing.assert_allclose(
                out[0, 3 + 21 * k : 3 + 21 * (k + 1)], exp, rtol=1e-5,
                atol=3e-5,
            )
        # the literal ("direct") formulation matches tightly
        out_d = embedding.positional_encoding(pe, x, max_deg=5, impl="direct")
        for k, f in enumerate([1, 2, 4, 8, 16, 32]):
            exp = np.sin(np.pi * f * proj)
            np.testing.assert_allclose(
                out_d[0, 3 + 21 * k : 3 + 21 * (k + 1)], exp, rtol=1e-5,
                atol=1e-6,
            )

    def test_recurrence_matches_direct(self):
        """Default recurrence impl tracks the direct sines (values + grads)
        over a broad input range."""
        pe = embedding.init_pe_params(scale=2.0)
        x = jnp.asarray(
            np.random.default_rng(3).uniform(-3, 3, (512, 3)), jnp.float32
        )
        a = embedding.positional_encoding(pe, x, impl="direct")
        b = embedding.positional_encoding(pe, x, impl="recurrence")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
        g1 = jax.grad(
            lambda p: embedding.positional_encoding(p, x, impl="direct").sum()
        )(pe)["dirs"]
        g2 = jax.grad(
            lambda p: embedding.positional_encoding(
                p, x, impl="recurrence"
            ).sum()
        )(pe)["dirs"]
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-2
        )

    def test_scale_not_differentiated(self):
        pe = embedding.init_pe_params(scale=2.0)
        x = jnp.ones((4, 3))

        def f(p):
            return embedding.positional_encoding(p, x).sum()

        g = jax.grad(f)(pe)
        assert float(jnp.abs(g["scale"])) == 0.0
        assert float(jnp.abs(g["dirs"]).sum()) > 0.0  # dirs ARE trainable

    def test_batch_shapes(self):
        pe = embedding.init_pe_params(scale=5.0)
        x = jnp.zeros((7, 11, 3))
        assert embedding.positional_encoding(pe, x).shape == (7, 11, 129)


class TestMLP:
    def test_shapes_and_heads(self, key):
        p = mlp.init_mlp_params(key, hidden=32, clip_size=512)
        emb = jnp.zeros((5, 129))
        a, c, f = mlp.mlp_apply(p, emb)
        assert a.shape == (5, 1)
        assert c.shape == (5, 3)
        assert f.shape == (5, 512)
        assert (c >= 0).all() and (c <= 1).all()  # sigmoid head

    def test_alpha_scale(self, key):
        """alpha = raw * 10 (reference model.py:88): at zero weights input the
        alpha of a zero-bias net is exactly 0; check linearity of the scale by
        doubling the head weight."""
        p = mlp.init_mlp_params(key, hidden=16)
        emb = jax.random.normal(key, (3, 129))
        a1, _, _ = mlp.mlp_apply(p, emb)
        p2 = jax.tree.map(lambda x: x, p)
        p2["out_alpha"] = {"w": p["out_alpha"]["w"] * 2, "b": p["out_alpha"]["b"]}
        a2, _, _ = mlp.mlp_apply(p2, emb)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a1) * 2, rtol=1e-5)

    def test_vmap_over_objects(self, key):
        """A stacked [O, ...] param pytree under vmap must equal per-object
        application — the core vMAP ensembling contract."""
        keys = jax.random.split(key, 4)
        ps = [mlp.init_mlp_params(k, hidden=32, clip_size=8) for k in keys]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
        emb = jax.random.normal(key, (4, 6, 129))
        a_b, c_b, f_b = jax.vmap(mlp.mlp_apply)(stacked, emb)
        for i in range(4):
            a_i, c_i, f_i = mlp.mlp_apply(ps[i], emb[i])
            np.testing.assert_allclose(np.asarray(a_b[i]), np.asarray(a_i), rtol=2e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(f_b[i]), np.asarray(f_i), rtol=2e-5, atol=1e-5)

    def test_param_count_obj(self, key):
        # 32-hidden object net: known layer dims (model.py:16-56)
        p = mlp.init_mlp_params(key, hidden=32, clip_size=512)
        n = mlp.param_count(p)
        expect = (
            (87 * 32 + 32) + (32 * 32 + 32) + (119 * 32 + 32) + (32 * 32 + 32)
            + (32 * 1 + 1) + (74 * 32 + 32) + (32 * 3 + 3)
            + (74 * 32 + 32) + (32 * 512 + 512)
        )
        assert n == expect


class TestRendering:
    def test_termination_golden(self):
        """w_i = occ_i * prod_{j<i}(1 - occ_j + 1e-10) (render_rays.py:32-54)."""
        occ = jnp.array([[0.2, 0.5, 0.9]])
        w = rendering.occupancy_to_termination(occ)
        e = 1e-10
        expect = np.array(
            [0.2, 0.5 * (0.8 + e), 0.9 * (0.8 + e) * (0.5 + e)]
        )
        np.testing.assert_allclose(np.asarray(w[0]), expect, rtol=1e-6)

    def test_termination_batch_shapes(self):
        occ = jnp.ones((4, 7, 10)) * 0.3
        w = rendering.occupancy_to_termination(occ)
        assert w.shape == (4, 7, 10)
        # weights sum <= 1 (+ tiny eps slack)
        assert float(jnp.sum(w, -1).max()) <= 1.0 + 1e-6

    def test_solid_surface_terminates(self):
        """occ ~ [0,0,1,...] must put all weight at the surface sample."""
        occ = jnp.array([[0.0, 0.0, 1.0, 0.5]])
        w = rendering.occupancy_to_termination(occ)
        np.testing.assert_allclose(np.asarray(w[0]), [0, 0, 1, 0], atol=1e-6)

    def test_render_depth(self):
        occ = jnp.array([[0.0, 1.0, 0.0]])
        z = jnp.array([[1.0, 2.0, 3.0]])
        w = rendering.occupancy_to_termination(occ)
        d = rendering.render(w, z)
        np.testing.assert_allclose(float(d[0]), 2.0, rtol=1e-6)

    def test_losses(self):
        p = jnp.array([1.0, 2.0])
        g = jnp.array([1.5, 1.0])
        np.testing.assert_allclose(
            np.asarray(rendering.render_loss(p, g, "L1")), [0.5, 1.0]
        )
        np.testing.assert_allclose(
            np.asarray(rendering.render_loss(p, g, "L2")), [0.25, 1.0]
        )
        a = jnp.array([[1.0, 0.0]])
        b = jnp.array([[0.0, 1.0]])
        np.testing.assert_allclose(
            np.asarray(rendering.render_loss(a, b, "cos")), [1.0], atol=1e-6
        )

    def test_reduce_masked_loss(self):
        lm = jnp.array([[1.0, 2.0, 3.0], [5.0, 5.0, 5.0]])
        mask = jnp.array([[True, True, False], [False, False, False]])
        out = rendering.reduce_masked_loss(lm * mask, mask)
        np.testing.assert_allclose(np.asarray(out), [1.5, 0.0], rtol=1e-6)

    def test_reduce_var_weighting(self):
        """information = 1/(sqrt(var)+1e-4) for L1 (render_rays.py:96-102)."""
        lm = jnp.array([[2.0]])
        mask = jnp.array([[True]])
        var = jnp.array([[4.0]])
        out = rendering.reduce_masked_loss(lm, mask, var=var, loss_type="L1")
        np.testing.assert_allclose(float(out[0]), 2.0 / (2.0 + 1e-4), rtol=1e-5)

    def test_make_3d_grid(self):
        tf = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
        g = rendering.make_3d_grid(dim=3, scale=jnp.array([2.0, 2.0, 2.0]), transform=tf)
        assert g.shape == (3, 3, 3, 3)
        np.testing.assert_allclose(np.asarray(g[0, 0, 0]), [-1.0, 0.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(g[-1, -1, -1]), [3.0, 4.0, 5.0], atol=1e-6)


class TestSampling:
    def test_stratified_bins_bounds_and_order(self, key):
        z = sampling.stratified_bins(key, 0.5, jnp.full((64,), 3.5), 10, (64,))
        assert z.shape == (64, 10)
        assert float(z.min()) >= 0.5
        assert float(z.max()) <= 3.5
        assert bool((jnp.diff(z, axis=-1) > 0).all())  # stratified => sorted

    def test_stratified_bins_uniform_coverage(self, key):
        z = sampling.stratified_bins(key, 0.0, 1.0, 4, (10000,))
        # bin k must stay within [k/4, (k+1)/4]
        for k in range(4):
            col = np.asarray(z[:, k])
            assert col.min() >= k / 4 - 1e-6
            assert col.max() <= (k + 1) / 4 + 1e-6

    def test_normal_bins(self, key):
        depth = jnp.full((5000,), 2.0)
        z = sampling.normal_bins(key, depth, 9, delta=0.1)
        assert z.shape == (5000, 9)
        assert float(jnp.abs(z - 2.0).max()) <= 0.1 + 1e-6
        assert bool((jnp.diff(z, axis=-1) >= 0).all())  # sorted
        # std of centered samples ~ delta/3 (clipped)
        assert abs(float(jnp.std(z - 2.0)) - 0.1 / 3) < 0.01

    def test_normal_bins_spacings_matches_sort_distribution(self, key):
        """The sort-free spacings sampler draws the SAME law as
        sample-then-sort: every order statistic's quantiles agree."""
        depth = jnp.full((60000,), 2.0)
        z_sort = np.asarray(
            sampling.normal_bins(key, depth, 9, 0.1, method="sort")
        )
        z_sp = np.asarray(
            sampling.normal_bins(key, depth, 9, 0.1, method="spacings")
        )
        qs = np.linspace(0.05, 0.95, 10)
        for i in range(9):
            q1 = np.quantile(z_sort[:, i], qs)
            q2 = np.quantile(z_sp[:, i], qs)
            np.testing.assert_allclose(q1, q2, atol=2e-3)

    def test_ray_box_intersection(self):
        o = jnp.array([[0.0, 0.0, -5.0], [10.0, 10.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        near, far, hit = sampling.ray_box_intersection(
            o, d, jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0])
        )
        assert bool(hit[0]) and not bool(hit[1])
        np.testing.assert_allclose(float(near[0]), 4.0, rtol=1e-6)
        np.testing.assert_allclose(float(far[0]), 6.0, rtol=1e-6)

    def test_ray_box_behind(self):
        """A box entirely behind the origin must not hit (far > 0 test)."""
        o = jnp.array([[0.0, 0.0, 5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        _, _, hit = sampling.ray_box_intersection(
            o, d, jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0])
        )
        assert not bool(hit[0])

    def test_origin_dirs_w(self):
        t = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
        # 90° rotation about z
        r = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        t = t.at[:3, :3].set(r)
        o, d = sampling.origin_dirs_w(t[None], jnp.array([[1.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(o[0]), [1.0, 2.0, 3.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(d[0]), [0.0, 1.0, 0.0], atol=1e-6)

    def test_sample_z_values_modes(self, key):
        """The 3-mode z lattice (vmap.py:456-554): invalid depth spans to the
        batch max; this-object rays concentrate near the surface; other rays
        stay within [d-eps, d+stop_eps]."""
        depth = jnp.array([0.0, 2.0, 2.0, 4.0])
        state = jnp.array([0, 1, 0, 1])
        z = sampling.sample_z_values(
            key, depth, state, min_bound=0.0, n_bins_cam2surface=1,
            n_bins=9, surface_eps=0.1, stop_eps=0.05,
        )
        assert z.shape == (4, 10)
        z = np.asarray(z)
        # invalid ray: stratified over [0, 4] — must exceed its own (zero) depth
        assert z[0].max() > 1.0 and z[0].min() >= 0.0
        # this-object ray @2.0: back 9 bins within ±0.1 of the surface
        assert np.abs(z[1, 1:] - 2.0).max() <= 0.1 + 1e-6
        # front bin between min_bound and d - eps
        assert 0.0 <= z[1, 0] <= 1.9
        # other-object ray @2.0: back bins within [1.9, 2.05]
        assert z[2, 1:].min() >= 1.9 - 1e-6 and z[2, 1:].max() <= 2.05 + 1e-6

    def test_rays_to_points(self):
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 2.0]])
        z = jnp.array([[1.0, 2.0]])
        p = sampling.rays_to_points(o, d, z, obj_center=jnp.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(
            np.asarray(p[0]), [[-1.0, 0.0, 2.0], [-1.0, 0.0, 4.0]], atol=1e-6
        )

    def test_camera_ray_dirs(self):
        dirs = sampling.camera_ray_dirs(8, 6, fx=2.0, fy=2.0, cx=4.0, cy=3.0)
        assert dirs.shape == (6, 8, 3)
        np.testing.assert_allclose(np.asarray(dirs[3, 4]), [0.0, 0.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(dirs[0, 0]), [-2.0, -1.5, 1.0], atol=1e-6)


class TestStepBatchLoss:
    def _make(self, key, O=3, R=16, P=10):
        ks = jax.random.split(key, 6)
        alpha = jax.random.normal(ks[0], (O, R, P))
        color = jax.nn.sigmoid(jax.random.normal(ks[1], (O, R, P, 3)))
        z = jnp.sort(jax.random.uniform(ks[2], (O, R, P)) * 3 + 0.5, axis=-1)
        gt_d = jax.random.uniform(ks[3], (O, R)) * 3 + 0.5
        gt_c = jax.random.uniform(ks[4], (O, R, 3))
        state = jax.random.randint(ks[5], (O, R), 0, 3)
        return alpha, color, gt_d, gt_c, state, z

    def test_finite_and_positive(self, key):
        args = self._make(key)
        total, per_obj = losses.step_batch_loss(*args)
        assert np.isfinite(float(total))
        assert per_obj.shape == (3,)
        assert float(total) >= 0

    def test_active_mask_gates_slots(self, key):
        args = self._make(key)
        active = jnp.array([True, False, True])
        total, per_obj = losses.step_batch_loss(*args, active=active)
        assert float(per_obj[1]) == 0.0
        t_all, _ = losses.step_batch_loss(*args)
        assert float(total) < float(t_all)

    def test_inactive_slot_gets_zero_grads(self, key):
        """Gradient w.r.t. alpha of a gated slot must be exactly zero —
        this is what makes the preallocated object axis trainable."""
        alpha, color, gt_d, gt_c, state, z = self._make(key)
        active = jnp.array([True, False, True])

        def f(a):
            t, _ = losses.step_batch_loss(a, color, gt_d, gt_c, state, z, active=active)
            return t

        g = jax.grad(f)(alpha)
        assert float(jnp.abs(g[1]).sum()) == 0.0
        assert float(jnp.abs(g[0]).sum()) > 0.0

    def test_perfect_prediction_low_loss(self, key):
        """A field that renders exactly the GT depth/color/silhouette should
        have near-zero loss."""
        O, R, P = 1, 8, 10
        gt_d = jnp.full((O, R), 2.0)
        z = jnp.broadcast_to(jnp.linspace(0.5, 3.5, P), (O, R, P))
        # huge alpha at the sample closest to gt depth, -huge elsewhere
        closest = jnp.argmin(jnp.abs(z - gt_d[..., None]), axis=-1)
        alpha = jnp.where(
            jnp.arange(P)[None, None, :] == closest[..., None], 500.0, -500.0
        )
        gt_c = jnp.ones((O, R, 3)) * 0.25
        color = jnp.ones((O, R, P, 3)) * 0.25
        state = jnp.ones((O, R), dtype=jnp.int32)  # all this-object
        z_at = jnp.take_along_axis(z, closest[..., None], axis=-1)[..., 0]
        total, _ = losses.step_batch_loss(alpha, color, z_at, gt_c, state, z)
        assert float(total) < 1e-3

    def test_partfeat_cosine_term(self, key):
        alpha, color, gt_d, gt_c, state, z = self._make(key, O=2, R=8, P=10)
        C = 16
        k1, k2 = jax.random.split(key)
        gt_pf = jax.random.normal(k1, (2, 8, C))
        pred_pf = jax.random.normal(k2, (2, 8, 10, C))
        t_no, _ = losses.step_batch_loss(alpha, color, gt_d, gt_c, state, z)
        t_pf, _ = losses.step_batch_loss(
            alpha, color, gt_d, gt_c, state, z,
            gt_partfeat=gt_pf, pred_partfeat=pred_pf,
        )
        assert float(t_pf) != float(t_no)

    def test_zero_feature_rays_have_finite_grads(self):
        """Regression: an all-transparent ray renders a ZERO feature vector;
        jnp.linalg.norm's gradient at 0 is NaN and poisons the whole step
        even though the ray is masked (NaN * 0 = NaN). render_loss('cos')
        must keep an eps inside the sqrt."""
        O, R, P, C = 1, 4, 5, 8
        alpha = jnp.full((O, R, P), -500.0)   # occupancy ~ 0
        color = jnp.full((O, R, P, 3), 0.5)
        gt_d = jnp.ones((O, R))
        gt_c = jnp.full((O, R, 3), 0.5)
        state = jnp.ones((O, R), jnp.int32)
        z = jnp.broadcast_to(jnp.linspace(0.5, 2.0, P), (O, R, P))
        gt_pf = jnp.ones((O, R, C))
        hidden = jnp.zeros((O, R, P, 4))      # relu-dead clip hidden
        head = {"out_clip": {"w": jnp.ones((O, 4, C)),
                             "b": jnp.zeros((O, C))}}

        def f(a, h):
            t, _ = losses.step_batch_loss(
                a, color, gt_d, gt_c, state, z,
                gt_partfeat=gt_pf, pred_partfeat_hidden=h,
                partfeat_head=head,
            )
            return t

        ga, gh = jax.grad(f, argnums=(0, 1))(alpha, hidden)
        assert bool(jnp.isfinite(ga).all())
        assert bool(jnp.isfinite(gh).all())

    def test_partfeat_hidden_path_is_exact(self, key):
        """The composite-then-project fast path (clip hidden composited, one
        linear head per ray) must match per-point projection + compositing
        exactly — the head is linear, so the two orders are algebraically
        identical (ops.mlp.clip_project)."""
        from openobj_tpu.ops import mlp as mlp_ops

        O, R, P, H, C = 2, 8, 10, 4, 16
        alpha, color, gt_d, gt_c, state, z = self._make(key, O=O, R=R, P=P)
        ks = jax.random.split(key, 4)
        gt_pf = jax.random.normal(ks[0], (O, R, C))
        hidden = jax.nn.relu(jax.random.normal(ks[1], (O, R, P, H)))
        head = {
            "out_clip": {
                "w": jax.random.normal(ks[2], (O, H, C)),
                "b": jax.random.normal(ks[3], (O, C)),
            }
        }
        # legacy path: project every point, then composite inside the loss
        pred_pf = jnp.einsum("orph,ohc->orpc", hidden, head["out_clip"]["w"]) + \
            head["out_clip"]["b"][:, None, None, :]
        t_slow, per_slow = losses.step_batch_loss(
            alpha, color, gt_d, gt_c, state, z,
            gt_partfeat=gt_pf, pred_partfeat=pred_pf,
        )
        t_fast, per_fast = losses.step_batch_loss(
            alpha, color, gt_d, gt_c, state, z,
            gt_partfeat=gt_pf, pred_partfeat_hidden=hidden, partfeat_head=head,
        )
        np.testing.assert_allclose(
            np.asarray(per_fast), np.asarray(per_slow), rtol=2e-5, atol=2e-6
        )

        # unstacked head (bg path): w [H, C], hidden [1, R, P, H]
        head1 = {
            "out_clip": {"w": head["out_clip"]["w"][0], "b": head["out_clip"]["b"][0]}
        }
        pred1 = hidden[:1] @ head1["out_clip"]["w"] + head1["out_clip"]["b"]
        t1, _ = losses.step_batch_loss(
            alpha[:1], color[:1], gt_d[:1], gt_c[:1], state[:1], z[:1],
            gt_partfeat=gt_pf[:1], pred_partfeat=pred1,
        )
        t2, _ = losses.step_batch_loss(
            alpha[:1], color[:1], gt_d[:1], gt_c[:1], state[:1], z[:1],
            gt_partfeat=gt_pf[:1], pred_partfeat_hidden=hidden[:1],
            partfeat_head=head1,
        )
        np.testing.assert_allclose(float(t2), float(t1), rtol=2e-5)


class TestMergedGemm:
    """gemm_impl="merged" (column-merged sibling GEMMs, mlp_apply_merged):
    must match the segmented path in values and gradients — output columns
    of a merged GEMM accumulate independently, so the only roundoff-level
    deviation is the e1 concat's contraction reorder."""

    def _params_pts(self, key, clip=True):
        from openobj_tpu.models import object_field

        p = object_field.init_stacked_fields(
            key, 3, hidden=32, clip_size=64, scale=2.0
        )
        pts = jax.random.normal(key, (3, 40, 3))
        return p, pts

    def test_forward_parity_all_flag_combos(self, key):
        from openobj_tpu.models import object_field

        p, pts = self._params_pts(key)
        combos = [
            dict(),
            dict(clip_hidden_only=True),
            dict(do_clip=False),
            dict(do_alpha=False, do_clip=False),
            dict(do_color=False, do_clip=False),
        ]
        for kw in combos:
            r0 = object_field.field_apply_stacked(
                p, pts, gemm_impl="segmented", **kw)
            r1 = object_field.field_apply_stacked(
                p, pts, gemm_impl="merged", **kw)
            for x, y in zip(r0, r1):
                if x is None:
                    assert y is None
                    continue
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), atol=2e-5), kw

    def test_grad_parity(self, key):
        from openobj_tpu.models import object_field

        p, pts = self._params_pts(key)

        def loss(params, gi):
            a, c, f = object_field.field_apply_stacked(
                p if params is None else params, pts,
                clip_hidden_only=True, gemm_impl=gi)
            return a.sum() + (c ** 2).sum() + jnp.abs(f).sum()

        g0 = jax.grad(lambda q: loss(q, "segmented"))(p)
        g1 = jax.grad(lambda q: loss(q, "merged"))(p)
        for l0, l1 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            scale = float(jnp.max(jnp.abs(l0))) + 1e-9
            assert float(jnp.max(jnp.abs(l0 - l1))) / scale < 1e-4

    def test_merge_unmerge_roundtrip_bit_exact(self, key):
        """merge_mlp_params/unmerge_mlp_params are exact inverses (pure
        slicing/concat), on single AND stacked trees."""
        from openobj_tpu.ops import mlp

        single = mlp.init_mlp_params(key, 20, 12, hidden=16, clip_size=8)
        stacked = jax.vmap(
            lambda k: mlp.init_mlp_params(k, 20, 12, hidden=16, clip_size=8)
        )(jax.random.split(key, 3))
        for p in (single, stacked):
            back = mlp.unmerge_mlp_params(mlp.merge_mlp_params(p))
            assert jax.tree.structure(back) == jax.tree.structure(p)
            for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(back)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_premerged_layout_forward_matches_merged(self, key):
        """Evaluating on the pre-merged layout is the same merged math up
        to ONE deliberate accumulation reorder: e1 is consumed by row-
        partitioned matmuls (t@Wt + sins@Ws) instead of a concat-fed GEMM
        (that concat was the point of the layout), so outputs agree to
        f32 roundoff — everything downstream of e1 (slices of stored
        blocks = same GEMM widths) adds no further deviation. Checked for
        every head-flag combo the trainer/renderer uses."""
        from openobj_tpu.models import object_field
        from openobj_tpu.ops import mlp

        p, pts = self._params_pts(key)
        pm = {**p, "mlp": mlp.merge_mlp_params(p["mlp"])}
        combos = [
            dict(),
            dict(clip_hidden_only=True),
            dict(do_clip=False),
            dict(do_alpha=False, do_clip=False),
            dict(do_color=False, do_clip=False),
        ]
        for kw in combos:
            r0 = object_field.field_apply_stacked(
                p, pts, gemm_impl="merged", **kw)
            r1 = object_field.field_apply_stacked(
                pm, pts, gemm_impl="merged", **kw)
            for x, y in zip(r0, r1):
                if x is None:
                    assert y is None, kw
                    continue
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-5,
                    err_msg=str(kw))
        # do_cat=False (mlp-level knob): the pre layout serves in_layer's
        # columns from a slice of e1w
        emb = jax.random.normal(key, (40, 87 + 42))
        r0 = mlp.mlp_apply(jax.tree.map(lambda x: x[0], p["mlp"]),
                           emb, gemm_impl="merged", do_cat=False)
        r1 = mlp.mlp_apply(mlp.merge_mlp_params(
            jax.tree.map(lambda x: x[0], p["mlp"])),
            emb, gemm_impl="merged", do_cat=False)
        for x, y in zip(r0, r1):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_train_frame_converges_with_merged(self, key):
        """One jitted frame with gemm_impl=merged trains to ~the same loss
        as segmented on the same batch (same RNG stream); merged_params
        (pre-concatenated weight blocks, converted once per frame) must
        match merged to f32 roundoff — same elementwise update math,
        different storage/accumulation order — and must hand back the
        state in the reference layout."""
        from openobj_tpu.core import trainer as T
        from openobj_tpu.core.frame_store import append_frame, init_frame_store
        from openobj_tpu.core.scene import Camera

        rng = np.random.default_rng(0)
        cam = Camera(width=24, height=18, fx=15.0, fy=15.0, cx=12.0, cy=9.0)
        store = init_frame_store(2, cam.height, cam.width, part_feat_dim=0)
        inst = rng.integers(-1, 3, (cam.height, cam.width)).astype(np.int32)
        store, _ = append_frame(
            store,
            rng.integers(0, 255, (cam.height, cam.width, 3)).astype(np.uint8),
            rng.uniform(0.5, 3.0, (cam.height, cam.width)).astype(np.float32),
            inst, np.eye(4, dtype=np.float32))
        tables = {
            "kf_frames": jnp.zeros((4, 2), jnp.int32),
            "kf_bbox": jnp.tile(jnp.asarray(
                [0, cam.height, 0, cam.width], jnp.float32), (4, 2, 1)),
            "n_kf": jnp.ones((4,), jnp.int32),
            "latest2": jnp.zeros((4, 2), jnp.int32),
            "active": jnp.ones((4,), bool),
            "obj_inst": jnp.arange(1, 5, dtype=jnp.int32),
            "obj_center": jnp.zeros((4, 3), jnp.float32),
        }
        losses, states = {}, {}
        for gi in ("segmented", "merged", "merged_params"):
            cfg = T.TrainConfig(
                n_iters_per_frame=10, win_size=2, n_samples_per_frame=8,
                hidden=16, hidden_bg=16, clip_size=8, do_bg=False,
                part_mode=False, gemm_impl=gi)
            state = T.init_train_state(jax.random.PRNGKey(0), cfg, n_slots=4)
            out, per_iter = T.train_frame(
                state, store, cam.ray_dirs(), tables, None,
                jax.random.PRNGKey(1), cfg)
            losses[gi] = np.asarray(per_iter)
            states[gi] = out
        assert np.isfinite(losses["merged"]).all()
        np.testing.assert_allclose(
            losses["merged"], losses["segmented"], rtol=2e-3)
        # pre-merged storage is the same elementwise math, but XLA may
        # re-split the reference layout's concat-fed GEMMs, so equality
        # holds to f32 roundoff, not bitwise (measured ~5e-6 rel after
        # 10 steps); the state must come back in the REFERENCE layout
        np.testing.assert_allclose(
            losses["merged_params"], losses["merged"], rtol=1e-4)
        assert "in_layer" in states["merged_params"].fg_params["mlp"]
        for a, b in zip(
            jax.tree.leaves(states["merged"].fg_params),
            jax.tree.leaves(states["merged_params"].fg_params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5)

