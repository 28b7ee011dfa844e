"""Head-to-head against the reference's EXECUTING code (not its formulas).

Every parity claim before this harness was formula-twin level: docstrings
cite /root/reference/objnerf/loss.py:41-99 etc. and tests check forward
parity on imported checkpoints. This script closes the loop by importing
the reference's actual math core — model.py / embedding.py /
render_rays.py / loss.py (torch-cpu; they import only torch+numpy) — and
training BOTH frameworks on the SAME data:

  * identical initial weights (ours exported through interop into the
    reference's real ``OccupancyMap``/``UniDirsEmbed`` modules);
  * identical ray batches (our sampler's draws, exported to numpy by
    replicating ``train_frame``'s key splits — the JAX side then runs the
    real production ``train_frame`` with the same key, regenerating the
    exact same batches internally);
  * the reference's own optimization loop (train.py:394-474): torch.func
    vmap ensemble forward (the modern spelling of its functorch
    combine_state_for_ensemble strategy, utils.py:55-62), its
    ``loss.step_batch_loss``, one torch AdamW over the stacked params +
    the background model (train.py:78,240-251).

Outputs (``--out`` JSON + stdout table, summarized in docs/PARITY.md):
  * per-step loss curves from both loops and their divergence;
  * held-out eval: per-object depth L1 + PSNR, each side rendered by its
    OWN forward math, vs the synthetic ground truth;
  * final parameter divergence after N frames x n_iters AdamW steps;
  * ``--timing``: measured CPU s/frame of the reference's loop vs our
    ``train_frame`` at the room_0 workload shape (BASELINE.md) on the SAME
    host — the hardware-normalized cost ratio bench.py reports as
    ``ratio_vs_reference_cpu`` (the GPU-estimate denominator's measured
    companion). The torch side is NOT charged for its Python sampling
    stage (we hand it ready batches); ours includes sampling — the ratio
    is conservative in the reference's favor.

Run:  JAX_PLATFORMS=cpu python scripts/reference_twin.py [--timing] [--full]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

REFERENCE_OBJNERF = "/root/reference/objnerf"

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


# --------------------------------------------------------------------------- #
# loading the reference's executing modules
# --------------------------------------------------------------------------- #


def reference_available(root: str = REFERENCE_OBJNERF) -> bool:
    return all(
        os.path.exists(os.path.join(root, f))
        for f in ("model.py", "embedding.py", "render_rays.py", "loss.py")
    )


def load_reference_objnerf(root: str = REFERENCE_OBJNERF) -> dict:
    """Import the reference's math core by file path.

    ``loss.py`` does a bare ``import render_rays``, so render_rays is
    registered in sys.modules under that name just long enough for loss.py
    to bind it, then removed (loss keeps its own reference)."""
    mods = {}
    for name in ("render_rays", "embedding", "model", "loss"):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(root, name + ".py")
        )
        mod = importlib.util.module_from_spec(spec)
        if name == "loss":
            sys.modules["render_rays"] = mods["render_rays"]
            try:
                spec.loader.exec_module(mod)
            finally:
                sys.modules.pop("render_rays", None)
        else:
            spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


# --------------------------------------------------------------------------- #
# the reference-side twin loop (torch)
# --------------------------------------------------------------------------- #


class ReferenceTwin:
    """The reference's per-frame optimization loop, built from ITS modules.

    Mirrors train.py:394-474: torch.func-vmapped ensemble forward over the
    stacked fg params, the bg model forward separately, loss.step_batch_loss
    for both, summed, one backward, one AdamW step (lr/wd per
    train.py:78,240-251; stacked params are the optimizer leaves exactly as
    update_vmap registers them, utils.py:55-62)."""

    def __init__(self, ref: dict, fg_param_trees: list, bg_params: dict | None,
                 cfg, part_mode: bool = False, dtype=None):
        import torch

        from openobj_tpu import interop
        from openobj_tpu.ops import embedding as our_embedding

        self.torch = torch
        self.ref = ref
        self.cfg = cfg
        self.part_mode = part_mode
        self.dtype = torch.float64 if dtype in ("float64", np.float64,
                                                torch.float64) \
            else torch.float32
        np_dtype = np.float64 if self.dtype == torch.float64 else np.float32
        emb1, emb2 = our_embedding.embedding_split(cfg.max_deg)

        def build(params, hidden):
            fc = ref["model"].OccupancyMap(
                emb1, emb2, hidden_size=hidden, do_color=True, do_clip=True,
                clip_size=cfg.clip_size,
            )
            pe = ref["embedding"].UniDirsEmbed(
                min_deg=0, max_deg=cfg.max_deg,
                scale=float(np.asarray(params["pe"]["scale"])),
            )
            if self.dtype == torch.float64:
                fc, pe = fc.double(), pe.double()
            fc_sd, pe_sd = interop.params_to_reference_state_dicts(
                params, dtype=np_dtype)
            fc.load_state_dict(fc_sd)
            # reference PE state dict carries B_layer.weight + scale;
            # frequency_bands is non-persistent (embedding.py:43)
            pe.load_state_dict(pe_sd, strict=False)
            return fc, pe

        self.fc_models = []
        self.pe_models = []
        for p in fg_param_trees:
            fc, pe = build(p, cfg.hidden)
            self.fc_models.append(fc)
            self.pe_models.append(pe)

        from torch.func import functional_call, stack_module_state

        fc_params, fc_buffers = stack_module_state(self.fc_models)
        pe_params, pe_buffers = stack_module_state(self.pe_models)
        # stacked params are the trainable leaves (update_vmap does
        # [p.requires_grad_() for p in params] on the combined state)
        self.fc_params = {k: v.detach().clone().requires_grad_(True)
                          for k, v in fc_params.items()}
        self.pe_params = {k: v.detach().clone().requires_grad_(True)
                          for k, v in pe_params.items()}
        self.fc_buffers = fc_buffers
        self.pe_buffers = pe_buffers
        self._fc0, self._pe0 = self.fc_models[0], self.pe_models[0]

        def fwd_one(fc_p, fc_b, pe_p, pe_b, pts):
            emb = functional_call(self._pe0, (pe_p, pe_b), (pts,))
            return functional_call(self._fc0, (fc_p, fc_b), (emb,))

        self._vmapped = torch.vmap(fwd_one)

        self.bg_fc = self.bg_pe = None
        groups = [{"params": list(self.fc_params.values())},
                  {"params": list(self.pe_params.values())}]
        if bg_params is not None:
            self.bg_fc, self.bg_pe = build(bg_params, cfg.hidden_bg)
            groups.append({"params": list(self.bg_fc.parameters())})
            groups.append({"params": list(self.bg_pe.parameters())})
        self.optimiser = torch.optim.AdamW(
            groups, lr=cfg.learning_rate, weight_decay=cfg.weight_decay
        )

    # ---------------------------------------------------------------- #

    def forward_stacked(self, pts):
        """[O, R, P, 3] -> (alpha [O,R,P,1], color [O,R,P,3], clip)."""
        return self._vmapped(self.fc_params, self.fc_buffers,
                             self.pe_params, self.pe_buffers, pts)

    def compute_loss(self, fg_sl: dict, bg_sl: dict | None):
        """The reference's per-iteration loss on one step's ray slices
        (numpy dicts with keys origins/dirs_w/z/depth/rgb/state
        [+partfeat]) — its loss.step_batch_loss on the vmapped ensemble
        forward, plus the bg model's loss (train.py:436-463)."""
        torch = self.torch
        t = lambda x: torch.from_numpy(  # noqa: E731
            np.ascontiguousarray(x)).to(self.dtype) \
            if np.asarray(x).dtype.kind == "f" \
            else torch.from_numpy(np.ascontiguousarray(x))

        pts = t(fg_sl["origins"])[:, :, None, :] + \
            t(fg_sl["dirs_w"])[:, :, None, :] * t(fg_sl["z"])[..., None]
        alpha, color, clip = self.forward_stacked(pts)
        kw = {}
        if self.part_mode and "partfeat" in fg_sl:
            kw = dict(gt_partfeat=t(fg_sl["partfeat"]).to(self.dtype),
                      pred_partfeat=clip)
        batch_loss, _ = self.ref["loss"].step_batch_loss(
            alpha, color, t(fg_sl["depth"]), t(fg_sl["rgb"]),
            t(fg_sl["state"]), None, t(fg_sl["z"]),
            color_scaling=self.cfg.color_scaling,
            opacity_scaling=self.cfg.opacity_scaling,
            partfeat_scaling=self.cfg.partfeat_scaling, **kw,
        )
        if bg_sl is not None and self.bg_fc is not None:
            pts_bg = t(bg_sl["origins"])[:, None, :] + \
                t(bg_sl["dirs_w"])[:, None, :] * t(bg_sl["z"])[..., None]
            bg_alpha, bg_color, bg_clip = self.bg_fc(self.bg_pe(pts_bg))
            kw = {}
            if self.part_mode and "partfeat" in bg_sl:
                kw = dict(gt_partfeat=t(bg_sl["partfeat"]).to(self.dtype)[None],
                          pred_partfeat=bg_clip[None])
            bg_loss, _ = self.ref["loss"].step_batch_loss(
                bg_alpha[None], bg_color[None], t(bg_sl["depth"])[None],
                t(bg_sl["rgb"])[None], t(bg_sl["state"])[None], None,
                t(bg_sl["z"])[None],
                color_scaling=self.cfg.color_scaling,
                opacity_scaling=self.cfg.opacity_scaling,
                partfeat_scaling=self.cfg.partfeat_scaling, **kw,
            )
            batch_loss = batch_loss + bg_loss
        return batch_loss

    def loss_and_grads(self, fg_sl: dict, bg_sl: dict | None = None):
        """(loss, stacked fc grads, stacked pe grads, bg grads) with NO
        optimizer step — the one-step parity probe."""
        self.optimiser.zero_grad(set_to_none=True)
        loss = self.compute_loss(fg_sl, bg_sl)
        loss.backward()
        fc_g = {k: None if v.grad is None else v.grad.detach().clone()
                for k, v in self.fc_params.items()}
        pe_g = {k: None if v.grad is None else v.grad.detach().clone()
                for k, v in self.pe_params.items()}
        bg_g = {}
        if self.bg_fc is not None:
            for name, p in self.bg_fc.named_parameters():
                bg_g["fc." + name] = (None if p.grad is None
                                      else p.grad.detach().clone())
            for name, p in self.bg_pe.named_parameters():
                bg_g["pe." + name] = (None if p.grad is None
                                      else p.grad.detach().clone())
        self.optimiser.zero_grad(set_to_none=True)
        return float(loss.detach()), fc_g, pe_g, bg_g

    def step(self, fg_sl: dict, bg_sl: dict | None) -> float:
        """One optimizer step (backward + AdamW, train.py:465-474)."""
        batch_loss = self.compute_loss(fg_sl, bg_sl)
        batch_loss.backward()
        self.optimiser.step()
        self.optimiser.zero_grad(set_to_none=True)
        return float(batch_loss.detach())

    def train_frame(self, fg_steps: list, bg_steps: list | None) -> list:
        return [
            self.step(fg_steps[i], bg_steps[i] if bg_steps else None)
            for i in range(len(fg_steps))
        ]

    # ---------------------------------------------------------------- #

    def object_params_numpy(self, k: int) -> dict:
        """Slot k's current stacked params -> our param-pytree layout."""
        from openobj_tpu import interop

        fc_sd = {key: v[k].detach() for key, v in self.fc_params.items()}
        pe_sd = {key: v[k].detach() for key, v in self.pe_params.items()}
        pe_sd["scale"] = self.pe_buffers["scale"][k]
        return interop.reference_state_dicts_to_params(fc_sd, pe_sd)

    def render_rays_object(self, k: int, origins, dirs, z):
        """Composite depth/color along given rays with the REFERENCE's own
        forward + termination math (render_rays.py:32-63)."""
        torch = self.torch
        rr = self.ref["render_rays"]
        with torch.no_grad():
            pts = (torch.from_numpy(origins)[:, None, :]
                   + torch.from_numpy(dirs)[:, None, :]
                   * torch.from_numpy(z)[..., None])
            alpha, color, _ = self._vmapped(
                self.fc_params, self.fc_buffers,
                self.pe_params, self.pe_buffers, pts[None].expand(
                    len(self.fc_models), *pts.shape),
            )
            occ = rr.occupancy_activation(alpha[k, ..., 0])
            term = rr.occupancy_to_termination(occ)
            depth = rr.render(term, torch.from_numpy(z))
            col = rr.render(term[..., None], color[k], dim=-2)
        return depth.numpy(), col.numpy()


# --------------------------------------------------------------------------- #
# batch export: the exact arrays train_frame consumes, as numpy
# --------------------------------------------------------------------------- #


def export_frame_batches(key, store, cam_dirs, fg_tables, bg_tables, cfg):
    """Replicate train_frame's internal key splits (core/trainer.py:554)
    and return the per-step ray slices as numpy (ray-major), so the torch
    twin consumes byte-identical data to what the JAX side regenerates."""
    import jax

    from openobj_tpu.core import trainer

    k_fg, k_bg, _ = jax.random.split(key, 3)
    fg = trainer.sample_fg_batch(k_fg, store, cam_dirs, fg_tables, cfg,
                                 scan_order=True)
    bg = (trainer.sample_bg_batch(k_bg, store, cam_dirs, bg_tables, cfg,
                                  scan_order=True)
          if cfg.do_bg and bg_tables is not None else None)

    def steps(batch, is_bg):
        if batch is None:
            return None
        out = []
        host = {k: np.asarray(v) for k, v in batch.items()}
        for i in range(cfg.n_iters_per_frame):
            sl = {k: v[i] for k, v in host.items()}
            sl = trainer.restore_ray_major(sl)
            if "partfeat_idx" in sl and store.partfeat is not None:
                pf = np.asarray(store.partfeat)
                c = pf.shape[-1]
                idx = sl.pop("partfeat_idx")
                sl["partfeat"] = pf.reshape(-1, c)[idx.reshape(-1)].reshape(
                    *idx.shape, c)
            out.append(sl)
        return out

    return steps(fg, False), steps(bg, True)


# --------------------------------------------------------------------------- #
# the convergence twin
# --------------------------------------------------------------------------- #


def run_convergence_twin(n_frames: int = 8, n_iters: int = 100,
                         seed: int = 0, verbose: bool = True,
                         chaos_yardstick: bool = True) -> dict:
    """Train the reference's executing loop and our train_frame on the SAME
    synthetic-fixture batches; return loss-curve divergence + held-out
    eval metrics for both.

    ``chaos_yardstick``: also train a SECOND copy of the reference loop
    from the same init on a different (equally-distributed) batch draw.
    Both main loops consume byte-identical batches, so their end-of-run
    eval deltas are pure f32-roundoff amplified through n_frames x n_iters
    AdamW steps (chaotic, grows without bound as training runs longer);
    the yardstick measures the same amplification WITHIN the reference —
    jax-vs-ref parity claims are judged against ref-vs-ref spread."""
    import jax
    import jax.numpy as jnp

    from openobj_tpu.core import trainer
    from openobj_tpu.core.scene import Camera, SceneMapper
    from openobj_tpu.data import synthetic
    from openobj_tpu.models import object_field
    from openobj_tpu.ops import rendering, sampling

    ref = load_reference_objnerf()
    cam = Camera(width=96, height=72, fx=60.0, fy=60.0, cx=48.0, cy=36.0)
    cfg = trainer.TrainConfig(
        n_iters_per_frame=n_iters, win_size=5, n_samples_per_frame=24,
        win_size_bg=5, n_samples_per_frame_bg=48,
        hidden=32, hidden_bg=64, clip_size=8, part_mode=False,
    )
    scene = synthetic.default_scene(n_spheres=2)
    mapper = SceneMapper(cam, cfg, frame_capacity=32, initial_bucket=8,
                         seed=seed)
    dirs = np.asarray(cam.ray_dirs())
    # orbit starting at pi/2 (eye on +y): both spheres sit at +-1.2 x and are
    # laterally separated in view. At angle 0 the near sphere fully occludes
    # the far one, so the far object would only REGISTER at frame 1 — and the
    # twin requires the whole object set visible in frame 0 (constant slots)
    frames = []
    for i in range(n_frames):
        t_wc = synthetic.orbit_pose(np.pi / 2 + 2 * np.pi * i / n_frames)
        rgb_i, depth_i, inst_i = scene.render(t_wc, dirs)
        frames.append((rgb_i, depth_i, inst_i, t_wc))

    # ingest frame 0 (allocates slots) so both sides start from the SAME
    # initial weights
    rgb, depth, inst, t_wc = frames[0]
    mapper.process_frame(rgb, depth, inst, t_wc, train=False)
    state = mapper.state
    n_active = mapper.n_objects
    slots = [mapper.registry.inst_to_slot[i]
             for i in sorted(mapper.registry.inst_to_slot)]
    inst_ids = sorted(mapper.registry.inst_to_slot)

    # torch twin only carries the ACTIVE slots; inactive slots contribute
    # exactly 0 to our loss (active-gated) and receive no updates
    fg_param_trees = [
        jax.tree.map(np.asarray, object_field.slice_slot(state.fg_params, s))
        for s in slots
    ]
    bg_params = jax.tree.map(np.asarray, state.bg_params)
    twin = ReferenceTwin(ref, fg_param_trees, bg_params, cfg)
    twin_b = (ReferenceTwin(ref, fg_param_trees, bg_params, cfg)
              if chaos_yardstick else None)

    master = jax.random.PRNGKey(seed + 1000)
    master_b = jax.random.PRNGKey(seed + 424242)
    curves_ref, curves_jax = [], []
    for f, (rgb, depth, inst, t_wc) in enumerate(frames):
        if f > 0:
            mapper.process_frame(rgb, depth, inst, t_wc, train=False)
            assert mapper.n_objects == n_active, \
                "twin assumes a constant object set (all visible in frame 0)"
            state = trainer.TrainState(
                fg_params=state.fg_params, fg_opt=state.fg_opt,
                bg_params=state.bg_params, bg_opt=state.bg_opt,
            )
        fg_tables = mapper._fg_tables_device()
        bg_tables = mapper._bg_tables_device()
        k = jax.random.fold_in(master, f)
        fg_steps, bg_steps = export_frame_batches(
            k, mapper.store, mapper.cam_dirs, fg_tables, bg_tables, cfg
        )
        # slot->twin-index alignment: twin index j is slots[j]
        fg_steps_t = [
            {kk: v[slots] if v.shape and v.shape[0] == state.n_slots else v
             for kk, v in sl.items()}
            for sl in fg_steps
        ]
        t0 = time.perf_counter()
        ref_losses = twin.train_frame(fg_steps_t, bg_steps)
        t_ref = time.perf_counter() - t0
        if twin_b is not None:
            fg_steps_b, bg_steps_b = export_frame_batches(
                jax.random.fold_in(master_b, f), mapper.store,
                mapper.cam_dirs, fg_tables, bg_tables, cfg,
            )
            twin_b.train_frame(
                [{kk: v[slots]
                  if v.shape and v.shape[0] == state.n_slots else v
                  for kk, v in sl.items()} for sl in fg_steps_b],
                bg_steps_b,
            )
        t0 = time.perf_counter()
        state, jax_losses = trainer.train_frame(
            state, mapper.store, mapper.cam_dirs, fg_tables, bg_tables,
            k, cfg,
        )
        jax_losses = np.asarray(jax.block_until_ready(jax_losses))
        t_jax = time.perf_counter() - t0
        curves_ref.append(ref_losses)
        curves_jax.append(jax_losses.tolist())
        if verbose:
            d = np.abs(np.asarray(ref_losses) - jax_losses)
            rel = d / np.maximum(np.abs(np.asarray(ref_losses)), 1e-8)
            print(f"frame {f}: ref loss {ref_losses[0]:.4f}->"
                  f"{ref_losses[-1]:.4f}  jax {jax_losses[0]:.4f}->"
                  f"{jax_losses[-1]:.4f}  max|rel diff| {rel.max():.2e} "
                  f"(ref {t_ref:.1f}s, jax {t_jax:.1f}s)")
        mapper.state = state

    # ---- loss-curve divergence ----
    cr = np.asarray(curves_ref, np.float64)
    cj = np.asarray(curves_jax, np.float64)
    rel = np.abs(cr - cj) / np.maximum(np.abs(cr), 1e-8)

    # ---- final parameter divergence (active slots) ----
    pdiv = []
    for j, s in enumerate(slots):
        ours = jax.tree.map(np.asarray,
                            object_field.slice_slot(state.fg_params, s))
        theirs = twin.object_params_numpy(j)
        leaves_o = jax.tree.leaves(ours)
        leaves_t = jax.tree.leaves(theirs)
        num = sum(float(np.abs(a - b).max()) for a, b in
                  zip(leaves_o, leaves_t))
        den = max(len(leaves_o), 1)
        pdiv.append(num / den)

    # ---- held-out eval: both sides render with their OWN math ----
    t_eval = synthetic.orbit_pose(np.pi / 2 + 0.3)
    rgb_gt, depth_gt, inst_gt = scene.render(t_eval, dirs)
    z = np.linspace(0.2, 5.0, 120).astype(np.float32)
    eval_rows = {}
    for j, oid in enumerate(inst_ids):
        mask = inst_gt == oid
        rows, cols = np.where(mask)
        if len(rows) < 10:
            continue
        sel = np.linspace(0, len(rows) - 1, min(300, len(rows))).astype(int)
        rows, cols = rows[sel], cols[sel]
        d_c = jnp.asarray(dirs[rows, cols])
        o, dw = sampling.origin_dirs_w(
            jnp.asarray(t_eval, jnp.float32)[None], d_c)
        zz = np.broadcast_to(z, (len(rows), len(z))).copy()

        # ours
        pts = sampling.rays_to_points(o, dw, jnp.asarray(zz))
        params = mapper.params_for_instance(oid)
        a, c, _ = object_field.field_apply(params, pts)
        w = rendering.occupancy_to_termination(
            rendering.occupancy_activation(a[..., 0]))
        rd_j = np.asarray(rendering.render(w, jnp.asarray(zz)))
        rc_j = np.asarray(rendering.render(w[..., None], c, axis=-2))

        # theirs (reference forward + reference compositing)
        rd_t, rc_t = twin.render_rays_object(
            j, np.asarray(o), np.asarray(dw), zz)

        gt_d = depth_gt[rows, cols]
        gt_c = rgb_gt[rows, cols] / 255.0

        def psnr(pred, gt):
            mse = float(np.mean((pred - gt) ** 2))
            return float(10 * np.log10(1.0 / max(mse, 1e-12)))

        eval_rows[int(oid)] = {
            "depth_l1_jax": float(np.abs(rd_j - gt_d).mean()),
            "depth_l1_ref": float(np.abs(rd_t - gt_d).mean()),
            "psnr_jax": psnr(rc_j, gt_c),
            "psnr_ref": psnr(rc_t, gt_c),
            "cross_depth_l1": float(np.abs(rd_j - rd_t).mean()),
            "cross_color_l1": float(np.abs(rc_j - rc_t).mean()),
        }
        if twin_b is not None:
            rd_b, rc_b = twin_b.render_rays_object(
                j, np.asarray(o), np.asarray(dw), zz)
            eval_rows[int(oid)]["psnr_ref_b"] = psnr(rc_b, gt_c)
            eval_rows[int(oid)]["depth_l1_ref_b"] = float(
                np.abs(rd_b - gt_d).mean())

    return {
        "protocol": {
            "n_frames": n_frames, "n_iters": n_iters,
            "n_objects": n_active, "hidden": cfg.hidden,
            "hidden_bg": cfg.hidden_bg,
            "rays_per_step_fg": cfg.n_rays_per_step,
            "rays_per_step_bg": cfg.n_rays_per_step_bg,
        },
        "loss_rel_diff": {
            "max": float(rel.max()),
            "mean": float(rel.mean()),
            "final_step": float(rel[-1, -1]),
        },
        "loss_first_step": {"ref": float(cr[0, 0]), "jax": float(cj[0, 0])},
        "loss_final": {"ref": float(cr[-1, -1]), "jax": float(cj[-1, -1])},
        "param_max_abs_diff_per_slot": pdiv,
        "eval": eval_rows,
        "psnr_delta_max_db": max(
            (abs(r["psnr_jax"] - r["psnr_ref"]) for r in eval_rows.values()),
            default=None,
        ),
        # chaos yardstick: the reference vs ITSELF from the same init on an
        # equally-distributed batch draw — the f32-chaos floor any cross-
        # framework comparison at this length inherits
        "psnr_ref_self_delta_max_db": max(
            (abs(r["psnr_ref"] - r["psnr_ref_b"])
             for r in eval_rows.values() if "psnr_ref_b" in r),
            default=None,
        ),
    }


def run_multiseed(n_seeds: int = 5, n_frames: int = 8,
                  n_iters: int = 100, verbose: bool = True) -> dict:
    """Convergence twin over ``n_seeds`` independent seeds: per-seed init +
    batch draws differ, protocol identical. The round-4 verdict's point:
    a single (jax, ref, ref_b) triple is not a distribution — "inside the
    f32 chaos floor" needs the floor MEASURED as a spread. Returns both
    frameworks' PSNR distributions (mean over objects, per seed), the
    per-seed cross-framework deltas, and the per-seed ref-vs-ref self
    deltas (same init, equally-distributed different batch draw) that
    define the floor."""
    psnr_jax, psnr_ref, cross, self_ref = [], [], [], []
    for s in range(n_seeds):
        if verbose:
            print(f"-- multiseed {s + 1}/{n_seeds} (seed {s}) --", flush=True)
        r = run_convergence_twin(n_frames=n_frames, n_iters=n_iters,
                                 seed=s, verbose=verbose)
        rows = r["eval"].values()
        psnr_jax.append(float(np.mean([e["psnr_jax"] for e in rows])))
        psnr_ref.append(float(np.mean([e["psnr_ref"] for e in rows])))
        cross.append(float(r["psnr_delta_max_db"]))
        self_ref.append(float(r["psnr_ref_self_delta_max_db"]))

    def dist(xs):
        return {"per_seed": [round(x, 3) for x in xs],
                "mean": round(float(np.mean(xs)), 3),
                "std": round(float(np.std(xs)), 3),
                "min": round(float(np.min(xs)), 3),
                "max": round(float(np.max(xs)), 3)}

    out = {
        "n_seeds": n_seeds,
        "protocol": {"n_frames": n_frames, "n_iters": n_iters},
        # mean-over-objects PSNR of each framework's OWN render, per seed
        "psnr_jax_db": dist(psnr_jax),
        "psnr_ref_db": dist(psnr_ref),
        # max-over-objects |psnr_jax - psnr_ref| per seed (byte-identical
        # batches within a seed — the cross-framework divergence)
        "cross_delta_max_db": dist(cross),
        # max-over-objects |psnr_ref - psnr_ref_b| per seed (reference vs
        # itself, same init, different equally-distributed draw — the
        # measured f32 chaos floor)
        "ref_self_delta_max_db": dist(self_ref),
        # The claim that matters is DISTRIBUTION equality: each framework's
        # own-render PSNR over seeds. Per-seed paired deltas are extreme-
        # value statistics of a chaotic amplifier (one seed measured 6 dB
        # cross vs a 3.6 dB max self-floor from only 5 samples of that
        # tail) — the means differing by a fraction of a standard error is
        # the meaningful parity statement.
        "mean_diff_db": round(abs(float(np.mean(psnr_jax))
                                  - float(np.mean(psnr_ref))), 3),
        "mean_diff_standard_errors": round(
            abs(float(np.mean(psnr_jax)) - float(np.mean(psnr_ref)))
            / max(float(np.sqrt(np.var(psnr_jax) / n_seeds
                                + np.var(psnr_ref) / n_seeds)), 1e-9), 2),
        "distributions_indistinguishable": bool(
            abs(float(np.mean(psnr_jax)) - float(np.mean(psnr_ref)))
            <= 2.0 * float(np.sqrt(np.var(psnr_jax) / n_seeds
                                   + np.var(psnr_ref) / n_seeds))),
        "cross_mean_within_self_max": bool(
            np.mean(cross) <= np.max(self_ref)),
    }
    if verbose:
        print(json.dumps(out, indent=2), flush=True)
    return out


# --------------------------------------------------------------------------- #
# the float64 one-step loss+grad parity probe
# --------------------------------------------------------------------------- #


def run_grad_check(seed: int = 0, verbose: bool = True) -> dict:
    """One optimizer-step loss + gradient parity, torch (the reference's
    executing modules) vs JAX (our production ``_loss_for_slice``), in
    FLOAT64 on byte-identical batches and weights.

    Why f64: in f32 the two stacks disagree by ~3e-3 relative at step 0 —
    measured to be roundoff (different sin/GEMM orderings) amplified
    ~2000x through an untrained random MLP, not semantics. f64 removes the
    amplifier: agreement at <=1e-9 relative on the loss AND every gradient
    leaf is an executable proof that forward + loss + backward are the
    same math as /root/reference/objnerf/{model,embedding,render_rays,
    loss}.py, as run by torch autograd."""
    import jax
    import jax.numpy as jnp

    enable_x64 = jax.enable_x64  # jax>=0.9 top-level context manager

    from openobj_tpu import interop
    from openobj_tpu.core import trainer
    from openobj_tpu.core.scene import Camera, SceneMapper
    from openobj_tpu.data import synthetic
    from openobj_tpu.models import object_field

    ref = load_reference_objnerf()
    cam = Camera(width=96, height=72, fx=60.0, fy=60.0, cx=48.0, cy=36.0)
    cfg = trainer.TrainConfig(
        n_iters_per_frame=2, win_size=5, n_samples_per_frame=24,
        win_size_bg=5, n_samples_per_frame_bg=48,
        hidden=32, hidden_bg=64, clip_size=8, part_mode=False,
    )
    scene = synthetic.default_scene(n_spheres=2)
    mapper = SceneMapper(cam, cfg, frame_capacity=8, initial_bucket=8,
                         seed=seed)
    dirs = np.asarray(cam.ray_dirs())
    t_wc = synthetic.orbit_pose(np.pi / 2)
    rgb, depth, inst = scene.render(t_wc, dirs)
    mapper.process_frame(rgb, depth, inst, t_wc, train=False)
    state = mapper.state
    slots = [mapper.registry.inst_to_slot[i]
             for i in sorted(mapper.registry.inst_to_slot)]

    fg_tables = mapper._fg_tables_device()
    bg_tables = mapper._bg_tables_device()
    fg_steps, bg_steps = export_frame_batches(
        jax.random.PRNGKey(seed + 77), mapper.store, mapper.cam_dirs,
        fg_tables, bg_tables, cfg,
    )
    fg_sl, bg_sl = fg_steps[0], bg_steps[0]

    def f64(x):
        x = np.asarray(x)
        return x.astype(np.float64) if x.dtype.kind == "f" else x

    fg64 = {k: f64(v) for k, v in fg_sl.items()}
    bg64 = {k: f64(v) for k, v in bg_sl.items()}
    fg_params64 = jax.tree.map(lambda a: f64(np.asarray(a)), state.fg_params)
    bg_params64 = jax.tree.map(lambda a: f64(np.asarray(a)), state.bg_params)
    active_np = np.asarray(fg_tables["active"])

    # ---- torch side: the reference's modules in double precision ----
    fg_trees64 = [
        jax.tree.map(np.asarray, object_field.slice_slot(fg_params64, s))
        for s in slots
    ]
    twin = ReferenceTwin(ref, fg_trees64, bg_params64, cfg, dtype="float64")
    fg64_t = {k: v[slots] if v.shape and v.shape[0] == state.n_slots else v
              for k, v in fg64.items()}
    loss_t, fc_g, pe_g, bg_g = twin.loss_and_grads(fg64_t, bg64)

    # ---- jax side: production _loss_for_slice under x64 ----
    with enable_x64():
        fg_j = {k: jnp.asarray(v) for k, v in fg64.items()}
        bg_j = {k: jnp.asarray(v) for k, v in bg64.items()}
        active = jnp.asarray(active_np)
        fg_p = jax.tree.map(jnp.asarray, fg_params64)
        bg_p = jax.tree.map(jnp.asarray, bg_params64)

        def loss_fn(ps):
            total, _ = trainer._loss_for_slice(ps["fg"], dict(fg_j), active,
                                               cfg, is_bg=False)
            bg_total, _ = trainer._loss_for_slice(ps["bg"], dict(bg_j), None,
                                                  cfg, is_bg=True)
            return total + bg_total

        loss_j, grads = jax.value_and_grad(loss_fn)({"fg": fg_p, "bg": bg_p})
        loss_j = float(loss_j)
        grads = jax.tree.map(np.asarray, grads)

    loss_rel = abs(loss_j - loss_t) / max(abs(loss_t), 1e-12)

    # ---- per-leaf gradient comparison in the reference's layout ----
    def compare(ref_t, ours_np, rows, name):
        a = ref_t.detach().numpy() if hasattr(ref_t, "detach") else ref_t
        b = np.asarray(ours_np)
        denom = max(float(np.abs(a).max()), 1e-12)
        rows[name] = float(np.abs(a - b).max()) / denom

    leaf_rel = {}
    for j, s in enumerate(slots):
        g_slot = object_field.slice_slot(grads["fg"], s)
        fc_gd, pe_gd = interop.params_to_reference_state_dicts(
            g_slot, dtype=np.float64)
        for key, t in fc_gd.items():
            if fc_g.get(key) is None:
                continue
            compare(fc_g[key][j], t.numpy(), leaf_rel, f"fg{j}.{key}")
        if pe_g.get("B_layer.weight") is not None:
            compare(pe_g["B_layer.weight"][j],
                    pe_gd["B_layer.weight"].numpy(), leaf_rel, f"fg{j}.pe")
    bg_fc_gd, bg_pe_gd = interop.params_to_reference_state_dicts(
        grads["bg"], dtype=np.float64)
    for key, t in bg_fc_gd.items():
        if bg_g.get("fc." + key) is None:
            continue
        compare(bg_g["fc." + key], t.numpy(), leaf_rel, f"bg.{key}")
    if bg_g.get("pe.B_layer.weight") is not None:
        compare(bg_g["pe.B_layer.weight"], bg_pe_gd["B_layer.weight"].numpy(),
                leaf_rel, "bg.pe")

    worst = max(leaf_rel, key=leaf_rel.get)
    out = {
        "dtype": "float64",
        "loss_ref": loss_t,
        "loss_jax": loss_j,
        "loss_rel_diff": loss_rel,
        "n_grad_leaves": len(leaf_rel),
        "grad_rel_diff_max": leaf_rel[worst],
        "grad_rel_diff_worst_leaf": worst,
    }
    if verbose:
        print(f"f64 one-step: loss ref {loss_t:.12f} jax {loss_j:.12f} "
              f"rel {loss_rel:.2e}; {len(leaf_rel)} grad leaves, "
              f"max rel {leaf_rel[worst]:.2e} ({worst})")
    return out


# --------------------------------------------------------------------------- #
# the CPU cost twin (room_0 workload shape)
# --------------------------------------------------------------------------- #


def run_timing_twin(n_objects: int = 50, n_iters: int = 100,
                    n_frames_each: int = 2, part_mode: bool = True,
                    verbose: bool = True) -> dict:
    """Measured CPU s/frame: reference loop (its own modules + torch.func
    vmap + its loss + torch AdamW) vs our train_frame, identical room_0
    per-step workload (BASELINE.md: 50 obj x 120 rays x 10 pts + bg
    1200 x 14, hidden 32/128, 512-d clip head, part distillation on,
    100 steps/frame). Same host, same thread budget. The torch side gets
    pre-built batches (its Python sampling stage is NOT charged); ours
    regenerates sampling on-device inside train_frame — conservative in
    the reference's favor."""
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib.util as _ilu

    bench_spec = _ilu.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "..", "bench.py"))
    bench = _ilu.module_from_spec(bench_spec)
    bench_spec.loader.exec_module(bench)

    from openobj_tpu.core import trainer

    ref = load_reference_objnerf()
    cfg = trainer.TrainConfig(n_iters_per_frame=n_iters,
                              part_mode=part_mode)
    state, store, cam_dirs, fg_tables, bg_tables, cfg = bench.build_envelope(
        cfg)
    n_slots = state.n_slots
    active_slots = list(range(min(n_objects, n_slots)))

    # ---- ours: the production train_frame (includes sampling) ----
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state2, losses = trainer.train_frame(
        state, store, cam_dirs, fg_tables, bg_tables, key, cfg)
    jax.block_until_ready(losses)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n_frames_each):
        state2, losses = trainer.train_frame(
            state2, store, cam_dirs, fg_tables, bg_tables,
            jax.random.PRNGKey(1 + i), cfg)
    jax.block_until_ready(losses)
    jax_spf = (time.perf_counter() - t0) / n_frames_each
    if verbose:
        print(f"jax train_frame: {jax_spf:.2f} s/frame "
              f"(compile {compile_s:.1f}s)")

    # ---- theirs: reference loop on identical per-step slices ----
    import jax.numpy as jnp  # noqa: F401

    from openobj_tpu.models import object_field

    fg_param_trees = [
        jax.tree.map(np.asarray, object_field.slice_slot(state2.fg_params, s))
        for s in active_slots
    ]
    bg_params = jax.tree.map(np.asarray, state2.bg_params)
    twin = ReferenceTwin(ref, fg_param_trees, bg_params, cfg,
                         part_mode=part_mode)
    fg_steps, bg_steps = export_frame_batches(
        jax.random.PRNGKey(7), store, cam_dirs, fg_tables, bg_tables, cfg)
    fg_steps = [
        {kk: v[active_slots] if v.shape and v.shape[0] == n_slots else v
         for kk, v in sl.items()}
        for sl in fg_steps
    ]
    # warmup (torch allocator + vmap graphs)
    twin.step(fg_steps[0], bg_steps[0] if bg_steps else None)
    t0 = time.perf_counter()
    for f in range(n_frames_each):
        twin.train_frame(fg_steps, bg_steps)
    ref_spf = (time.perf_counter() - t0) / n_frames_each
    if verbose:
        print(f"reference loop: {ref_spf:.2f} s/frame")

    import multiprocessing

    return {
        "workload": {
            "n_objects": len(active_slots), "n_iters": n_iters,
            "rays_per_step_fg": cfg.n_rays_per_step,
            "rays_per_step_bg": cfg.n_rays_per_step_bg,
            "hidden": cfg.hidden, "hidden_bg": cfg.hidden_bg,
            "clip_size": cfg.clip_size, "part_mode": part_mode,
        },
        "host_cpus": multiprocessing.cpu_count(),
        "jax_sec_per_frame": round(jax_spf, 3),
        "reference_sec_per_frame": round(ref_spf, 3),
        "ratio_vs_reference_cpu": round(ref_spf / jax_spf, 2),
        "note": ("both loops on the same CPU host; torch side not charged "
                 "for sampling, ours includes it (conservative)"),
    }


# --------------------------------------------------------------------------- #


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--timing", action="store_true",
                    help="also run the room_0-envelope CPU cost twin")
    ap.add_argument("--timing-only", action="store_true")
    ap.add_argument("--grad-check", action="store_true",
                    help="float64 one-step loss+grad parity probe")
    ap.add_argument("--grad-check-only", action="store_true")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--timing-objects", type=int, default=50)
    ap.add_argument("--timing-frames", type=int, default=2)
    ap.add_argument("--multiseed", type=int, default=0,
                    help="run the convergence twin over N seeds and record "
                         "PSNR distributions (verdict r4 item 3)")
    ap.add_argument("--multiseed-only", action="store_true")
    ap.add_argument("--out", default="docs/parity/twin_results.json")
    args = ap.parse_args(argv)

    if not reference_available():
        print("reference not available at", REFERENCE_OBJNERF)
        return 1

    results = {"generated_by": "scripts/reference_twin.py"}
    if args.grad_check or args.grad_check_only:
        print("== float64 one-step loss+grad parity ==")
        results["grad_check"] = run_grad_check()
    if args.multiseed or args.multiseed_only:
        print("== multi-seed convergence distributions ==")
        results["multiseed"] = run_multiseed(
            n_seeds=args.multiseed or 5, n_frames=args.frames,
            n_iters=args.iters)
    if (not args.timing_only and not args.grad_check_only
            and not args.multiseed_only and not args.multiseed):
        print("== convergence twin (same data, same init) ==")
        results["convergence"] = run_convergence_twin(
            n_frames=args.frames, n_iters=args.iters)
        c = results["convergence"]
        print(json.dumps(c, indent=2))
    if args.timing or args.timing_only:
        print("== CPU cost twin (room_0 workload shape) ==")
        results["timing"] = run_timing_twin(
            n_objects=args.timing_objects,
            n_frames_each=args.timing_frames)
        print(json.dumps(results["timing"], indent=2))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing.update(results)
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=2)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    os.environ.setdefault("OPENOBJ_SCAN_UNROLL", "1")
    # the container's sitecustomize registers the remote-TPU (axon) plugin
    # and forces the platform at interpreter start — JAX_PLATFORMS in the
    # env does NOT stick; the twin is a CPU harness (torch is CPU-only
    # here), so pin the backend via jax.config before any backend init
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    _cache = os.path.join(_REPO_ROOT, ".cache", "jax")
    _jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    sys.exit(main())
