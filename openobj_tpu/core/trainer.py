"""The jitted incremental-mapping training step.

The reference's per-frame loop (/root/reference/objnerf/train.py:158-485)
is Python all the way down: per-object sampling loops, functorch re-stacking,
100 optimizer steps each launching dozens of kernels. Here the ENTIRE
per-frame computation — keyframe draws, pixel sampling, 3-mode z lattices,
the 100-step optimization — is one jitted function (`train_frame`): sampling
is vmapped over the stacked object axis, and the optimizer steps run under
``lax.scan``, so a frame is a single XLA program with zero host round trips.

Workload-shape parity (configs/Replica/room_0.json):
  * per frame, per object: iters(100) x win(5) keyframe draws x 24 pixels
    = 12000 rays, of which each optimizer step consumes a 120-ray slice
    (train.py:299-332,394-404);
  * background: iters x win_bg(10) draws x 120 pixels = 120000 rays,
    1200-ray slices, its own wider MLP (train.py:300-315,447-463);
  * fg z: 1 cam->surface + 9 surface bins; bg: 5 + 9 (room_0.json:31-33);
  * one AdamW over everything, lr 1e-3, wd 0.013 (train.py:78).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
import os
from functools import partial

import jax
import jax.numpy as jnp

from openobj_tpu.core import optim
from openobj_tpu.core.frame_store import FrameStore
from openobj_tpu.parallel import sharding
from openobj_tpu.models import object_field
from openobj_tpu.ops import losses, sampling


@dataclass(frozen=True)
class TrainConfig:
    """Static (hashable) training configuration; defaults = Replica room_0."""
    n_iters_per_frame: int = 100
    win_size: int = 5
    n_samples_per_frame: int = 24          # rays per keyframe draw (fg)
    win_size_bg: int = 10
    n_samples_per_frame_bg: int = 120
    n_bins_cam2surface: int = 1
    n_bins_cam2surface_bg: int = 5
    n_bins: int = 9
    surface_eps: float = 0.1
    stop_eps: float = 0.05
    min_depth: float = 0.0
    learning_rate: float = 1e-3
    weight_decay: float = 0.013
    color_scaling: float = 5.0
    opacity_scaling: float = 10.0
    partfeat_scaling: float = 5.0
    part_mode: bool = False
    part_down: int = 5
    # part-feature store dtype: "int8" (unit-norm x127 — exact for the
    # cosine loss, 1/4 the bytes) or "bf16" (see frame_store docstring)
    part_dtype: str = "int8"
    hidden: int = 32
    hidden_bg: int = 128
    clip_size: int = 512
    max_deg: int = 5
    obj_scale: float = 2.0
    bg_scale: float = 5.0
    do_bg: bool = True
    # "xla" (default) or "pallas": which field forward/backward to use.
    # See ops.fused_field docstring for the measured tradeoff.
    field_impl: str = "xla"
    # "f32" or "bf16": MLP matmul operand precision (f32 masters + accum).
    compute_dtype: str = "f32"
    # "segmented" (row-partitioned concat-free matmuls), "merged"
    # (column-merged sibling GEMMs — fewer, wider launches; the step is
    # ensemble-GEMM-throughput-bound, see mlp.mlp_apply_merged docstring),
    # or "merged_params" (merged GEMMs over PRE-CONCATENATED weight
    # blocks: train_frame re-lays the param + Adam trees into
    # mlp.merge_mlp_params layout once per frame, runs the whole
    # optimizer scan in that layout — identical update math to f32
    # roundoff, zero per-step weight concats/grad-splits — and converts
    # back before returning, so checkpoints/interop/render all still
    # see the reference layout)
    gemm_impl: str = "segmented"
    # unroll factor for the optimizer-step scan (amortizes per-iteration
    # fixed costs across the ~40 small fusions per step; raises compile
    # time). Numerics-invariant; env-overridable so the CPU test suite can
    # default to 1 (conftest) without touching the TPU default. Read per
    # instantiation (default_factory), not at class definition, so setting
    # the env after import still takes effect.
    scan_unroll: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get("OPENOBJ_SCAN_UNROLL", "4"))
    )
    # "tree" (per-leaf AdamW fusions) or "flat" (one fused update over the
    # concatenated [O, K] parameter matrix — bit-identical, see optim)
    optim_impl: str = "tree"

    # rematerialize the field forward in the backward pass
    # (jax.checkpoint): the xplane profile shows the fwd activation slabs
    # ([O,119,32]/[O,74,32] per trunk layer) spilled to HBM and
    # prefetch-copied back for the gradient GEMMs every step; remat trades
    # those round-trips for recompute FLOPs (the MXU idles at <1% peak
    # here, so FLOPs are ~free). Measured before flipping the default.
    remat: bool = False

    @property
    def n_rays_per_step(self) -> int:
        return self.win_size * self.n_samples_per_frame        # 120

    @property
    def n_rays_per_step_bg(self) -> int:
        return self.win_size_bg * self.n_samples_per_frame_bg  # 1200

    # recompute the z lattice INSIDE each optimizer step (from that step's
    # depth/state xs + a per-step key) instead of materializing the whole
    # frame's [iters, O, rays, P] z tensor as a scan input. Statistically
    # identical draws (different key stream); trades the z slab's HBM
    # write + per-step transposing VMEM prefetch (the largest single copy
    # in the frame profile) for ~77k cheap VPU normal/uniform draws per
    # step. Measured on-chip before flipping the default.
    z_per_step: bool = False

    # sample each step's rays inside the optimizer scan instead of
    # materializing the whole frame's ray batch upfront. Statistically
    # identical draws (every ray is consumed exactly once either way,
    # reference train.py:299-332,394-404) and saves the [O, iters*rays, ...]
    # intermediates (~0.9 GB/frame at the room_0 envelope) — but measured
    # 2.8x SLOWER on v5e (745 vs 268 ms/frame): the per-invocation RNG +
    # gather fixed costs dominate at 120-ray granularity. Keep False unless
    # HBM-bound.
    sample_per_step: bool = False


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    fg_params: dict          # stacked leaves [O, ...]
    fg_opt: optim.AdamWState
    bg_params: dict | None
    bg_opt: optim.AdamWState | None

    @property
    def n_slots(self) -> int:
        return jax.tree.leaves(self.fg_params)[0].shape[0]


def init_train_state(key: jax.Array, cfg: TrainConfig, n_slots: int) -> TrainState:
    k_fg, k_bg = jax.random.split(key)
    fg = object_field.init_stacked_fields(
        k_fg, n_slots, hidden=cfg.hidden, clip_size=cfg.clip_size,
        # do_clip stays True regardless of part_mode: grow_train_state and
        # _allocate_new_slots init with the default tree structure, and the
        # semantic-assignment path uses the clip head even without part
        # distillation — a part_mode-conditional head would desynchronize
        # the stacked pytree structure across the three init sites
        scale=cfg.obj_scale, max_deg=cfg.max_deg, do_clip=True,
    )
    bg = bg_opt = None
    if cfg.do_bg:
        bg = object_field.init_field_params(
            k_bg, hidden=cfg.hidden_bg, clip_size=cfg.clip_size,
            scale=cfg.bg_scale, max_deg=cfg.max_deg,
        )
        bg_opt = optim.init_adamw_state(bg, n_slots=None)
    return TrainState(
        fg_params=fg,
        fg_opt=optim.init_adamw_state(fg, n_slots=n_slots),
        bg_params=bg,
        bg_opt=bg_opt,
    )


def grow_train_state(
    key: jax.Array, state: TrainState, cfg: TrainConfig, new_n_slots: int
) -> TrainState:
    """Pad the stacked fg axis with freshly-initialized slots (bucket growth;
    happens O(log) times per run — objects appearing within a bucket cost
    nothing)."""
    old = state.n_slots
    extra = object_field.init_stacked_fields(
        key, new_n_slots - old, hidden=cfg.hidden, clip_size=cfg.clip_size,
        scale=cfg.obj_scale, max_deg=cfg.max_deg,
    )
    fg = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0), state.fg_params, extra
    )
    pad0 = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((new_n_slots - old, *a.shape[1:]), a.dtype)], axis=0
        ),
        state.fg_opt.mu,
    )
    pad1 = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((new_n_slots - old, *a.shape[1:]), a.dtype)], axis=0
        ),
        state.fg_opt.nu,
    )
    count = jnp.concatenate(
        [state.fg_opt.count, jnp.zeros((new_n_slots - old,), jnp.int32)]
    )
    return TrainState(
        fg_params=fg,
        fg_opt=optim.AdamWState(mu=pad0, nu=pad1, count=count),
        bg_params=state.bg_params,
        bg_opt=state.bg_opt,
    )


# --------------------------------------------------------------------------- #
# sampling
# --------------------------------------------------------------------------- #


def _sample_batch(
    key: jax.Array,
    store: FrameStore,
    cam_dirs: jnp.ndarray,     # [H, W, 3]
    kf_frames: jnp.ndarray,    # [O, K] frame indices
    kf_bbox: jnp.ndarray,      # [O, K, 4] (r0, r1, c0, c1) half-open
    n_kf: jnp.ndarray,         # [O] int32
    latest2: jnp.ndarray,      # [O, 2] keyframe-slot indices
    obj_inst: jnp.ndarray,     # [O] instance id ("this" pixels)
    obj_center: jnp.ndarray,   # [O, 3]
    n_draws: int,
    n_px: int,
    n_bins_c2s: int,
    cfg: TrainConfig,
    scan_iters: int | None = None,
):
    """Draw (n_draws * n_px) training rays for every object slot at once and
    build the fixed-shape z lattice (reference get_training_samples +
    sample_3d_points, vmap.py:386-554).

    TPU notes:
      * all pixel fetches are ONE flat row-gather over the object x draw x
        pixel axes — a vmap-of-advanced-indexing formulation lowered to a
        pathologically slow batched gather (~90 ms/frame at the room_0
        envelope; the flat form is ~100x faster);
      * with ``scan_iters=I``, every leaf comes out SCAN-ORDERED
        [I, O, rays/step, ...]: the tiny index tensors are transposed
        BEFORE the big gathers, so the bulky tensors are born in the
        layout lax.scan consumes as xs (contiguous leading-axis slices).
        The previous dynamic-slice-per-step formulation made XLA copy
        whole batch arrays to scratch every step (profiled ~20 ms/frame).
    """
    k_kf, k_u, k_v, k_z = jax.random.split(key, 4)
    o = kf_frames.shape[0]
    h, w = store.frame_shape

    n_kf_safe = jnp.maximum(n_kf, 1)[:, None]
    draws = jax.random.randint(k_kf, (o, n_draws), 0, n_kf_safe)
    # force the two most recent keyframes into the draw (vmap.py:390-412).
    # EXACT reference placement: the reference also appends latest-2 at the
    # END of the flat (iters*win) draw list, so after its per-step slicing
    # (train.py:396-404) the forced keyframes land only in the final
    # optimizer step's window — our scan reorder reproduces that, it does
    # not force them into every step.
    forced = jnp.concatenate([draws[:, :-2], latest2.astype(draws.dtype)], axis=1)
    draws = jnp.where((n_kf > 2)[:, None], forced, draws)

    oix = jnp.arange(o)[:, None]
    frames = kf_frames[oix, draws]                  # [O, D]
    bbox = kf_bbox[oix, draws]                      # [O, D, 4]
    ru = jax.random.uniform(k_u, (o, n_draws, n_px))
    rv = jax.random.uniform(k_v, (o, n_draws, n_px))
    u = jnp.floor(
        ru * (bbox[..., 1:2] - bbox[..., 0:1]) + bbox[..., 0:1]
    ).astype(jnp.int32)
    v = jnp.floor(
        rv * (bbox[..., 3:4] - bbox[..., 2:3]) + bbox[..., 2:3]
    ).astype(jnp.int32)

    if scan_iters:
        # reorder draw axis (o, I*win, ...) -> (I, o, win, ...); element
        # (o, i*win + j) -> (i, o, j), exactly the rays step i consumed
        # under the old per-step slicing
        win = n_draws // scan_iters

        def to_scan(x):
            return x.reshape(o, scan_iters, win, *x.shape[2:]).swapaxes(0, 1)

        frames, u, v = to_scan(frames), to_scan(u), to_scan(v)
        lead = (scan_iters, o)          # [I, O, win, px, ...] from here on
    else:
        lead = (o,)                     # [O, D, px, ...]

    from openobj_tpu.core import frame_store as FS

    f = frames[..., None]                           # [..., win|D, 1]
    lin = ((f * h + u) * w + v).reshape(-1)         # flat pixel ids
    # ONE fused gather per pixel over the packed planes (depth | inst bits
    # | rgb bits) — random pixel fetches are latency-bound, so separately
    # issued gathers cost ~3x this (frame_store docstring)
    px_shape = u.shape                              # [*lead, win|D, px]
    px = jnp.take(store.packed.reshape(3, -1), lin, axis=1)
    rgb = FS.unpack_rgb(px).astype(jnp.float32) / 255.0
    depth = FS.unpack_depth(px).reshape(px_shape)
    inst = FS.unpack_inst(px).reshape(px_shape)
    obj_b = obj_inst[:, None, None]
    if scan_iters:
        obj_b = obj_b[None]
    state = jnp.where(
        inst == obj_b, sampling.STATE_THIS,
        jnp.where(inst == -1, sampling.STATE_UNKNOWN, sampling.STATE_OTHER),
    )

    dirs_c = jnp.take(
        cam_dirs.reshape(-1, 3), (u * w + v).reshape(-1), axis=0
    ).reshape(*px_shape, 3)
    t_wc = store.t_wc[frames]                       # [..., 4, 4] (row gather)
    origins, dirs_w = sampling.origin_dirs_w(t_wc[..., None, :, :], dirs_c)

    # per-object max over ALL the frame's draws (reference vmap.py:493)
    max_axes = (0, 2, 3) if scan_iters else (1, 2)
    max_bound = jnp.max(depth, axis=max_axes, keepdims=True)
    defer_z = bool(scan_iters) and cfg.z_per_step
    if not defer_z:
        z = sampling.sample_z_values(
            k_z, depth, state, cfg.min_depth, n_bins_c2s, cfg.n_bins,
            cfg.surface_eps, cfg.stop_eps, max_bound=max_bound,
        )                                           # [..., px, P]
    center_b = obj_center[:, None, None]
    if scan_iters:
        center_b = center_b[None]

    R = (win if scan_iters else n_draws) * n_px
    P = n_bins_c2s + cfg.n_bins
    # points = origins + dirs * z - center are NOT materialized: the
    # [.., R, P, 3] tensor is 3P x the per-ray data (92 MB/frame at the
    # room_0 envelope of pure HBM write+read); the step reconstructs them
    # elementwise (points_for_slice), fusing into the PE
    #
    # Scan xs are stored RAY-MINOR ([.., 3|P, R] — see restore_ray_major):
    # TPU arrays are tiled (8, 128) over the two minormost dims, so a
    # trailing dim of 3 (rgb/origins/dirs) or P=10 (z) lane-pads the
    # stored slab up to 42x/12.8x its logical bytes, and every scan step
    # paid a ~1.5 GB/s retiling copy into the compute layout (which puts
    # R on the lanes — xplane profile). Ray-minor storage matches the
    # in-loop layout, so the per-step copy becomes a relabel.
    rm = (lambda x: x.swapaxes(-1, -2)) if scan_iters else (lambda x: x)
    batch = {
        "rgb": rm(rgb.reshape(*lead, R, 3)),
        "depth": depth.reshape(*lead, R),
        "state": state.reshape(*lead, R),
        "origins": rm((origins - center_b).reshape(*lead, R, 3)),
        "dirs_w": rm(dirs_w.reshape(*lead, R, 3)),
    }
    if defer_z:
        # z recomputed inside each step (cfg.z_per_step): per-step keys ride
        # the xs; max_bound is a per-frame constant the caller closes over
        batch["zkey"] = jax.random.split(k_z, scan_iters)      # [I] keys
        batch["max_bound"] = jnp.broadcast_to(
            max_bound.reshape(1, o, 1), (scan_iters, o, 1)
        )
    else:
        batch["z"] = rm(z.reshape(*lead, R, P))
    if cfg.part_mode and store.partfeat is not None:
        hp, wp = store.partfeat.shape[1], store.partfeat.shape[2]
        lin_pf = ((f * hp + u // cfg.part_down) * wp + v // cfg.part_down)
        # DEFERRED gather: only the flat row indices go into the batch; the
        # per-step loss gathers its own 120-ray slice of the int8 store
        # (gather_partfeat). Materializing the whole [O, R_total, 512]
        # feature batch upfront was the single largest sampled tensor
        # (393 MB int8 at the room_0 envelope) and profiled ~10 ms/frame of
        # pure HBM write+read before the per-step slices even started.
        batch["partfeat_idx"] = lin_pf.reshape(*lead, R).astype(jnp.int32)
    return batch


RAY_MINOR_KEYS = ("rgb", "origins", "dirs_w", "z")


def restore_ray_major(sl: dict) -> dict:
    """Undo the xs ray-minor storage transpose ([.., 3|P, R] -> [.., R, .])
    on a step's slice. A logical transpose only: the physical layout
    already matches the step's compute layout (see _sample_batch), so XLA
    lowers this to a relabel, not a copy."""
    for k in RAY_MINOR_KEYS:
        if k in sl:
            sl[k] = sl[k].swapaxes(-1, -2)
    return sl


def resolve_z(sl: dict, cfg: TrainConfig, is_bg: bool) -> dict:
    """Materialize a step's z lattice from its deferred per-step key
    (cfg.z_per_step): same 3-mode law as the upfront batch, drawn fresh
    from the step's xs key instead of sliced from a precomputed slab."""
    key = sl.pop("zkey", None)
    if key is None:
        return sl
    mb = sl.pop("max_bound")
    n_c2s = cfg.n_bins_cam2surface_bg if is_bg else cfg.n_bins_cam2surface
    sl["z"] = sampling.sample_z_values(
        key, sl["depth"], sl["state"], cfg.min_depth, n_c2s, cfg.n_bins,
        cfg.surface_eps, cfg.stop_eps, max_bound=mb,
    )
    return sl


def gather_partfeat(sl: dict, partfeat: jnp.ndarray | None) -> dict:
    """Resolve a slice's deferred part-feature indices against the store
    (int8 unit-norm by default — the cosine loss upcasts and normalizes, so
    the compact dtype is exactly transparent; frame_store docstring)."""
    idx = sl.pop("partfeat_idx", None)
    if idx is not None and partfeat is not None:
        c = partfeat.shape[-1]
        pf = jnp.take(partfeat.reshape(-1, c), idx.reshape(-1), axis=0)
        sl["partfeat"] = pf.reshape(*idx.shape, c)
    return sl


def sample_fg_batch(key, store, cam_dirs, tables, cfg: TrainConfig,
                    n_iters: int | None = None, scan_order: bool = False):
    """All object slots at once; tables leaves: [O, ...]. ``n_iters``
    overrides how many optimizer steps' worth of rays to draw (1 for the
    per-step sampling path). ``scan_order`` returns leaves shaped
    [iters, O, rays/step, ...] for direct use as lax.scan xs."""
    iters = n_iters if n_iters is not None else cfg.n_iters_per_frame
    return _sample_batch(
        key, store, cam_dirs, tables["kf_frames"], tables["kf_bbox"],
        tables["n_kf"], tables["latest2"], tables["obj_inst"],
        tables["obj_center"],
        iters * cfg.win_size, cfg.n_samples_per_frame,
        cfg.n_bins_cam2surface, cfg,
        scan_iters=iters if scan_order else None,
    )


def sample_bg_batch(key, store, cam_dirs, bg_tables, cfg: TrainConfig,
                    n_iters: int | None = None, scan_order: bool = False):
    iters = n_iters if n_iters is not None else cfg.n_iters_per_frame
    batch = _sample_batch(
        key, store, cam_dirs,
        bg_tables["kf_frames"][None], bg_tables["kf_bbox"][None],
        bg_tables["n_kf"][None], bg_tables["latest2"][None],
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3), jnp.float32),
        iters * cfg.win_size_bg, cfg.n_samples_per_frame_bg,
        cfg.n_bins_cam2surface_bg, cfg,
        scan_iters=iters if scan_order else None,
    )
    ax = 1 if scan_order else 0
    return {k: x if k == "zkey" else jnp.squeeze(x, axis=ax)
            for k, x in batch.items()}


# --------------------------------------------------------------------------- #
# the per-frame training program
# --------------------------------------------------------------------------- #


def _relayout_state(state: TrainState, f) -> TrainState:
    """Apply a param-layout conversion ``f`` (mlp.merge_mlp_params or its
    inverse) to every mlp subtree in the train state — params AND the
    Adam mu/nu trees, fg and bg. Pure slicing/concat, so converting the
    optimizer moments is exactly as valid as converting the params
    (AdamW is elementwise; see merge_mlp_params docstring)."""
    def conv(tree):
        return {**tree, "mlp": f(tree["mlp"])}

    def conv_opt(o):
        return optim.AdamWState(mu=conv(o.mu), nu=conv(o.nu), count=o.count)

    bg_p, bg_o = state.bg_params, state.bg_opt
    if bg_p is not None:
        bg_p, bg_o = conv(bg_p), conv_opt(bg_o)
    return TrainState(
        fg_params=conv(state.fg_params), fg_opt=conv_opt(state.fg_opt),
        bg_params=bg_p, bg_opt=bg_o,
    )


def _loss_for_slice(params, batch, active, cfg: TrainConfig, is_bg: bool):
    """Forward + step_batch_loss on one iteration's ray slice."""
    if cfg.field_impl == "pallas":
        from openobj_tpu.ops import fused_field

        def apply_stacked(p, x):
            return fused_field.field_apply_stacked_fused(
                p, x, max_deg=cfg.max_deg, do_clip=cfg.part_mode)

        def apply_single(p, x):
            return fused_field.field_apply_fused(
                p, x, max_deg=cfg.max_deg, do_clip=cfg.part_mode)
    else:
        gi = "merged" if cfg.gemm_impl == "merged_params" else cfg.gemm_impl

        def apply_stacked(p, x):
            return object_field.field_apply_stacked(
                p, x, max_deg=cfg.max_deg, do_clip=cfg.part_mode,
                clip_hidden_only=True, compute_dtype=cfg.compute_dtype,
                gemm_impl=gi)

        def apply_single(p, x):
            return object_field.field_apply(
                p, x, max_deg=cfg.max_deg, do_clip=cfg.part_mode,
                clip_hidden_only=True, compute_dtype=cfg.compute_dtype,
                gemm_impl=gi)

    if cfg.remat:
        apply_stacked = jax.checkpoint(apply_stacked)
        apply_single = jax.checkpoint(apply_single)

    # points reconstructed elementwise from the per-ray data (never
    # materialized in the batch — _sample_batch docstring); center was
    # pre-subtracted from origins
    pts = sampling.rays_to_points(batch["origins"], batch["dirs_w"], batch["z"])

    if is_bg:
        a, c, f = apply_single(params, pts)
        a, c = a[None], c[None]
        f = f[None] if f is not None else None
        gt_rgb, gt_d = batch["rgb"][None], batch["depth"][None]
        state, z = batch["state"][None], batch["z"][None]
        act = None
        gt_pf = batch.get("partfeat")
        gt_pf = gt_pf[None] if gt_pf is not None else None
    else:
        a, c, f = apply_stacked(params, pts)
        gt_rgb, gt_d = batch["rgb"], batch["depth"]
        state, z = batch["state"], batch["z"]
        act = active
        gt_pf = batch.get("partfeat")

    total, per_obj = losses.step_batch_loss(
        a[..., 0], c, gt_d, gt_rgb, state, z,
        active=act,
        color_scaling=cfg.color_scaling,
        opacity_scaling=cfg.opacity_scaling,
        gt_partfeat=gt_pf if cfg.part_mode else None,
        pred_partfeat_hidden=f if cfg.part_mode else None,
        partfeat_head=params["mlp"] if cfg.part_mode else None,
        partfeat_scaling=cfg.partfeat_scaling,
        compute_dtype=cfg.compute_dtype,
    )
    return total, per_obj


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def train_frame(
    state: TrainState,
    store: FrameStore,
    cam_dirs: jnp.ndarray,
    fg_tables: dict,
    bg_tables: dict | None,
    key: jax.Array,
    cfg: TrainConfig,
):
    """One frame's worth of incremental mapping: n_iters optimizer steps
    under lax.scan, each consuming win*samples rays per object (+ the bg
    window). Rays are drawn inside the scan by default
    (cfg.sample_per_step); the pre-sampled whole-frame batch path is kept
    for debugging/ablation. Returns (new state, per-iter losses)."""
    k_fg, k_bg, k_scan = jax.random.split(key, 3)
    active = fg_tables["active"]
    do_bg = cfg.do_bg and state.bg_params is not None

    pre_merged = cfg.gemm_impl == "merged_params"
    if pre_merged and cfg.field_impl == "pallas":
        raise ValueError(
            "gemm_impl='merged_params' is an XLA-path layout; the pallas "
            "field kernel consumes the reference param layout"
        )
    if pre_merged and (
        "color_linear" not in state.fg_params["mlp"]
        or "clip_linear" not in state.fg_params["mlp"]
    ):
        # fail fast at trace time with a config-level message instead of a
        # NotImplementedError from merge_mlp_params mid-frame
        raise ValueError(
            "gemm_impl='merged_params' requires param trees built with both "
            "color and clip heads (do_color=do_clip=True); use "
            "gemm_impl='merged' for headless trees"
        )
    if pre_merged:
        # ONE layout conversion per frame (outside the scan) buys 100
        # concat-free optimizer steps; converted back before returning so
        # every external contract (checkpoint, interop, render, slot
        # writes) keeps seeing the reference layout
        from openobj_tpu.ops import mlp as _mlp

        state = _relayout_state(state, _mlp.merge_mlp_params)

    def run_step(st, fg_sl, bg_sl, ray_minor=False):
        fg_sl, bg_sl = dict(fg_sl), None if bg_sl is None else dict(bg_sl)
        if ray_minor:
            fg_sl = restore_ray_major(fg_sl)
            if bg_sl is not None:
                bg_sl = restore_ray_major(bg_sl)
        fg_sl = resolve_z(fg_sl, cfg, is_bg=False)
        if bg_sl is not None:
            bg_sl = resolve_z(bg_sl, cfg, is_bg=True)
        # ray-level data parallelism: under a ('data', 'object') mesh
        # (jax.set_mesh + parallel.sharding.make_mesh_2d) each step's ray
        # slice shards over 'data'; grad psums follow from the shardings.
        fg_sl = {k: sharding.maybe_constrain(v, "object", "data")
                 for k, v in fg_sl.items()}
        if bg_sl is not None:
            bg_sl = {k: sharding.maybe_constrain(v, "data")
                     for k, v in bg_sl.items()}
        if cfg.part_mode:
            fg_sl = gather_partfeat(dict(fg_sl), store.partfeat)
            if bg_sl is not None:
                bg_sl = gather_partfeat(dict(bg_sl), store.partfeat)

        def loss_fn(ps):
            total, _ = _loss_for_slice(ps["fg"], fg_sl, active, cfg, is_bg=False)
            if bg_sl is not None:
                bg_total, _ = _loss_for_slice(ps["bg"], bg_sl, None, cfg, is_bg=True)
                total = total + bg_total
            return total

        params = {"fg": st.fg_params}
        if bg_sl is not None:
            params["bg"] = st.bg_params
        loss, grads = jax.value_and_grad(loss_fn)(params)

        upd = (optim.adamw_update_flat if cfg.optim_impl == "flat"
               else optim.adamw_update)
        fg_p, fg_o = upd(
            st.fg_params, grads["fg"], st.fg_opt,
            lr=cfg.learning_rate, weight_decay=cfg.weight_decay, active=active,
        )
        bg_p, bg_o = st.bg_params, st.bg_opt
        if bg_sl is not None:
            bg_p, bg_o = upd(
                st.bg_params, grads["bg"], st.bg_opt,
                lr=cfg.learning_rate, weight_decay=cfg.weight_decay,
            )
        return TrainState(fg_p, fg_o, bg_p, bg_o), loss

    if cfg.sample_per_step:
        def opt_step(st, it):
            k_step_fg, k_step_bg = jax.random.split(
                jax.random.fold_in(k_scan, it)
            )
            fg_sl = sample_fg_batch(
                k_step_fg, store, cam_dirs, fg_tables, cfg, n_iters=1
            )
            bg_sl = (
                sample_bg_batch(
                    k_step_bg, store, cam_dirs, bg_tables, cfg, n_iters=1
                ) if do_bg else None
            )
            return run_step(st, fg_sl, bg_sl)

        state, losses_per_iter = jax.lax.scan(
            opt_step, state, jnp.arange(cfg.n_iters_per_frame),
            unroll=cfg.scan_unroll,
        )
        if pre_merged:
            state = _relayout_state(state, _mlp.unmerge_mlp_params)
        return state, losses_per_iter

    # whole-frame batches, SCAN-ORDERED [iters, ...]: lax.scan consumes them
    # as xs with contiguous leading-axis slices (no per-step dynamic-slice
    # scratch copies — _sample_batch docstring)
    fg_batch = sample_fg_batch(
        k_fg, store, cam_dirs, fg_tables, cfg, scan_order=True
    )
    bg_batch = (
        sample_bg_batch(k_bg, store, cam_dirs, bg_tables, cfg, scan_order=True)
        if do_bg else {}
    )

    def opt_step(st, xs):
        fg_sl, bg_sl = xs
        return run_step(st, fg_sl, bg_sl if do_bg else None, ray_minor=True)

    state, losses_per_iter = jax.lax.scan(
        opt_step, state, (fg_batch, bg_batch), unroll=cfg.scan_unroll,
    )
    if pre_merged:
        state = _relayout_state(state, _mlp.unmerge_mlp_params)
    return state, losses_per_iter
