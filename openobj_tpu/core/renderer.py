"""2D view synthesis from object fields + multi-object z-buffer compositing.

Parity targets:
  * per-object render: rays intersected with the object's oriented bbox in
    the OBB frame, 150 stratified bins near->far+0.2, bin midpoints as z,
    occupancy->termination, opacity<0.9 -> transparent, rendered depth
    outside [near, far] rejected (reference trainer.sample_points_bbox
    trainer.py:130-198 + sceneObject.render_2D_syn vmap.py:604-685);
  * whole-frame compositing: per-object renders merged by z-buffer, with
    background ids excluded from the depth buffer so foreground objects are
    never occluded by the bg field (reference train.py:576-594).

TPU-first: rays are processed in fixed-size chunks under ``lax.map`` with
padding — no data-dependent shapes; non-hit rays ride along masked instead
of being compacted on the host.

Render-path speedups beyond the reference (both opt-in, parity-tested):
  * ``two_pass=True``: empty-space skipping — a cheap alpha-only probe pass
    (``n_probe`` deterministic bins over [near, far], no color/CLIP heads)
    locates the surface, then the full pass places its ``n_bins`` stratified
    bins inside a tight window around it. Rays whose probe finds no surface
    keep the full interval, so transparent/miss behaviour is unchanged. At
    probe 32 + refine 64 this is ~55% of the one-pass-150 FLOPs with a
    DENSER surface sampling than 150 bins over the whole box.
  * ``compute_dtype="bf16"``: evaluate the field MLP in bf16 (f32 params +
    accumulation) — rendering is pure inference, so the half-precision
    matmuls are quality-neutral at the occupancy/color ranges here.
  * ``render_frame_bucketed``: per-object adaptive bin counts — the
    configured bin count anchors the sampling density at the largest
    object; smaller objects render with proportionally fewer bins through
    a few statically-sized bucketed dispatches (the reference's fixed 150
    bins oversample small objects ~10x). Composes with ``two_pass``.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from openobj_tpu.models import object_field
from openobj_tpu.ops import mlp, rendering, sampling


def _probe_tighten(
    params: dict,
    origins,                   # [..., 3] (broadcastable against near)
    dirs_w,                    # [..., 3]
    near,                      # [...]
    far,                       # [...]
    obj_center,
    n_probe: int,
    max_deg: int,
    compute_dtype: str,
    opacity_floor: float = 0.3,
    widen_bins: float = 3.0,
):
    """Alpha-only probe: n_probe deterministic bin midpoints over
    [near, far] -> termination-weighted surface depth -> tightened
    (near', far') window of +-widen_bins probe-bin widths around it.
    Rays with probe opacity < opacity_floor (no surface) keep [near, far]."""
    e = jnp.linspace(0.0, 1.0, n_probe + 1)
    mids = 0.5 * (e[1:] + e[:-1])
    span = far - near
    z = near[..., None] + span[..., None] * mids
    pts = sampling.rays_to_points(origins, dirs_w, z, obj_center)
    a, _, _ = object_field.field_apply(
        params, pts, max_deg=max_deg, do_color=False, do_clip=False,
        compute_dtype=compute_dtype,
    )
    occ = rendering.occupancy_activation(a[..., 0])
    w = rendering.occupancy_to_termination(occ)
    opacity = jnp.sum(w, axis=-1)
    d = rendering.render(w, z) / jnp.maximum(opacity, 1e-6)
    delta = widen_bins * span / n_probe
    found = opacity > opacity_floor
    t0 = jnp.where(found, jnp.maximum(near, d - delta), near)
    t1 = jnp.where(found, jnp.minimum(far, d + delta), far)
    return t0, jnp.maximum(t1, t0 + 1e-3)


@partial(
    jax.jit,
    static_argnames=(
        "n_bins", "max_deg", "chunk_size", "render_part", "two_pass",
        "n_probe", "compute_dtype",
    ),
)
def render_rays_obb(
    params: dict,
    origins: jnp.ndarray,     # [N, 3] world
    dirs_w: jnp.ndarray,      # [N, 3] world (z=1 convention, unnormalized)
    t_wo: jnp.ndarray,        # [4, 4] OBB frame -> world
    extents: jnp.ndarray,     # [3] OBB full extents
    obj_center: jnp.ndarray,  # [3]
    key: jax.Array,
    n_bins: int = 150,
    max_deg: int = 5,
    chunk_size: int = 4096,
    opacity_thresh: float = 0.9,
    far_extension: float = 0.2,
    render_part: bool = False,
    two_pass: bool = False,
    n_probe: int = 32,
    compute_dtype: str = "f32",
):
    """Render depth/color (and optional part features) for N rays against one
    object field bounded by an oriented box. Returns dict with
    hit [N] bool, depth [N], color [N, 3], (partfeat [N, C])."""
    r_ow = t_wo[:3, :3].T
    o_obb = (origins - t_wo[:3, 3]) @ r_ow.T
    d_obb = dirs_w @ r_ow.T
    near, far, hit = sampling.ray_box_intersection(
        o_obb, d_obb, -extents / 2.0, extents / 2.0
    )
    near = jnp.maximum(near, 0.0)
    far = far + far_extension  # cam may sit inside the box (trainer.py:169)

    n = origins.shape[0]
    pad = (-n) % chunk_size
    def _pad(x):
        return jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)])
    o_p, d_p = _pad(origins), _pad(dirs_w)
    near_p, far_p = _pad(near), _pad(jnp.where(far > near, far, near + 1e-3))
    keys = jax.random.split(key, (n + pad) // chunk_size)

    def render_chunk(args):
        k, o_c, d_c, nr, fr = args
        if two_pass:
            nr, fr = _probe_tighten(
                params, o_c, d_c, nr, fr, obj_center, n_probe, max_deg,
                compute_dtype,
            )
        z_edges = sampling.stratified_bins(k, nr, fr, n_bins, nr.shape)
        z = 0.5 * (z_edges[..., 1:] + z_edges[..., :-1])  # midpoints
        pts = sampling.rays_to_points(o_c, d_c, z, obj_center)
        a, c, f = object_field.field_apply(
            params, pts, max_deg=max_deg, do_clip=render_part,
            clip_hidden_only=True, compute_dtype=compute_dtype,
        )
        occ = rendering.occupancy_activation(a[..., 0])
        w = rendering.occupancy_to_termination(occ)
        opacity = jnp.sum(w, axis=-1)
        depth = rendering.render(w, z)
        color = rendering.render(w[..., None], c, axis=-2)
        out = (depth, color, opacity)
        if render_part:
            # composite the h-wide clip hidden, project once per ray (exact:
            # the clip head is linear — ops.mlp.clip_project)
            hid = rendering.render(w[..., None], f, axis=-2)
            out = out + (mlp.clip_project(params["mlp"], hid, opacity=opacity),)
        return out

    chunks = jax.lax.map(
        render_chunk,
        (
            keys,
            o_p.reshape(-1, chunk_size, 3),
            d_p.reshape(-1, chunk_size, 3),
            near_p.reshape(-1, chunk_size),
            far_p.reshape(-1, chunk_size),
        ),
    )
    depth = chunks[0].reshape(-1)[:n]
    color = chunks[1].reshape(-1, 3)[:n]
    opacity = chunks[2].reshape(-1)[:n]

    valid = (
        hit
        & (opacity >= opacity_thresh)
        & (depth >= near)
        & (depth <= far)
    )
    out = {"hit": valid, "depth": depth, "color": color, "opacity": opacity}
    if render_part:
        out["partfeat"] = chunks[3].reshape(-1, chunks[3].shape[-1])[:n]
    return out


def render_object_view(
    params: dict,
    obb,                      # utils.geometry.OrientedBox
    obj_center: np.ndarray,
    t_wc: np.ndarray,
    cam_dirs: jnp.ndarray,    # [H, W, 3]
    key: jax.Array,
    n_bins: int = 150,
    render_part: bool = False,
    chunk_size: int = 4096,
    two_pass: bool = False,
    n_probe: int = 32,
    compute_dtype: str = "f32",
):
    """Full-frame render of one object (reference render_2D_syn)."""
    h, w, _ = cam_dirs.shape
    dirs_c = cam_dirs.reshape(-1, 3)
    t = jnp.asarray(t_wc, jnp.float32)
    origins, dirs_w = sampling.origin_dirs_w(
        jnp.broadcast_to(t, (dirs_c.shape[0], 4, 4)), dirs_c
    )
    t_wo = np.eye(4, dtype=np.float32)
    t_wo[:3, :3] = obb.r
    t_wo[:3, 3] = obb.center
    out = render_rays_obb(
        params, origins, dirs_w, jnp.asarray(t_wo), jnp.asarray(obb.extent, jnp.float32),
        jnp.asarray(obj_center, jnp.float32), key,
        n_bins=n_bins, chunk_size=chunk_size, render_part=render_part,
        two_pass=two_pass, n_probe=n_probe, compute_dtype=compute_dtype,
    )
    return {
        k: np.asarray(v).reshape((h, w) + np.asarray(v).shape[1:])
        for k, v in out.items()
    }


def composite_views(
    views: dict[int, dict],
    class_of: dict[int, int],
    h: int,
    w: int,
    bg_ids=(0, 2, 3),
):
    """Z-buffer composite of per-object full-frame renders
    (reference train.py:576-594). ``views``: {obj_id: render_object_view
    output}; ``class_of``: {obj_id: semantic class id} for the maskid image.
    Background ids paint color but never write the depth buffer."""
    rgb = np.zeros((h, w, 3), np.uint8)
    maskid = np.zeros((h, w), np.uint16)
    instid = np.zeros((h, w), np.int32)
    zbuf = np.full((h, w), 100.0, np.float32)
    # separate z-buffer for background ids: the reference resolves bg-vs-bg
    # overlaps by iteration order (its own comment flags it as a known
    # wart, train.py:594 '记得修改'); depth-testing bg against bg keeps the
    # nearer wall/floor surface while preserving the reference's fg
    # semantics exactly (bg never occludes fg via the main zbuf)
    bg_zbuf = np.full((h, w), 100.0, np.float32)
    for obj_id, v in views.items():
        if v is None:
            continue
        this_depth = np.where(v["hit"], v["depth"], 100.0)
        ok = zbuf > this_depth
        if obj_id in bg_ids:
            ok &= bg_zbuf > this_depth
        rgb[ok] = (np.clip(v["color"], 0, 1)[ok] * 255).astype(np.uint8)
        maskid[ok] = class_of.get(obj_id, 0)
        instid[ok] = obj_id
        if obj_id not in bg_ids:
            zbuf[ok] = this_depth[ok]
        else:
            bg_zbuf[ok] = this_depth[ok]
    depth = np.where(zbuf >= 100.0, 0.0, zbuf)
    return {"rgb": rgb, "depth": depth, "maskid": maskid, "instid": instid}


# --------------------------------------------------------------------------- #
# batched whole-frame rendering (all objects, one dispatch)
# --------------------------------------------------------------------------- #


def _obb_ray_geometry(t_wo, extents, active, origins, dirs_w, far_extension):
    """Slab-test every ray against every OBB: (near, far, hit) with shapes
    [O, N]."""
    r_ow = jnp.swapaxes(t_wo[:, :3, :3], 1, 2)           # world -> obb
    o_off = origins[None] - t_wo[:, None, :3, 3]         # [O, N, 3]
    o_obb = jnp.einsum("oij,onj->oni", r_ow, o_off)
    d_obb = jnp.einsum("oij,nj->oni", r_ow, dirs_w)
    near, far, hit = jax.vmap(
        lambda o, d, e: sampling.ray_box_intersection(o, d, -e / 2.0, e / 2.0)
    )(o_obb, d_obb, extents)
    hit = hit & active[:, None]
    near = jnp.maximum(near, 0.0)
    far = jnp.where(far > near, far, near + 1e-3) + far_extension
    return near, far, hit


@jax.jit
def obb_hit_counts(t_wo, extents, active, origins, dirs_w):
    """Per-object OBB-hit ray counts [O] — cheap pure-geometry pre-pass so
    callers can size ``render_frame_batched``'s ``max_hit_rays`` to the
    actual coverage and never silently truncate (a close-up object can
    cover most of the frame)."""
    _, _, hit = _obb_ray_geometry(t_wo, extents, active, origins, dirs_w, 0.0)
    return jnp.sum(hit, axis=1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "n_bins", "max_deg", "max_hit_rays", "chunk", "two_pass", "n_probe",
        "compute_dtype",
    ),
)
def render_frame_batched(
    stacked_params: dict,      # leaves [O, ...] (fg stack or a gathered subset)
    t_wo: jnp.ndarray,         # [O, 4, 4] OBB->world
    extents: jnp.ndarray,      # [O, 3]
    centers: jnp.ndarray,      # [O, 3] object centers (field-frame offsets)
    active: jnp.ndarray,       # [O] bool
    origins: jnp.ndarray,      # [N, 3] (one camera: all rows identical)
    dirs_w: jnp.ndarray,       # [N, 3]
    key: jax.Array,
    n_bins: int = 150,
    max_deg: int = 5,
    max_hit_rays: int = 65536,
    chunk: int = 2048,
    opacity_thresh: float = 0.9,
    far_extension: float = 0.2,
    two_pass: bool = False,
    n_probe: int = 32,
    compute_dtype: str = "f32",
):
    """Render EVERY object of a stack at one pose in a single jitted program
    and z-buffer composite on device.

    The reference renders per object from Python (train.py:576-594 calling
    render_2D_syn per object, each internally chunked) — ~50 dispatches per
    frame and full-frame evaluation per object. Here: one dispatch; each
    object evaluates only rays that hit its OBB (slab test -> sized nonzero
    compaction to max_hit_rays, a static cap, typically 8-25% of the frame), cutting
    the field FLOPs by the typical 1/coverage factor.

    Returns {"depth" [N] (inf = no hit), "winner" [N] int32 (index into the
    stack, -1 = none), "color" [N, 3], "n_hit" [O] int32}.

    ``n_hit`` is each object's true OBB-hit ray count: if any
    ``n_hit[o] > max_hit_rays`` that object's surplus rays were NOT rendered
    (holes). Callers must size the cap from ``obb_hit_counts`` (as
    train.render_dataset does) or check ``n_hit`` after the fact.
    """
    o_count = extents.shape[0]
    n = origins.shape[0]
    m = max_hit_rays

    near, far, hit = _obb_ray_geometry(
        t_wo, extents, active, origins, dirs_w, far_extension
    )
    n_hit = jnp.sum(hit, axis=1).astype(jnp.int32)

    idx = jax.vmap(lambda h: jnp.nonzero(h, size=m, fill_value=n)[0])(hit)
    valid = idx < n
    idx_c = jnp.minimum(idx, n - 1)
    near_g = jnp.take_along_axis(near, idx_c, axis=1)    # [O, M]
    far_g = jnp.take_along_axis(far, idx_c, axis=1)
    dirs_g = dirs_w[idx_c]                               # [O, M, 3]
    origin = origins[0]
    keys = jax.random.split(key, o_count)

    n_chunks = -(-m // chunk)
    m_pad = n_chunks * chunk

    def _pad(x, fill=0.0):
        pad = m_pad - m
        if pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((o_count, pad, *x.shape[2:]), fill, x.dtype)], axis=1
        )

    near_p, far_p, dirs_p = _pad(near_g), _pad(far_g, 1.0), _pad(dirs_g)

    def render_object(args):
        params, center, nr, fr, dg, k = args

        def render_chunk(c_args):
            kc, nr_c, fr_c, dg_c = c_args
            if two_pass:
                nr_c, fr_c = _probe_tighten(
                    params, origin, dg_c, nr_c, fr_c, center, n_probe,
                    max_deg, compute_dtype,
                )
            z_edges = sampling.stratified_bins(kc, nr_c, fr_c, n_bins, nr_c.shape)
            z = 0.5 * (z_edges[..., 1:] + z_edges[..., :-1])
            pts = origin + dg_c[:, None, :] * z[..., None] - center
            a, c, _ = object_field.field_apply(
                params, pts, max_deg=max_deg, do_clip=False,
                compute_dtype=compute_dtype,
            )
            occ = rendering.occupancy_activation(a[..., 0])
            w = rendering.occupancy_to_termination(occ)
            return (
                rendering.render(w, z),
                rendering.render(w[..., None], c, axis=-2),
                jnp.sum(w, axis=-1),
            )

        ks = jax.random.split(k, n_chunks)
        d, c, op = jax.lax.map(
            render_chunk,
            (ks, nr.reshape(n_chunks, chunk), fr.reshape(n_chunks, chunk),
             dg.reshape(n_chunks, chunk, 3)),
        )
        return d.reshape(m_pad)[:m], c.reshape(m_pad, 3)[:m], op.reshape(m_pad)[:m]

    depth_m, color_m, opac_m = jax.lax.map(
        render_object, (stacked_params, centers, near_p, far_p, dirs_p, keys)
    )

    ok = (
        valid
        & (opac_m >= opacity_thresh)
        & (depth_m >= near_g)
        & (depth_m <= far_g)
    )

    def zbuf_body(o, bufs):
        zb, win, rgbb = bufs
        i = idx[o]
        d = jnp.where(ok[o], depth_m[o], jnp.inf)
        cur = zb[jnp.minimum(i, n - 1)]
        upd = (d < cur) & (i < n)
        tgt = jnp.where(upd, i, n)            # n -> dropped by mode="drop"
        zb = zb.at[tgt].set(d, mode="drop")
        win = win.at[tgt].set(o, mode="drop")
        rgbb = rgbb.at[tgt].set(color_m[o], mode="drop")
        return zb, win, rgbb

    zb, win, rgbb = jax.lax.fori_loop(
        0, o_count, zbuf_body,
        (jnp.full((n,), jnp.inf), jnp.full((n,), -1, jnp.int32),
         jnp.zeros((n, 3))),
    )
    return {"depth": zb, "winner": win, "color": rgbb, "n_hit": n_hit}


# --------------------------------------------------------------------------- #
# adaptive per-object bin counts (bucketed dispatch)
# --------------------------------------------------------------------------- #


def bucket_bin_counts(
    extents,
    active,
    n_bins: int,
    min_bins: int = 24,
    levels=(1.0, 0.5, 0.25),
    far_extension: float = 0.2,
):
    """Per-object bin counts [O] (host-side, numpy) for the bucketed renderer.

    The reference evaluates a FIXED 150 bins over every object's OBB interval
    (trainer.py:141-147) — so a 30 cm cup is sampled 10x denser than a 3 m
    sofa. Keeping the *density* of the largest active object instead: the
    configured ``n_bins`` is anchored to the largest OBB diagonal (the
    longest possible traversal), every smaller object gets proportionally
    fewer bins, quantized UP to ``n_bins * level`` for the given levels (so
    no object is ever sampled sparser than the anchor object), floor
    ``min_bins``. A handful of distinct sizes keeps the number of jit
    specializations bounded.
    """
    ext = np.asarray(extents, np.float64)
    act = np.asarray(active, bool)
    spans = np.linalg.norm(ext, axis=1) + far_extension
    ref = float(spans[act].max()) if act.any() else 1.0
    need = n_bins * spans / max(ref, 1e-6)
    sizes = sorted(
        {max(min_bins, int(round(n_bins * lv))) for lv in levels} | {n_bins}
    )
    out = np.full(ext.shape[0], n_bins, np.int32)
    for o in np.nonzero(act)[0]:
        out[o] = next(s for s in sizes if s >= min(need[o], n_bins))
    return out


def render_frame_bucketed(
    stacked_params: dict,
    t_wo: jnp.ndarray,
    extents: jnp.ndarray,
    centers: jnp.ndarray,
    active: jnp.ndarray,
    origins: jnp.ndarray,
    dirs_w: jnp.ndarray,
    key: jax.Array,
    n_bins: int = 150,
    max_deg: int = 5,
    max_hit_rays: int = 65536,
    chunk: int = 2048,
    opacity_thresh: float = 0.9,
    far_extension: float = 0.2,
    two_pass: bool = False,
    n_probe: int = 32,
    compute_dtype: str = "f32",
    min_bins: int = 24,
    levels=(1.0, 0.5, 0.25),
    hit_counts=None,
):
    """``render_frame_batched`` with per-object adaptive bin counts.

    Host-side orchestration: objects are grouped by ``bucket_bin_counts``
    into a few static bin sizes; each bucket renders through one
    ``render_frame_batched`` dispatch whose hit-ray cap is sized to that
    bucket's TRUE coverage (rounded up to a power-of-two number of chunks so
    re-specializations stay O(log) over a run), and the bucket z-buffers are
    merged by nearest depth. Small objects thus pay proportionally fewer
    point evals AND a tighter ray pad than the global cap. Composes with
    ``two_pass``.

    Returns the ``render_frame_batched`` dict (winner indices into the full
    stack) plus ``"bins"`` [O] — the per-object bin counts used.

    ``hit_counts``: precomputed ``obb_hit_counts`` result [O] — pass it when
    the caller already ran the pre-pass (train.render_dataset sizes its cap
    from it) so the slab test isn't evaluated twice per frame.
    """
    o_count = extents.shape[0]
    n = origins.shape[0]
    bins = bucket_bin_counts(
        extents, active, n_bins, min_bins=min_bins, levels=levels,
        far_extension=far_extension,
    )
    counts = np.asarray(
        obb_hit_counts(t_wo, extents, active, origins, dirs_w)
        if hit_counts is None else hit_counts
    )
    act = np.asarray(active, bool)
    n_cap = -(-n // chunk) * chunk

    depth = jnp.full((n,), jnp.inf)
    winner = jnp.full((n,), -1, jnp.int32)
    color = jnp.zeros((n, 3))
    n_hit = np.zeros(o_count, np.int32)
    n_hit[act] = counts[act]

    for b in sorted({int(x) for x in bins[act]}):
        sel = np.nonzero(act & (bins == b))[0]
        sel_j = jnp.asarray(sel)
        need = int(counts[sel].max())
        n_chunks = max(1, -(-min(need, max_hit_rays, n) // chunk))
        n_chunks = 1 << (n_chunks - 1).bit_length()   # next power of two
        m = min(n_chunks * chunk, n_cap, -(-max_hit_rays // chunk) * chunk)
        out = render_frame_batched(
            jax.tree.map(lambda x: x[sel_j], stacked_params),
            t_wo[sel_j], extents[sel_j], centers[sel_j],
            jnp.ones((len(sel),), bool), origins, dirs_w,
            jax.random.fold_in(key, b),
            n_bins=b, max_deg=max_deg, max_hit_rays=m, chunk=chunk,
            opacity_thresh=opacity_thresh, far_extension=far_extension,
            two_pass=two_pass, n_probe=n_probe, compute_dtype=compute_dtype,
        )
        better = out["depth"] < depth   # out depth is inf where no winner
        depth = jnp.where(better, out["depth"], depth)
        winner = jnp.where(
            better, sel_j.astype(jnp.int32)[jnp.maximum(out["winner"], 0)],
            winner,
        )
        color = jnp.where(better[:, None], out["color"], color)

    return {
        "depth": depth, "winner": winner, "color": color,
        "n_hit": jnp.asarray(n_hit), "bins": bins,
    }
