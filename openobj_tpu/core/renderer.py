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
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from openobj_tpu.models import object_field
from openobj_tpu.ops import mlp, rendering, sampling


@partial(
    jax.jit,
    static_argnames=("n_bins", "max_deg", "chunk_size", "render_part"),
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
        z_edges = sampling.stratified_bins(k, nr, fr, n_bins, nr.shape)
        z = 0.5 * (z_edges[..., 1:] + z_edges[..., :-1])  # midpoints
        pts = sampling.rays_to_points(o_c, d_c, z, obj_center)
        a, c, f = object_field.field_apply(
            params, pts, max_deg=max_deg, do_clip=render_part,
            clip_hidden_only=True,
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
    for obj_id, v in views.items():
        if v is None:
            continue
        this_depth = np.where(v["hit"], v["depth"], 100.0)
        ok = zbuf > this_depth
        rgb[ok] = (np.clip(v["color"], 0, 1)[ok] * 255).astype(np.uint8)
        maskid[ok] = class_of.get(obj_id, 0)
        instid[ok] = obj_id
        if obj_id not in bg_ids:
            zbuf[ok] = this_depth[ok]
    depth = np.where(zbuf >= 100.0, 0.0, zbuf)
    return {"rgb": rgb, "depth": depth, "maskid": maskid, "instid": instid}
