"""Object mesh extraction: OBB-framed grid eval -> marching tetrahedra ->
world-space vertex-colored mesh (+ optional part-feature vertices).

Parity with reference Trainer.meshing / eval_points
(/root/reference/objnerf/trainer.py:46-128):
  * grid spans [-1, 1]^3 scaled by extent/(2 * bound_extent) and rigidly
    placed by the OBB (bound_extent 0.995 bg / 0.9 obj, trainer.py:24-28);
  * adaptive grid dim = min(max_extent / voxel_size + 1, grid_dim)
    (train.py:626);
  * field evaluated in fixed-size chunks (lax.map; reference chunks 300k);
  * occ = sigmoid(alpha); all-zero occ -> None ("no occ", trainer.py:125-127);
  * surface at level 0.5; vertices re-evaluated for colors (x255 uint8) and
    512-d part features (trainer.py:91-102);
  * save_pcd mode: occ > 0.5 grid points + colors (trainer.py:70-79).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from openobj_tpu.models import object_field
from openobj_tpu.ops import rendering
from openobj_tpu.utils.geometry import OrientedBox, TriangleMesh


@partial(jax.jit, static_argnames=("max_deg", "chunk_size", "do_clip"))
def eval_points_chunked(
    params: dict,
    points: jnp.ndarray,      # [N, 3] (N padded to chunk multiple by caller)
    max_deg: int = 5,
    chunk_size: int = 65536,
    do_clip: bool = False,
):
    """Chunked no-grad field evaluation. Returns (occ [N], color [N, 3],
    clip [N, C] or zeros)."""
    n = points.shape[0]
    pad = (-n) % chunk_size
    pts = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)])

    def one(chunk):
        a, c, f = object_field.field_apply(params, chunk, max_deg=max_deg,
                                           do_clip=do_clip)
        occ = rendering.occupancy_activation(a[..., 0])
        if f is None:
            f = jnp.zeros((*chunk.shape[:-1], 1), jnp.float32)
        return occ, c, f

    occ, color, clip = jax.lax.map(one, pts.reshape(-1, chunk_size, 3))
    return (
        occ.reshape(-1)[:n],
        color.reshape(-1, 3)[:n],
        clip.reshape(-1, clip.shape[-1])[:n],
    )


def adaptive_grid_dim(obb: OrientedBox, voxel_size: float, grid_dim: int) -> int:
    return int(min(np.max(obb.extent) // voxel_size + 1, grid_dim))


def mesh_object(
    params: dict,
    obb: OrientedBox,
    obj_center: np.ndarray,
    grid_dim: int = 128,
    is_bg: bool = False,
    with_color: bool = True,
    with_part: bool = False,
    max_deg: int = 5,
    level: float = 0.5,
) -> TriangleMesh | None:
    """Extract one object's mesh in world coordinates."""
    bound_extent = 0.995 if is_bg else 0.9
    scale = obb.extent / (2.0 * bound_extent)
    transform = np.eye(4, dtype=np.float32)
    transform[:3, :3] = obb.r
    transform[:3, 3] = obb.center

    grid = rendering.make_3d_grid(
        occ_range=(-1.0, 1.0), dim=grid_dim,
        scale=jnp.asarray(scale, jnp.float32),
        transform=jnp.asarray(transform),
    ).reshape(-1, 3)
    grid = grid - jnp.asarray(obj_center, jnp.float32)

    occ, _, _ = eval_points_chunked(params, grid, max_deg=max_deg)
    occ = np.asarray(occ, np.float32)
    if occ.max() <= level:
        return None
    from openobj_tpu import native

    out = native.marching_tetrahedra(
        occ.reshape(grid_dim, grid_dim, grid_dim), level=level
    )
    if out is None:
        return None
    verts01, faces = out

    # [0,1] grid coords -> [-1,1] -> scaled -> world (reference trainer.py:85-90)
    verts = (verts01 * 2.0 - 1.0) * scale
    verts = verts @ transform[:3, :3].T + transform[:3, 3]
    mesh = TriangleMesh(vertices=verts.astype(np.float32), faces=faces)

    if with_color or with_part:
        # field inputs are object-centered (training subtracts obj_center)
        _, color, clip = eval_points_chunked(
            params, jnp.asarray(mesh.vertices - np.asarray(obj_center, np.float32)),
            max_deg=max_deg, do_clip=with_part,
        )
        if with_color:
            mesh.vertex_colors = (
                np.clip(np.asarray(color), 0, 1) * 255
            ).astype(np.uint8)
        if with_part:
            mesh.vertex_attrs = {"partfeat": np.asarray(clip, np.float32)}
    return mesh


def object_point_cloud(
    params: dict,
    obb: OrientedBox,
    obj_center: np.ndarray,
    grid_dim: int = 128,
    is_bg: bool = False,
    max_deg: int = 5,
    level: float = 0.5,
):
    """occ > level grid points + colors (reference save_pcd path,
    trainer.py:70-79; its voxel_down_sample discards the result, so no
    downsampling here either). Returns (points [N,3], colors [N,3]) or None."""
    bound_extent = 0.995 if is_bg else 0.9
    scale = obb.extent / (2.0 * bound_extent)
    transform = np.eye(4, dtype=np.float32)
    transform[:3, :3] = obb.r
    transform[:3, 3] = obb.center
    grid = rendering.make_3d_grid(
        occ_range=(-1.0, 1.0), dim=grid_dim,
        scale=jnp.asarray(scale, jnp.float32), transform=jnp.asarray(transform),
    ).reshape(-1, 3) - jnp.asarray(obj_center, jnp.float32)
    occ, color, _ = eval_points_chunked(params, grid, max_deg=max_deg)
    occ = np.asarray(occ)
    mask = occ > level
    if not mask.any():
        return None
    pts = np.asarray(grid)[mask] + np.asarray(obj_center, np.float32)  # world
    cols = np.asarray(color)[mask]
    return pts, cols
