"""The multi-cue similarity matrices over all masks of a sequence.

Parity with /root/reference/maskclustering/mask_graph.py:

  * ``iou3d_matrix`` — pairwise AABB intersection normalized by the SMALLER
    box volume (not the union; :501-530);
  * ``cosine_matrix`` — feature Gram with row-norm normalization (:573-584,
    :592-601 — same formula for caption, CLIP, and color-hist cues);
  * ``projected_iou2d_matrix`` — per frame: every 10th pixel's ray scaled by
    depth, intersected with every mask AABB (vectorized slab test :634-643),
    each AABB's hit-pixel set -> tight 2D bbox (:660-680), pairwise 2D IoU
    (union-normalized, :533-558), running mean over frames (:697-712).

These are dense [M, M] batched ops — jnp so they run on the accelerator
when available (the reference moved exactly these to CUDA).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def iou3d_matrix(bboxes: np.ndarray) -> np.ndarray:
    """bboxes [M, 6] (min_xyz, max_xyz) -> [M, M] intersection / smaller-vol."""
    b = jnp.asarray(bboxes, jnp.float32)
    lo, hi = b[:, :3], b[:, 3:]
    vol = jnp.prod(hi - lo, axis=-1)
    inter_lo = jnp.maximum(lo[:, None, :], lo[None, :, :])
    inter_hi = jnp.minimum(hi[:, None, :], hi[None, :, :])
    inter = jnp.prod(jnp.maximum(0.0, inter_hi - inter_lo), axis=-1)
    smaller = jnp.minimum(vol[:, None], vol[None, :])
    out = jnp.where(smaller > 0, inter / smaller, 0.0)
    return np.asarray(jnp.nan_to_num(out))


def cosine_matrix(feats: np.ndarray) -> np.ndarray:
    """Row-normalized Gram matrix (mask_graph.py:573-584)."""
    f = jnp.asarray(np.asarray(feats), jnp.float32)
    norm = jnp.linalg.norm(f, axis=1, keepdims=True)
    f = f / jnp.maximum(norm, 1e-12)
    return np.asarray(f @ f.T)


def iou2d(boxes: jnp.ndarray) -> jnp.ndarray:
    """boxes [M, 4] (r0, c0, r1, c1) -> [M, M] union-normalized IoU
    (mask_graph.py:533-558); degenerate pairs -> 0."""
    r0, c0, r1, c1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (r1 - r0) * (c1 - c0)
    ir0 = jnp.maximum(r0[:, None], r0[None, :])
    ir1 = jnp.minimum(r1[:, None], r1[None, :])
    ic0 = jnp.maximum(c0[:, None], c0[None, :])
    ic1 = jnp.minimum(c1[:, None], c1[None, :])
    inter = jnp.clip(ir1 - ir0, 0) * jnp.clip(ic1 - ic0, 0)
    union = area[:, None] + area[None, :] - inter
    return jnp.nan_to_num(jnp.where(union > 0, inter / union, 0.0))


def _hit_bboxes(hit: jnp.ndarray, hs: int, ws: int) -> jnp.ndarray:
    """hit [M, hs*ws] bool -> [M, 4] tight bbox of hit pixels per mask
    (min_rect_bbox parity; empty -> zeros, mask_graph.py:660-680)."""
    hit = hit.reshape(-1, hs, ws)
    rows = jnp.arange(hs)[None, :, None]
    cols = jnp.arange(ws)[None, None, :]
    big = 10**6
    r0 = jnp.min(jnp.where(hit, rows, big), axis=(1, 2))
    r1 = jnp.max(jnp.where(hit, rows, -1), axis=(1, 2)) + 1
    c0 = jnp.min(jnp.where(hit, cols, big), axis=(1, 2))
    c1 = jnp.max(jnp.where(hit, cols, -1), axis=(1, 2)) + 1
    any_hit = hit.any(axis=(1, 2))
    box = jnp.stack([r0, c0, r1, c1], axis=-1).astype(jnp.float32)
    return jnp.where(any_hit[:, None], box, 0.0)


def projected_iou2d_matrix(
    depths: list[np.ndarray],     # per frame [H, W] meters
    t_wcs: np.ndarray,            # [F, 4, 4]
    fx: float, fy: float, cx: float, cy: float,
    bboxes: np.ndarray,           # [M, 6] world AABBs
    skip: int = 10,
) -> np.ndarray:
    """Running mean over frames of pairwise 2D IoU between each AABB's
    projected ray-hit footprint (mask_graph.py:683-735)."""
    b = jnp.asarray(bboxes, jnp.float32)
    lo, hi = b[:, :3], b[:, 3:]
    m = b.shape[0]
    acc = jnp.zeros((m, m), jnp.float32)
    for i, depth in enumerate(depths):
        d = depth[::skip, ::skip]
        hs, ws = d.shape
        vs, us = np.meshgrid(
            np.arange(0, depth.shape[0], skip),
            np.arange(0, depth.shape[1], skip),
            indexing="ij",
        )
        dirs = np.stack(
            [(us - cx) / fx, (vs - cy) / fy, np.ones_like(us, np.float32)], -1
        )
        rays_d = (dirs * d[..., None]).reshape(-1, 3) @ t_wcs[i][:3, :3].T
        rays_o = np.broadcast_to(t_wcs[i][:3, 3], rays_d.shape)
        o = jnp.asarray(rays_o, jnp.float32)[:, None, :]
        dd = jnp.asarray(rays_d, jnp.float32)[:, None, :]
        dd = jnp.where(jnp.abs(dd) < 1e-12, 1e-12, dd)
        tmin = (lo[None] - o) / dd
        tmax = (hi[None] - o) / dd
        t1 = jnp.minimum(tmin, tmax)
        t2 = jnp.maximum(tmin, tmax)
        near = jnp.max(t1, axis=2)
        far = jnp.min(t2, axis=2)
        hit = ((near <= far) & (far > 0)).T          # [M, n_rays]
        boxes2d = _hit_bboxes(hit, hs, ws)
        acc = (acc * i + iou2d(boxes2d)) / (i + 1)
    return np.asarray(acc)
