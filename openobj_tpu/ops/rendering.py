"""Occupancy -> termination compositing, residuals, and masked reductions.

Behavioural parity with the reference render_rays.py
(/root/reference/objnerf/render_rays.py):

  * ``occupancy_activation``: sigmoid(alpha) (UniSurf) or 1 - exp(-alpha * d)
    (render_rays.py:6-14);
  * ``occupancy_to_termination``: w_i = occ_i * prod_{j<i}(1 - occ_j + 1e-10)
    (render_rays.py:32-54) — shape-polymorphic over leading dims (the
    reference's is_batch flag is unnecessary here);
  * ``render``: sum(w * val) (render_rays.py:56-63);
  * ``render_loss``: L1 / L2 / cosine residuals (render_rays.py:65-83);
  * ``reduce_masked_loss``: masked mean with optional inverse-variance
    information weighting (render_rays.py:85-117). Deviation from reference:
    the reference zeroes the WHOLE batch loss if ANY object row has zero
    valid samples (render_rays.py:90-94) — poison for a slot-allocated
    object axis where inactive slots always have zero masks. We zero only
    the empty rows, which is the obviously-intended semantics.
  * ``make_3d_grid``: scaled/rotated cube lattice for meshing
    (render_rays.py:119-146).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FREE_PROB_EPS = 1e-10  # reference render_rays.py:38,41
INFO_EPS = 1e-4  # reference render_rays.py:96
MASK_EPS = 1e-10  # reference render_rays.py:108


def occupancy_activation(alpha: jnp.ndarray, distances=None) -> jnp.ndarray:
    if distances is not None:
        return 1.0 - jnp.exp(-alpha * distances)
    return jax.nn.sigmoid(alpha)


def occupancy_to_termination(occupancy: jnp.ndarray) -> jnp.ndarray:
    """Per-sample termination probability along the last axis.

    occupancy: [..., P] -> termination [..., P] with
    w_i = occ_i * prod_{j < i} (1 - occ_j + 1e-10).
    """
    free = 1.0 - occupancy + FREE_PROB_EPS
    # exclusive cumulative product along the sample axis
    shifted = jnp.concatenate(
        [jnp.ones_like(free[..., :1]), free[..., :-1]], axis=-1
    )
    return occupancy * jnp.cumprod(shifted, axis=-1)


def render(termination: jnp.ndarray, vals: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Composite per-sample values with termination weights."""
    return jnp.sum(termination * vals, axis=axis)


def render_loss(pred: jnp.ndarray, gt: jnp.ndarray, loss: str = "L1",
                normalise: bool = False) -> jnp.ndarray:
    if loss == "L2":
        mat = (pred - gt) ** 2
    elif loss == "L1":
        mat = jnp.abs(pred - gt)
    elif loss == "cos":
        num = jnp.sum(pred * gt, axis=-1)
        # eps INSIDE the sqrt: jnp.linalg.norm has a NaN gradient at exactly
        # zero vectors (x/||x|| = 0/0), and an all-transparent ray renders a
        # zero feature — NaN x masked-0 still poisons the whole step
        den = jnp.sqrt(jnp.sum(pred**2, axis=-1) + 1e-12) * jnp.sqrt(
            jnp.sum(gt**2, axis=-1) + 1e-12
        )
        mat = 1.0 - num / den
    else:
        raise ValueError(f"loss type {loss} not implemented")
    if normalise:
        mat = mat / gt
    return mat


def reduce_masked_loss(
    loss_mat: jnp.ndarray,
    mask: jnp.ndarray,
    var: jnp.ndarray | None = None,
    loss_type: str = "L1",
) -> jnp.ndarray:
    """Masked mean over the last axis, per leading row.

    loss_mat, mask: [..., R]. Returns [...]-shaped per-row losses; rows with
    no valid samples contribute exactly zero (see module docstring for the
    deviation from the reference's all-or-nothing behaviour).
    """
    if var is not None:
        if loss_type == "L2":
            information = 1.0 / (var + INFO_EPS)
        else:  # L1
            information = 1.0 / (jnp.sqrt(var) + INFO_EPS)
        loss_mat = loss_mat * information
    mask_f = mask.astype(loss_mat.dtype)
    num = jnp.sum(loss_mat * mask_f, axis=-1)
    den = jnp.sum(mask_f, axis=-1)
    return jnp.where(den > 0, num / (den + MASK_EPS), 0.0)


def make_3d_grid(
    occ_range=(-1.0, 1.0),
    dim: int = 256,
    transform: jnp.ndarray | None = None,
    scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[dim, dim, dim, 3] lattice, optionally scaled per-axis then rigidly
    transformed (reference render_rays.py:119-146; 'ij' meshgrid order)."""
    t = jnp.linspace(occ_range[0], occ_range[1], dim)
    gx, gy, gz = jnp.meshgrid(t, t, t, indexing="ij")
    grid = jnp.stack([gx, gy, gz], axis=-1)
    if scale is not None:
        grid = grid * scale
    if transform is not None:
        r = transform[:3, :3]
        grid = grid @ r.T + transform[:3, 3]
    return grid
