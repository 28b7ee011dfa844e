"""The batched multi-term training loss.

Behavioural parity with the reference ``step_batch_loss``
(/root/reference/objnerf/loss.py:5-103) over tensors shaped
[n_obj, n_rays, n_pts]:

  * mask_obj = state != 0 (this-or-unknown), mask_sem = state != 2
    (this-or-other), both stop-gradiented (loss.py:16-21);
  * composite depth, per-ray depth variance (detached), color, and
    opacity = sum(termination) (loss.py:27-35);
  * depth L1 on (mask_sem & mask_obj), information-weighted by
    1/(sqrt(var)+1e-4) (loss.py:41-49);
  * color L1 summed over channels on (mask_sem & mask_obj), x5 (loss.py:54-63);
  * opacity L1 toward the object silhouette (mask_obj as {0,1}) on mask_sem,
    x10 (loss.py:71-75);
  * optional part-feature cosine loss on the rendered feature vs the 2D
    part-CLIP map, x5 (loss.py:81-99);
  * total = sum over objects (loss.py:101).

TPU-native extension: an ``active`` [n_obj] mask gates dead object slots
(slot-allocated object axis — SURVEY.md §7.1), and per-empty-row losses are
zeroed instead of the reference's whole-batch bailout (see
openobj_tpu.ops.rendering.reduce_masked_loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openobj_tpu.ops import mlp, rendering
from openobj_tpu.ops.sampling import STATE_OTHER, STATE_THIS, STATE_UNKNOWN  # noqa: F401


def step_batch_loss(
    alpha: jnp.ndarray,          # [O, R, P] raw density (already x10)
    color: jnp.ndarray,          # [O, R, P, 3]
    gt_depth: jnp.ndarray,       # [O, R]
    gt_color: jnp.ndarray,       # [O, R, 3] in [0, 1]
    state: jnp.ndarray,          # [O, R] pixel states {0 other, 1 this, 2 unknown}
    z_vals: jnp.ndarray,         # [O, R, P]
    active: jnp.ndarray | None = None,   # [O] bool slot mask
    color_scaling: float = 5.0,
    opacity_scaling: float = 10.0,
    gt_partfeat: jnp.ndarray | None = None,   # [O, R, C]
    pred_partfeat: jnp.ndarray | None = None,  # [O, R, P, C]
    pred_partfeat_hidden: jnp.ndarray | None = None,  # [O, R, P, h]
    partfeat_head: dict | None = None,         # mlp params with "out_clip"
    partfeat_scaling: float = 5.0,
):
    """Returns (scalar total loss, per-object loss [O])."""
    mask_obj = jax.lax.stop_gradient(state != STATE_OTHER)
    mask_sem = jax.lax.stop_gradient(state != STATE_UNKNOWN)
    mask_so = mask_sem & mask_obj

    occupancy = rendering.occupancy_activation(alpha)
    termination = rendering.occupancy_to_termination(occupancy)  # [O, R, P]

    render_depth = rendering.render(termination, z_vals)  # [O, R]
    diff_sq = (z_vals - render_depth[..., None]) ** 2
    var = jax.lax.stop_gradient(rendering.render(termination, diff_sq))
    render_color = rendering.render(termination[..., None], color, axis=-2)
    render_opacity = jnp.sum(termination, axis=-1)

    loss_depth_raw = rendering.render_loss(render_depth, gt_depth, loss="L1")
    loss_depth = rendering.reduce_masked_loss(
        loss_depth_raw * mask_so, mask_so, var=var, loss_type="L1"
    )

    loss_col_raw = rendering.render_loss(render_color, gt_color, loss="L1").sum(-1)
    loss_col = rendering.reduce_masked_loss(loss_col_raw * mask_so, mask_so)

    loss_opacity_raw = rendering.render_loss(
        render_opacity, mask_obj.astype(render_opacity.dtype), loss="L1"
    )
    loss_opacity = rendering.reduce_masked_loss(loss_opacity_raw * mask_sem, mask_sem)

    per_obj = loss_depth + loss_col * color_scaling + loss_opacity * opacity_scaling

    render_partfeat = None
    if gt_partfeat is not None:
        gt_partfeat = gt_partfeat.astype(jnp.float32)  # bf16 store -> f32 math
    if gt_partfeat is not None and pred_partfeat_hidden is not None:
        # Fast path: composite the h-wide clip hidden, then project once per
        # ray — exact because the clip head is linear (ops.mlp.clip_project).
        render_hidden = rendering.render(
            termination[..., None], pred_partfeat_hidden, axis=-2
        )
        render_partfeat = mlp.clip_project(
            partfeat_head, render_hidden, opacity=render_opacity
        )
    elif gt_partfeat is not None and pred_partfeat is not None:
        render_partfeat = rendering.render(
            termination[..., None], pred_partfeat, axis=-2
        )
    if render_partfeat is not None:
        loss_pf_raw = rendering.render_loss(render_partfeat, gt_partfeat, loss="cos")
        loss_pf = rendering.reduce_masked_loss(loss_pf_raw * mask_so, mask_so)
        per_obj = per_obj + loss_pf * partfeat_scaling

    if active is not None:
        per_obj = per_obj * active.astype(per_obj.dtype)

    return per_obj.sum(), per_obj
