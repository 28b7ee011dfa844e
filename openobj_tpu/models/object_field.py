"""Per-object neural field = positional encoding + occupancy MLP, with a
stacked leading object axis.

The reference materializes one Python ``Trainer`` per object and re-runs
functorch's ``combine_state_for_ensemble`` every time an object appears
(/root/reference/objnerf/utils.py:55-62, train.py:272-276). Here the stack IS
the native layout: ``init_stacked_fields`` builds params with a leading [O]
axis on every leaf, ``field_apply_stacked`` vmaps the field over it, and new
objects are written into preallocated slots (``write_slot``) — no recompiles,
no re-stacking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openobj_tpu.ops import embedding, mlp


def init_field_params(
    key: jax.Array,
    hidden: int = 32,
    clip_size: int = 512,
    scale: float = 2.0,
    max_deg: int = 5,
    do_color: bool = True,
    do_clip: bool = True,
) -> dict:
    emb1, emb2 = embedding.embedding_split(max_deg)
    return {
        "pe": embedding.init_pe_params(scale),
        "mlp": mlp.init_mlp_params(
            key, emb1, emb2, hidden=hidden, clip_size=clip_size,
            do_color=do_color, do_clip=do_clip,
        ),
    }


def init_stacked_fields(
    key: jax.Array,
    n_slots: int,
    hidden: int = 32,
    clip_size: int = 512,
    scale: float = 2.0,
    max_deg: int = 5,
    do_color: bool = True,
    do_clip: bool = True,
) -> dict:
    """Stacked params: every leaf gets a leading [n_slots] axis."""
    keys = jax.random.split(key, n_slots)
    return jax.vmap(
        lambda k: init_field_params(
            k, hidden=hidden, clip_size=clip_size, scale=scale,
            max_deg=max_deg, do_color=do_color, do_clip=do_clip,
        )
    )(keys)


def field_apply(
    params: dict,
    points: jnp.ndarray,
    max_deg: int = 5,
    do_alpha: bool = True,
    do_color: bool = True,
    do_clip: bool = True,
    clip_hidden_only: bool = False,
    compute_dtype: str = "f32",
    gemm_impl: str = "segmented",
):
    """Evaluate one object's field at world-frame points [..., 3]."""
    emb1, _ = embedding.embedding_split(max_deg)
    emb = embedding.positional_encoding(
        params["pe"], points, max_deg=max_deg, concat=False
    )
    return mlp.mlp_apply(
        params["mlp"], emb, emb_size1=emb1,
        do_alpha=do_alpha, do_color=do_color, do_clip=do_clip,
        clip_hidden_only=clip_hidden_only, compute_dtype=compute_dtype,
        gemm_impl=gemm_impl,
    )


def field_apply_stacked(
    stacked_params: dict,
    points: jnp.ndarray,
    max_deg: int = 5,
    do_alpha: bool = True,
    do_color: bool = True,
    do_clip: bool = True,
    clip_hidden_only: bool = False,
    compute_dtype: str = "f32",
    gemm_impl: str = "segmented",
):
    """Evaluate all object fields at their own points.

    stacked_params: leaves [O, ...]; points: [O, ..., 3].
    Returns (alpha [O, ..., 1], color [O, ..., 3], clip [O, ..., C]).
    """
    return jax.vmap(
        lambda p, x: field_apply(
            p, x, max_deg=max_deg,
            do_alpha=do_alpha, do_color=do_color, do_clip=do_clip,
            clip_hidden_only=clip_hidden_only, compute_dtype=compute_dtype,
            gemm_impl=gemm_impl,
        )
    )(stacked_params, points)


def slice_slot(stacked_params: dict, slot) -> dict:
    """Extract one object's params from the stack."""
    return jax.tree.map(lambda x: x[slot], stacked_params)


def write_slot(stacked_params: dict, slot, params: dict) -> dict:
    """Write fresh params into a slot (new object allocation)."""
    return jax.tree.map(
        lambda s, n: s.at[slot].set(n.astype(s.dtype)), stacked_params, params
    )
