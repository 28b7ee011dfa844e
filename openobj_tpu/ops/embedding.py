"""Icosphere-projection frequency positional encoding.

Behavioural parity with the reference `UniDirsEmbed`
(/root/reference/objnerf/embedding.py:4-55): the input point is divided by a
per-object scale, projected onto 21 icosphere half-vertex directions, each
projection multiplied by frequency bands 2^0..2^max_deg, passed through
sin(x * pi), and concatenated after the scaled raw point.

With max_deg = 5 (the shipped configs) the embedding is
3 + 21*6 = 129-dimensional, split 87 / 42 between the density trunk and the
color/feature heads (reference trainer.py:20-21).

TPU-first notes: the direction table is a *trainable* per-object [21, 3]
matrix (the reference registers it as a bias-free nn.Linear whose parameters
are added to the optimizer, train.py:250-251); the scale and frequency bands
are non-trainable constants. Params live in flat dicts so a stack of objects
is just a leading axis on every leaf, mapping the whole encode onto one
batched matmul.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# 21 icosphere half-vertex directions (reference embedding.py:15-37).
ICOSPHERE_DIRS = np.array(
    [
        [0.8506508, 0.0, 0.5257311],
        [0.809017, 0.5, 0.309017],
        [0.5257311, 0.8506508, 0.0],
        [1.0, 0.0, 0.0],
        [0.809017, 0.5, -0.309017],
        [0.8506508, 0.0, -0.5257311],
        [0.309017, 0.809017, -0.5],
        [0.0, 0.5257311, -0.8506508],
        [0.5, 0.309017, -0.809017],
        [0.0, 1.0, 0.0],
        [-0.5257311, 0.8506508, 0.0],
        [-0.309017, 0.809017, -0.5],
        [0.0, 0.5257311, 0.8506508],
        [-0.309017, 0.809017, 0.5],
        [0.309017, 0.809017, 0.5],
        [0.5, 0.309017, 0.809017],
        [0.5, -0.309017, 0.809017],
        [0.0, 0.0, 1.0],
        [-0.5, 0.309017, 0.809017],
        [-0.809017, 0.5, 0.309017],
        [-0.809017, 0.5, -0.309017],
    ],
    dtype=np.float32,
)

N_DIRS = ICOSPHERE_DIRS.shape[0]  # 21


def n_freqs(max_deg: int, min_deg: int = 0) -> int:
    return max_deg - min_deg + 1


def frequency_bands(max_deg: int, min_deg: int = 0) -> jnp.ndarray:
    """2^min_deg .. 2^max_deg, one per integer degree (reference :42)."""
    return jnp.asarray(
        2.0 ** np.linspace(min_deg, max_deg, n_freqs(max_deg, min_deg)),
        dtype=jnp.float32,
    )


def embedding_dim(max_deg: int = 5, min_deg: int = 0) -> int:
    return 3 + N_DIRS * n_freqs(max_deg, min_deg)


def embedding_split(max_deg: int = 5) -> tuple[int, int]:
    """(emb_size1, emb_size2) — trunk / head split.

    Reference trainer.py:20-21: emb_size1 = 21*(3+1)+3 = 87 (scaled point +
    first 4 frequency bands), emb_size2 = the remaining bands.
    """
    size1 = N_DIRS * 4 + 3
    return size1, embedding_dim(max_deg) - size1


def init_pe_params(scale: float) -> dict:
    """Trainable direction table + non-trainable scale.

    ``scale`` is carried inside the param dict as a stop-gradient constant so
    that stacked per-object pytrees keep heterogeneous scales (bg=5.0,
    obj=2.0) without recompilation; the optimizer masks it out.
    """
    return {
        "dirs": jnp.asarray(ICOSPHERE_DIRS),
        "scale": jnp.asarray(scale, dtype=jnp.float32),
    }


def positional_encoding(
    pe_params: dict, x: jnp.ndarray, max_deg: int = 5, min_deg: int = 0,
    impl: str = "recurrence", concat: bool = True,
):
    """Encode points ``x`` [..., 3] -> [..., 3 + 21 * n_freqs].

    Band layout is frequency-major / direction-minor to match the reference's
    ``proj_bands.view(...)`` flattening (embedding.py:49-50):
    [t(3), sin(pi * f0 * proj(0..20)), sin(pi * f1 * proj(0..20)), ...].

    impl:
      * "recurrence" (default): the bands are exact doublings, so all F
        sines come from ONE sin/cos pair via the double-angle identities
        sin(2a) = 2 sin(a) cos(a), cos(2a) = 1 - 2 sin^2(a) — 2
        transcendentals + a few VPU muls instead of F sines over the full
        [..., F*21] lattice. Profiling the room_0 training step showed the
        direct sine fusion (fwd + its cos-based backward) at ~1/3 of the
        per-step device time; float error of 5 doublings is ~32 ulp
        (< 4e-6), far inside bf16's resolution that XLA's TPU propagation
        pass demotes the embedding to anyway.
      * "direct": the reference's literal formulation.

    concat=False returns the pieces ``(t, sins)`` unconcatenated —
    mlp_apply consumes them via row-partitioned matmuls so the [..., 129]
    tensor is never materialized (measured time-neutral at the room_0
    envelope; kept for the memory shape, not speed).
    """
    scale = jax.lax.stop_gradient(pe_params["scale"])
    t = x / scale
    # The projection feeds sin() at frequencies up to 2^max_deg * pi — bf16
    # MXU phase error would destroy the top bands, so force f32 here (the
    # matmul is [..., 3] @ [3, 21]: negligible cost).
    proj = jnp.dot(t, pe_params["dirs"].T, precision=jax.lax.Precision.HIGHEST)
    f = n_freqs(max_deg, min_deg)
    if impl == "recurrence":
        theta = proj * (jnp.pi * (2.0 ** min_deg))
        s, c = jnp.sin(theta), jnp.cos(theta)
        outs = [s]
        for _ in range(f - 1):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            outs.append(s)
        sins = jnp.concatenate(outs, axis=-1)  # frequency-major [..., F*21]
    else:
        bands = frequency_bands(max_deg, min_deg)  # [F]
        xb = proj[..., None, :] * bands[:, None]  # [..., F, 21]
        xb = xb.reshape(*proj.shape[:-1], -1)  # [..., F*21]
        sins = jnp.sin(xb * jnp.pi)
    if not concat:
        return t, sins
    return jnp.concatenate([t, sins], axis=-1)
