"""The per-object occupancy/color/CLIP field MLP, as pure functions.

Behavioural parity with the reference ``OccupancyMap``
(/root/reference/objnerf/model.py:16-103):

  trunk:  in_layer(emb1 -> h) -> mid1(h -> h) -> cat_layer(h+emb1 -> h)
          -> mid2(h -> h), all Linear+ReLU;
  heads:  out_alpha(h -> 1), raw * 10 (UniSurf convention, model.py:88);
          color_linear(h+emb2 -> h)+ReLU -> out_color(h -> 3) -> sigmoid;
          clip_linear(h+emb2 -> h)+ReLU -> out_clip(h -> clip_size), linear.

emb1/emb2 are the 87/42 split of the 129-d positional encoding
(reference trainer.py:20-21). Hidden size: 32 for objects, 128 for the
background (configs/Replica/room_0.json:53-54). Weights use Xavier-normal
init (model.py:4-6,43); biases start at zero.

Params are flat dicts of (weight [in, out], bias [out]) so a stack of N
objects is a leading axis on every leaf — `jax.vmap(mlp_apply)` turns the
whole object ensemble into one batched MXU matmul stack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LAYERS = (
    # name, (in expression), out expression — resolved in init
    "in_layer",
    "mid1",
    "cat_layer",
    "mid2",
    "out_alpha",
    "color_linear",
    "out_color",
    "clip_linear",
    "out_clip",
)

ALPHA_SCALE = 10.0  # UniSurf raw-density scale (reference model.py:88)


def _xavier_normal(key, fan_in: int, fan_out: int) -> jnp.ndarray:
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return std * jax.random.normal(key, (fan_in, fan_out), dtype=jnp.float32)


def _linear_init(key, fan_in: int, fan_out: int) -> dict:
    return {
        "w": _xavier_normal(key, fan_in, fan_out),
        "b": jnp.zeros((fan_out,), dtype=jnp.float32),
    }


def init_mlp_params(
    key: jax.Array,
    emb_size1: int = 87,
    emb_size2: int = 42,
    hidden: int = 32,
    clip_size: int = 512,
    do_color: bool = True,
    do_clip: bool = True,
) -> dict:
    keys = jax.random.split(key, len(_LAYERS))
    p = {
        "in_layer": _linear_init(keys[0], emb_size1, hidden),
        "mid1": _linear_init(keys[1], hidden, hidden),
        "cat_layer": _linear_init(keys[2], hidden + emb_size1, hidden),
        "mid2": _linear_init(keys[3], hidden, hidden),
        "out_alpha": _linear_init(keys[4], hidden, 1),
    }
    if do_color:
        p["color_linear"] = _linear_init(keys[5], hidden + emb_size2, hidden)
        p["out_color"] = _linear_init(keys[6], hidden, 3)
    if do_clip:
        p["clip_linear"] = _linear_init(keys[7], hidden + emb_size2, hidden)
        p["out_clip"] = _linear_init(keys[8], hidden, clip_size)
    return p


def _linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def _linear_relu(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(_linear(p, x))


def mlp_apply(
    params: dict,
    emb: jnp.ndarray,
    emb_size1: int = 87,
    do_alpha: bool = True,
    do_color: bool = True,
    do_clip: bool = True,
    do_cat: bool = True,
):
    """Evaluate the field at embedded points.

    emb: [..., emb_size1 + emb_size2]
    Returns (alpha [..., 1] | None, color [..., 3] | None,
             clip [..., clip_size] | None).
    """
    e1 = emb[..., :emb_size1]
    e2 = emb[..., emb_size1:]

    h = _linear_relu(params["in_layer"], e1)
    h = _linear_relu(params["mid1"], h)
    if do_cat:
        h = _linear_relu(params["cat_layer"], jnp.concatenate([h, e1], axis=-1))
    h = _linear_relu(params["mid2"], h)

    alpha = None
    if do_alpha:
        alpha = _linear(params["out_alpha"], h) * ALPHA_SCALE

    color = None
    if do_color and "out_color" in params:
        hc = _linear_relu(params["color_linear"], jnp.concatenate([h, e2], axis=-1))
        color = jax.nn.sigmoid(_linear(params["out_color"], hc))

    clip = None
    if do_clip and "out_clip" in params:
        hf = _linear_relu(params["clip_linear"], jnp.concatenate([h, e2], axis=-1))
        clip = _linear(params["out_clip"], hf)

    return alpha, color, clip


def param_count(params: dict) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
