"""Multi-chip scale-out via jax.sharding + GSPMD.

The reference is single-process single-GPU with NO distributed backend
(SURVEY.md §2.5); its one parallelism trick is the functorch object
ensemble. TPU-native scale-out keeps that object axis as the PRINCIPAL
shard axis — each chip owns a contiguous block of object slots (their
params, optimizer state, keyframe tables, and sampled rays all shard
together along the leading [O] axis, so per-object training is fully local
and embarrassingly parallel over ICI). The shared background model is
replicated; its gradients are identical across chips (replicated sampling),
so no collective is needed until ray-level data parallelism is enabled, at
which point XLA inserts the psum automatically from the shardings.

Usage:
    mesh = make_mesh(jax.devices(), ("object",))
    state, tables = shard_scene(mesh, state, fg_tables)
    state, losses = trainer.train_frame(state, store, cam_dirs,
                                        tables, bg_tables, key, cfg)
(The jitted train_frame is reused verbatim: computation follows data.)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=("object",), shape=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else (1,) * (len(axis_names) - 1) + (n,)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def make_mesh_2d(devices=None, n_data: int = 2) -> Mesh:
    """2D ('data', 'object') mesh: object slots shard over 'object', the
    per-step ray batches over 'data' (gradients psum over 'data'
    automatically from the shardings). Activate with
    ``with jax.set_mesh(mesh): ...`` around train_frame calls so the
    in-graph constraints (``maybe_constrain``) see the axes."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % n_data:
        raise ValueError(f"{n} devices not divisible by data axis {n_data}")
    dev_array = np.asarray(devices).reshape(n_data, n // n_data)
    return Mesh(dev_array, ("data", "object"))


def maybe_constrain(x, *axes: str):
    """Sharding-constrain leading axes of ``x`` by mesh axis name, for every
    requested axis the ambient (jax.set_mesh) mesh actually has with size >
    1. No-op when no mesh is active — so jitted library code can embed
    constraints without forcing callers to think about meshes."""
    mesh = jax.sharding.get_abstract_mesh()
    names = tuple(getattr(mesh, "axis_names", ()) or ())
    spec = tuple(
        a if (a in names and mesh.shape[a] > 1) else None for a in axes
    )
    if not any(s is not None for s in spec):
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


def object_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the 'object' mesh axis."""
    return NamedSharding(mesh, P("object"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _shard_leading(mesh: Mesh, tree):
    s = object_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def _replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_scene(mesh: Mesh, state, fg_tables: dict, store=None):
    """Place a TrainState + fg keyframe tables onto the mesh: every stacked
    [O, ...] leaf sharded over 'object', bg model replicated. Returns
    (state, fg_tables[, store replicated])."""
    from openobj_tpu.core import optim, trainer

    n_shards = mesh.shape["object"]
    if state.n_slots % n_shards:
        raise ValueError(
            f"object slots ({state.n_slots}) must divide the 'object' mesh "
            f"axis ({n_shards}); grow the bucket first"
        )
    new_state = trainer.TrainState(
        fg_params=_shard_leading(mesh, state.fg_params),
        fg_opt=optim.AdamWState(
            mu=_shard_leading(mesh, state.fg_opt.mu),
            nu=_shard_leading(mesh, state.fg_opt.nu),
            count=jax.device_put(state.fg_opt.count, object_sharding(mesh)),
        ),
        bg_params=(
            _replicate(mesh, state.bg_params)
            if state.bg_params is not None else None
        ),
        bg_opt=(
            optim.AdamWState(
                mu=_replicate(mesh, state.bg_opt.mu),
                nu=_replicate(mesh, state.bg_opt.nu),
                count=jax.device_put(state.bg_opt.count, replicated(mesh)),
            )
            if state.bg_opt is not None else None
        ),
    )
    tables = {
        k: jax.device_put(v, object_sharding(mesh)) for k, v in fg_tables.items()
    }
    out = (new_state, tables)
    if store is not None:
        out = out + (jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), store),)
    return out
