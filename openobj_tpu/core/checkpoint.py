"""Per-object checkpoints + full training-state snapshots.

The reference saves one .pth per object holding the MLP+PE state dicts,
obj_id, the serialized oriented bbox, obj_scale, the stacked CLIP/caption
observation features, and the semantic id
(/root/reference/objnerf/vmap.py:556-602); the export/vis consumers
(gen_map_vis.py:86-90) read those back. We keep that contract on .npz
(flat key/value arrays — no pickled code), one file per object:
``obj_<id>.npz``.

Beyond parity, ``save_scene`` / ``load_scene`` snapshot the WHOLE mapper
(stacked params + optimizer + keyframe tables) so training can actually
resume — the reference cannot (SURVEY.md §5: no optimizer state saved).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree, prefix: str):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = prefix + "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _unflatten(files: dict, prefix: str, template):
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = prefix + "/".join(str(getattr(p, "key", p)) for p in path)
        leaves.append(jnp.asarray(files[key], dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_object_checkpoint(
    path: str,
    obj_id: int,
    params: dict,
    obj_scale: float,
    bbox3d=None,            # utils.geometry.OrientedBox | None
    obj_center=None,
    clip_feats: np.ndarray | None = None,
    caption_feats: np.ndarray | None = None,
    semantic_id: int | None = None,
):
    """One object's field + metadata (reference save_checkpoints contract,
    vmap.py:556-576)."""
    data = _flatten(params, "params/")
    data["obj_id"] = np.asarray(obj_id, np.int32)
    data["obj_scale"] = np.asarray(obj_scale, np.float32)
    data["obj_center"] = np.asarray(
        obj_center if obj_center is not None else np.zeros(3), np.float32
    )
    if bbox3d is not None:
        data["bbox_center"] = np.asarray(bbox3d.center, np.float32)
        data["bbox_r"] = np.asarray(bbox3d.r, np.float32)
        data["bbox_extent"] = np.asarray(bbox3d.extent, np.float32)
    if clip_feats is not None:
        data["clip_feats"] = np.asarray(clip_feats, np.float32)
    if caption_feats is not None:
        data["caption_feats"] = np.asarray(caption_feats, np.float32)
    if semantic_id is not None:
        data["semantic_id"] = np.asarray(semantic_id, np.int32)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **data)


def load_object_checkpoint(path: str, params_template: dict) -> dict:
    """Returns {obj_id, params, obj_scale, obj_center, bbox (OrientedBox |
    None), clip_feats, caption_feats, semantic_id}."""
    from openobj_tpu.utils.geometry import OrientedBox

    z = np.load(path)
    out = {
        "obj_id": int(z["obj_id"]),
        "obj_scale": float(z["obj_scale"]),
        "obj_center": z["obj_center"],
        "params": _unflatten(z, "params/", params_template),
        "bbox": None,
        "clip_feats": z["clip_feats"] if "clip_feats" in z else None,
        "caption_feats": z["caption_feats"] if "caption_feats" in z else None,
        "semantic_id": int(z["semantic_id"]) if "semantic_id" in z else None,
    }
    if "bbox_center" in z:
        out["bbox"] = OrientedBox(
            center=z["bbox_center"].astype(np.float64),
            r=z["bbox_r"].astype(np.float64),
            extent=z["bbox_extent"].astype(np.float64),
        )
    return out


def _device_state_tree(st) -> dict:
    """The mapper's device state as one raw pytree (orbax-friendly)."""
    tree = {
        "fg_params": st.fg_params,
        "fg_mu": st.fg_opt.mu,
        "fg_nu": st.fg_opt.nu,
        "fg_count": st.fg_opt.count,
    }
    if st.bg_params is not None:
        tree.update(
            bg_params=st.bg_params, bg_mu=st.bg_opt.mu, bg_nu=st.bg_opt.nu,
            bg_count=st.bg_opt.count,
        )
    return tree


def _registry_meta(mapper) -> dict:
    """Host-side registry/bookkeeping arrays (shared by both snapshot
    formats)."""
    r = mapper.registry
    return {
        "kf_frames": r.kf_frames,
        "kf_bbox": r.kf_bbox,
        "n_kf": r.n_kf,
        "latest2": r.latest2,
        "active": r.active,
        "obj_inst": r.obj_inst,
        "slot_inst_ids": np.asarray(
            [r.slots[s].inst_id for s in sorted(r.slots)], np.int64
        ),
        "frame_count": np.asarray(mapper.frame_count, np.int64),
        # temporal frame -> store slot (eviction recycles slots; replaying
        # appends at these slots reproduces the final store exactly)
        "frame_slots": np.asarray(mapper.frame_slots, np.int64),
        # store capacity the run was trained with: restore rebuilds a
        # too-small store to this size so resume never depends on the new
        # process passing the same --frame-capacity
        "frame_capacity": np.asarray(mapper.store.capacity, np.int64),
        "bg_seen": np.asarray(int(r.bg_seen), np.int64),
        "bg_kf_frames": r.bg_kf_frames,
        "bg_kf_bbox": r.bg_kf_bbox,
        "bg_latest2": r.bg_latest2,
        "bg_n_kf": np.asarray(r.bg.n_kf if r.bg else 0, np.int64),
    }


def save_scene(dirpath: str, mapper) -> None:
    """Full resumable snapshot of a SceneMapper's device + host state."""
    os.makedirs(dirpath, exist_ok=True)
    st = mapper.state
    data = {}
    data.update(_flatten(st.fg_params, "fg_params/"))
    data.update(_flatten(st.fg_opt.mu, "fg_mu/"))
    data.update(_flatten(st.fg_opt.nu, "fg_nu/"))
    data["fg_count"] = np.asarray(st.fg_opt.count)
    if st.bg_params is not None:
        data.update(_flatten(st.bg_params, "bg_params/"))
        data.update(_flatten(st.bg_opt.mu, "bg_mu/"))
        data.update(_flatten(st.bg_opt.nu, "bg_nu/"))
        data["bg_count"] = np.asarray(st.bg_opt.count)
    data.update(_registry_meta(mapper))
    np.savez_compressed(os.path.join(dirpath, "scene_state.npz"), **data)


def load_scene(dirpath: str, mapper) -> None:
    """Restore a save_scene snapshot into a freshly-constructed mapper with
    the same config (device state + keyframe tables; per-slot host policy
    counters resume approximately: frame counts restart)."""
    from openobj_tpu.core import optim, trainer

    z = np.load(os.path.join(dirpath, "scene_state.npz"))
    n_slots = z["fg_count"].shape[0]
    if mapper.state.n_slots > n_slots:
        raise ValueError(
            f"snapshot has {n_slots} object slots but the mapper already "
            f"has {mapper.state.n_slots}; construct the mapper with "
            f"initial_bucket <= {n_slots} before restoring"
        )
    if mapper.state.n_slots != n_slots:
        mapper.state = trainer.grow_train_state(
            jax.random.PRNGKey(0), mapper.state, mapper.cfg, n_slots
        )
    st = mapper.state
    fg_params = _unflatten(z, "fg_params/", st.fg_params)
    fg_opt = optim.AdamWState(
        mu=_unflatten(z, "fg_mu/", st.fg_opt.mu),
        nu=_unflatten(z, "fg_nu/", st.fg_opt.nu),
        count=jnp.asarray(z["fg_count"]),
    )
    bg_params, bg_opt = st.bg_params, st.bg_opt
    if (st.bg_params is not None) != ("bg_count" in z):
        # same contract as load_scene_sharded: continuing with randomly
        # initialized bg params as if they were trained state is a silent
        # corruption, not a recoverable mismatch
        raise ValueError(
            "snapshot/mapper background mismatch: "
            f"mapper do_bg={st.bg_params is not None}, "
            f"snapshot has bg={'bg_count' in z}"
        )
    if st.bg_params is not None and "bg_count" in z:
        bg_params = _unflatten(z, "bg_params/", st.bg_params)
        bg_opt = optim.AdamWState(
            mu=_unflatten(z, "bg_mu/", st.bg_opt.mu),
            nu=_unflatten(z, "bg_nu/", st.bg_opt.nu),
            count=jnp.asarray(z["bg_count"]),
        )
    mapper.state = trainer.TrainState(fg_params, fg_opt, bg_params, bg_opt)
    _restore_registry_meta(mapper, z)


def _restore_registry_meta(mapper, z) -> None:
    from openobj_tpu.core.registry import SlotState

    r = mapper.registry
    r.kf_frames[:] = z["kf_frames"]
    r.kf_bbox[:] = z["kf_bbox"]
    r.n_kf[:] = z["n_kf"]
    r.latest2[:] = z["latest2"]
    r.active[:] = z["active"]
    r.obj_inst[:] = z["obj_inst"]
    for slot, inst_id in enumerate(z["slot_inst_ids"]):
        inst_id = int(inst_id)
        stt = SlotState(inst_id, is_bg=False)
        stt.n_kf = int(r.n_kf[slot])
        stt.latest = [int(x) for x in r.latest2[slot]]
        r.slots[slot] = stt
        r.inst_to_slot[inst_id] = slot
    if "frame_count" in z:
        mapper.frame_count = int(z["frame_count"])
        for slot, stt in r.slots.items():
            stt.frame_cnt = mapper.frame_count  # approximate policy resume
    if "frame_slots" in z:
        mapper.frame_slots = [int(x) for x in z["frame_slots"]]
    if "frame_capacity" in z:
        snap_cap = int(z["frame_capacity"])
        if mapper.store.capacity < snap_cap:
            # the keyframe tables index store slots up to the ORIGINAL
            # capacity; rebuild the (still-empty) store at that size rather
            # than failing mid-replay when the new process was constructed
            # with a smaller --frame-capacity
            from openobj_tpu.core.frame_store import init_frame_store

            cfg = mapper.cfg
            mapper.store = init_frame_store(
                snap_cap, mapper.camera.height, mapper.camera.width,
                part_feat_dim=cfg.clip_size if cfg.part_mode else 0,
                part_down=cfg.part_down,
                part_dtype=cfg.part_dtype,
            )
    if "bg_seen" in z and r.bg is not None:
        r.bg_seen = bool(int(z["bg_seen"]))
        r.bg_kf_frames[:] = z["bg_kf_frames"]
        r.bg_kf_bbox[:] = z["bg_kf_bbox"]
        r.bg_latest2[:] = z["bg_latest2"]
        r.bg.n_kf = int(z["bg_n_kf"])
        r.bg.latest = [int(x) for x in r.bg_latest2]
        r.bg.frame_cnt = mapper.frame_count


# --------------------------------------------------------------------------- #
# orbax sharded snapshots (multi-chip)
# --------------------------------------------------------------------------- #


def save_state_sharded(path: str, state) -> None:
    """TrainState -> orbax directory WITHOUT a host gather: each shard
    streams its own slice (correct and efficient when the state is sharded
    over a mesh via parallel.sharding.shard_scene, multi-host-safe under
    jax.distributed). The state-level core of save_scene_sharded; also the
    driver multi-chip gate's checkpoint sub-check (__graft_entry__)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _device_state_tree(state), force=True)
    ckptr.wait_until_finished()


def load_state_sharded(path: str, state_template):
    """Restore a save_state_sharded snapshot DIRECTLY INTO the template's
    placement: each leaf lands with the template's shape/dtype/sharding, so
    shards stream to their owning devices without a host round trip.
    Returns a new TrainState (bg taken from the template when the snapshot
    has none)."""
    import orbax.checkpoint as ocp

    from openobj_tpu.core import optim, trainer

    template = _device_state_tree(state_template)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        template,
    )
    ckptr = ocp.StandardCheckpointer()
    t = ckptr.restore(os.path.abspath(path), abstract)
    bg = "bg_params" in t
    return trainer.TrainState(
        fg_params=t["fg_params"],
        fg_opt=optim.AdamWState(t["fg_mu"], t["fg_nu"], t["fg_count"]),
        bg_params=t["bg_params"] if bg else state_template.bg_params,
        bg_opt=optim.AdamWState(t["bg_mu"], t["bg_nu"], t["bg_count"])
        if bg else state_template.bg_opt,
    )


def save_scene_sharded(dirpath: str, mapper) -> None:
    """Scene snapshot via orbax: the device state is written WITHOUT a host
    gather (save_state_sharded), host registry metadata as a small npz next
    to it. Counterpart of save_scene for scale-out runs."""
    dirpath = os.path.abspath(dirpath)
    os.makedirs(dirpath, exist_ok=True)
    save_state_sharded(os.path.join(dirpath, "orbax_state"), mapper.state)
    if jax.process_index() == 0:  # one writer for the host metadata
        np.savez_compressed(
            os.path.join(dirpath, "scene_meta.npz"),
            n_slots=np.asarray(mapper.state.n_slots, np.int64),
            has_bg=np.asarray(int(mapper.state.bg_params is not None),
                              np.int64),
            **_registry_meta(mapper),
        )


def load_scene_sharded(dirpath: str, mapper) -> None:
    """Restore a save_scene_sharded snapshot DIRECTLY INTO the mapper's
    current placement: construct the mapper (and shard_scene it onto a mesh
    first if desired) — each leaf is restored with the shape/dtype/sharding
    of the mapper's existing state, so shards land on their owning devices
    without a host round trip."""
    from openobj_tpu.core import trainer

    dirpath = os.path.abspath(dirpath)
    z = np.load(os.path.join(dirpath, "scene_meta.npz"))
    n_slots = int(z["n_slots"])
    if mapper.state.n_slots > n_slots:
        raise ValueError(
            f"snapshot has {n_slots} object slots but the mapper already "
            f"has {mapper.state.n_slots}; construct the mapper with "
            f"initial_bucket <= {n_slots} before restoring"
        )
    snap_bg = bool(int(z["has_bg"])) if "has_bg" in z else True
    if snap_bg != (mapper.state.bg_params is not None):
        raise ValueError(
            "snapshot and mapper disagree on the background model "
            f"(snapshot has_bg={snap_bg}); construct the mapper with the "
            "same do_bg config"
        )
    if mapper.state.n_slots != n_slots:
        mapper.state = trainer.grow_train_state(
            jax.random.PRNGKey(0), mapper.state, mapper.cfg, n_slots
        )
    mapper.state = load_state_sharded(
        os.path.join(dirpath, "orbax_state"), mapper.state
    )
    _restore_registry_meta(mapper, z)
