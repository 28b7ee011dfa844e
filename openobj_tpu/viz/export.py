"""Map export: checkpoints -> per-object mesh + feature bundle.

Parity with /root/reference/visualization/gen_map_vis.py: load every
object's field, mesh it at grid 128 with vertex colors and vertex part
features (:113-124), L2-normalize the part features, and bundle
{clip_feat, caption_feat, class_id, mesh, color, part_feat} per object into
a gzipped pickle (map_vis.pkl.gz contract, :128-146) consumed by the query
layer."""

from __future__ import annotations

import gzip
import pickle

import numpy as np

from openobj_tpu.core import meshing


def export_object_entry(
    params: dict,
    obb,
    obj_center,
    clip_feat: np.ndarray | None,
    caption_feat: np.ndarray | None,
    class_id: int | None,
    grid_dim: int = 128,
    is_bg: bool = False,
    max_deg: int = 5,
) -> dict | None:
    mesh = meshing.mesh_object(
        params, obb, np.asarray(obj_center), grid_dim=grid_dim, is_bg=is_bg,
        with_color=True, with_part=True, max_deg=max_deg,
    )
    if mesh is None:
        return None
    pf = mesh.vertex_attrs["partfeat"]
    pf = pf / np.maximum(np.linalg.norm(pf, axis=-1, keepdims=True), 1e-12)
    return {
        "mesh": {"vertices": mesh.vertices, "faces": mesh.faces},
        "color": mesh.vertex_colors,
        "part_feat": pf.astype(np.float32),
        "clip_feat": clip_feat,
        "caption_feat": caption_feat,
        "class_id": class_id,
    }


def save_map_bundle(path: str, objects: dict[int, dict]):
    """Write map_vis bundle: {obj_id: entry} gzipped pickle."""
    with gzip.open(path, "wb") as f:
        pickle.dump(objects, f)


def load_map_bundle(path: str) -> dict[int, dict]:
    with gzip.open(path, "rb") as f:
        return pickle.load(f)


def export_scene_map(
    mapper,
    path: str,
    grid_dim: int = 128,
    live_voxel_size: float = 0.005,
) -> dict[int, dict]:
    """Mesh + bundle every mapped object of a SceneMapper (reference
    gen_map_vis.py:64-146 flow, with adaptive grid dim train.py:626)."""
    out: dict[int, dict] = {}
    for inst_id, slot in mapper.registry.inst_to_slot.items():
        st = mapper.registry.slots[slot]
        if st.bbox3d is None:
            continue
        dim = meshing.adaptive_grid_dim(st.bbox3d, live_voxel_size, grid_dim)
        clip = np.stack(st.clip_feats) if st.clip_feats else None
        cap = np.stack(st.caption_feats) if st.caption_feats else None
        entry = export_object_entry(
            mapper.slot_params(slot), st.bbox3d, st.obj_center,
            clip, cap, st.semantic_id, grid_dim=dim,
        )
        if entry is not None:
            out[inst_id] = entry
    if path:
        save_map_bundle(path, out)
    return out
