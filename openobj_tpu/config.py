"""Configuration: JSON scene configs with the reference schema.

Reads the exact per-scene JSON layout the reference ships
(/root/reference/objnerf/configs/Replica/room_0.json, parsed by cfg.py:8-114)
and lowers it into the framework's typed pieces: a ``trainer.TrainConfig``
(static jit config), a ``scene.Camera``, and dataset/runtime knobs.

Derived quantities parity (reference cfg.py):
  * H/W shrink by 2*margin (cfg.py:39-40); cx/cy shift by margin;
  * keyframe steps divide by the frame stride (cfg.py:83-84);
  * n_samples_per_frame = n_per_optim // win_size (cfg.py:78-81);
  * depth_scale = 1/scale (cfg.py:31).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from openobj_tpu.core.scene import Camera
from openobj_tpu.core.trainer import TrainConfig


@dataclass
class SceneConfig:
    train: TrainConfig
    camera: Camera
    dataset_format: str = "Replica"
    dataset_dir: str = ""
    start: int = 0
    stride: int = 10
    depth_scale: float = 1e-3
    max_depth: float = 8.0
    min_depth: float = 0.0
    max_n_models: int = 100
    # bbox min-side filter in PIXELS (reference dataset.py:147 hardcodes
    # 10 at Replica's 1200-px width; at miniature resolutions the same
    # absolute threshold silently drops every real small object — the
    # full-system matrix sets ~10 * width/1200)
    min_bbox_side: int = 10
    imap_mode: bool = False
    keyframe_buffer_size: int = 20
    keyframe_step: float = 25
    keyframe_step_bg: float = 50
    bg_ids: tuple = (0, 2, 3)
    grid_dim: int = 128
    live_voxel_size: float = 0.005
    n_bins_fine_vis: int = 10
    eps_fine_vis: float = 0.1
    save_mesh: bool = True
    save_pcd: bool = False
    # 8-coefficient distortion [k1, k2, p1, p2, k3, k4, k5, k6] or None
    # (reference cfg.py:52-65)
    distortion: tuple | None = None
    # apply undistortion remap in the loaders. The reference parses the
    # coefficients but never applies Undistort in its loaders (cfg.py:52-65;
    # ScanNet images are typically rectified offline), so this is an
    # explicit opt-in ("dataset": {"undistort": 1}), default off.
    undistort: bool = False
    # crop margins (camera intrinsics are stored margin-cropped; the raw
    # image undistortion maps need them back)
    margin_h: int = 0
    margin_w: int = 0
    raw: dict = field(default_factory=dict)


def load_scene_config(path: str) -> SceneConfig:
    with open(path) as f:
        c = json.load(f)

    cam_c = c["camera"]
    mh, mw = cam_c.get("mh", 0), cam_c.get("mw", 0)
    h = cam_c["h"] - 2 * mh
    w = cam_c["w"] - 2 * mw
    if "fx" in cam_c:
        fx, fy, cx, cy = cam_c["fx"], cam_c["fy"], cam_c["cx"], cam_c["cy"]
    else:
        # ScanNet: intrinsics live in the scan directory
        # (reference cfg.py:46-51, intrinsic/intrinsic_depth.txt 4x4)
        import numpy as np

        k = np.loadtxt(os.path.join(
            c["dataset"]["path"], "intrinsic", "intrinsic_depth.txt"
        ))
        fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    camera = Camera(
        width=w, height=h, fx=fx, fy=fy, cx=cx - mw, cy=cy - mh,
    )
    if "distortion" in cam_c:
        distortion = tuple(cam_c["distortion"])
    elif "k1" in cam_c:
        # missing higher-order coefficients default to 0 (4/5/8-length
        # vectors are all valid OpenCV models)
        distortion = tuple(
            cam_c.get(k, 0.0)
            for k in ("k1", "k2", "p1", "p2", "k3", "k4", "k5", "k6")
        )
    else:
        distortion = None

    tr, md, rd, opt = c["trainer"], c["model"], c["render"], c["optimizer"]["args"]
    stride = tr.get("stride", 1)
    part_mode = bool(tr.get("part_mode", 0))

    train = TrainConfig(
        n_iters_per_frame=rd["iters_per_frame"],
        win_size=md["window_size"],
        n_samples_per_frame=rd["n_per_optim"] // md["window_size"],
        win_size_bg=md["window_size_bg"],
        n_samples_per_frame_bg=rd["n_per_optim_bg"] // md["window_size_bg"],
        n_bins_cam2surface=rd["n_bins_cam2surface"],
        n_bins_cam2surface_bg=rd["n_bins_cam2surface_bg"],
        n_bins=rd["n_bins"],
        surface_eps=md["surface_eps"],
        stop_eps=md["other_eps"],
        min_depth=rd["depth_range"][0],
        learning_rate=opt["lr"],
        weight_decay=opt["weight_decay"],
        color_scaling=md.get("color_scaling", 5.0),
        opacity_scaling=md.get("opacity_scaling", 10.0),
        part_mode=part_mode,
        part_down=tr.get("part_down", 5),
        hidden=md["hidden_feature_size"],
        hidden_bg=md["hidden_feature_size_bg"],
        clip_size=md["clip_point_feature_size"],
        max_deg=md["n_unidir_funcs"],
        obj_scale=md["obj_scale"],
        bg_scale=md["bg_scale"],
        do_bg=bool(tr.get("do_bg", 1)),
        # "bf16" switches the MLP ensemble matmuls AND the part-loss
        # C-wide GEMMs to bf16 operands with f32 masters/accumulation
        # (the gt side of the part GEMM is exact in bf16 — int8 values)
        compute_dtype=tr.get("compute_dtype", "f32"),
        # implementation knobs (trainer.TrainConfig docstrings for the
        # measured tradeoffs): "segmented" | "merged" | "merged_params"
        gemm_impl=tr.get("gemm_impl", "segmented"),
        field_impl=tr.get("field_impl", "xla"),
        optim_impl=tr.get("optim_impl", "tree"),
    )

    vis = c.get("vis", {})
    return SceneConfig(
        train=train,
        camera=camera,
        dataset_format=c["dataset"]["format"],
        dataset_dir=c["dataset"]["path"],
        start=tr.get("start", 0),
        stride=stride,
        depth_scale=1.0 / tr.get("scale", 1000.0),
        max_depth=rd["depth_range"][1],
        min_depth=rd["depth_range"][0],
        max_n_models=tr.get("n_models", 100),
        min_bbox_side=int(tr.get("min_bbox_side", 10)),
        imap_mode=bool(tr.get("imap_mode", 0)),
        keyframe_buffer_size=md["keyframe_buffer_size"],
        keyframe_step=md["keyframe_step"] / stride,
        keyframe_step_bg=md["keyframe_step_bg"] / stride,
        bg_ids=tuple(vis.get("bg_id", (0, 2, 3))),
        grid_dim=vis.get("grid_dim", 128),
        live_voxel_size=vis.get("live_voxel_size", 0.005),
        n_bins_fine_vis=vis.get("n_bins_fine_vis", 10),
        eps_fine_vis=vis.get("eps_fine_vis", 0.1),
        save_mesh=bool(vis.get("save_mesh", 1)),
        save_pcd=bool(vis.get("save_pcd", 0)),
        distortion=distortion,
        undistort=bool(c["dataset"].get("undistort", 0)),
        margin_h=mh,
        margin_w=mw,
        raw=c,
    )


def make_mapper(cfg: SceneConfig, frame_capacity: int | None = None, seed: int = 0):
    """Build a SceneMapper from a SceneConfig."""
    from openobj_tpu.core.scene import SceneMapper

    return SceneMapper(
        cfg.camera, cfg.train,
        frame_capacity=frame_capacity or 256,
        max_objects=cfg.max_n_models,
        keyframe_buffer_size=cfg.keyframe_buffer_size,
        keyframe_step=cfg.keyframe_step,
        keyframe_step_bg=cfg.keyframe_step_bg,
        seed=seed,
    )
