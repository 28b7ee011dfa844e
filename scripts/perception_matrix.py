#!/usr/bin/env python
"""Weights-free perception stress matrix over the synthetic archetypes.

For each archetype (data.synthetic.ARCHETYPES: easy control, textured,
touching, non-convex, tabletop, grazing walls): write a RAW rgb/depth/traj
scene (GT instance maps held aside where the stages can't see them), run
the full weights-free perception stack (segmenter -> captioner/encoders ->
projection -> similarity graph -> Louvain -> geo-bg anchoring -> merge),
and score the produced instance_our maps against the GT with
optimally-matched instance mIoU + background IoU.

    python scripts/perception_matrix.py [--size 96 72] [--frames 40]
                                        [--out matrix.json] [--only name...]

CPU-only (forces the CPU backend; perception is host-side anyway).
Results table goes to stdout + JSON; BASELINE.md records the tracked
numbers.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def run_archetype(name, h, w, n_frames, keep=None, noise=0.0):
    import cv2

    from openobj_tpu.config import SceneConfig
    from openobj_tpu.core.scene import Camera
    from openobj_tpu.core.trainer import TrainConfig
    from openobj_tpu.data import synthetic
    from openobj_tpu.eval import matched_instance_miou
    from openobj_tpu.ops import sampling
    from openobj_tpu.perception.auto import keyframe_skip, run_auto_perception

    fx = fy = 0.65 * w
    cx, cy = w / 2.0, h / 2.0
    dirs = np.asarray(sampling.camera_ray_dirs(w, h, fx, fy, cx, cy))
    scene, orbit = synthetic.archetype_scene(name)

    root = keep or tempfile.mkdtemp(prefix=f"percmat_{name}_")
    os.makedirs(root, exist_ok=True)
    gt_maps = synthetic.write_raw_scene(
        root, scene, dirs, n_frames=n_frames, orbit_kwargs=orbit,
        assoc_stride=keyframe_skip(n_frames), noise_level=noise,
    )

    cfg = SceneConfig(
        train=TrainConfig(part_mode=False),
        camera=Camera(width=w, height=h, fx=fx, fy=fy, cx=cx, cy=cy),
        dataset_format="Replica", dataset_dir=root,
    )
    run_auto_perception(cfg)

    pred_maps = []
    for i in range(len(gt_maps)):
        p = cv2.imread(
            os.path.join(root, "instance_our", f"semantic_instance_{i}.png"),
            cv2.IMREAD_UNCHANGED,
        )
        pred_maps.append(p.astype(np.int32))
    score = matched_instance_miou(pred_maps, gt_maps)
    score["root"] = root
    score["n_gt_instances"] = len(score["per_gt_iou"])
    return score


def _scene_config(root, w, h, fx, fy, cx, cy, iters, stride, n_models=16):
    """Train-CLI JSON config at the archetype camera (schema as the
    reference cfg.py consumes it; values from the fixture e2e test)."""
    return {
        "dataset": {"live": 0, "path": root, "format": "Replica",
                    "keep_alive": 20},
        "optimizer": {"args": {"lr": 0.001, "weight_decay": 0.013}},
        "trainer": {"part_mode": 0, "part_down": 5, "imap_mode": 0,
                    "start": 0, "stride": stride, "do_bg": 1,
                    "n_models": n_models, "scale": 1000.0,
                    # resolution-scaled bbox filter: the reference's
                    # absolute 10-px min side (dataset.py:147) assumes
                    # 1200-px frames; at the matrix's miniature W it
                    # silently drops every real small object (measured:
                    # the tabletop archetype trained only bg+table —
                    # three 7-px objects never got slots, rendered
                    # inst_mIoU 0.16 while association scored 0.99)
                    "min_bbox_side": max(2, round(10 * w / 1200))},
        "render": {"depth_range": [0.0, 8.0], "n_bins": 9,
                   "n_bins_cam2surface": 1, "n_bins_cam2surface_bg": 5,
                   "iters_per_frame": iters, "n_per_optim": 120,
                   "n_per_optim_bg": 240},
        "model": {"n_unidir_funcs": 5, "obj_scale": 2.0, "bg_scale": 5.0,
                  "color_scaling": 5.0, "opacity_scaling": 10.0,
                  "surface_eps": 0.1, "other_eps": 0.05,
                  "keyframe_buffer_size": 8, "keyframe_step": 25,
                  "keyframe_step_bg": 50, "window_size": 2,
                  "window_size_bg": 2, "hidden_feature_size": 32,
                  "hidden_feature_size_bg": 32,
                  "clip_point_feature_size": 8},
        "camera": {"w": w, "h": h, "fx": fx, "fy": fy, "cx": cx, "cy": cy,
                   "mw": 0, "mh": 0},
        "vis": {"if_vis": 0, "if_ckpt": 1, "if_render": 1, "if_obj": 1,
                "save_pcd": 0, "save_mesh": 1, "bg_id": [0, 2, 3],
                "n_vis_iter": 9999, "eps_fine_vis": 0.1,
                "n_bins_fine_vis": 10, "grid_dim": 32,
                "live_voxel_size": 0.02},
    }


def run_archetype_full(name, h, w, n_frames, assoc_score, iters=100,
                       stride=10):
    """Full-system scorecard: the association artifacts produced by
    run_archetype already sit in ``assoc_score['root']`` — train the
    fields on them (run_scenes: train -> export -> eval), then score the
    RENDERED instance maps against the held-aside GT (regenerated
    analytically at the rendered frame indices — the stages never saw
    it). Measures the whole system: segmentation -> association ->
    field training -> rendering."""
    import glob
    import re
    import subprocess

    import cv2

    from openobj_tpu.data import synthetic
    from openobj_tpu.eval import matched_instance_miou
    from openobj_tpu.ops import sampling

    root = assoc_score["root"]
    fx = fy = 0.65 * w
    cx, cy = w / 2.0, h / 2.0
    cfg_dir = os.path.join(root, "sys_configs")
    os.makedirs(cfg_dir, exist_ok=True)
    with open(os.path.join(cfg_dir, f"{name}.json"), "w") as f:
        json.dump(_scene_config(root, w, h, fx, fy, cx, cy, iters, stride),
                  f)
    out = os.path.join(root, "sys_runs")
    # train in a SUBPROCESS so it runs on the default backend (the real
    # TPU when tunneled) — this parent process force-pinned jax to CPU
    # for the host-side perception stages, and that choice is sticky
    # per-process
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "run_scenes.py"),
         cfg_dir, "--out", out, "--eval", "--n-classes", "32",
         "--perception", "auto"],
        env=env, check=True,
    )
    summary = json.load(open(os.path.join(out, "summary.json")))[name]
    if summary.get("status") != "ok":
        return {"error": summary.get("status", "failed")}

    render_dir = os.path.join(out, name, "render")
    frames = sorted(
        int(re.search(r"inst_(\d+)\.png$", p).group(1))
        for p in glob.glob(os.path.join(render_dir, "inst_*.png"))
    )
    scene, orbit = synthetic.archetype_scene(name)
    dirs = np.asarray(sampling.camera_ray_dirs(w, h, fx, fy, cx, cy))
    pred_maps, gt_maps = [], []
    for i in frames:
        p = cv2.imread(os.path.join(render_dir, f"inst_{i}.png"),
                       cv2.IMREAD_UNCHANGED)
        pred_maps.append(p.astype(np.int32))
        t_wc = synthetic.orbit_pose(2 * np.pi * i / n_frames, **orbit)
        _, _, inst = scene.render(t_wc, dirs)
        gt_maps.append(inst.astype(np.int32))
    score = matched_instance_miou(pred_maps, gt_maps)
    score["n_gt_instances"] = len(score["per_gt_iou"])
    score["psnr"] = summary["eval"].get("psnr")
    score["depth_l1"] = summary["eval"].get("depth_l1")
    score["frames_scored"] = frames
    return score


def main(argv=None):
    from openobj_tpu.data.synthetic import ARCHETYPES

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--size", nargs=2, type=int, default=(96, 72),
                    metavar=("W", "H"))
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--out", default=None, help="write JSON here")
    ap.add_argument("--keep", default=None,
                    help="keep scene dirs under this root (debugging)")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of archetypes")
    ap.add_argument("--full", action="store_true",
                    help="also train/render each archetype and score the "
                         "RENDERED instance maps + PSNR vs held-aside GT "
                         "(full-system scorecard)")
    ap.add_argument("--iters", type=int, default=100,
                    help="--full: optimizer steps per frame "
                         "(100 = reference budget)")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="sensor-noise level (synthetic.apply_sensor_noise;"
                         " 1.0 ~ a real Kinect, GT stays clean)")
    args = ap.parse_args(argv)
    w, h = args.size

    rows = {}
    names = args.only or list(ARCHETYPES)
    for name in names:
        keep = os.path.join(args.keep, name) if args.keep else None
        try:
            s = run_archetype(name, h, w, args.frames, keep=keep,
                              noise=args.noise)
        except Exception as e:  # noqa: BLE001 — matrix keeps going
            rows[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name:10s}  ERROR {rows[name]['error']}", flush=True)
            continue
        rows[name] = s
        print(
            f"{name:10s}  inst_mIoU {s['inst_miou']:.3f}   "
            f"bg_IoU {s['bg_iou']:.3f}   "
            f"gt {s['n_gt_instances']} / pred {s['n_pred_instances']} inst  "
            f"per-gt { {k: round(v, 2) for k, v in s['per_gt_iou'].items()} }",
            flush=True,
        )
        if args.full:
            try:
                fs = run_archetype_full(name, h, w, args.frames, s,
                                        iters=args.iters)
            except Exception as e:  # noqa: BLE001 — matrix keeps going
                fs = {"error": f"{type(e).__name__}: {e}"}
            s["full_system"] = fs
            if "error" in fs:
                print(f"{name:10s}  FULL ERROR {fs['error']}", flush=True)
            else:
                # eval fields may be None (summary['eval'] misses); render
                # them as n/a instead of raising outside the try/except
                def _fmt(v, spec):
                    return format(v, spec) if v is not None else "n/a"

                print(
                    f"{name:10s}  FULL rendered inst_mIoU "
                    f"{_fmt(fs.get('inst_miou'), '.3f')}   "
                    f"psnr {_fmt(fs.get('psnr'), '.1f')}   "
                    f"depth_l1 {_fmt(fs.get('depth_l1'), '.3f')}   per-gt "
                    f"{ {k: round(v, 2) for k, v in fs.get('per_gt_iou', {}).items()} }",
                    flush=True,
                )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2, default=str)
    ok = [r for r in rows.values() if "inst_miou" in r]
    if ok:
        mean = float(np.mean([r["inst_miou"] for r in ok]))
        print(f"\nmatrix mean inst_mIoU over {len(ok)} archetypes: {mean:.3f}")
    full_ok = [r["full_system"] for r in rows.values()
               if "inst_miou" in r.get("full_system", {})]
    if full_ok:
        fmean = float(np.mean([r["inst_miou"] for r in full_ok]))
        psnrs = [r["psnr"] for r in full_ok if r.get("psnr") is not None]
        ptxt = f"{float(np.mean(psnrs)):.1f} dB" if psnrs else "n/a"
        print(f"full-system mean rendered inst_mIoU {fmean:.3f}, "
              f"mean PSNR {ptxt} over {len(full_ok)} archetypes")
    return rows


if __name__ == "__main__":
    main()
