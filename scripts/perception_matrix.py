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


def run_archetype(name, h, w, n_frames, keep=None):
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
        assoc_stride=keyframe_skip(n_frames),
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
    args = ap.parse_args(argv)
    w, h = args.size

    rows = {}
    names = args.only or list(ARCHETYPES)
    for name in names:
        keep = os.path.join(args.keep, name) if args.keep else None
        try:
            s = run_archetype(name, h, w, args.frames, keep=keep)
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
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2, default=str)
    ok = [r for r in rows.values() if "inst_miou" in r]
    if ok:
        mean = float(np.mean([r["inst_miou"] for r in ok]))
        print(f"\nmatrix mean inst_mIoU over {len(ok)} archetypes: {mean:.3f}")
    return rows


if __name__ == "__main__":
    main()
