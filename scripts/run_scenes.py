#!/usr/bin/env python
"""Multi-scene pipeline driver: train -> checkpoints -> map bundle (-> eval)
for every scene config in a directory.

    python scripts/run_scenes.py configs/replica --data-root /data/replica \
        --out runs/ [--class-features class_feats.npz] [--max-frames N] \
        [--parallel N] [--scene-shard i:n]

Per scene: the train CLI (openobj_tpu.train), the checkpoint->bundle export
(openobj_tpu.viz.export), and — when --gt-rgb-name is given — the PSNR/mIoU
eval (openobj_tpu.eval). Writes runs/<scene>/summary.json per scene and a
combined runs/summary.json.

Scale-out (parallel.multislice):
  --parallel N      split the visible devices into N groups and train N
                    scenes concurrently (scene-per-group; remaining scenes
                    queue round-robin). Scenes are independent, so this is
                    the DCN-level parallelism axis.
  --scene-shard i:n for multi-host launches: this invocation takes every
                    n-th scene starting at i (combine with --parallel for
                    per-host device groups).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_perception(cfg_path: str, args) -> None:
    """Generate the training artifacts from raw posed RGB-D with the
    weights-free perception stages (perception.auto — the reference's
    pre-training programs, every pixel-count knob scaled from the scene's
    camera config)."""
    from openobj_tpu.config import load_scene_config
    from openobj_tpu.perception.auto import run_auto_perception

    run_auto_perception(load_scene_config(cfg_path))


def run_one_scene(cfg_path: str, scene: str, args) -> dict:
    from openobj_tpu import train as train_cli
    from openobj_tpu.viz import export as viz_export

    logdir = os.path.join(args.out, scene)
    os.makedirs(logdir, exist_ok=True)
    if args.data_root:
        cfg = json.load(open(cfg_path))
        cfg["dataset"]["path"] = os.path.join(args.data_root, scene)
        cfg_path = os.path.join(logdir, "config.json")
        json.dump(cfg, open(cfg_path, "w"), indent=2)
    print(f"=== {scene} ===")
    if args.perception != "off":
        jcfg = json.load(open(cfg_path))
        root = jcfg["dataset"]["path"]
        required = [
            os.path.join(root, "object_clipfeat.pkl"),
            os.path.join(root, "object_capfeat.pkl"),
            os.path.join(root, "instance_our"),
        ]
        if jcfg.get("trainer", {}).get("part_mode", 0):
            required.append(os.path.join(root, "partlevel"))
        have = all(os.path.exists(p) for p in required)
        if args.perception == "always" or not have:
            print(f"[{scene}] running perception stages "
                  f"({'forced' if have else 'artifacts missing'})")
            try:
                run_perception(cfg_path, args)
            except Exception as e:  # noqa: BLE001 — isolate per scene
                print(f"[{scene}] perception FAILED: "
                      f"{type(e).__name__}: {e}")
                return {"status": "perception_failed", "error": str(e)}
    cli = ["--config", cfg_path, "--logdir", logdir]
    if args.class_features:
        cli += ["--class-features", args.class_features]
    if args.max_frames:
        cli += ["--max-frames", str(args.max_frames)]
    try:
        train_cli.main(cli)
        entry = {"status": "ok"}
        if not args.skip_export:
            bundle = os.path.join(logdir, "map_vis.pkl.gz")
            out = viz_export.export_from_checkpoints(
                os.path.join(logdir, "ckpt"), bundle
            )
            entry["objects"] = len(out)
        timing = os.path.join(logdir, "timing.json")
        if os.path.exists(timing):
            entry["timing"] = json.load(open(timing))
        render_dir = os.path.join(logdir, "render")
        if args.eval and os.path.isdir(render_dir):
            from openobj_tpu.eval import evaluate_run

            root = json.load(open(cfg_path))["dataset"]["path"]
            # semantic GT: a REAL class-id GT dir if the dataset ships one
            # (class_our is NOT one — it carries global instance ids,
            # reference mask_graph.py:1240-1264); otherwise evaluate_run
            # derives class GT from instance_our + the run's own
            # render/mapping_class.json (same id space as maskid renders)
            gt_sem = os.path.join(root, "semantic_class")
            gt_inst = os.path.join(root, "instance_our")
            # assoc stride inferred from the artifacts (the auto
            # perception path scales it to short scenes; see
            # loaders.infer_assoc_stride)
            from openobj_tpu.data.loaders import infer_assoc_stride
            from openobj_tpu.perception.auto import count_raw_frames

            train_stride = (json.load(open(cfg_path))
                            .get("trainer", {}).get("stride", 1))
            sem_stride = infer_assoc_stride(
                gt_inst, count_raw_frames(root), train_stride=train_stride
            )
            entry["eval"] = {
                k: (round(float(v), 4) if np.isscalar(v) else v)
                for k, v in evaluate_run(
                    render_dir,
                    os.path.join(root, "rgb"),
                    os.path.join(root, "depth"),
                    gt_sem if os.path.isdir(gt_sem) else None,
                    args.n_classes,
                    sem_stride=sem_stride,
                    gt_inst_dir=gt_inst if os.path.isdir(gt_inst) else None,
                ).items()
            }
            print(f"{scene} eval: {entry['eval']}")
    except Exception as e:  # keep going across scenes
        entry = {"status": f"failed: {e}"}
        print(f"{scene} FAILED: {e}")
    json.dump(entry, open(os.path.join(logdir, "summary.json"), "w"),
              indent=2)
    return entry


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config_dir")
    ap.add_argument("--out", default="runs")
    ap.add_argument("--data-root", default=None,
                    help="override dataset.path root: <data-root>/<scene>")
    ap.add_argument("--class-features", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--skip-export", action="store_true")
    ap.add_argument("--perception", choices=("off", "auto", "always"),
                    default="off",
                    help="run the perception stages (maskgen/associate/"
                         "partfeat, weights-free defaults) before training: "
                         "'auto' = only when the association artifacts are "
                         "missing from the scene dir")
    ap.add_argument("--eval", action="store_true",
                    help="score renders vs the dataset's rgb/depth/"
                         "class_our/instance_our GT (PSNR, depth L1, "
                         "zero-shot mIoU, instance IoU)")
    ap.add_argument("--n-classes", type=int, default=102)
    ap.add_argument("--parallel", type=int, default=None,
                    help="train N scenes concurrently on N device groups")
    ap.add_argument("--scene-shard", default=None,
                    help='"i:n": this host takes every n-th scene from i')
    ap.add_argument("--distributed", default=None, metavar="HOST:PORT",
                    help="coordinator address: join a multi-process "
                         "jax.distributed runtime (scene shard defaults to "
                         "this process's i:n)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)

    if args.distributed:
        from openobj_tpu.parallel import distributed

        distributed.initialize(
            args.distributed, args.num_processes, args.process_id
        )
        if args.scene_shard is None:
            args.scene_shard = distributed.process_scene_shard()

    configs = sorted(glob.glob(os.path.join(args.config_dir, "*.json")))
    if not configs:
        raise FileNotFoundError(f"no configs in {args.config_dir}")
    if args.scene_shard:
        from openobj_tpu.parallel.multislice import shard_scene_list

        configs = shard_scene_list(configs, args.scene_shard)
        print(f"scene shard {args.scene_shard}: "
              f"{[os.path.basename(c) for c in configs]}")

    scenes = [os.path.splitext(os.path.basename(c))[0] for c in configs]
    summary = {}
    if args.parallel and args.parallel > 1:
        from openobj_tpu.parallel.multislice import device_groups, run_parallel

        groups = device_groups(args.parallel)
        print(f"{len(groups)} device groups: "
              f"{[[str(d) for d in g] for g in groups]}")
        tasks = [
            (scene, lambda devs, c=cfg_path, s=scene: run_one_scene(c, s, args))
            for cfg_path, scene in zip(configs, scenes)
        ]
        for r in run_parallel(tasks, groups=groups):
            summary[r.name] = (
                r.result if r.ok else {"status": f"failed: {r.error}"}
            )
    else:
        for cfg_path, scene in zip(configs, scenes):
            summary[scene] = run_one_scene(cfg_path, scene, args)
    json.dump(summary, open(os.path.join(args.out, "summary.json"), "w"),
              indent=2)
    print(json.dumps({k: v.get("status") for k, v in summary.items()}))


if __name__ == "__main__":
    main()
