#!/usr/bin/env python
"""Profile the per-frame training program on the dev TPU and print the top
device ops by self time (docs/PERFORMANCE.md methodology: xplane op times,
not wall-clock deltas — the tunnel's ±10% variance swallows small effects).

    python scripts/profile_train.py [--frames 2] [--top 40]

Parses the raw .xplane.pb with the tensorflow.tsl proto under the
pure-python protobuf impl (the tensorboard_plugin_profile converter is
incompatible with the installed TF).
"""

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def setup():
    """The bench.py workload (room_0 envelope), returned as a step closure."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import bench
    from openobj_tpu.core import trainer
    from openobj_tpu.core.frame_store import append_frame, init_frame_store
    from openobj_tpu.core.scene import Camera

    cfg = trainer.TrainConfig(part_mode=True)
    H, W = bench.H, bench.W
    cam = Camera(width=W, height=H, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    key = jax.random.PRNGKey(0)
    state = trainer.init_train_state(key, cfg, n_slots=bench.N_SLOTS)
    store = init_frame_store(
        bench.N_FRAMES_STORE, H, W, part_feat_dim=cfg.clip_size,
        part_down=cfg.part_down,
    )
    rng = np.random.default_rng(0)
    inst_full = rng.integers(-1, bench.N_ACTIVE_OBJECTS, (H, W)).astype(np.int32)
    for f in range(bench.N_FRAMES_STORE):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.1 * f, 0, 0]
        store, _ = append_frame(
            store, rng.integers(0, 255, (H, W, 3)).astype(np.uint8),
            rng.uniform(0.5, 6.0, (H, W)).astype(np.float32), inst_full, pose,
            partfeat=rng.normal(
                size=(H // cfg.part_down, W // cfg.part_down, cfg.clip_size)
            ).astype(np.float32),
        )
    K = bench.N_FRAMES_STORE
    active = np.zeros(bench.N_SLOTS, bool)
    active[: bench.N_ACTIVE_OBJECTS] = True
    bbox = np.tile(np.asarray([0, H, 0, W], np.float32), (bench.N_SLOTS, K, 1))
    bbox[:, :, 0] = rng.integers(0, H // 2, (bench.N_SLOTS, K))
    bbox[:, :, 1] = bbox[:, :, 0] + H // 5
    bbox[:, :, 2] = rng.integers(0, W // 2, (bench.N_SLOTS, K))
    bbox[:, :, 3] = bbox[:, :, 2] + W // 5
    fg_tables = {
        "kf_frames": jnp.asarray(
            rng.integers(0, K, (bench.N_SLOTS, K)), jnp.int32
        ),
        "kf_bbox": jnp.asarray(bbox),
        "n_kf": jnp.full((bench.N_SLOTS,), K - 1, jnp.int32),
        "latest2": jnp.tile(jnp.asarray([K - 3, K - 2], jnp.int32),
                            (bench.N_SLOTS, 1)),
        "active": jnp.asarray(active),
        "obj_inst": jnp.arange(bench.N_SLOTS, dtype=jnp.int32),
        "obj_center": jnp.zeros((bench.N_SLOTS, 3), jnp.float32),
    }
    bg_tables = {
        "kf_frames": fg_tables["kf_frames"][0],
        "kf_bbox": jnp.tile(jnp.asarray([0, H, 0, W], jnp.float32), (K, 1)),
        "n_kf": jnp.asarray(K - 1, jnp.int32),
        "latest2": fg_tables["latest2"][0],
    }
    cam_dirs = cam.ray_dirs()

    def run(st, k):
        return trainer.train_frame(
            st, store, cam_dirs, fg_tables, bg_tables, k, cfg
        )

    return run, state


def parse_xplane(logdir, top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.xplane.pb")
    )
    assert paths, f"no xplane under {logdir}"
    totals = defaultdict(float)
    counts = defaultdict(int)
    for path in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(path, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            ev_names = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                if "XLA Ops" not in line.name and "Ops" != line.name:
                    continue
                for ev in line.events:
                    nm = ev_names.get(ev.metadata_id, "?")
                    totals[nm] += ev.duration_ps / 1e9  # ms
                    counts[nm] += 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"{'total_ms':>10} {'n':>6}  op")
    for nm, ms in rows[:top]:
        print(f"{ms:10.2f} {counts[nm]:6d}  {nm[:110]}")
    print(f"\nsum of listed: {sum(ms for _, ms in rows[:top]):.1f} ms; "
          f"all ops: {sum(totals.values()):.1f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import jax

    run, state = setup()
    # compile + warm up outside the trace
    state, losses = run(state, jax.random.PRNGKey(1))
    jax.block_until_ready(losses)

    logdir = tempfile.mkdtemp(prefix="openobj_prof_")
    with jax.profiler.trace(logdir):
        for i in range(args.frames):
            state, losses = run(state, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(losses)
    print(f"trace in {logdir}\n")
    parse_xplane(logdir, args.top)
    if not args.keep:
        import shutil

        shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
