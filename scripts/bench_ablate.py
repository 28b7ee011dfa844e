#!/usr/bin/env python
"""Ablation/knob timing on the bench.py workload envelope (one TPU chip).

    python scripts/bench_ablate.py                  # standard ablation rows
    python scripts/bench_ablate.py z_per_step=True scan_unroll=8 ...
                                                    # one row per KEY=VAL set

Each row re-times the jitted per-frame training program (bench.py's scan
protocol: 1 warmup frame, 4 pipelined timed frames) with TrainConfig
overrides applied, printing one JSON line {label, sec_per_frame}. Values
are eval()ed, so booleans/ints/strings work. Run from the repo root (the
axon plugin needs sys.path[0] = /root/repo).
"""
import os
import sys
import time, json
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench

def timed(cfg_kwargs, label):
    import jax
    from openobj_tpu.core import trainer
    from openobj_tpu.core.frame_store import append_frame, init_frame_store
    from openobj_tpu.core.scene import Camera
    cfg = trainer.TrainConfig(**cfg_kwargs)
    H, W = bench.H, bench.W
    cam = Camera(width=W, height=H, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    key = jax.random.PRNGKey(0)
    state = trainer.init_train_state(key, cfg, n_slots=bench.N_SLOTS)
    store = init_frame_store(bench.N_FRAMES_STORE, H, W,
        part_feat_dim=cfg.clip_size if cfg.part_mode else 0, part_down=cfg.part_down)
    rng = np.random.default_rng(0)
    inst_full = rng.integers(-1, bench.N_ACTIVE_OBJECTS, (H, W)).astype(np.int32)
    for f in range(bench.N_FRAMES_STORE):
        pose = np.eye(4, dtype=np.float32); pose[:3, 3] = [0.1*f, 0, 0]
        pf = (rng.normal(size=(H//cfg.part_down, W//cfg.part_down, cfg.clip_size)).astype(np.float32)
              if cfg.part_mode else None)
        store, _ = append_frame(store, rng.integers(0,255,(H,W,3)).astype(np.uint8),
            rng.uniform(0.5,6.0,(H,W)).astype(np.float32), inst_full, pose, partfeat=pf)
    K = bench.N_FRAMES_STORE
    import jax.numpy as jnp
    active = np.zeros(bench.N_SLOTS, bool); active[:bench.N_ACTIVE_OBJECTS] = True
    bbox = np.tile(np.asarray([0,H,0,W],np.float32),(bench.N_SLOTS,K,1))
    bbox[:,:,0] = rng.integers(0,H//2,(bench.N_SLOTS,K)); bbox[:,:,1] = bbox[:,:,0]+H//5
    bbox[:,:,2] = rng.integers(0,W//2,(bench.N_SLOTS,K)); bbox[:,:,3] = bbox[:,:,2]+W//5
    fg_tables = {"kf_frames": jnp.asarray(rng.integers(0,K,(bench.N_SLOTS,K)),jnp.int32),
        "kf_bbox": jnp.asarray(bbox), "n_kf": jnp.full((bench.N_SLOTS,),K-1,jnp.int32),
        "latest2": jnp.tile(jnp.asarray([K-3,K-2],jnp.int32),(bench.N_SLOTS,1)),
        "active": jnp.asarray(active), "obj_inst": jnp.arange(bench.N_SLOTS,dtype=jnp.int32),
        "obj_center": jnp.zeros((bench.N_SLOTS,3),jnp.float32)}
    bg_tables = {"kf_frames": fg_tables["kf_frames"][0],
        "kf_bbox": jnp.tile(jnp.asarray([0,H,0,W],jnp.float32),(K,1)),
        "n_kf": jnp.asarray(K-1,jnp.int32), "latest2": fg_tables["latest2"][0]}
    cam_dirs = cam.ray_dirs()
    st, losses = trainer.train_frame(state, store, cam_dirs, fg_tables, bg_tables, jax.random.PRNGKey(1), cfg)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for i in range(4):
        st, losses = trainer.train_frame(st, store, cam_dirs, fg_tables, bg_tables, jax.random.PRNGKey(2+i), cfg)
    jax.block_until_ready(losses)
    spf = (time.perf_counter()-t0)/4
    print(json.dumps({"label": label, "sec_per_frame": round(spf,4)}), flush=True)



if __name__ == "__main__":
    args = sys.argv[1:]
    if args:
        kw = {}
        for a in args:
            k, v = a.split("=", 1)
            kw[k] = eval(v)  # noqa: S307 — operator-supplied CLI
        timed(dict(part_mode=True, **kw), " ".join(args))
    else:
        timed(dict(part_mode=True), "full (part+bg)")
        timed(dict(part_mode=False), "no part loss")
        timed(dict(part_mode=True, do_bg=False), "no bg model")
        timed(dict(part_mode=False, do_bg=False), "fg only, no part")
