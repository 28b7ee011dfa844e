#!/usr/bin/env python
"""Ablation/knob timing on the bench.py workload envelope (one TPU chip).

    python scripts/bench_ablate.py                  # standard ablation rows
    python scripts/bench_ablate.py z_per_step=True scan_unroll=8 ...
                                                    # one row per KEY=VAL set
    python scripts/bench_ablate.py slots=128 active=100
                                                    # the reference's 100-model
                                                    # cap (train.py:231)

Each row re-times the jitted per-frame training program under bench.py's
protocol (1 warmup/compile frame, then bench.N_TIMED_FRAMES frames timed
per-frame SYNCHRONOUSLY — losses fetched to host each frame, same
replay-proofing as the headline) with TrainConfig overrides applied,
printing one JSON line {label, sec_per_frame, rays_per_frame, suspect}.
``slots=``/``active=`` route to build_envelope's slot parameters instead
of TrainConfig. Values are eval()ed, so booleans/ints/strings work. Run
from the repo root (the axon plugin needs sys.path[0] = /root/repo). The
workload itself comes from bench.build_envelope — the SAME construction
the headline number uses.
"""
import os
import sys
import time, json

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench


def timed(cfg_kwargs, label, n_slots=None, n_active=None):
    import jax
    import numpy as np
    from openobj_tpu.core import trainer

    cfg = trainer.TrainConfig(**cfg_kwargs)
    state, store, cam_dirs, fg_tables, bg_tables, cfg = bench.build_envelope(
        cfg, n_slots=n_slots, n_active=n_active)
    seed = int.from_bytes(os.urandom(4), "little")
    st, losses = trainer.train_frame(
        state, store, cam_dirs, fg_tables, bg_tables,
        jax.random.PRNGKey(seed), cfg
    )
    jax.block_until_ready(losses)
    times = []
    for i in range(bench.N_TIMED_FRAMES):
        t0 = time.perf_counter()
        st, losses = trainer.train_frame(
            st, store, cam_dirs, fg_tables, bg_tables,
            jax.random.PRNGKey(seed ^ (2 + i)), cfg,
        )
        np.asarray(jax.block_until_ready(losses))
        times.append(time.perf_counter() - t0)
    spf = float(np.median(times))
    n_act = bench.N_ACTIVE_OBJECTS if n_active is None else n_active
    rays = cfg.n_iters_per_frame * (
        n_act * cfg.n_rays_per_step + cfg.n_rays_per_step_bg)
    print(json.dumps({
        "label": label, "sec_per_frame": round(spf, 4),
        "rays_per_frame": rays,
        "rays_per_sec": round(rays / spf, 1),
        # scaled plausibility floor: rows with more active objects do
        # proportionally more work
        "suspect": spf < bench.SUSPECT_SEC_PER_FRAME
        * (n_act / bench.N_ACTIVE_OBJECTS),
    }), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    if args:
        kw = {"part_mode": True}
        n_slots = n_active = None
        for a in args:
            k, v = a.split("=", 1)
            if k == "slots":
                n_slots = int(v)
            elif k == "active":
                n_active = int(v)
            else:
                kw[k] = eval(v)  # noqa: S307 — operator-supplied CLI
        timed(kw, " ".join(args), n_slots=n_slots, n_active=n_active)
    else:
        timed(dict(part_mode=True), "full (part+bg)")
        timed(dict(part_mode=False), "no part loss")
        timed(dict(part_mode=True, do_bg=False), "no bg model")
        timed(dict(part_mode=False, do_bg=False), "fg only, no part")
