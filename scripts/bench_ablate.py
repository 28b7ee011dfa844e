#!/usr/bin/env python
"""Ablation/knob timing on the bench.py workload envelope (one TPU chip).

    python scripts/bench_ablate.py                  # standard ablation rows
    python scripts/bench_ablate.py z_per_step=True scan_unroll=8 ...
                                                    # one row per KEY=VAL set

Each row re-times the jitted per-frame training program under bench.py's
protocol (1 warmup/compile frame, then bench.N_TIMED_FRAMES pipelined
timed frames) with TrainConfig overrides applied, printing one JSON line
{label, sec_per_frame}. Values are eval()ed, so booleans/ints/strings
work. Run from the repo root (the axon plugin needs sys.path[0] =
/root/repo). The workload itself comes from bench.build_envelope — the
SAME construction the headline number uses.
"""
import os
import sys
import time, json

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench


def timed(cfg_kwargs, label):
    import jax
    from openobj_tpu.core import trainer

    cfg = trainer.TrainConfig(**cfg_kwargs)
    state, store, cam_dirs, fg_tables, bg_tables, cfg = bench.build_envelope(cfg)
    st, losses = trainer.train_frame(
        state, store, cam_dirs, fg_tables, bg_tables, jax.random.PRNGKey(1), cfg
    )
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for i in range(bench.N_TIMED_FRAMES):
        st, losses = trainer.train_frame(
            st, store, cam_dirs, fg_tables, bg_tables,
            jax.random.PRNGKey(2 + i), cfg,
        )
    jax.block_until_ready(losses)
    spf = (time.perf_counter() - t0) / bench.N_TIMED_FRAMES
    print(json.dumps({"label": label, "sec_per_frame": round(spf, 4)}),
          flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    if args:
        kw = {"part_mode": True}
        for a in args:
            k, v = a.split("=", 1)
            kw[k] = eval(v)  # noqa: S307 — operator-supplied CLI
        timed(kw, " ".join(args))
    else:
        timed(dict(part_mode=True), "full (part+bg)")
        timed(dict(part_mode=False), "no part loss")
        timed(dict(part_mode=True, do_bg=False), "no bg model")
        timed(dict(part_mode=False, do_bg=False), "fg only, no part")
