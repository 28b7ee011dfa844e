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
    """The bench.py workload (room_0 envelope, via bench.build_envelope —
    the same construction the headline number uses), returned as a step
    closure."""
    import bench
    from openobj_tpu.core import trainer

    state, store, cam_dirs, fg_tables, bg_tables, cfg = bench.build_envelope()

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
    listed_ms = 0.0
    shown = 0
    for nm, ms in rows:
        if shown >= top:
            break
        head = nm.split(" = ", 1)[0].lstrip("%")
        if head.startswith(("copy-start", "copy-done", "slice-start",
                            "slice-done", "while")):
            continue          # async DMA spans / scan shells — not compute
        print(f"{ms:10.2f} {counts[nm]:6d}  {nm[:140]}")
        listed_ms += ms
        shown += 1
    print(f"\nsum of listed: {listed_ms:.1f} ms; "
          f"all ops: {sum(totals.values()):.1f} ms")

    # category rollup: copy-start/-done are ASYNC DMAs that overlap compute
    # (they are NOT the critical path unless compute starves); 'while' is
    # the scan shell whose self-time nests everything. The compute rows
    # (fusion/convolution/dot/etc.) are what serialize the step.
    cats = defaultdict(float)
    catn = defaultdict(int)
    for nm, ms in rows:
        head = nm.split(" = ", 1)[0].lstrip("%")
        base = head.split(".")[0].rstrip("0123456789-")
        cats[base] += ms
        catn[base] += counts[nm]
    print("\nby category:")
    for base, ms in sorted(cats.items(), key=lambda kv: -kv[1])[:16]:
        print(f"{ms:10.2f} {catn[base]:6d}  {base}")


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
