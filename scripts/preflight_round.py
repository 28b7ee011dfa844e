#!/usr/bin/env python
"""End-of-round artifact-hygiene checklist (round-4 postmortem: two bad
driver artifacts — a rc=124 multichip gate and a replay-corrupted bench
headline — shipped because nobody ran them once before the snapshot).

Runs, in order, and prints ONE PASS/FAIL table the builder must read
before the end-of-round commit:

  1. dryrun   — ``dryrun_multichip(8)`` exactly as the driver invokes it,
                timed against the driver-budget expectation; FAIL on
                nonzero rc or wall > --dryrun-budget.
  2. bench    — ``python bench.py`` once; FAIL on nonzero rc, a tripped
                top-level ``timing_suspect_dispatch_replay``, a null
                value, or a value outside the plausibility band
                [0.25x, 4x] of the documented budget number.
  3. quick    — ``pytest -m quick`` ; FAIL on nonzero rc or
                wall > --quick-budget.

Usage:  python scripts/preflight_round.py [--skip bench] [--skip dryrun]
        (each stage skippable when its substrate — TPU tunnel, time —
        is unavailable; a skip prints as SKIP, never as PASS)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_timed(cmd, timeout_s, env=None):
    t0 = time.monotonic()
    try:
        res = subprocess.run(
            cmd, cwd=REPO, env=env, timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        rc, out = res.returncode, res.stdout
    except subprocess.TimeoutExpired as e:
        rc = 124
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
    return rc, time.monotonic() - t0, out


def check_dryrun(budget_s):
    code = ("import __graft_entry__; __graft_entry__.dryrun_multichip(8)")
    # propagate the budget into the gate's own deadline ladder so the
    # child plans against the SAME number this check enforces
    env = dict(os.environ)
    env["OPENOBJ_DRYRUN_BUDGET_S"] = str(budget_s)
    rc, wall, out = run_timed([sys.executable, "-u", "-c", code],
                              timeout_s=budget_s + 120, env=env)
    checks = [ln for ln in out.splitlines()
              if ln.startswith("dryrun_multichip ")]
    ok = rc == 0 and wall <= budget_s and any(
        "OK [" in ln for ln in checks)
    detail = (f"rc={rc} wall={wall:.0f}s (budget {budget_s:.0f}s); "
              f"{sum('OK [' in ln for ln in checks)} OK / "
              f"{sum('SKIP [' in ln for ln in checks)} SKIP sub-checks")
    return ok, detail, out


def check_bench(budget_s):
    rc, wall, out = run_timed([sys.executable, "bench.py"],
                              timeout_s=budget_s)
    line = next((ln for ln in out.splitlines()
                 if ln.startswith("{") and '"metric"' in ln), None)
    if rc != 0 or line is None:
        return False, f"rc={rc} wall={wall:.0f}s; no JSON line", out
    try:
        j = json.loads(line)
    except ValueError:
        return False, "JSON line unparseable", out
    sys.path.insert(0, REPO)
    import bench

    budget = bench.DOCUMENTED_SEC_PER_FRAME
    val = j.get("value")
    suspect = j.get("timing_suspect_dispatch_replay", False)
    spf = (j.get("detail") or {}).get("sec_per_frame")
    ok = (val is not None and not suspect
          and spf is not None and budget / 4 <= spf <= budget * 4)
    detail = (f"rc={rc} value={val} method={j.get('method')} "
              f"sec_per_frame={spf} suspect={suspect}")
    return ok, detail, out


def check_quick(budget_s):
    rc, wall, out = run_timed(
        [sys.executable, "-m", "pytest", "-m", "quick", "-q",
         "--no-header", "-x"], timeout_s=budget_s + 60)
    tail = "\n".join(out.splitlines()[-3:])
    ok = rc == 0 and wall <= budget_s
    return ok, f"rc={rc} wall={wall:.0f}s (budget {budget_s:.0f}s); {tail}", out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", action="append", default=[],
                    choices=["dryrun", "bench", "quick"])
    ap.add_argument("--dryrun-budget", type=float, default=480.0)
    ap.add_argument("--bench-budget", type=float, default=1500.0)
    ap.add_argument("--quick-budget", type=float, default=420.0)
    # measured 272 s uncontended on this 1-core host; the margin
    # absorbs CPU contention from concurrent jobs
    ap.add_argument("--verbose", action="store_true",
                    help="echo each stage's full output")
    args = ap.parse_args()

    stages = [
        ("dryrun", lambda: check_dryrun(args.dryrun_budget)),
        ("bench", lambda: check_bench(args.bench_budget)),
        ("quick", lambda: check_quick(args.quick_budget)),
    ]
    rows, all_ok = [], True
    for name, fn in stages:
        if name in args.skip:
            rows.append((name, "SKIP", "skipped by flag"))
            continue
        print(f"preflight: running {name} ...", flush=True)
        ok, detail, out = fn()
        if args.verbose or not ok:
            print(out)
        rows.append((name, "PASS" if ok else "FAIL", detail))
        all_ok &= ok

    print("\n== preflight_round ==")
    for name, status, detail in rows:
        print(f"  {status:4} {name:8} {detail}")
    print(f"== {'ALL GREEN — safe to snapshot' if all_ok else 'NOT GREEN — fix before the end-of-round commit'} ==")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
