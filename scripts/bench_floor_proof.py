#!/usr/bin/env python
"""Measured floor proof for the remaining ~25-35% gap-to-floor
(docs/PERFORMANCE.md names two residuals: ~40 small per-step fusions at a
5-30 us width-insensitive latency floor, and a sampling stage pinned by
HBM row-gather latency). This script measures BOTH primitives in
isolation on the chip and prints the arithmetic that either closes the
budget (observed ~= floor, gap is structural) or exposes slack worth
attacking.

  A. per-fusion latency: a scan whose body is a chain of N DEPENDENT
     trivial fusions (each a multiply+add on a [64,120,32] slab — the
     step's typical activation shape, too small to be throughput-bound).
     marginal cost per added fusion = the issue/latency floor lambda.
     Chain lengths {8, 40, 80} give a line; its slope is lambda.
  B. random-row gather: the sampling stage's access pattern — R random
     pixel rows from the packed [3,F,H,W] u32 store — vs the SAME byte
     count fetched contiguously. ns/row and effective GB/s for both; the
     ratio is the latency-vs-bandwidth verdict.

Floor arithmetic printed at the end (see docs/PERFORMANCE.md "Floor
proof" for the recorded reading):

  step_floor  ~= lambda x (critical-path fusions/step)
  frame_floor ~= 100 x step_floor + rows_per_frame x ns/row + overlapped-IO
  vs observed 0.123 s/frame.

Run ON TPU:  python scripts/bench_floor_proof.py
All timings via scripts/_benchlib.scan_time (tunnel dedup-proof).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from _benchlib import scan_time


# --------------------------------------------------------------------------- #
# A. marginal latency per dependent fusion
# --------------------------------------------------------------------------- #


def fusion_chain_cost(n_fusions: int, shape=(64, 120, 32)) -> float:
    """Seconds per scan step for a body of ``n_fusions`` DEPENDENT small
    fusions. Each link is y = sin(y) * c + k (sin blocks algebraic
    collapse of the chain; the perturbation k keeps the tunnel from
    deduping). XLA cannot fuse across the links because each consumes the
    previous link's full slab — exactly the shape of the ~40 per-step
    fusions in the frame program (grad pieces, Adam moments, masks)."""
    c = jnp.float32(0.999)
    y0 = jnp.asarray(np.random.randn(*shape), jnp.float32)

    def fn(y, k):
        for _ in range(n_fusions):
            # sin -> multiply-add: one fused elementwise kernel per link,
            # dependent on the previous link's output
            y = jnp.sin(y) * c + k * 1e-6
        return y

    return scan_time(fn, (y0, jnp.float32(0.0)), iters=200, reps=5)


def part_a() -> dict:
    lengths = (8, 40, 80)
    costs = {n: fusion_chain_cost(n) for n in lengths}
    # slope via least squares over the three points
    xs = np.asarray(lengths, np.float64)
    ys = np.asarray([costs[n] for n in lengths], np.float64)
    slope, intercept = np.polyfit(xs, ys, 1)
    return {
        "us_per_step_by_chain_length": {
            str(n): round(costs[n] * 1e6, 2) for n in lengths},
        "lambda_us_per_fusion": round(slope * 1e6, 3),
        "intercept_us": round(intercept * 1e6, 2),
    }


# --------------------------------------------------------------------------- #
# B. random-row vs contiguous gather
# --------------------------------------------------------------------------- #


def part_b(f=20, h=680, w=1200, rows_per_frame=768_000) -> dict:
    """The sampling stage fetches ~768k random pixel rows per frame from
    the packed [3,F,H,W] u32 store (3 planes x 256k draws). Measure
    ns/row random vs contiguous at the same total bytes."""
    store = jnp.asarray(
        np.random.randint(0, 2**31, (3, f, h, w), np.int64).astype(np.uint32))
    n = rows_per_frame // 3  # per-plane draws; gather hits all 3 planes
    idx_rand = jnp.asarray(
        np.random.randint(0, f * h * w, n, np.int64).astype(np.int32))
    base = int(np.random.randint(0, f * h * w - n))
    flat = store.reshape(3, -1)

    def gather_fn(fl, idx, k):
        i = (idx + k.astype(jnp.int32)) % fl.shape[1]
        return fl[:, i].astype(jnp.float32).sum(0)

    t_rand = scan_time(lambda fl, k: gather_fn(fl, idx_rand, k),
                       (flat, jnp.float32(0.0)), iters=50, reps=5)

    def contig_fn(fl, k):
        off = (k.astype(jnp.int32) % 64) + base
        sl = jax.lax.dynamic_slice(fl, (0, off), (3, n))
        return sl.astype(jnp.float32).sum(0)

    t_contig = scan_time(contig_fn, (flat, jnp.float32(0.0)),
                         iters=50, reps=5)
    nbytes = 3 * n * 4
    return {
        "rows": int(3 * n),
        "random_ns_per_row": round(t_rand / (3 * n) * 1e9, 2),
        "contig_ns_per_row": round(t_contig / (3 * n) * 1e9, 2),
        "random_gbps": round(nbytes / t_rand / 1e9, 2),
        "contig_gbps": round(nbytes / t_contig / 1e9, 2),
        "latency_ratio": round(t_rand / t_contig, 1),
        "random_ms_per_768k_rows": round(t_rand * 1e3, 2),
    }


def main():
    out = {"device": str(jax.devices()[0])}
    print("A: per-fusion latency ...", flush=True)
    out["fusion_latency"] = part_a()
    print(json.dumps(out["fusion_latency"], indent=2), flush=True)
    print("B: gather rows ...", flush=True)
    out["row_gather"] = part_b()
    print(json.dumps(out["row_gather"], indent=2), flush=True)

    # the closing arithmetic (docs/PERFORMANCE.md "Floor proof"):
    lam = out["fusion_latency"]["lambda_us_per_fusion"]
    step_floor_us = lam * 40  # critical-path fusions/step (xplane count)
    frame_floor_ms = (100 * step_floor_us / 1e3
                      + out["row_gather"]["random_ms_per_768k_rows"])
    out["arithmetic"] = {
        "lambda_x40_step_floor_us": round(step_floor_us, 1),
        "x100_plus_sampling_frame_floor_ms": round(frame_floor_ms, 1),
        "observed_frame_ms": 123.0,
        "floor_fraction_of_observed": round(frame_floor_ms / 123.0, 3),
    }
    print(json.dumps(out["arithmetic"], indent=2), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "docs", "parity", "floor_proof.json")
    with open(os.path.abspath(path), "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote docs/parity/floor_proof.json")


if __name__ == "__main__":
    main()
