"""Feasibility probes for the fused optimizer-step Pallas kernel.

docs/PERFORMANCE.md names ONE unbuilt structural lever: "fewer/bigger
fusions per step or a fused step kernel". Whether any fused-step design can
pay on this stack reduces to a small set of measurable questions — this
script measures them BEFORE committing to a ~1000-line kernel. VERDICT
(measured 2026-08, v5e via the axon tunnel — full reading in
docs/PERFORMANCE.md "Fused-step kernel" section): the kernel LOSES.

  Q1. Does Mosaic lower a BATCHED dot_general (ensemble GEMM
      [B,N,K]x[B,K,h]) at XLA-like efficiency?
      MEASURED: yes for ONE site — batched 1.88 us / unrolled-per-object
      1.25 us vs XLA einsum 2.52 us (85 TFLOPS in-kernel!). But CHAINING
      two batched dots (second operand computed, directly or routed
      through VMEM scratch, K in {87,128,256}) crashes the Mosaic remote
      compiler (HTTP 500 from tpu_compile_helper), and object tiles > 8
      crash it regardless of form. The only GEMM form that beats XLA is
      unreachable for a multi-layer kernel on this toolchain.
  Q2. Per-grid-step floor of a (obj_tiles x steps) grid, no-op body:
      MEASURED: 21.7 us/grid-step with the step's ray slab streamed as a
      [1,8,1200,8] block (trailing dim 8 of 128 lanes -> 16x lane-padding;
      14 GB/s effective = ~226 GB/s physical) vs 0.02 us with a tiny
      block. The floor is streaming LAYOUT, not grid iteration.
  Q3. Steps-grid with a per-object 2D fwd GEMM chain (the only form that
      compiles), 8 tiles x 100 steps x 8 objects x 5 matmuls:
      MEASURED: 39.9 ms/frame-equivalent (49.8 us/grid-step: ~21.7 DMA +
      ~28 us of 40 serialized small matmuls at ~0.7 us each) — vs XLA
      running the IDENTICAL math whole-frame in 20.75 ms. The fwd chain
      alone already loses 2x; fwd+bwd+Adam (~26 matmul sites/object)
      extrapolates to ~117 ms/frame vs today's 97 ms while-loop.

Timing: every figure via scripts/_benchlib.scan_time (the tunnel DEDUPES
identical dispatches — naive repeat loops measure 0 ms; see the
"0.03 ms for 134 GFLOP" trap this script fell into first).

Run ON TPU:  python scripts/bench_fused_step_probe.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# room_0 per-step ensemble shape: O objects x (120 rays x 10 pts) x 87-d
# embedding into h=32, the biggest GEMM of the step
O_TILE = 16
N = 1200
K = 87
H = 32
STEPS = 100


def timed(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# --------------------------------------------------------------------------- #
# Q1: batched dot inside a kernel vs unrolled loop vs XLA
# --------------------------------------------------------------------------- #


def _batched_dot_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        jnp.sin(x_ref[...]), w_ref[...],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _unrolled_dot_kernel(x_ref, w_ref, o_ref):
    for b in range(O_TILE):
        o_ref[b] = jnp.dot(jnp.sin(x_ref[b]), w_ref[b],
                           preferred_element_type=jnp.float32)


def q1():
    """Per-site cost of the ensemble GEMM, in-kernel vs XLA, via the scan
    protocol (_benchlib). Every variant computes sin(x+k) @ w — the sin
    blocks XLA's linear-perturbation hoist (x@(w+k) folds; sin(x+k)@w
    cannot), and is identical work across variants."""
    x = jnp.asarray(np.random.randn(O_TILE, N, K), jnp.float32)
    w = jnp.asarray(np.random.randn(O_TILE, K, H), jnp.float32)

    def pallas_fn(kernel):
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((O_TILE, N, H), jnp.float32),
        )
        return lambda w, x: f(x, w)

    def xla_fn(w, x):
        return jnp.einsum("onk,okh->onh", jnp.sin(x), w,
                          preferred_element_type=jnp.float32)

    flops = 2 * O_TILE * N * K * H
    out = {}
    for name, fn in [("pallas_batched", pallas_fn(_batched_dot_kernel)),
                     ("pallas_unrolled", pallas_fn(_unrolled_dot_kernel)),
                     ("xla_einsum", xla_fn)]:
        try:
            dt = _scan_time(fn, (w, x), iters=30)
            out[name] = {"us_per_site": round(dt * 1e6, 2),
                         "tflops": round(flops / dt / 1e12, 2)}
        except Exception as e:  # noqa: BLE001 — report lowering failures
            out[name] = {"error": str(e).split("\n")[0][:200]}
    return out


# --------------------------------------------------------------------------- #
# Q2: per-grid-step floor of a steps-grid kernel (no-op body)
# --------------------------------------------------------------------------- #


def _scan_time(fn, args, iters=30, reps=5):
    import sys as _sys
    import os as _os

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from _benchlib import scan_time

    return scan_time(fn, args, iters=iters, reps=reps)


def q2(n_tiles: int = 8, o_tile: int = 8):
    """No-op kernel over the (obj_tiles x steps) grid, once with the real
    per-step ray slab streamed ([1,O,1200,8] block — the fused-step
    design's input) and once with a tiny block. The delta is the
    per-grid-step streaming cost; grid iteration itself is ~free."""
    xs = jnp.zeros((STEPS, n_tiles * o_tile, N, 8), jnp.float32)
    w0 = jnp.zeros((n_tiles * o_tile, 8, K), jnp.float32)

    def noop_kernel(x, w0r, o):
        w = w0r[...]
        o[...] = (w[:, :1, :H] * 1.000001)[None]

    def make(xblock, xarr):
        f = pl.pallas_call(
            noop_kernel,
            grid=(n_tiles, STEPS),
            in_specs=[
                pl.BlockSpec(xblock, lambda i, j: (j, i, 0, 0)),
                pl.BlockSpec((o_tile, 8, K), lambda i, j: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, o_tile, 1, H), lambda i, j: (j, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (STEPS, n_tiles * o_tile, 1, H), jnp.float32),
        )
        return _scan_time(lambda a, x: f(x, a), (w0, xarr))

    gs = n_tiles * STEPS
    full = make((1, o_tile, N, 8), xs)
    tiny = make((1, o_tile, 8, 8), xs[:, :, :8, :])
    return {
        "grid_steps": gs,
        "us_per_grid_step_ray_slab": round(full / gs * 1e6, 2),
        "us_per_grid_step_tiny_block": round(tiny / gs * 1e6, 2),
        "note": "delta = lane-padded streaming of the [N,8] ray slab "
                "(trailing dim 8 of 128 lanes)",
    }


# --------------------------------------------------------------------------- #
# Q3: steps-grid with the per-object 2D fwd GEMM chain (the form that
# compiles) vs XLA running the identical math whole-frame
# --------------------------------------------------------------------------- #


def q3(n_tiles: int = 8, o_tile: int = 8):
    ot = n_tiles * o_tile
    xs = jnp.asarray(
        np.random.randn(STEPS, ot, N, 8) * 0.1, jnp.float32)
    w0 = jnp.asarray(np.random.randn(ot, 8, K), jnp.float32)
    w1 = jnp.asarray(np.random.randn(ot, K, H), jnp.float32)
    w2 = jnp.asarray(np.random.randn(ot, H, H), jnp.float32)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def kernel(x, w0r, w1r, w2r, o):
        for b in range(o_tile):
            e = jnp.sin(mm(x[0, b], w0r[b]))
            h1 = jax.nn.relu(mm(e, w1r[b]))
            h = h1
            for _ in range(3):
                h = jax.nn.relu(mm(h, w2r[b]))
            o[0, b] = jnp.sum(h, axis=0, keepdims=True)

    f = pl.pallas_call(
        kernel,
        grid=(n_tiles, STEPS),
        in_specs=[
            pl.BlockSpec((1, o_tile, N, 8), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((o_tile, 8, K), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((o_tile, K, H), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((o_tile, H, H), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, o_tile, 1, H), lambda i, j: (j, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((STEPS, ot, 1, H), jnp.float32),
    )
    gs = n_tiles * STEPS
    out = {}
    try:
        per = _scan_time(lambda a, b, c, x: f(x, a, b, c), (w0, w1, w2, xs))
        out["pallas_steps_grid"] = {
            "ms_per_frame_equiv": round(per * 1e3, 2),
            "us_per_grid_step": round(per / gs * 1e6, 2),
            "grid_steps": gs,
        }
    except Exception as e:  # noqa: BLE001
        out["pallas_steps_grid"] = {"error": str(e).split("\n")[0][:160]}

    def xla_chain(a, b, c, x):
        e = jnp.sin(jnp.einsum("sonk,okh->sonh", x, a,
                               preferred_element_type=jnp.float32))
        h = jax.nn.relu(jnp.einsum("sonh,ohg->song", e, b,
                                   preferred_element_type=jnp.float32))
        for _ in range(3):
            h = jax.nn.relu(jnp.einsum("sonh,ohg->song", h, c,
                                       preferred_element_type=jnp.float32))
        return h.sum(axis=2)

    perx = _scan_time(xla_chain, (w0, w1, w2, xs), iters=10)
    out["xla_whole_frame_same_chain"] = {"ms": round(perx * 1e3, 2)}
    return out


# --------------------------------------------------------------------------- #
# Q4: the compiler-crash boundary (chained batched dots; object tile size)
# --------------------------------------------------------------------------- #


def q4():
    """Document which kernel forms the Mosaic remote compiler accepts.
    Each case compiles a steps-grid kernel; 'crash' = HTTP 500 from
    tpu_compile_helper (observed stable across ports/retries)."""
    import functools as ft

    bd = ft.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    def compile_case(o_tile, body, scratch=()):
        xs = jnp.zeros((4, o_tile, N, 8), jnp.float32)
        w0 = jnp.zeros((o_tile, 8, K), jnp.float32)
        w1 = jnp.zeros((o_tile, K, H), jnp.float32)
        f = pl.pallas_call(
            body,
            grid=(1, 4),
            in_specs=[
                pl.BlockSpec((1, o_tile, N, 8), lambda i, j: (j, i, 0, 0)),
                pl.BlockSpec((o_tile, 8, K), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((o_tile, K, H), lambda i, j: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, o_tile, 1, H), lambda i, j: (j, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((4, o_tile, 1, H), jnp.float32),
            scratch_shapes=list(scratch),
        )
        try:
            jax.block_until_ready(
                jax.jit(lambda *a: f(*a).sum())(xs, w0, w1))
            return "ok"
        except Exception as e:  # noqa: BLE001
            return "crash: " + str(e).split("\n")[0][:80]

    def chained_batched(x, w0r, w1r, o):
        e = jnp.sin(bd(x[0], w0r[...]))
        h = jax.nn.relu(bd(e, w1r[...]))
        o[...] = jnp.sum(h, axis=1, keepdims=True)[None]

    def single_batched(x, w0r, w1r, o):
        e = jnp.sin(bd(x[0], w0r[...]))
        o[...] = jnp.sum(e[:, :, :H], axis=1, keepdims=True)[None]

    def per_object_2d(x, w0r, w1r, o):
        for b in range(x.shape[1]):
            e = jnp.sin(jnp.dot(x[0, b], w0r[b],
                                preferred_element_type=jnp.float32))
            h = jax.nn.relu(jnp.dot(e, w1r[b],
                                    preferred_element_type=jnp.float32))
            o[0, b] = jnp.sum(h, axis=0, keepdims=True)

    return {
        "single_batched_dot_o16": compile_case(16, single_batched),
        "chained_batched_dot_o16": compile_case(16, chained_batched),
        "chained_batched_dot_o8": compile_case(8, chained_batched),
        "per_object_2d_o8": compile_case(8, per_object_2d),
        "per_object_2d_o16": compile_case(16, per_object_2d),
    }


# --------------------------------------------------------------------------- #
# Q5: the part-term kernel (the OTHER named lever: "Pallas part-term kernel
# (est. -10 ms)") — probe its only compiling form against XLA
# --------------------------------------------------------------------------- #


def q5(n_tiles: int = 8, o_tile: int = 8):
    """Part-term fwd kernel probe. Per optimizer step the factored cosine
    term (ops/losses.py:factored_cosine_loss) computes
        t = gt @ wb^T   (the C=512 contraction — the big GEMM)
        g = wb @ wb^T   (tiny Gram)
    then num = sum(t*hp), pn2 = hp g hp. A part-term kernel can only fuse
    the two LOADED-operand batched dots: the quadratic form hp @ g is a
    dot on a COMPUTED operand (the q4 crash form), and the elementwise
    expansion hp[:,:,:,None]*g[:,None]*hp[:,:,None,:] pads 33 -> 128
    lanes and blows VMEM (8*120*40*128 f32 = 20 MB). So the honest kernel
    = {t, g} fused, epilogue in XLA — timed here against XLA running the
    identical math. sin() on the perturbed gt operand breaks linearity so
    the scan protocol cannot hoist the dots (_benchlib CAUTION).
    Compile-only cases document whether a bwd kernel (dW = d_t contract-R
    gt, both loaded) is even expressible."""
    import functools as ft

    obj = n_tiles * o_tile
    r, hpd, c = 120, H + 1, 512
    gt0 = jnp.asarray(np.random.randn(obj, r, c) * 0.1, jnp.float32)
    wb = jnp.asarray(np.random.randn(obj, hpd, c) * 0.1, jnp.float32)
    hp = jnp.asarray(np.random.randn(obj, r, hpd) * 0.1, jnp.float32)

    bd_c = ft.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    def kernel(gt_ref, wb_ref, t_ref, g_ref):
        gt = gt_ref[...]
        w = wb_ref[...]
        t_ref[...] = bd_c(gt, w)
        g_ref[...] = bd_c(w, w)

    f = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((o_tile, r, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((o_tile, hpd, c), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((o_tile, r, hpd), lambda i: (i, 0, 0)),
            pl.BlockSpec((o_tile, hpd, hpd), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((obj, r, hpd), jnp.float32),
            jax.ShapeDtypeStruct((obj, hpd, hpd), jnp.float32),
        ],
    )

    def epilogue(t, g, h):
        num = jnp.sum(t * h, axis=-1)
        pn2 = jnp.einsum("orh,ohk,ork->or", h, g, h)
        return num + pn2

    def pallas_fn(w, h, g0):
        t, g = f(jnp.sin(g0), w)
        return epilogue(t, g, h)

    def xla_fn(w, h, g0):
        gt = jnp.sin(g0)
        t = jnp.einsum("orc,ohc->orh", gt, w,
                       preferred_element_type=jnp.float32)
        g = jnp.einsum("ohc,okc->ohk", w, w,
                       preferred_element_type=jnp.float32)
        return epilogue(t, g, h)

    out = {}
    try:
        per = _scan_time(pallas_fn, (wb, hp, gt0), iters=100)
        out["pallas_t_g_kernel_us_per_step"] = round(per * 1e6, 2)
        out["pallas_us_per_grid_step"] = round(per / n_tiles * 1e6, 2)
    except Exception as e:  # noqa: BLE001
        out["pallas_t_g_kernel"] = "crash: " + str(e).split("\n")[0][:120]
    perx = _scan_time(xla_fn, (wb, hp, gt0), iters=100)
    out["xla_same_math_us_per_step"] = round(perx * 1e6, 2)
    if "pallas_t_g_kernel_us_per_step" in out:
        out["per_frame_ms_pallas_x100"] = round(
            out["pallas_t_g_kernel_us_per_step"] / 10, 2)
    out["per_frame_ms_xla_x100"] = round(perx * 1e6 / 10, 2)

    # compile-only boundary cases for the rest of the part-term kernel
    def compile_case(body, n_out):
        fs = pl.pallas_call(
            body,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((o_tile, r, c), lambda i: (i, 0, 0)),
                pl.BlockSpec((o_tile, hpd, c), lambda i: (i, 0, 0)),
                pl.BlockSpec((o_tile, r, hpd), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((o_tile,) + n_out, lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((obj,) + n_out, jnp.float32),
        )
        try:
            jax.block_until_ready(
                jax.jit(lambda *a: fs(*a).sum())(gt0, wb, hp))
            return "ok"
        except Exception as e:  # noqa: BLE001
            return "crash: " + str(e).split("\n")[0][:80]

    bd_r = ft.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    def bwd_dw(gt_ref, wb_ref, dt_ref, o_ref):
        # dW = d_t (contract rays) gt — BOTH loaded; the bwd kernel's core
        o_ref[...] = bd_r(dt_ref[...], gt_ref[...])

    def fwd_quadratic_chained(gt_ref, wb_ref, hp_ref, o_ref):
        # hp @ g with g computed in-kernel: the q4 crash form at THESE shapes
        w = wb_ref[...]
        g = bd_c(w, w)
        z = jax.lax.dot_general(
            hp_ref[...], g,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[...] = z

    out["compile_bwd_dW_loaded_operands"] = compile_case(bwd_dw, (hpd, c))
    out["compile_quadratic_chained_dot"] = compile_case(
        fwd_quadratic_chained, (r, hpd))
    return out


if __name__ == "__main__":
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of q1 q2 q3 q4 q5 (remote compiles are slow; "
                         "run sections separately when iterating)")
    args = ap.parse_args()
    sections = {"q1": q1, "q2": q2, "q3": q3, "q4": q4, "q5": q5}
    print("devices:", jax.devices(), flush=True)
    for name, fn in sections.items():
        if args.only and name not in args.only:
            continue
        print(f"== {name} ==", flush=True)
        print(json.dumps(fn(), indent=2), flush=True)
