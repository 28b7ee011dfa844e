"""Feasibility probes for the fused optimizer-step Pallas kernel.

docs/PERFORMANCE.md names ONE unbuilt structural lever: "fewer/bigger
fusions per step or a fused step kernel". Whether any fused-step design can
pay on this stack reduces to a small set of measurable questions — this
script measures them BEFORE committing to a ~1000-line kernel:

  Q1. Does Mosaic lower a BATCHED dot_general (ensemble GEMM
      [B,N,K]x[B,K,h]) at XLA-like efficiency, or does it serialize per
      batch element at the measured ~0.7 us/matmul issue cost?
      (XLA's batched ensemble GEMMs run at ~69 TFLOPS f32 — the kernel
      only pays if its GEMM path is comparable, because the win it chases
      is the per-fusion 5-30 us launch floor, not GEMM time.)
  Q2. What does an EMPTY steps-grid kernel cost per grid step with
      object-tile-resident accumulator blocks (the weights+moments
      residency pattern of the fused-step design)? This is the floor any
      (obj_tiles x 100-steps) grid pays before computing anything.
  Q3. The same grid with a representative per-step compute body (batched
      fwd GEMM chain at the room_0 per-step shape) — the end-to-end
      per-grid-step cost the full kernel would start from.

Design arithmetic the answers feed (room_0 envelope, 64 slots, 100 steps):
today's while loop ~0.97 ms/step = ~0.77 ms of ~108 small fusions + ~0.2 ms
scan overhead. A fused-step kernel at tile=16 objects runs a
(4 x 100) grid: pays 400 x (Q2 + Q3-compute); tile=64 pays 100 x but needs
>16 MB VMEM for weights+moments (doesn't fit); tile=8 pays 800 x.

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
        x_ref[...], w_ref[...],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _unrolled_dot_kernel(x_ref, w_ref, o_ref):
    for b in range(O_TILE):
        o_ref[b] = jnp.dot(x_ref[b], w_ref[b],
                           preferred_element_type=jnp.float32)


def q1(reps: int = 16):
    """Per-invocation cost of the ensemble GEMM, in-kernel vs XLA.

    Each variant runs ``reps`` back-to-back GEMMs inside ONE dispatch
    (fori_loop with a data dependence) so the tunnel's per-dispatch
    latency amortizes out of the per-GEMM figure."""
    x = jnp.asarray(np.random.randn(O_TILE, N, K), jnp.float32)
    w = jnp.asarray(np.random.randn(O_TILE, K, H), jnp.float32)

    def pallas_call(kernel):
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((O_TILE, N, H), jnp.float32),
        )

        @jax.jit
        def run(x, w):
            def body(_, acc):
                y = f(x + acc[:, :1, :1] * 1e-20, w)
                return y.mean()
            return jax.lax.fori_loop(
                0, reps, body, jnp.zeros((O_TILE, 1, 1)).mean())
        return run

    @jax.jit
    def xla_run(x, w):
        def body(_, acc):
            y = jnp.einsum("onk,okh->onh", x + acc * 1e-20, w,
                           preferred_element_type=jnp.float32)
            return y.mean()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    flops = 2 * O_TILE * N * K * H
    out = {}
    for name, fn in [("pallas_batched", pallas_call(_batched_dot_kernel)),
                     ("pallas_unrolled", pallas_call(_unrolled_dot_kernel)),
                     ("xla_einsum", xla_run)]:
        try:
            dt = timed(fn, x, w) / reps
            out[name] = {"us_per_gemm": round(dt * 1e6, 2),
                         "tflops": round(flops / dt / 1e12, 2)}
        except Exception as e:  # noqa: BLE001 — report lowering failures
            out[name] = {"error": str(e).split("\n")[0][:200]}
    return out


# --------------------------------------------------------------------------- #
# Q2: empty (obj_tile x steps) grid with resident accumulators
# --------------------------------------------------------------------------- #


def q2(n_tiles: int = 4):
    w = jnp.zeros((n_tiles, O_TILE, K, H), jnp.float32)
    xs = jnp.zeros((STEPS, n_tiles, O_TILE, 8, K), jnp.float32)

    def kernel(x_ref, w_ref, o_ref):
        # touch the resident block so it isn't DCE'd; no real compute
        o_ref[...] = w_ref[...] * 1.000001

    f = pl.pallas_call(
        kernel,
        grid=(n_tiles, STEPS),
        in_specs=[
            pl.BlockSpec((1, 1, O_TILE, 8, K), lambda i, j: (j, i, 0, 0, 0)),
            pl.BlockSpec((1, O_TILE, K, H), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, O_TILE, K, H), lambda i, j: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, O_TILE, K, H), jnp.float32),
    )
    jf = jax.jit(lambda x, w: f(x[:, None], w).sum())
    dt = timed(jf, xs, w)
    return {"grid_steps": n_tiles * STEPS,
            "us_per_grid_step": round(dt / (n_tiles * STEPS) * 1e6, 2),
            "ms_total": round(dt * 1e3, 3)}


# --------------------------------------------------------------------------- #
# Q3: steps-grid with a representative per-step fwd GEMM chain
# --------------------------------------------------------------------------- #


def q3(n_tiles: int = 4):
    """(tiles x steps) grid; each step runs the fg fwd GEMM chain
    (in->h, mid1, cat, mid2 at [O_TILE,N,*]) on its step slab with the
    weight block resident. No bwd/Adam — a lower bound on the real
    kernel's per-step cost."""
    xs = jnp.asarray(
        np.random.randn(STEPS, n_tiles, O_TILE, N, K) * 0.1, jnp.float32)
    w1 = jnp.asarray(np.random.randn(n_tiles, O_TILE, K, H), jnp.float32)
    w2 = jnp.asarray(np.random.randn(n_tiles, O_TILE, H, H), jnp.float32)

    def kernel(x_ref, w1_ref, w2_ref, o_ref):
        bd = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        h1 = jax.nn.relu(bd(x_ref[0, 0], w1_ref[0]))
        h2 = jax.nn.relu(bd(h1, w2_ref[0]))
        h3 = jax.nn.relu(bd(h2, w2_ref[0]))
        h4 = jax.nn.relu(bd(h3, w2_ref[0]))
        o_ref[...] = jnp.sum(h4, axis=1, keepdims=True)[None, None]

    f = pl.pallas_call(
        kernel,
        grid=(n_tiles, STEPS),
        in_specs=[
            pl.BlockSpec((1, 1, O_TILE, N, K), lambda i, j: (j, i, 0, 0, 0)),
            pl.BlockSpec((1, O_TILE, K, H), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, O_TILE, H, H), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, O_TILE, 1, H), lambda i, j: (i, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, STEPS, O_TILE, 1, H), jnp.float32),
    )
    jf = jax.jit(lambda x, a, b: f(x[:, :, None], a, b).sum())
    try:
        dt = timed(jf, xs, w1, w2, n=5)
    except Exception as e:  # noqa: BLE001
        return {"error": str(e).split("\n")[0][:200]}
    return {"grid_steps": n_tiles * STEPS,
            "us_per_grid_step": round(dt / (n_tiles * STEPS) * 1e6, 2),
            "ms_total": round(dt * 1e3, 2),
            "note": "4-GEMM fwd chain only; real kernel adds bwd+Adam"}


if __name__ == "__main__":
    import json

    print("devices:", jax.devices())
    res = {"q1_batched_dot": q1()}
    print(json.dumps(res["q1_batched_dot"], indent=2))
    res["q2_empty_grid"] = q2()
    print(json.dumps(res["q2_empty_grid"], indent=2))
    res["q3_fwd_chain_grid"] = q3()
    print(json.dumps(res["q3_fwd_chain_grid"], indent=2))
