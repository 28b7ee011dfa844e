#!/usr/bin/env python
"""Decisive micro-benchmarks for the fused-step-kernel (megakernel) plan.

Measures, on the real chip, at the room_0 training shape:
  1. XLA batched ensemble GEMM  [O,N,K] x [O,K,H]        (the status quo)
  2. Pallas batched dot_general (one grid step, whole ensemble resident)
  3. Pallas per-object fori_loop of 2D matmuls (one grid step)
  4. pallas kernel-launch overhead inside lax.scan (100 no-op launches)

(2)/(3) >= (1) is the GO condition for fusing the whole optimizer step
into one kernel: the megakernel removes ~108 small fusions/step but must
not give back the matmul time. (4) prices a launch-per-step fallback.

Scan-timing protocol per docs/PERFORMANCE.md. CAVEAT: sections 1-3
time ops LINEAR in the perturbed operand — XLA folds the perturbation
and hoists the matmul (see _benchlib docstring), so those rows
under-report; only section 4 (nonlinear-free no-op launch cost) and
xplane self-times are trustworthy.
"""
import sys, os, time, json

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

O, N, K, H = 64, 1200, 88, 32   # in-width padded 87->88 (8-multiple)


from _benchlib import scan_time  # noqa: E402


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (O, N, K), jnp.float32)
    w = jax.random.normal(key, (O, K, H), jnp.float32) * 0.1

    flops = 2 * O * N * K * H

    # 1. XLA batched ensemble GEMM
    def xla_mm(w, x):
        return jnp.einsum("onk,okh->onh", x, w,
                          preferred_element_type=jnp.float32)
    t = scan_time(xla_mm, (w, x))
    print(json.dumps({"which": "xla_batched_gemm", "us": round(t * 1e6, 1),
                      "tflops": round(flops / t / 1e12, 1)}))

    # 2. Pallas batched dot_general, whole ensemble in one grid step
    def batched_kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def pallas_batched(w, x):
        return pl.pallas_call(
            batched_kernel,
            out_shape=jax.ShapeDtypeStruct((O, N, H), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        )(x, w)
    try:
        # x is [64,1200,88] f32 = 27 MB > VMEM; stream via ANY and let the
        # kernel DMA per object? First try: x in ANY fails dot_general -
        # fall back to object-tiled grid below if this raises.
        t = scan_time(pallas_batched, (w, x))
        print(json.dumps({"which": "pallas_batched_1grid",
                          "us": round(t * 1e6, 1),
                          "tflops": round(flops / t / 1e12, 1)}))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"which": "pallas_batched_1grid",
                          "error": f"{type(e).__name__}: {str(e)[:140]}"}))

    # 3. object-tiled grid (8 objects per step -> 8 grid steps)
    TO = 8
    def tiled_kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def pallas_tiled(w, x):
        return pl.pallas_call(
            tiled_kernel,
            grid=(O // TO,),
            out_shape=jax.ShapeDtypeStruct((O, N, H), jnp.float32),
            in_specs=[
                pl.BlockSpec((TO, N, K), lambda i: (i, 0, 0)),
                pl.BlockSpec((TO, K, H), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((TO, N, H), lambda i: (i, 0, 0)),
        )(x, w)
    try:
        t = scan_time(pallas_tiled, (w, x))
        print(json.dumps({"which": f"pallas_tiled_grid{O//TO}",
                          "us": round(t * 1e6, 1),
                          "tflops": round(flops / t / 1e12, 1)}))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"which": "pallas_tiled", "error":
                          f"{type(e).__name__}: {str(e)[:140]}"}))

    # 3b. per-object fori_loop inside ONE grid step (weights VMEM-resident)
    def loop_kernel(x_hbm, w_ref, o_ref, xbuf, sem):
        def body(i, _):
            cp = pltpu.make_async_copy(x_hbm.at[i], xbuf, sem)
            cp.start(); cp.wait()
            o_ref[i] = jax.lax.dot_general(
                xbuf[:], w_ref[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0
        jax.lax.fori_loop(0, O, body, 0)

    def pallas_loop(w, x):
        return pl.pallas_call(
            loop_kernel,
            out_shape=jax.ShapeDtypeStruct((O, N, H), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((N, K), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )(x, w)
    try:
        t = scan_time(pallas_loop, (w, x))
        print(json.dumps({"which": "pallas_objloop_1grid",
                          "us": round(t * 1e6, 1),
                          "tflops": round(flops / t / 1e12, 1)}))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"which": "pallas_objloop", "error":
                          f"{type(e).__name__}: {str(e)[:140]}"}))

    # 4. launch overhead: no-op pallas kernel inside the scan
    def nop_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def pallas_nop(_, x):
        return pl.pallas_call(
            nop_kernel,
            out_shape=jax.ShapeDtypeStruct((8, K), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x[0, :8, :])
    t = scan_time(pallas_nop, (w, x))
    print(json.dumps({"which": "pallas_nop_launch", "us": round(t * 1e6, 1)}))


if __name__ == "__main__":
    main()
