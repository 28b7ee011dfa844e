#!/usr/bin/env python
"""ragged_dot (MoE grouped matmul) vs the batched ensemble GEMM.

The ensemble matmul [O,N,K]x[O,K,H] at the room_0 training shape measures
~7 TFLOPS f32 while the SAME-shape unbatched GEMM measures ~17 — the
batch dim is the tax. ragged_dot([O*N,K], [O,K,H], group_sizes=[N]*O)
computes exactly the per-object matmul over contiguous row groups with
the MoE expert-GEMM lowering. Also times the two VJP shapes:
  dX: ragged_dot(dY [O*N,H], W^T [O,H,K])
  dW: per-group X^T dY — ragged_dot_general with lhs/rhs both ragged.
"""
import sys, os, time, json

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

O, N, K, H = 64, 1200, 88, 32


from _benchlib import scan_time  # noqa: E402


def row(which, t, flops):
    print(json.dumps({"which": which, "us": round(t * 1e6, 1),
                      "tflops": round(flops / t / 1e12, 1)}), flush=True)


def main():
    key = jax.random.PRNGKey(0)
    f = 2 * O * N * K * H
    gs = jnp.full((O,), N, jnp.int32)

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jax.random.normal(key, (O * N, K), jnp.float32).astype(dt)
        w = (jax.random.normal(key, (O, K, H), jnp.float32) * 0.1).astype(dt)

        def rd(w_, x_):
            return jax.lax.ragged_dot(
                x_, w_, gs, preferred_element_type=jnp.float32)
        try:
            row(f"ragged_fwd_{tag}", scan_time(rd, (w, x)), f)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"which": f"ragged_fwd_{tag}",
                              "error": f"{type(e).__name__}: {str(e)[:120]}"}),
                  flush=True)

        # dX shape: [O*N, H] x [O, H, K]
        dy = jax.random.normal(key, (O * N, H), jnp.float32).astype(dt)
        wt = jnp.swapaxes(w, 1, 2)

        def rdx(w_, d_):
            return jax.lax.ragged_dot(
                d_, w_, gs, preferred_element_type=jnp.float32)
        try:
            row(f"ragged_dX_{tag}", scan_time(rdx, (wt, dy)), f)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"which": f"ragged_dX_{tag}",
                              "error": f"{type(e).__name__}: {str(e)[:120]}"}),
                  flush=True)

        # dW via autodiff of ragged_dot (exercises its transpose rule)
        def loss(w_, x_):
            return jax.lax.ragged_dot(
                x_, w_, gs, preferred_element_type=jnp.float32).sum()
        gfn = jax.grad(loss)
        try:
            row(f"ragged_dW_grad_{tag}", scan_time(gfn, (w, x)), 2 * f)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"which": f"ragged_dW_grad_{tag}",
                              "error": f"{type(e).__name__}: {str(e)[:120]}"}),
                  flush=True)

    # numerical parity vs the batched einsum
    x = jax.random.normal(key, (O * N, K), jnp.float32)
    w = jax.random.normal(key, (O, K, H), jnp.float32) * 0.1
    a = jax.lax.ragged_dot(x, w, gs, preferred_element_type=jnp.float32)
    b = jnp.einsum("onk,okh->onh", x.reshape(O, N, K), w,
                   preferred_element_type=jnp.float32).reshape(O * N, H)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
    print(json.dumps({"which": "parity_rel_err", "value": err}), flush=True)


if __name__ == "__main__":
    main()
