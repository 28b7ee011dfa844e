#!/usr/bin/env python
"""Ensemble-GEMM lowering variants at the room_0 training shape.

HISTORICAL CAVEAT (kept as a measurement lesson, see _benchlib and
docs/PERFORMANCE.md): the scan protocol's additive perturbation is
INVALID for ops linear in the perturbed operand — XLA hoists x@w out of
the loop and folds x@(w+k) to a broadcast-add, which produced impossible
>peak "TFLOPS" in this sweep's first runs. Trust xplane self-times of
the real training program for GEMM costs, not these rows.
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

    def mk(dtype, k=K, h=H, n=N):
        x = jax.random.normal(key, (O, n, k), jnp.float32).astype(dtype)
        w = (jax.random.normal(key, (O, k, h), jnp.float32) * 0.1).astype(dtype)
        return x, w

    def ens(x, w):
        return jnp.einsum("onk,okh->onh", x, w,
                          preferred_element_type=jnp.float32)

    # baseline f32
    x, w = mk(jnp.float32)
    row("f32_o64_n1200_k88_h32", scan_time(ens, (x, w)), f)

    # bf16 operands, f32 accum
    xb, wb = mk(jnp.bfloat16)
    row("bf16_same_shape", scan_time(ens, (xb, wb)), f)

    # H padded to 128 (what if the head were lane-wide?)
    x4, w4 = mk(jnp.float32, h=128)
    row("f32_h128", scan_time(ens, (x4, w4)), 2 * O * N * K * 128)
    xb4, wb4 = mk(jnp.bfloat16, h=128)
    row("bf16_h128", scan_time(ens, (xb4, wb4)), 2 * O * N * K * 128)

    # all 6 fwd GEMMs merged into ONE wide ensemble GEMM?
    # fwd consumes e1[87] -> h(32) five times + e2[42] heads: upper bound
    # test: K=128, H=256
    x5, w5 = mk(jnp.float32, k=128, h=256)
    row("f32_k128_h256", scan_time(ens, (x5, w5)), 2 * O * N * 128 * 256)
    xb5, wb5 = mk(jnp.bfloat16, k=128, h=256)
    row("bf16_k128_h256", scan_time(ens, (xb5, wb5)), 2 * O * N * 128 * 256)

    # dW shape: [O,K,N]x[O,N,H] (contract over rays)
    xt = jax.random.normal(key, (O, K, N), jnp.float32)
    wt = jax.random.normal(key, (O, N, H), jnp.float32) * 0.1
    def dw(x_, w_):
        return jnp.einsum("okn,onh->okh", x_, w_,
                          preferred_element_type=jnp.float32)
    row("f32_dW_k88xN1200xh32", scan_time(dw, (xt, wt)), f)

    # grouped 1x1 conv lowering (feature_group_count = O)
    xc = jax.random.normal(key, (1, O * K, N), jnp.float32)     # NCW
    wc = jax.random.normal(key, (O * H, K, 1), jnp.float32)     # OIW
    def conv(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_, (1,), "VALID", feature_group_count=O,
            dimension_numbers=("NCW", "OIW", "NCW"),
            preferred_element_type=jnp.float32)
    row("f32_grouped_conv", scan_time(conv, (xc, wc)), f)

    # fewer, bigger objects: O=8 with 8x rays (same total points)
    x8 = jax.random.normal(key, (8, N * 8, K), jnp.float32)
    w8 = jax.random.normal(key, (8, K, H), jnp.float32) * 0.1
    row("f32_o8_n9600", scan_time(ens, (x8, w8)), f)

    # single huge matmul, same total FLOPs (the no-ensemble upper bound)
    xs = jax.random.normal(key, (O * N, K), jnp.float32)
    ws = jax.random.normal(key, (K, H), jnp.float32) * 0.1
    def smm(x_, w_):
        return jnp.dot(x_, w_, preferred_element_type=jnp.float32)
    row("f32_single_76800xK88xH32", scan_time(smm, (xs, ws)), f)
    xsb, wsb = xs.astype(jnp.bfloat16), ws.astype(jnp.bfloat16)
    row("bf16_single_76800xK88xH32", scan_time(smm, (xsb, wsb)), f)


if __name__ == "__main__":
    main()
