"""Shared micro-benchmark timing for the scripts/ bench tools.

One scan-protocol implementation (docs/PERFORMANCE.md methodology) so the
estimator fixes live in one place:

  * median(f_N) − median(f_1), timed SEPARATELY — the paired-subtract form
    ((t2−t1)−(t1−t0)) goes negative under the tunnel's multi-ms dispatch
    jitter;
  * CAUTION for callers: the per-iteration perturbation `arg + k` is only
    a valid cache-buster for NON-linear ops. For a matmul (or any op
    linear in the perturbed operand) XLA distributes and hoists —
    x@(w+k) = x@w + k*(x@1) — and the measured "op" collapses to a
    broadcast-add (observed: impossible >peak TFLOPS). Time linear ops via
    xplane self-times of the real program instead (scripts/profile_train).
"""
import time

import numpy as np


def scan_time(fn, args, iters=400, reps=5):
    """Per-iteration cost of fn(*args[:-1], args[-1] + k) under lax.scan."""
    import jax
    import jax.numpy as jnp

    def scanned(n):
        def body(c, k):
            out = fn(*args[:-1], args[-1] + k.astype(args[-1].dtype))
            return c + out.mean().astype(jnp.float32), None
        r, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(n, dtype=jnp.float32))
        return r

    f1 = jax.jit(lambda: scanned(1)).lower().compile()
    fN = jax.jit(lambda: scanned(iters)).lower().compile()
    jax.block_until_ready(f1())
    jax.block_until_ready(fN())
    t1s, tNs = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f1())
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(fN())
        tNs.append(time.perf_counter() - t0)
    return (float(np.median(tNs)) - float(np.median(t1s))) / (iters - 1)
