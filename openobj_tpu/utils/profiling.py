"""Tracing / profiling instrumentation.

Parity with the reference's ``performance_measure`` context manager
(/root/reference/objnerf/utils.py:13-27, wrapped around every training phase
at train.py:161-478), extended TPU-style: optional jax.profiler trace
capture for TensorBoard, and an aggregating registry so steady-state
per-stage statistics survive past a single print.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict

import jax

# thread-local so concurrent scenes (parallel.multislice.run_parallel) keep
# separate per-stage aggregates
_TLS = threading.local()


def _stats_dict() -> dict[str, list[float]]:
    if not hasattr(_TLS, "stats"):
        _TLS.stats = defaultdict(list)
    return _TLS.stats


@contextlib.contextmanager
def performance_measure(name: str, verbose: bool = True, block: bool = False):
    """Time a stage. With block=True, waits for device work to finish first
    (otherwise async dispatch makes wall times meaningless)."""
    t0 = time.perf_counter_ns()
    yield
    if block:
        try:
            jax.effects_barrier()
        except Exception:
            pass
    dt_ms = (time.perf_counter_ns() - t0) / 1e6
    _stats_dict()[name].append(dt_ms)
    if verbose:
        print(f"[perf] {name}: {dt_ms:.2f} ms")


def stats() -> dict[str, dict]:
    out = {}
    for name, xs in _stats_dict().items():
        out[name] = {
            "n": len(xs),
            "mean_ms": sum(xs) / len(xs),
            "last_ms": xs[-1],
            "min_ms": min(xs),
        }
    return out


def reset_stats():
    _stats_dict().clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
