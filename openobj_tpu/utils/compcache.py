"""Persistent XLA compilation cache wiring.

The per-frame training program costs tens of seconds of XLA compile per
(slot-bucket, config) shape — pure overhead on every process start. JAX's
persistent compilation cache (``jax_compilation_cache_dir``) keys compiled
executables by (HLO, compile options, backend version) and serves warm
starts from disk; this module is the ONE place that turns it on so
bench.py, train.py, and the test suite share a location and policy.

The reference has no analogue (torch eager recompiles nothing but also
fuses nothing); this is a TPU-framework concern: the trade is disk space
(~MBs per program) for start-up latency (measured: the room_0 bench frame
program warm-starts in <10 s vs ~55 s cold — BENCH compile_s history
29.6 -> 34.4 -> 54.7 s was 100% cold compiles of a growing program).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache", "jax",
)


def enable_persistent_cache(cache_dir: str | None = None) -> dict:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit arg > $OPENOBJ_COMPILATION_CACHE > the
    repo-local default ``.cache/jax``. An empty-string/"0" value disables.
    Returns {"dir", "entries_before"} so callers can report cold vs warm
    (entries_before == 0 means this start cannot be warm). Must run before
    the first compilation; safe to call more than once."""
    cache_dir = (
        cache_dir
        if cache_dir is not None
        else os.environ.get("OPENOBJ_COMPILATION_CACHE", DEFAULT_DIR)
    )
    if not cache_dir or cache_dir == "0":
        return {"dir": None, "entries_before": 0}
    import jax

    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    entries = sum(1 for n in os.listdir(cache_dir)
                  if not n.startswith("."))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:  # pragma: no cover — option renamed across versions
        pass
    return {"dir": cache_dir, "entries_before": entries}
