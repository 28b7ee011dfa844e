"""Scene-level scale-out across device groups / slices (the DCN axis).

The reference is single-scene, single-GPU (SURVEY.md §2.5). Within one
scene this framework shards the object and ray axes over an ICI mesh
(`parallel.sharding`). ACROSS scenes there is no communication at all —
every Replica/ScanNet scene is an independent mapping job — so the natural
DCN-level parallelism is **scene-per-slice**: each slice (or device group)
trains its own scene end to end, and the only cross-slice traffic is file
output. This mirrors how the reference's multi-scene workflow is actually
run (one `train.py` invocation per scene config, README.md:100-118), but
as one process driving all groups concurrently.

Two layers:

  * ``device_groups(n)`` — partition the visible devices into ``n`` groups,
    keeping devices of the same process together (under multi-host
    ``jax.distributed``, ``process_index`` boundaries are slice/host
    boundaries, so groups never straddle DCN unless a group spans
    processes by construction);
  * ``run_parallel(tasks, groups)`` — run one task per group in a thread
    pool. Each task runs under ``jax.default_device(group[0])`` (JAX config
    context managers are thread-local), so single-device scene training
    lands on its group's device with zero code changes; tasks that want
    the whole group for an in-scene mesh receive the device list and can
    build one via ``sharding.make_mesh(devices)``.

Dispatch is async and the Python host work per frame is small, so driving
N devices from one process's thread pool keeps them busy; for true
multi-host (separate processes per slice) use ``scripts/run_scenes.py
--scene-shard i:n`` to split the scene list across launches instead.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax


def device_groups(n_groups: int, devices: Sequence | None = None) -> list[list]:
    """Partition devices into ``n_groups`` contiguous groups.

    Devices are ordered by (process_index, id) so a group never straddles a
    process/slice boundary unless unavoidable (n_groups not a multiple of
    the process count). Group sizes differ by at most 1.
    """
    devices = list(devices) if devices is not None else list(jax.devices())
    if n_groups < 1:
        raise ValueError("n_groups must be >= 1")
    if n_groups > len(devices):
        raise ValueError(
            f"n_groups={n_groups} exceeds device count {len(devices)}"
        )
    devices.sort(key=lambda d: (getattr(d, "process_index", 0), d.id))
    base, rem = divmod(len(devices), n_groups)
    groups, start = [], 0
    for g in range(n_groups):
        size = base + (1 if g < rem else 0)
        groups.append(devices[start:start + size])
        start += size
    return groups


@dataclass
class TaskResult:
    """Outcome of one parallel task: exactly one of result/error is set."""
    name: str
    result: Any = None
    error: Exception | None = None

    @property
    def ok(self) -> bool:
        return self.error is None


def run_parallel(
    tasks: Sequence[tuple[str, Callable]],
    groups: list[list] | None = None,
    n_groups: int | None = None,
) -> list[TaskResult]:
    """Run tasks across device groups, one thread per group.

    tasks: (name, fn) pairs; fn is called as ``fn(devices)`` with its
    group's device list, inside ``jax.default_device(devices[0])``. More
    tasks than groups queue up round-robin (a group starts its next task
    when its current one finishes). Exceptions are captured per task, never
    aborting siblings. Returns TaskResults in task order.
    """
    if groups is None:
        groups = device_groups(n_groups or jax.device_count())
    results = [TaskResult(name=name) for name, _ in tasks]
    it_lock = threading.Lock()
    it = iter(enumerate(tasks))

    def worker(group):
        while True:
            with it_lock:
                nxt = next(it, None)
            if nxt is None:
                return
            i, (name, fn) = nxt
            try:
                with jax.default_device(group[0]):
                    results[i].result = fn(group)
            except Exception as e:  # noqa: BLE001 — reported per task
                results[i].error = e
    with ThreadPoolExecutor(max_workers=len(groups)) as ex:
        futures = [ex.submit(worker, g) for g in groups]
        for f in futures:
            f.result()
    return results


def shard_scene_list(scenes: Sequence, shard: str) -> list:
    """Split a scene list for multi-host launches: ``shard`` is "i:n"
    (0-based). Deterministic round-robin so hosts get balanced mixes."""
    i, n = (int(x) for x in shard.split(":"))
    if not (0 <= i < n):
        raise ValueError(f"bad scene shard {shard!r}")
    return [s for j, s in enumerate(scenes) if j % n == i]
