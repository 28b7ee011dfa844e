"""Multi-host wiring: jax.distributed + process-level scene sharding.

The reference has NO distributed backend at all (SURVEY.md §2.5 — no
NCCL/MPI/dist.init anywhere; single GPU). The TPU-native story has three
layers, outermost first:

  1. PROCESS (this module, DCN): each host/slice is one process;
     ``initialize`` wires them into one JAX runtime
     (`jax.distributed.initialize`) and ``process_scene_shard`` gives each
     process its slice of the independent scene list (scene-per-host —
     scenes never communicate, so DCN carries zero training traffic);
  2. GROUP (`parallel.multislice`): within a process, device groups train
     scenes concurrently;
  3. MESH (`parallel.sharding`): within a scene, the object/ray axes
     shard over an ICI mesh.

Works on real multi-host TPU slices and, identically, on N CPU processes
(gloo collectives) — which is how tests/test_distributed.py exercises the
full path with 2 local processes.
"""

from __future__ import annotations

import jax


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
) -> None:
    """Join this process into a multi-process JAX runtime. Must run before
    any backend use. On TPU pods the three arguments are optional
    (auto-detected from the TPU environment); here they are explicit so CPU
    process groups work too."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_scene_shard() -> str:
    """This process's scene-shard spec "i:n" for
    multislice.shard_scene_list — each host trains every n-th scene."""
    return f"{jax.process_index()}:{jax.process_count()}"


def barrier(name: str = "openobj_barrier") -> None:
    """Block until every process reaches this point (e.g. before reading a
    sibling host's outputs)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
