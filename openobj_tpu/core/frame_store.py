"""Device-resident global frame store.

The reference duplicates every keyframe's FULL frame (RGB + per-pixel state,
depth, pose) into EACH object's 20-slot buffer
(/root/reference/objnerf/vmap.py:84-147) — ~100x pixel duplication on the
data device. TPU-native redesign: frames are stored ONCE in preallocated
device arrays; per-object keyframe tables hold only frame indices + 2D
bboxes, and per-ray object state is derived at gather time from the global
instance map (state = this(1) / unknown(2) / other(0), train.py:203-205).

Part-level CLIP maps (reference keeps all frames' maps on the GPU,
train.py:183-188) live here too, stored bf16 at 1/part_down resolution.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FrameStore:
    rgb: jnp.ndarray      # [F, H, W, 3] uint8
    depth: jnp.ndarray    # [F, H, W] float32 (scaled to meters, >max_depth -> 0)
    inst: jnp.ndarray     # [F, H, W] int32 global instance ids; -1 = unknown
    t_wc: jnp.ndarray     # [F, 4, 4] float32 camera-to-world
    partfeat: jnp.ndarray | None  # [F, H//down, W//down, C] bfloat16, or None
    n_frames: jnp.ndarray  # [] int32 — frames written so far

    @property
    def capacity(self) -> int:
        return self.rgb.shape[0]

    @property
    def frame_shape(self) -> tuple[int, int]:
        return self.rgb.shape[1], self.rgb.shape[2]


def init_frame_store(
    capacity: int,
    height: int,
    width: int,
    part_feat_dim: int = 0,
    part_down: int = 5,
) -> FrameStore:
    pf = None
    if part_feat_dim > 0:
        pf = jnp.zeros(
            (capacity, height // part_down, width // part_down, part_feat_dim),
            dtype=jnp.bfloat16,
        )
    return FrameStore(
        rgb=jnp.zeros((capacity, height, width, 3), dtype=jnp.uint8),
        depth=jnp.zeros((capacity, height, width), dtype=jnp.float32),
        inst=jnp.full((capacity, height, width), -1, dtype=jnp.int32),
        t_wc=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
        partfeat=pf,
        n_frames=jnp.asarray(0, dtype=jnp.int32),
    )


@jax.jit
def _append(store: FrameStore, rgb, depth, inst, t_wc, partfeat) -> FrameStore:
    i = store.n_frames
    new = replace(
        store,
        rgb=jax.lax.dynamic_update_index_in_dim(store.rgb, rgb, i, 0),
        depth=jax.lax.dynamic_update_index_in_dim(store.depth, depth, i, 0),
        inst=jax.lax.dynamic_update_index_in_dim(store.inst, inst, i, 0),
        t_wc=jax.lax.dynamic_update_index_in_dim(store.t_wc, t_wc, i, 0),
        n_frames=i + 1,
    )
    if store.partfeat is not None:
        new = replace(
            new,
            partfeat=jax.lax.dynamic_update_index_in_dim(
                store.partfeat, partfeat.astype(jnp.bfloat16), i, 0
            ),
        )
    return new


def append_frame(
    store: FrameStore, rgb, depth, inst, t_wc, partfeat=None
) -> tuple[FrameStore, int]:
    """Append one frame; returns (new store, frame index). Host-called once
    per frame — the scatter itself runs on device."""
    idx = int(store.n_frames)
    if idx >= store.capacity:
        raise ValueError(
            f"frame store full ({store.capacity}); raise capacity or add eviction"
        )
    rgb = jnp.asarray(rgb, dtype=jnp.uint8)
    depth = jnp.asarray(depth, dtype=jnp.float32)
    inst = jnp.asarray(inst, dtype=jnp.int32)
    t_wc = jnp.asarray(t_wc, dtype=jnp.float32)
    if store.partfeat is not None:
        if partfeat is None:
            partfeat = jnp.zeros(store.partfeat.shape[1:], dtype=jnp.bfloat16)
        else:
            partfeat = jnp.asarray(partfeat).astype(jnp.bfloat16)
    return _append(store, rgb, depth, inst, t_wc, partfeat), idx
