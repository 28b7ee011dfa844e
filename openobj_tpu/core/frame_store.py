"""Device-resident global frame store.

The reference duplicates every keyframe's FULL frame (RGB + per-pixel state,
depth, pose) into EACH object's 20-slot buffer
(/root/reference/objnerf/vmap.py:84-147) — ~100x pixel duplication on the
data device. TPU-native redesign: frames are stored ONCE in preallocated
device arrays; per-object keyframe tables hold only frame indices + 2D
bboxes, and per-ray object state is derived at gather time from the global
instance map (state = this(1) / unknown(2) / other(0), train.py:203-205).

Storage layout: depth, instance id, and RGB are PACKED into one
[3, F, H, W] uint32 array (plane 0 = the f32 depth bit-cast; 1 = the
int32 instance id; 2 = the 3 RGB bytes bit-cast). Training sampling draws
random pixels, so the per-pixel fetch is a latency-bound random gather —
packing turns three (four with part features) separately-issued gathers
into one fused 3-plane fetch (profiled ~22 → ~8 ms/frame at the room_0
envelope). The carrier dtype is an INTEGER on purpose: inst=-1
(0xFFFFFFFF) and many RGB byte patterns are NaN payloads under a float32
carrier, and nothing guarantees XLA preserves NaN payload bits through
stack/gather/dynamic-update on every backend — integer moves are always
bit-exact. (Same 4-byte lanes either way; gather perf is identical.)
The PLANAR [3, ...] axis order matters: it matches the layout XLA picks
for the gather operand — a [..., 3]-row layout was silently re-laid-out
to planar INSIDE every train_frame (~9 ms/frame of pure copy).
``.depth`` / ``.inst`` / ``.rgb`` decode views on demand (cheap slices +
bitcasts that XLA fuses into consumers).

Part-level CLIP maps (reference keeps all frames' maps on the GPU,
train.py:183-188) live here too, at 1/part_down resolution. Default
storage is UNIT-NORM int8 (x127): the part features are consumed only by
the cosine distillation loss, which normalizes both sides — the scale is
exactly transparent, and int8 quantization of a unit 512-vector perturbs
the cosine by < 1e-3. Quarter the bytes of f32 → the per-frame gather of
the sampled rays' features (profiled ~11 ms at the room_0 envelope in
bf16) fetches half the bytes. ``part_dtype="bf16"`` keeps the old store.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp


def pack_pixels(depth: jnp.ndarray, inst: jnp.ndarray, rgb: jnp.ndarray):
    """(depth f32 [..., H, W], inst i32, rgb u8 [..., 3]) -> packed u32
    [3, ..., H, W] (planar: depth bits | inst | rgb bytes)."""
    rgb4 = jnp.concatenate(
        [rgb, jnp.zeros((*rgb.shape[:-1], 1), jnp.uint8)], axis=-1
    )
    return jnp.stack(
        [
            jax.lax.bitcast_convert_type(
                depth.astype(jnp.float32), jnp.uint32
            ),
            jax.lax.bitcast_convert_type(inst.astype(jnp.int32), jnp.uint32),
            jax.lax.bitcast_convert_type(rgb4, jnp.uint32),
        ],
        axis=0,
    )


def unpack_depth(packed: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(packed[0], jnp.float32)


def unpack_inst(packed: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(packed[1], jnp.int32)


def unpack_rgb(packed: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(packed[2], jnp.uint8)[..., :3]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FrameStore:
    packed: jnp.ndarray   # [3, F, H, W] uint32 (depth bits | inst | rgb bytes)
    t_wc: jnp.ndarray     # [F, 4, 4] float32 camera-to-world
    partfeat: jnp.ndarray | None  # [F, H//down, W//down, C] bfloat16, or None
    n_frames: jnp.ndarray  # [] int32 — frames written so far

    @property
    def rgb(self) -> jnp.ndarray:      # [F, H, W, 3] uint8
        return unpack_rgb(self.packed)

    @property
    def depth(self) -> jnp.ndarray:    # [F, H, W] float32
        return unpack_depth(self.packed)

    @property
    def inst(self) -> jnp.ndarray:     # [F, H, W] int32; -1 = unknown
        return unpack_inst(self.packed)

    @property
    def capacity(self) -> int:
        return self.packed.shape[1]

    @property
    def frame_shape(self) -> tuple[int, int]:
        return self.packed.shape[2], self.packed.shape[3]


def init_frame_store(
    capacity: int,
    height: int,
    width: int,
    part_feat_dim: int = 0,
    part_down: int = 5,
    part_dtype: str = "int8",
) -> FrameStore:
    pf = None
    if part_feat_dim > 0:
        pf = jnp.zeros(
            (capacity, height // part_down, width // part_down, part_feat_dim),
            dtype=jnp.int8 if part_dtype == "int8" else jnp.bfloat16,
        )
    return FrameStore(
        packed=pack_pixels(
            jnp.zeros((capacity, height, width), jnp.float32),
            jnp.full((capacity, height, width), -1, jnp.int32),
            jnp.zeros((capacity, height, width, 3), jnp.uint8),
        ),
        t_wc=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
        partfeat=pf,
        n_frames=jnp.asarray(0, dtype=jnp.int32),
    )


@partial(jax.jit, donate_argnums=(0,))
def _append(store: FrameStore, rgb, depth, inst, t_wc, partfeat, i) -> FrameStore:
    # donating the store makes the dynamic_update in-place on TPU — without
    # it XLA materializes a fresh copy of the whole packed pixel store
    # (~1 GB HBM write at capacity 256, 640x480) to append one ~4 MB frame.
    # Every caller reassigns over its store reference (append_frame contract).
    new = replace(
        store,
        packed=jax.lax.dynamic_update_index_in_dim(
            store.packed, pack_pixels(depth, inst, rgb), i, 1
        ),
        t_wc=jax.lax.dynamic_update_index_in_dim(store.t_wc, t_wc, i, 0),
        n_frames=jnp.maximum(store.n_frames, i + 1),
    )
    if store.partfeat is not None:
        new = replace(
            new,
            partfeat=jax.lax.dynamic_update_index_in_dim(
                store.partfeat, partfeat, i, 0
            ),
        )
    return new


def _encode_partfeat(partfeat: jnp.ndarray, dtype) -> jnp.ndarray:
    if dtype == jnp.int8:
        x = jnp.asarray(partfeat, jnp.float32)
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        x = x / jnp.maximum(n, 1e-12)
        return jnp.round(x * 127.0).astype(jnp.int8)
    return jnp.asarray(partfeat).astype(dtype)


def append_frame(
    store: FrameStore, rgb, depth, inst, t_wc, partfeat=None,
    at: int | None = None,
) -> tuple[FrameStore, int]:
    """Append one frame; returns (new store, frame index). Host-called once
    per frame — the scatter itself runs on device.

    ``at`` overwrites an existing store slot instead of appending — the
    eviction path: when the store is full, SceneMapper recycles a slot no
    keyframe ring references (the reference's analog is its fixed 20-slot
    per-object buffers with random pruning, vmap.py:187-257; here frames
    are stored once so eviction is a shared-slot remap)."""
    if at is None:
        idx = int(store.n_frames)
        if idx >= store.capacity:
            raise ValueError(
                f"frame store full ({store.capacity}); raise capacity or "
                "pass at=<recyclable slot> (see SceneMapper eviction)"
            )
    else:
        idx = int(at)
        if not 0 <= idx < store.capacity:
            raise ValueError(f"at={idx} outside store capacity {store.capacity}")
    rgb = jnp.asarray(rgb, dtype=jnp.uint8)
    depth = jnp.asarray(depth, dtype=jnp.float32)
    inst = jnp.asarray(inst, dtype=jnp.int32)
    t_wc = jnp.asarray(t_wc, dtype=jnp.float32)
    if store.partfeat is not None:
        if partfeat is None:
            partfeat = jnp.zeros(
                store.partfeat.shape[1:], dtype=store.partfeat.dtype
            )
        else:
            partfeat = _encode_partfeat(partfeat, store.partfeat.dtype)
    return _append(
        store, rgb, depth, inst, t_wc, partfeat, jnp.asarray(idx, jnp.int32)
    ), idx
