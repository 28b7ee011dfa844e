"""openobj_tpu — a TPU-native, open-vocabulary object-level neural-field mapping
framework.

Re-designed from scratch for JAX/XLA/Pallas with the capabilities of the
OpenObj reference system (RA-L 2024, arXiv 2406.08009): given a posed RGB-D
sequence, segment + associate object instances across frames, train one tiny
occupancy/color/CLIP-feature NeRF per object (all objects batched as one MXU
computation over a stacked leading object axis), distill part-level CLIP
features, and serve open-vocabulary queries over the resulting object maps.

Design stance (see SURVEY.md §7):
  * objects are a tensor axis (preallocated slots + active mask), never
    Python objects in the hot path;
  * fixed shapes everywhere — per-frame training is a single jitted call
    (sampling + lax.scan over optimizer steps);
  * scale-out via jax.sharding Mesh (object axis + ray data axis), not
    process-level hacks;
  * hot per-ray path available as a fused Pallas kernel.
"""

__version__ = "0.1.0"

from openobj_tpu import ops  # noqa: F401
