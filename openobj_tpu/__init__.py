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


def __getattr__(name):
    """Lazy top-level API: openobj_tpu.SceneMapper, .Camera, .TrainConfig,
    .load_scene_config, .make_mapper without importing the whole stack at
    package-import time."""
    from importlib import import_module

    lazy = {
        "SceneMapper": ("openobj_tpu.core.scene", "SceneMapper"),
        "Camera": ("openobj_tpu.core.scene", "Camera"),
        "TrainConfig": ("openobj_tpu.core.trainer", "TrainConfig"),
        "load_scene_config": ("openobj_tpu.config", "load_scene_config"),
        "make_mapper": ("openobj_tpu.config", "make_mapper"),
        "GraphSegmenter": ("openobj_tpu.perception.segmentation",
                           "GraphSegmenter"),
        "OnlineInstanceTracker": ("openobj_tpu.perception.tracking",
                                  "OnlineInstanceTracker"),
        "import_torch_checkpoint": ("openobj_tpu.interop",
                                    "import_torch_checkpoint"),
        "export_torch_checkpoint": ("openobj_tpu.interop",
                                    "export_torch_checkpoint"),
        "associate": ("openobj_tpu.perception.pipeline", "associate"),
        "AssociationConfig": ("openobj_tpu.perception.pipeline",
                              "AssociationConfig"),
    }
    if name in lazy:
        mod, attr = lazy[name]
        return getattr(import_module(mod), attr)
    raise AttributeError(f"module 'openobj_tpu' has no attribute {name!r}")
