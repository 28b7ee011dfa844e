"""Scene runtime: device-resident frame store, host keyframe policy,
torch-semantics slot-aware AdamW, the single-program per-frame trainer, and
the SceneMapper orchestrator."""

from openobj_tpu.core import frame_store, optim, registry, scene, trainer  # noqa: F401
