"""Perception front-end + cross-frame instance association:
mask -> 3D evidence projection, multi-cue similarity graph, Louvain
clustering, global merge, artifact IO, pluggable encoders, part-level
feature maps."""

from openobj_tpu.perception import (  # noqa: F401
    encoders, graph, merge, partfeat, pipeline, projection, similarity,
)
