"""Pure-functional math core: positional encoding, field MLP, compositing,
sampling, and the multi-term training loss. Everything here is stateless,
shape-static, and jit/vmap/shard_map-friendly."""

from openobj_tpu.ops import embedding, losses, mlp, rendering, sampling  # noqa: F401
