"""CPU-side utilities: geometry, profiling."""

from openobj_tpu.utils import geometry  # noqa: F401
