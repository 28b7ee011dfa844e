"""Dataset loaders and host-side preprocessing."""

from openobj_tpu.data import synthetic, transforms  # noqa: F401
