"""Device-mesh scale-out (jax.sharding / GSPMD)."""

from openobj_tpu.parallel import sharding  # noqa: F401
