"""Neural field models with a stacked leading object axis."""

from openobj_tpu.models import object_field  # noqa: F401
