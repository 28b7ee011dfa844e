"""Map export + headless open-vocabulary query serving."""

from openobj_tpu.viz import export, query  # noqa: F401
