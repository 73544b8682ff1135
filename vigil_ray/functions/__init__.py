"""Shared scalar/eval utilities (reference ``src/utils.py``)."""

from vigil_ray.functions.booleans import TRUE_VALUES, normalize_boolean

__all__ = ["TRUE_VALUES", "normalize_boolean"]
