"""Geometry (Lie group) subpackage."""
from sgtd_tpu.geom import se3  # noqa: F401
