"""Descriptor subpackage."""
from sgtd_tpu.desc.triangles import Descriptors, build_descriptors  # noqa: F401
from sgtd_tpu.desc import keys  # noqa: F401
