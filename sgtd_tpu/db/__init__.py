"""Descriptor database subpackage."""
from sgtd_tpu.db.database import DescriptorDB, DBBuildReport, build_database, save_database, load_database  # noqa: F401
