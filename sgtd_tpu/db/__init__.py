"""Descriptor database subpackage."""
from sgtd_tpu.db.database import DescriptorDB, DBBuildReport, build_database, build_database_stacked, save_database, load_database, tuned_config  # noqa: F401
