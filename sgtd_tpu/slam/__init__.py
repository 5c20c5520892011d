"""SLAM orchestration subpackage."""
from sgtd_tpu.slam.multisession import (  # noqa: F401
    SessionResult,
    localize_and_optimize_session,
)
