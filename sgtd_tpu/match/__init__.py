"""Matching subpackage."""
from sgtd_tpu.match.search import CandidateSet, candidate_search  # noqa: F401
from sgtd_tpu.match.verify import VerifyResult, triangle_solver, verify_candidates  # noqa: F401
from sgtd_tpu.match.pipeline import LocalizationResult, localize, localize_batch, localize_descriptors  # noqa: F401
