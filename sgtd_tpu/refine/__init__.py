"""refine subpackage: GICP / VGICP / NDT registration + LSQ optimizers."""

from sgtd_tpu.refine.gicp import gicp_align, gicp_rerank, point_covariances
from sgtd_tpu.refine.lsq import gn_solve, lm_solve
from sgtd_tpu.refine.ndt import build_ndt_map, ndt_align
from sgtd_tpu.refine.vgicp import build_voxel_map, vgicp_align, vgicp_rerank

__all__ = [
    "gicp_align",
    "gicp_rerank",
    "point_covariances",
    "gn_solve",
    "lm_solve",
    "build_ndt_map",
    "ndt_align",
    "build_voxel_map",
    "vgicp_align",
    "vgicp_rerank",
]
