"""Trajectory plotting — the analog of the reference's final matplotlibcpp
scatter (semantic_graph_localization.cpp:986-997): map keyframes, query GT,
successful and failed estimates."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def plot_localization(
    out_path: str,
    map_poses: np.ndarray,
    query_gt: np.ndarray,
    est_poses: np.ndarray,
    success: np.ndarray,
    title: str = "sgtd_tpu localization",
) -> Optional[str]:
    """Write a top-down scatter PNG. Returns the path, or None when
    matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None

    fig, ax = plt.subplots(figsize=(8, 8))
    mp = np.asarray(map_poses)[:, :2, 3]
    ax.scatter(mp[:, 0], mp[:, 1], s=10, c="red", label="map keyframes")
    qg = np.asarray(query_gt)[:, :2, 3]
    ax.scatter(qg[:, 0], qg[:, 1], s=10, c="blue", label="query GT")
    est = np.asarray(est_poses)[:, :2, 3]
    succ = np.asarray(success).astype(bool)
    if succ.any():
        ax.scatter(est[succ, 0], est[succ, 1], s=20, c="green", label="estimate (ok)")
    if (~succ).any():
        ax.scatter(est[~succ, 0], est[~succ, 1], s=20, c="orange", label="estimate (fail)")
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title(title)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path
