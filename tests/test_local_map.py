"""Multi-frame local-map keyframe densification."""

import numpy as np
import pytest

from sgtd_tpu.config import CapacityConfig, DcvcConfig
from sgtd_tpu.graph.local_map import (
    build_local_map_graphs,
    merge_scans,
    neighbor_indices,
)


def _poses_line(n, spacing):
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * spacing
    return poses


def test_neighbor_indices():
    poses = _poses_line(10, 10.0)
    nb = neighbor_indices(poses, 5, 15.0)
    np.testing.assert_array_equal(nb, [4, 5, 6])


def test_merge_scans_transforms_into_center(rng):
    poses = _poses_line(3, 10.0)

    def load_scan(j):
        # One point at the sensor origin of each scan.
        return (
            np.zeros((1, 3), np.float32),
            np.full(1, 17, np.int32),
            np.zeros(1, np.int32),
        )

    pts, sem, inst, mask = merge_scans(load_scan, poses, 1, [0, 1, 2], 64)
    got = np.sort(pts[mask][:, 0])
    # Scan 0 origin lands at -10 in frame 1, scan 2 at +10.
    np.testing.assert_allclose(got, [-10.0, 0.0, 10.0], atol=1e-5)
    assert np.all(sem[mask] == 17)


def test_local_map_densifies_nodes(rng):
    """A pole seen only partially per scan becomes a valid cluster when
    neighbour scans merge."""
    caps = CapacityConfig(max_nodes=32)
    dcvc = DcvcConfig(max_points=2048, max_voxels=2048, max_clusters=16)
    poses = _poses_line(3, 5.0)
    pole_world = np.array([7.0, 3.0, 1.0])

    def load_scan(j):
        # Each scan sees only 3 points of the pole: below DCVC min_seg=5
        # alone, enough (9) when merged.
        T_inv = np.linalg.inv(poses[j])
        local = pole_world @ T_inv[:3, :3].T + T_inv[:3, 3]
        pts = (local + rng.normal(0, 0.05, (3, 3))).astype(np.float32)
        return pts, np.full(3, 17, np.int32), np.zeros(3, np.int32)

    # Single-scan graph: no node (3 < 5 points).
    single = build_local_map_graphs(
        load_scan, poses, radius_m=0.1, caps=caps, dcvc=dcvc, keyframe_ids=[1]
    )[0]
    assert int(np.sum(np.asarray(single.mask))) == 0

    dense = build_local_map_graphs(
        load_scan, poses, radius_m=15.0, caps=caps, dcvc=dcvc, keyframe_ids=[1]
    )[0]
    labels = np.asarray(dense.labels)[np.asarray(dense.mask)]
    assert len(labels) == 1 and labels[0] == 10  # pole node
    center = np.asarray(dense.centers)[np.asarray(dense.mask)][0]
    expect = pole_world - poses[1][:3, 3]
    np.testing.assert_allclose(center, expect, atol=0.2)
