"""Synthetic semantic-instance worlds for tests and benchmarks.

The reference ships no tests and benchmarks against private datasets
(SURVEY.md section 4/6), so the framework generates controlled synthetic
scenes with known ground truth: a world of labelled semantic instances
(pole/trunk/building/... class mix modelled on the MulRan node statistics),
a map trajectory with keyframes observing nearby instances, and revisit
queries with pose offsets, centroid noise, instance dropout, and label
corruption (the reference's ``label_deter_rate`` robustness knob,
src/sgtd/src/semantic_graph_localization.cpp:91-97).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from sgtd_tpu.config import SGTDConfig
from sgtd_tpu.graph.types import SemanticGraph, make_graph

# Remapped node labels are 3..12 (ref get_json.cpp:287-293). Weights roughly
# follow urban instance frequency: buildings/poles/trunks dominate.
NODE_LABELS = np.arange(3, 13)
LABEL_WEIGHTS = np.array([0.08, 0.05, 0.30, 0.08, 0.02, 0.12, 0.05, 0.20, 0.08, 0.02])


@dataclasses.dataclass
class SyntheticWorld:
    instance_xyz: np.ndarray  # (M, 3)
    instance_label: np.ndarray  # (M,)
    map_poses: np.ndarray  # (F, 4, 4)
    query_poses: np.ndarray  # (Q, 4, 4)


def _pose_2d(x: float, y: float, yaw: float, z: float = 0.0) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)
    T[:3, 3] = (x, y, z)
    return T


def make_world(
    rng: np.random.Generator,
    extent_m: float = 400.0,
    instances_per_100m2: float = 1.2,
    num_map_frames: int = 50,
    num_queries: int = 20,
    keyframe_spacing_m: float = 8.0,
    query_offset_m: float = 3.0,
) -> SyntheticWorld:
    """A looping trajectory through a field of labelled instances."""
    area = extent_m * extent_m
    m = int(area / 100.0 * instances_per_100m2)
    xyz = np.column_stack(
        [
            rng.uniform(-extent_m / 2, extent_m / 2, m),
            rng.uniform(-extent_m / 2, extent_m / 2, m),
            rng.uniform(0.0, 4.0, m),
        ]
    ).astype(np.float32)
    labels = rng.choice(NODE_LABELS, size=m, p=LABEL_WEIGHTS / LABEL_WEIGHTS.sum())

    # Map trajectory: a loop of radius ~extent/3.
    r = extent_m / 3.0
    thetas = np.linspace(0, 2 * np.pi, num_map_frames, endpoint=False)
    # Scale spacing: circumference / frames should be ~keyframe_spacing.
    map_poses = np.stack(
        [
            _pose_2d(r * np.cos(t), r * np.sin(t), t + np.pi / 2)
            for t in thetas
        ]
    )

    # Queries revisit random points on the loop with lateral/heading offsets.
    q_thetas = rng.uniform(0, 2 * np.pi, num_queries)
    query_poses = np.stack(
        [
            _pose_2d(
                r * np.cos(t) + rng.normal(0, query_offset_m),
                r * np.sin(t) + rng.normal(0, query_offset_m),
                t + np.pi / 2 + rng.normal(0, 0.15),
            )
            for t in q_thetas
        ]
    )
    return SyntheticWorld(xyz, labels, map_poses, query_poses)


def observe(
    world: SyntheticWorld,
    pose: np.ndarray,
    config: SGTDConfig,
    rng: np.random.Generator,
    view_radius_m: float = 50.0,
    center_noise_m: float = 0.05,
    dropout: float = 0.0,
    label_corrupt_rate: float = 0.0,
) -> SemanticGraph:
    """Render the semantic graph a sensor at ``pose`` would produce."""
    Tinv = np.linalg.inv(pose)
    local = (world.instance_xyz @ Tinv[:3, :3].T) + Tinv[:3, 3]
    dist = np.linalg.norm(local[:, :2], axis=1)
    vis = dist < view_radius_m
    if dropout > 0:
        vis &= rng.uniform(size=vis.shape) > dropout
    centers = local[vis] + rng.normal(0, center_noise_m, (int(vis.sum()), 3))
    labels = world.instance_label[vis].copy()
    if label_corrupt_rate > 0:
        bad = rng.uniform(size=labels.shape) < label_corrupt_rate
        labels[bad] = rng.choice(NODE_LABELS, size=int(bad.sum()))
    return make_graph(
        centers.astype(np.float32),
        labels,
        pose,
        config.caps.max_nodes,
    )


def make_map_and_queries(
    config: SGTDConfig,
    seed: int = 0,
    num_map_frames: int = 50,
    num_queries: int = 20,
    **obs_kw,
) -> Tuple[List[SemanticGraph], List[SemanticGraph], SyntheticWorld]:
    rng = np.random.default_rng(seed)
    world = make_world(
        rng, num_map_frames=num_map_frames, num_queries=num_queries
    )
    map_graphs = [
        observe(world, p, config, rng) for p in world.map_poses
    ]
    query_graphs = [
        observe(world, p, config, rng, **obs_kw) for p in world.query_poses
    ]
    return map_graphs, query_graphs, world


def render_cloud(
    world: SyntheticWorld,
    pose: np.ndarray,
    rng: np.random.Generator,
    max_points: int = 4096,
    points_per_instance: int = 60,
    view_radius_m: float = 50.0,
    noise_m: float = 0.03,
):
    """Render a structured point cloud (surface blobs around instances +
    ground points) in the sensor frame — raw-cloud input for GICP tests.

    Returns (points (max_points, 3) float32, mask (max_points,) bool).
    """
    Tinv = np.linalg.inv(pose)
    local = (world.instance_xyz @ Tinv[:3, :3].T) + Tinv[:3, 3]
    vis = np.linalg.norm(local[:, :2], axis=1) < view_radius_m
    pts = []
    for c in local[vis]:
        # Vertical-structure blob: instances read as poles/walls.
        k = points_per_instance
        p = np.column_stack(
            [
                c[0] + rng.normal(0, 0.15, k),
                c[1] + rng.normal(0, 0.15, k),
                rng.uniform(0, max(c[2] * 2, 1.0), k),
            ]
        )
        pts.append(p)
    n_ground = max_points // 3
    pts.append(
        np.column_stack(
            [
                rng.uniform(-view_radius_m, view_radius_m, n_ground),
                rng.uniform(-view_radius_m, view_radius_m, n_ground),
                rng.normal(0, noise_m, n_ground),
            ]
        )
    )
    cloud = np.concatenate(pts).astype(np.float32)
    cloud += rng.normal(0, noise_m, cloud.shape)
    if len(cloud) > max_points:
        stride = -(-len(cloud) // max_points)
        cloud = cloud[::stride]
    out = np.zeros((max_points, 3), np.float32)
    mask = np.zeros(max_points, bool)
    out[: len(cloud)] = cloud
    mask[: len(cloud)] = True
    return out, mask
