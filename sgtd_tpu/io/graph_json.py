"""Reference-compatible semantic-graph JSON serialization.

Round-trips the reference's per-scan Graph JSON files
(``Graph::toJSON``/``fromJSON``, src/sgtd/include/Semantic_Graph.hpp:79-157):
keys ``nodes`` (int list), ``centers`` ([[x,y,z], ...]), ``poses`` (flat 12+
floats, row-major 3x4), plus optional ``edges``/``weights``/``volumes``/
``densitys`` (written empty by the reference's shipped builder since its
Graph constructor only carries nodes/centers/poses — get_json.cpp:332).

This lets the framework consume maps produced by the reference tooling and
vice versa.
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

from sgtd_tpu.config import SGTDConfig
from sgtd_tpu.graph.types import SemanticGraph, make_graph


def pose_row_to_matrix(poses: List[float]) -> np.ndarray:
    """Flat row-major 3x4 (or longer) pose row -> 4x4 matrix
    (layout per Semantic_Graph.hpp:496-505)."""
    p = np.asarray(poses, dtype=np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, :4] = p[0:4]
    T[1, :4] = p[4:8]
    T[2, :4] = p[8:12]
    return T


def matrix_to_pose_row(T: np.ndarray) -> List[float]:
    T = np.asarray(T, dtype=np.float32)
    return [float(x) for x in T[:3, :4].reshape(-1)]


def read_graph_json(path: str, config: SGTDConfig) -> SemanticGraph:
    with open(path) as f:
        j = json.load(f)
    nodes = np.asarray(j["nodes"], dtype=np.int32)
    centers = np.asarray(j["centers"], dtype=np.float32).reshape(-1, 3)
    pose = pose_row_to_matrix(j["poses"])
    density = None
    if j.get("densitys"):
        density = np.asarray(j["densitys"], dtype=np.float32)
    return make_graph(centers, nodes, pose, config.caps.max_nodes, density)


def write_graph_json(path: str, graph: SemanticGraph) -> None:
    mask = np.asarray(graph.mask)
    j = {
        "nodes": [int(x) for x in np.asarray(graph.labels)[mask]],
        "edges": [],
        "weights": [],
        "centers": [
            [float(v) for v in row] for row in np.asarray(graph.centers)[mask]
        ],
        "poses": matrix_to_pose_row(np.asarray(graph.pose)),
        "volumes": [],
        "densitys": [float(x) for x in np.asarray(graph.density)[mask]],
    }
    with open(path, "w") as f:
        json.dump(j, f)


def read_graph_dir(directory: str, config: SGTDConfig) -> List[SemanticGraph]:
    """Load every .json graph in a directory, sorted by filename
    (the reference's map/query loading, semantic_graph_localization.cpp:379-403)."""
    files = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(".json")
    )
    return [read_graph_json(f, config) for f in files]
