"""Triangle descriptor construction: golden values, invariances, dedup."""

import numpy as np
import jax.numpy as jnp

from sgtd_tpu.config import CapacityConfig, DescriptorConfig
from sgtd_tpu.desc.keys import db_keys, pack_label_code, probe_keys, validate_key_space
from sgtd_tpu.desc.triangles import build_descriptors
from sgtd_tpu.graph.types import make_graph


def _graph_from(centers, labels, max_nodes=64):
    return make_graph(
        np.asarray(centers, np.float32),
        np.asarray(labels, np.int32),
        np.eye(4, dtype=np.float32),
        max_nodes,
    )


def _build(centers, labels, cfg=None, caps=None):
    cfg = cfg or DescriptorConfig()
    caps = caps or CapacityConfig(max_nodes=64, max_descriptors=256)
    g = _graph_from(centers, labels, caps.max_nodes)
    return build_descriptors(g, cfg, caps)


def test_single_triangle_golden():
    # 3-4-5 right triangle in the xy plane.
    centers = [[0, 0, 0], [3, 0, 0], [0, 4, 0]]
    labels = [5, 7, 9]
    d = _build(centers, labels)
    n = int(d.count)
    assert n == 1
    sides = np.asarray(d.sides)[0]
    np.testing.assert_allclose(sides, [3.0, 4.0, 5.0], atol=1e-5)
    # Vertex A is opposite the longest side (5 = hypotenuse) -> the origin.
    verts = np.asarray(d.vertices)[0]
    np.testing.assert_allclose(verts[0], [0, 0, 0], atol=1e-5)
    # B opposite the middle side (4) -> (3,0,0); C opposite shortest -> (0,4,0)
    np.testing.assert_allclose(verts[1], [3, 0, 0], atol=1e-5)
    np.testing.assert_allclose(verts[2], [0, 4, 0], atol=1e-5)
    labels_abc = np.asarray(d.labels)[0]
    np.testing.assert_array_equal(labels_abc, [5, 7, 9])


def test_side_length_gates():
    # Too small (sides < min_len) and too large (side > max_len) triangles.
    small = [[0, 0, 0], [0.1, 0, 0], [0, 0.1, 0]]
    d = _build(small, [5, 5, 5])
    assert int(d.count) == 0
    big = [[0, 0, 0], [60, 0, 0], [0, 60, 0]]
    d = _build(big, [5, 5, 5])
    assert int(d.count) == 0


def test_se3_invariance(rng):
    """Descriptors (sides, angles, labels) are invariant under rigid motion."""
    n = 20
    centers = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    labels = rng.integers(3, 13, n)
    d0 = _build(centers, labels)

    from sgtd_tpu.geom import se3

    T = np.asarray(
        se3.se3_exp(jnp.asarray([0.3, -4.0, 1.0, 0.2, -0.1, 0.9], jnp.float32))
    )
    moved = centers @ T[:3, :3].T + T[:3, 3]
    d1 = _build(moved, labels)

    assert int(d0.count) == int(d1.count)
    m0 = np.asarray(d0.mask)
    s0, s1 = np.asarray(d0.sides)[m0], np.asarray(d1.sides)[np.asarray(d1.mask)]
    # Same multiset of side triples (order may differ after motion).
    np.testing.assert_allclose(
        np.sort(s0.round(3), axis=0), np.sort(s1.round(3), axis=0), atol=5e-3
    )
    l0 = np.asarray(d0.labels)[m0]
    l1 = np.asarray(d1.labels)[np.asarray(d1.mask)]
    assert sorted(map(tuple, l0)) == sorted(map(tuple, l1))


def test_dedup_is_first_occurrence(rng):
    """Duplicate side-triples collapse to one descriptor."""
    # Two identical triangles far apart -> same quantised sides, dedup to 1
    # (plus any cross triangles are filtered by max_len when far enough).
    t1 = np.array([[0, 0, 0], [3, 0, 0], [0, 4, 0]], np.float32)
    t2 = t1 + np.array([200, 0, 0], np.float32)
    centers = np.concatenate([t1, t2])
    d = _build(centers, [5, 7, 9, 5, 7, 9])
    assert int(d.count) == 1
    # The kept triangle is the first in enumeration order (node ids 0..2).
    kept_nodes = np.sort(np.asarray(d.node_ids)[0])
    np.testing.assert_array_equal(kept_nodes, [0, 1, 2])


def test_knn_limits_triangles(rng):
    """Descriptors only use each node's k nearest neighbours."""
    cfg = DescriptorConfig(near_num=4)
    n = 12
    centers = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    labels = rng.integers(3, 13, n)
    d = _build(centers, labels, cfg=cfg)
    # near_num=4 -> per node C(3,2)=3 candidate triangles -> <= 36 pre-dedup.
    assert int(d.count) <= 36


def test_keys_roundtrip_and_probe_contains_db_key(rng):
    cfg = DescriptorConfig()
    validate_key_space(cfg)
    n = 15
    centers = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    labels = rng.integers(3, 13, n)
    d = _build(centers, labels, cfg=cfg)
    m = np.asarray(d.mask)
    k_db = np.asarray(db_keys(d.sides, d.labels, cfg))[m]
    k_probe, gate = probe_keys(d.sides, d.labels, cfg)
    k_probe = np.asarray(k_probe)[m]
    gate = np.asarray(gate)[m]
    # A descriptor probing the DB always reaches its own key within the 27
    # neighbours (round(side) is trunc(side) or trunc(side)+1).
    for i in range(k_db.shape[0]):
        assert (k_probe[i] == k_db[i]).any(), f"descriptor {i}: key not probed"
    # The 1.5-cell gate can legitimately exclude the own bucket only when the
    # distance to its voxel centre exceeds 1.5 — the reference has the same
    # property (STDesc.cpp:366-369); verify we reproduce it exactly.
    sides = np.asarray(d.sides)[m]
    for i in range(k_db.shape[0]):
        voxel = np.floor(sides[i] + 0.5)
        expect = np.linalg.norm(sides[i] - (voxel + 0.5)) < 1.5
        got = ((k_probe[i] == k_db[i]) & gate[i]).any()
        assert got == expect


def test_pack_label_code_injective():
    codes = set()
    for a in range(13):
        for b in range(13):
            for c in range(13):
                codes.add(int(pack_label_code(jnp.asarray([a, b, c]))))
    assert len(codes) == 13**3
