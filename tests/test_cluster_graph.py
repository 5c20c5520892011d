"""DCVC clustering and scan->graph building on synthetic labeled clouds."""

import numpy as np
import jax.numpy as jnp
import pytest

from sgtd_tpu.cluster.dcvc import dcvc_cluster
from sgtd_tpu.config import DcvcConfig
from sgtd_tpu.graph.build import build_graph


def _pad_points(pts, n_max):
    pts = np.asarray(pts, np.float32)
    mask = np.zeros(n_max, bool)
    mask[: len(pts)] = True
    out = np.zeros((n_max, 3), np.float32)
    out[: len(pts)] = pts
    return jnp.asarray(out), jnp.asarray(mask)


def _blob(rng, center, n, spread=0.3):
    return center + rng.normal(0, spread, (n, 3))


@pytest.fixture(scope="module")
def dcvc_cfg():
    return DcvcConfig(max_points=4096, max_voxels=4096, max_clusters=32)


def test_dcvc_separates_blobs(rng, dcvc_cfg):
    # Two dense blobs far apart -> two clusters.
    b1 = _blob(rng, np.array([10.0, 0.0, 0.0]), 200)
    b2 = _blob(rng, np.array([-10.0, 5.0, 0.0]), 150)
    pts, mask = _pad_points(np.concatenate([b1, b2]), 1024)
    res = dcvc_cluster(pts, mask, 50, dcvc_cfg)
    n_valid = int(np.sum(np.asarray(res.valid)))
    assert n_valid == 2
    cents = np.asarray(res.centroids)[np.asarray(res.valid)]
    cents = cents[np.argsort(cents[:, 0])]
    np.testing.assert_allclose(cents[0], [-10, 5, 0], atol=0.3)
    np.testing.assert_allclose(cents[1], [10, 0, 0], atol=0.3)


def test_dcvc_min_seg_filter(rng, dcvc_cfg):
    big = _blob(rng, np.array([10.0, 0.0, 0.0]), 200)
    small = _blob(rng, np.array([-10.0, 5.0, 1.0]), 20)
    pts, mask = _pad_points(np.concatenate([big, small]), 1024)
    res = dcvc_cluster(pts, mask, 50, dcvc_cfg)
    assert int(np.sum(np.asarray(res.valid))) == 1
    # Lowering min_seg keeps both.
    res2 = dcvc_cluster(pts, mask, 5, dcvc_cfg)
    assert int(np.sum(np.asarray(res2.valid))) == 2


def test_dcvc_range_gates(rng, dcvc_cfg):
    # Points beyond 120 m and closer than 0.5 m are dropped
    # (ref cluster_manager.hpp:198).
    far = _blob(rng, np.array([150.0, 0.0, 0.0]), 100, spread=0.1)
    near = rng.normal(0, 0.1, (100, 3))
    pts, mask = _pad_points(np.concatenate([far, near]), 512)
    res = dcvc_cluster(pts, mask, 10, dcvc_cfg)
    assert int(np.sum(np.asarray(res.valid))) == 0


def test_dcvc_azimuth_wraparound(rng, dcvc_cfg):
    # One blob straddling the 0/360 azimuth seam must stay a single cluster.
    n = 150
    ang = np.deg2rad(rng.uniform(-2, 2, n))
    r = rng.uniform(19.5, 20.5, n)
    pts3 = np.column_stack([r * np.cos(ang), r * np.sin(ang), rng.normal(0, 0.2, n)])
    pts, mask = _pad_points(pts3, 512)
    res = dcvc_cluster(pts, mask, 50, dcvc_cfg)
    assert int(np.sum(np.asarray(res.valid))) == 1


def test_build_graph_class_routing(rng, small_config):
    """Full scan -> graph: whole-kept sidewalk, DCVC poles, dropped classes."""
    dcvc_cfg = DcvcConfig(max_points=8192, max_voxels=8192, max_clusters=32)
    clouds, sems, insts = [], [], []

    # class 10 (sidewalk): scattered ground points -> one whole instance.
    ground = np.column_stack(
        [rng.uniform(-30, 30, 400), rng.uniform(-30, 30, 400), rng.normal(0, 0.05, 400)]
    )
    clouds.append(ground); sems.append(np.full(400, 10)); insts.append(np.zeros(400))

    # class 17 (pole): two tight vertical blobs, min_seg=5.
    for c in ([12.0, 3.0, 1.0], [-8.0, -15.0, 1.0]):
        p = _blob(rng, np.array(c), 30, spread=0.15)
        clouds.append(p); sems.append(np.full(30, 17)); insts.append(np.zeros(30))

    # class 0 (car, dropped): a blob that must NOT appear.
    p = _blob(rng, np.array([5.0, 5.0, 0.5]), 100, spread=0.4)
    clouds.append(p); sems.append(np.full(100, 0)); insts.append(np.zeros(100))

    # class 12 (building) with GT instance ids: two instances, one too small.
    b1 = _blob(rng, np.array([20.0, -10.0, 3.0]), 60, spread=1.0)
    b2 = _blob(rng, np.array([-25.0, 8.0, 3.0]), 10, spread=1.0)  # <= 20 pts
    clouds += [b1, b2]
    sems += [np.full(60, 12), np.full(10, 12)]
    insts += [np.full(60, 7), np.full(10, 9)]

    pts = np.concatenate(clouds).astype(np.float32)
    sem = np.concatenate(sems).astype(np.int32)
    inst = np.concatenate(insts).astype(np.int32)
    n_max = 2048
    pad = n_max - len(pts)
    mask = np.zeros(n_max, bool); mask[: len(pts)] = True
    pts = np.pad(pts, ((0, pad), (0, 0)))
    sem = np.pad(sem, (0, pad)); inst = np.pad(inst, (0, pad))

    g = build_graph(
        jnp.asarray(pts), jnp.asarray(sem), jnp.asarray(inst), jnp.asarray(mask),
        np.eye(4, dtype=np.float32), small_config.caps, dcvc_cfg,
    )
    labels = np.asarray(g.labels)[np.asarray(g.mask)]
    centers = np.asarray(g.centers)[np.asarray(g.mask)]
    # sidewalk -> node 3 (one), poles -> node 10 (two), building -> node 5 (one).
    assert np.sum(labels == 3) == 1
    assert np.sum(labels == 10) == 2
    assert np.sum(labels == 5) == 1
    # no car nodes (class 0 has no node mapping).
    assert len(labels) == 4
    b_center = centers[labels == 5][0]
    np.testing.assert_allclose(b_center, [20.0, -10.0, 3.0], atol=0.5)


def test_wild_routing(rng, small_config):
    """Wild-Places profile: dirt kept whole, tree-foliage dropped,
    identity node labels."""
    from sgtd_tpu.graph.build import WILD_ROUTING
    from sgtd_tpu.graph.build import build_graph

    dcvc_cfg = DcvcConfig(max_points=2048, max_voxels=2048, max_clusters=16)
    clouds, sems = [], []
    # dirt (1): scattered ground -> one whole node labelled 1.
    g = np.column_stack(
        [rng.uniform(-20, 20, 300), rng.uniform(-20, 20, 300), rng.normal(0, 0.05, 300)]
    )
    clouds.append(g); sems.append(np.full(300, 1))
    # tree-trunk (13 raw -> 12 remapped): tight blob, min_seg 100.
    t = np.array([8.0, 3.0, 1.0]) + rng.normal(0, 0.2, (150, 3))
    clouds.append(t); sems.append(np.full(150, 12))
    # tree-foliage (11): dropped.
    f = np.array([-6.0, 5.0, 4.0]) + rng.normal(0, 0.5, (200, 3))
    clouds.append(f); sems.append(np.full(200, 11))

    pts = np.concatenate(clouds).astype(np.float32)
    sem = np.concatenate(sems).astype(np.int32)
    n_max = 2048
    pad = n_max - len(pts)
    mask = np.zeros(n_max, bool); mask[: len(pts)] = True
    graph = build_graph(
        jnp.asarray(np.pad(pts, ((0, pad), (0, 0)))),
        jnp.asarray(np.pad(sem, (0, pad))),
        jnp.asarray(np.zeros(n_max, np.int32)),
        jnp.asarray(mask),
        np.eye(4, dtype=np.float32),
        small_config.caps, dcvc_cfg, WILD_ROUTING,
    )
    labels = np.asarray(graph.labels)[np.asarray(graph.mask)]
    assert np.sum(labels == 1) == 1   # dirt whole
    assert np.sum(labels == 12) == 1  # trunk cluster
    assert np.sum(labels == 11) == 0  # foliage dropped
