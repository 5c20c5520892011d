"""FEC euclidean clustering vs scipy connected components.

Reference semantics (src/sgtd/src/FEC.h:34-140): clusters = connected
components of the tolerance-radius graph, then a min-size filter. The
tensor implementation uses a k-bounded neighbour graph (the reference
caps radius queries at max_n too); tests use well-separated blobs where
both definitions coincide.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.cluster.hierarchy import fcluster, linkage

from sgtd_tpu.cluster.fec import fec_cluster


def _blobs(rng, centers, per, spread=0.3):
    pts = np.concatenate(
        [c + rng.normal(0, spread, (per, 3)) for c in centers]
    ).astype(np.float32)
    return pts


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_separated_blobs(rng):
    centers = np.array([[0, 0, 0], [20, 0, 0], [0, 25, 0], [15, 15, 5]])
    pts = _blobs(rng, centers, 60)
    n = 256
    cloud = np.zeros((n, 3), np.float32)
    m = np.zeros(n, bool)
    cloud[: len(pts)] = pts
    m[: len(pts)] = True
    res = fec_cluster(jnp.asarray(cloud), jnp.asarray(m), 2.0, 10)
    labels = np.asarray(res.labels)
    assert labels[~m].max(initial=-1) == -1
    # Exactly 4 clusters of 60.
    found = labels[m]
    assert set(found.tolist()) == {0, 1, 2, 3}
    assert np.all(np.sort(np.asarray(res.counts))[-4:] == 60)
    # Points of one blob share one label.
    for b in range(4):
        blob_labels = found[b * 60 : (b + 1) * 60]
        assert len(set(blob_labels.tolist())) == 1


def test_min_size_filter(rng):
    centers = np.array([[0, 0, 0], [30, 0, 0]])
    pts = np.concatenate(
        [_blobs(rng, centers[:1], 50), _blobs(rng, centers[1:], 5)]
    )
    n = 64
    cloud = np.zeros((n, 3), np.float32)
    m = np.zeros(n, bool)
    cloud[: len(pts)] = pts
    m[: len(pts)] = True
    res = fec_cluster(jnp.asarray(cloud), jnp.asarray(m), 2.0, 10)
    labels = np.asarray(res.labels)
    assert set(labels[m][:50].tolist()) == {0}
    assert set(labels[m][50:].tolist()) == {-1}  # small blob filtered


def test_matches_single_linkage(rng):
    # Random points: components under the radius graph == single-linkage
    # dendrogram cut at the tolerance (when degree cap k is not binding).
    pts = rng.uniform(0, 30, (120, 3)).astype(np.float32)
    tol = 3.0
    n = 128
    cloud = np.zeros((n, 3), np.float32)
    m = np.zeros(n, bool)
    cloud[:120] = pts
    m[:120] = True
    res = fec_cluster(
        jnp.asarray(cloud), jnp.asarray(m), tol, 1, max_n=64
    )
    ours = np.asarray(res.labels)[:120]
    ref = fcluster(linkage(pts, method="single"), tol, criterion="distance")
    # Same partition (label values differ).
    import itertools

    for i, j in itertools.combinations(range(0, 120, 7), 2):
        assert (ours[i] == ours[j]) == (ref[i] == ref[j]), (i, j)


def test_empty_mask():
    n = 64
    res = fec_cluster(
        jnp.zeros((n, 3), jnp.float32), jnp.zeros(n, bool), 1.0, 5
    )
    assert np.all(np.asarray(res.labels) == -1)
    assert np.all(np.asarray(res.counts) == 0)


def test_max_n_binds_on_dense_elongated_cluster(rng):
    """Documents the bounded-degree approximation (ADVICE r3): in a dense
    elongated cluster whose clumps each hold more than max_n points, all of
    a point's max_n nearest neighbours can lie inside its own clump, so the
    k-bounded graph loses the bridging radius edges and the component
    splits. Raising max_n to cover the local density recovers the exact
    radius-graph component (scipy single-linkage agreement)."""
    # 8 dense clumps of 32 points (sigma 0.05 m) spaced 0.5 m along x;
    # tolerance 0.6 m connects adjacent clumps in the exact radius graph.
    centers = np.array([[0.5 * i, 0.0, 0.0] for i in range(8)])
    pts = _blobs(rng, centers, 32, spread=0.05)
    n = 256
    cloud = np.zeros((n, 3), np.float32)
    m = np.zeros(n, bool)
    cloud[: len(pts)] = pts
    m[: len(pts)] = True

    # max_n=16 < clump size: the neighbour cap binds and the cluster splits.
    res16 = fec_cluster(jnp.asarray(cloud), jnp.asarray(m), 0.6, 10, max_n=16)
    n16 = int((np.asarray(res16.counts) > 0).sum())
    assert n16 > 1

    # max_n=64 > clump size: one component, matching the radius graph.
    res64 = fec_cluster(jnp.asarray(cloud), jnp.asarray(m), 0.6, 10, max_n=64)
    labels = np.asarray(res64.labels)[m]
    assert (labels == labels[0]).all() and labels[0] >= 0
