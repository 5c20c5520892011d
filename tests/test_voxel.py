"""Voxel-grid centroid downsample (ApproximateVoxelGrid analog)."""

import numpy as np
import jax.numpy as jnp

from sgtd_tpu.ops.voxel import (
    load_query_cloud,
    voxel_downsample,
    voxel_downsample_np,
)


def test_voxel_downsample_np_centroids(rng):
    pts = rng.uniform(-10, 10, (2000, 3)).astype(np.float32)
    out = voxel_downsample_np(pts, 2.0)
    # One centroid per occupied voxel.
    keys = set(map(tuple, np.floor(pts / 2.0).astype(int)))
    assert out.shape[0] == len(keys)
    # Each centroid is the mean of its voxel's points.
    c0 = np.floor(out[0] / 2.0).astype(int)
    sel = np.all(np.floor(pts / 2.0).astype(int) == c0, axis=1)
    np.testing.assert_allclose(out[0], pts[sel].mean(axis=0), atol=1e-5)


def test_voxel_downsample_jit_matches_np(rng):
    pts = rng.uniform(-10, 10, (1024, 3)).astype(np.float32)
    mask = np.ones(1024, bool)
    mask[1000:] = False
    ref = voxel_downsample_np(pts[mask], 1.5)
    out, omask = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 1.5, 1024)
    got = np.asarray(out)[np.asarray(omask)]
    assert got.shape == ref.shape
    # Same centroid sets (order differs: key-sorted vs np.unique-sorted —
    # actually both are key-sorted; compare directly).
    np.testing.assert_allclose(np.sort(got, axis=0), np.sort(ref, axis=0), atol=1e-4)


def test_load_query_cloud(rng):
    pts = np.concatenate([
        np.zeros((10, 3), np.float32),  # near-origin invalid points
        rng.uniform(-30, 30, (5000, 3)).astype(np.float32),
    ])
    cloud, mask = load_query_cloud(pts, 3.0, 1024)
    assert cloud.shape == (1024, 3)
    n = int(mask.sum())
    assert 0 < n <= 1024
    # No near-origin survivors.
    assert np.all(np.sum(cloud[mask] ** 2, axis=1) >= 1e-3)
