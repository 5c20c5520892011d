"""Pose-graph optimization: drift correction with loop closures."""

import pytest
import numpy as np
import jax.numpy as jnp

from sgtd_tpu.backend.pgo import PoseGraph, chain_with_loops, optimize_pose_graph
from sgtd_tpu.geom import se3


def _circle_poses(n, radius=30.0):
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    poses = []
    for t in th:
        c, s = np.cos(t + np.pi / 2), np.sin(t + np.pi / 2)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        T[:3, 3] = (radius * np.cos(t), radius * np.sin(t), 0)
        poses.append(T)
    return np.stack(poses)


def test_pgo_zero_residual_fixed_point(rng):
    gt = _circle_poses(16)
    pg = chain_with_loops(
        jnp.asarray(gt),
        jnp.asarray([0]), jnp.asarray([8]),
        jnp.asarray(np.linalg.inv(gt[0]) @ gt[8])[None],
        jnp.asarray([1.0]),
    )
    out = np.asarray(optimize_pose_graph(pg, iterations=3))
    for i in range(16):
        te, re = np.linalg.norm(out[i][:3, 3] - gt[i][:3, 3]), 0
        assert te < 1e-3


def test_pgo_corrects_drift(rng):
    n = 24
    gt = _circle_poses(n)
    # Drifted odometry: perturb each relative motion slightly.
    rels = [np.linalg.inv(gt[i]) @ gt[i + 1] for i in range(n - 1)]
    drift = np.asarray(
        se3.se3_exp(jnp.asarray([0.05, 0.02, 0.0, 0.0, 0.0, 0.01], jnp.float32))
    )
    odom = [gt[0]]
    for r in rels:
        odom.append(odom[-1] @ r @ drift)
    odom = np.stack(odom).astype(np.float32)
    # Drift accumulates.
    end_err_before = np.linalg.norm(odom[-1][:3, 3] - gt[-1][:3, 3])
    assert end_err_before > 1.0

    # Loop closures: to the first node and mid-loop, with GT relatives
    # (as produced by descriptor matching + verification).
    li = np.array([n - 1, n - 2, n // 2])
    lj = np.array([0, 0, 0])
    lt = np.stack([np.linalg.inv(gt[i]) @ gt[j] for i, j in zip(li, lj)])
    pg = chain_with_loops(
        jnp.asarray(odom),
        jnp.asarray(li), jnp.asarray(lj),
        jnp.asarray(lt.astype(np.float32)),
        jnp.asarray([10.0, 10.0, 10.0], jnp.float32),
    )
    out = np.asarray(optimize_pose_graph(pg, iterations=10))
    end_err_after = np.linalg.norm(out[-1][:3, 3] - gt[-1][:3, 3])
    assert end_err_after < 0.3 * end_err_before, (end_err_before, end_err_after)
    # Anchor stays put.
    np.testing.assert_allclose(out[0], gt[0], atol=1e-4)


def test_pgo_disabled_factors_ignored(rng):
    gt = _circle_poses(8)
    # A wildly wrong loop factor with weight 0 must not move anything.
    bad_t = np.eye(4, dtype=np.float32)
    bad_t[:3, 3] = (100, 100, 100)
    pg = chain_with_loops(
        jnp.asarray(gt),
        jnp.asarray([3]), jnp.asarray([7]),
        jnp.asarray(bad_t)[None],
        jnp.asarray([0.0]),
    )
    out = np.asarray(optimize_pose_graph(pg, iterations=5))
    np.testing.assert_allclose(out, gt, atol=1e-3)


def test_pgo_cg_matches_dense(rng):
    from sgtd_tpu.backend.pgo import optimize_pose_graph_cg

    n = 24
    gt = _circle_poses(n)
    rels = [np.linalg.inv(gt[i]) @ gt[i + 1] for i in range(n - 1)]
    drift = np.asarray(
        se3.se3_exp(jnp.asarray([0.05, 0.02, 0.0, 0.0, 0.0, 0.01], jnp.float32))
    )
    odom = [gt[0]]
    for r in rels:
        odom.append(odom[-1] @ r @ drift)
    odom = np.stack(odom).astype(np.float32)
    li = np.array([n - 1, n - 2, n // 2])
    lj = np.array([0, 0, 0])
    lt = np.stack([np.linalg.inv(gt[i]) @ gt[j] for i, j in zip(li, lj)])
    pg = chain_with_loops(
        jnp.asarray(odom),
        jnp.asarray(li), jnp.asarray(lj),
        jnp.asarray(lt.astype(np.float32)),
        jnp.asarray([10.0, 10.0, 10.0], jnp.float32),
    )
    dense = np.asarray(optimize_pose_graph(pg, iterations=8))
    mfree = np.asarray(optimize_pose_graph_cg(pg, iterations=8))
    # Same GN iterates up to PCG solve tolerance.
    np.testing.assert_allclose(mfree[:, :3, 3], dense[:, :3, 3], atol=1e-2)
    np.testing.assert_allclose(mfree[:, :3, :3], dense[:, :3, :3], atol=1e-3)


@pytest.mark.slow
def test_pgo_cg_large_graph(rng):
    """4096-node graph: the dense path would need a (24576)^2 Hessian
    (2.4 GB f32); the matrix-free path solves it comfortably."""
    from sgtd_tpu.backend.pgo import optimize_pose_graph_cg

    n = 4096
    gt = _circle_poses(n, radius=300.0)
    rels = np.stack([np.linalg.inv(gt[i]) @ gt[i + 1] for i in range(n - 1)])
    drift = np.asarray(
        se3.se3_exp(jnp.asarray([2e-4, 1e-4, 0.0, 0.0, 0.0, 5e-5], jnp.float32))
    )
    odom = np.empty_like(gt)
    odom[0] = gt[0]
    for i in range(n - 1):
        odom[i + 1] = odom[i] @ rels[i] @ drift
    end_err_before = np.linalg.norm(odom[-1][:3, 3] - gt[-1][:3, 3])
    assert end_err_before > 1.0

    step = n // 32
    li = np.arange(step, n, step)
    lj = np.zeros_like(li)
    lt = np.stack([np.linalg.inv(gt[i]) @ gt[0] for i in li])
    pg = chain_with_loops(
        jnp.asarray(odom),
        jnp.asarray(li), jnp.asarray(lj),
        jnp.asarray(lt.astype(np.float32)),
        jnp.asarray(np.full(len(li), 10.0, np.float32)),
    )
    out = np.asarray(optimize_pose_graph_cg(pg, iterations=6, cg_iterations=300))
    end_err_after = np.linalg.norm(out[-1][:3, 3] - gt[-1][:3, 3])
    assert end_err_after < 0.2 * end_err_before, (end_err_before, end_err_after)
