"""Schur-complement bundle adjustment on synthetic landmark problems."""

import numpy as np
import jax.numpy as jnp

from sgtd_tpu.backend.ba import BAProblem, optimize_ba
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
