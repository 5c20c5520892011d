"""Multi-session SLAM: drifting trajectory corrected against a prior map."""

import numpy as np
import jax.numpy as jnp
import pytest

from sgtd_tpu.data.synthetic import make_world, observe
from sgtd_tpu.db.database import build_database, tuned_config
from sgtd_tpu.desc.triangles import build_descriptors
from sgtd_tpu.geom import se3
from sgtd_tpu.slam import localize_and_optimize_session


@pytest.fixture(scope="module")
def setup(small_config):
    cfg = small_config
    rng = np.random.default_rng(21)
    world = make_world(rng, num_map_frames=24, num_queries=1)
    map_graphs = [observe(world, p, cfg, rng) for p in world.map_poses]
    descs = [build_descriptors(g, cfg.desc, cfg.caps) for g in map_graphs]
    db, rep = build_database(
        descs, [np.asarray(g.pose) for g in map_graphs], cfg.desc, cfg.caps
    )
    return tuned_config(cfg, rep), world, db, rng


def test_session_correction(setup):
    cfg, world, db, rng = setup
    # Session: revisit along part of the loop with drifting odometry.
    s_n = 10
    idx = np.arange(s_n)
    gt_poses = world.map_poses[idx].astype(np.float64).copy()
    # accumulate drift on relative motions
    drift = np.asarray(
        se3.se3_exp(jnp.asarray([0.25, 0.1, 0.0, 0.0, 0.0, 0.01], jnp.float32))
    ).astype(np.float64)
    odom = [gt_poses[0]]
    for i in range(1, s_n):
        rel = np.linalg.inv(gt_poses[i - 1]) @ gt_poses[i]
        odom.append(odom[-1] @ rel @ drift)
    odom = np.stack(odom)

    session_graphs = [
        observe(world, p, cfg, rng, center_noise_m=0.05, dropout=0.1)
        for p in gt_poses
    ]

    end_before = np.linalg.norm(odom[-1][:3, 3] - gt_poses[-1][:3, 3])
    assert end_before > 1.0

    res = localize_and_optimize_session(db, session_graphs, odom, cfg)
    assert res.num_loops >= s_n // 2, res.loop_scores
    errs = [
        np.linalg.norm(res.poses[i][:3, 3] - gt_poses[i][:3, 3])
        for i in range(s_n)
    ]
    assert max(errs) < 1.0, (errs, end_before)


@pytest.mark.slow
def test_session_no_map_overlap_keeps_odometry(setup):
    cfg, world, db, rng = setup
    # A session far outside the map: no loops; odometry passes through.
    far = np.eye(4)
    far[:3, 3] = (4000.0, 4000.0, 0.0)
    poses = np.stack([far @ _shift(i * 5.0) for i in range(4)])
    graphs = [
        observe(world, p, cfg, rng) for p in poses
    ]
    res = localize_and_optimize_session(db, graphs, poses, cfg)
    assert res.num_loops == 0
    np.testing.assert_allclose(res.poses, poses.astype(np.float32), atol=1e-2)


def _shift(x):
    T = np.eye(4)
    T[0, 3] = x
    return T
