"""Batched GICP refinement on synthetic structured clouds."""

import numpy as np
import jax.numpy as jnp
import pytest

from sgtd_tpu.config import GicpConfig
from sgtd_tpu.geom import se3
from sgtd_tpu.refine.gicp import gicp_align, gicp_rerank, knn_indices, point_covariances


def _scene(rng, n=1024):
    """Structured scene: ground plane + a few walls (gives GICP constraints)."""
    n_g = n // 2
    ground = np.column_stack(
        [rng.uniform(-20, 20, n_g), rng.uniform(-20, 20, n_g), rng.normal(0, 0.02, n_g)]
    )
    n_w = n - n_g
    walls = []
    for i, (cx, cy, ax) in enumerate([(10, 0, 0), (-5, 8, 1), (0, -12, 0)]):
        m = n_w // 3 if i < 2 else n_w - 2 * (n_w // 3)
        u = rng.uniform(-6, 6, m)
        z = rng.uniform(0, 4, m)
        if ax == 0:
            w = np.column_stack([np.full(m, cx) + rng.normal(0, 0.02, m), cy + u, z])
        else:
            w = np.column_stack([cx + u, np.full(m, cy) + rng.normal(0, 0.02, m), z])
        walls.append(w)
    return np.concatenate([ground] + walls).astype(np.float32)


@pytest.fixture(scope="module")
def gicp_cfg():
    return GicpConfig(num_neighbors=10, max_iterations=10, max_points=1024)


def test_knn_indices(rng):
    pts = rng.uniform(-10, 10, (1024, 3)).astype(np.float32)
    mask = np.ones(1024, bool)
    idx = np.asarray(knn_indices(jnp.asarray(pts), jnp.asarray(mask), 5))
    # Self is the nearest neighbour.
    assert np.all(idx[:, 0] == np.arange(1024))
    # Spot-check against brute force for a few points.
    for i in [0, 100, 777]:
        d = np.linalg.norm(pts - pts[i], axis=1)
        ref = set(np.argsort(d)[:5].tolist())
        assert set(idx[i].tolist()) == ref


def test_point_covariances_plane(rng, gicp_cfg):
    # Points on a plane -> regularized covariance with small normal direction.
    pts = np.column_stack(
        [rng.uniform(-5, 5, 1024), rng.uniform(-5, 5, 1024), np.zeros(1024)]
    ).astype(np.float32)
    cov = np.asarray(
        point_covariances(jnp.asarray(pts), jnp.asarray(np.ones(1024, bool)), gicp_cfg)
    )
    # z-direction variance ~ plane_eps, in-plane ~ 1 (regularized spectrum).
    assert np.all(cov[:, 2, 2] < 0.1)
    assert np.all(cov[:, 0, 0] > 0.5)


def test_gicp_recovers_small_offset(rng, gicp_cfg):
    tgt = _scene(rng)
    xi = np.array([0.5, -0.3, 0.1, 0.02, -0.01, 0.05], np.float32)
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    # src = T_true^-1 applied to tgt (so aligning src->tgt recovers T_true).
    Tinv = np.linalg.inv(T_true)
    src = (tgt @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(np.float32)
    mask = jnp.asarray(np.ones(1024, bool))
    res = gicp_align(
        jnp.asarray(src), mask, jnp.asarray(tgt), mask,
        jnp.eye(4, dtype=jnp.float32), gicp_cfg,
    )
    T_est = np.asarray(res.transform)
    t_err = np.linalg.norm(T_est[:3, 3] - T_true[:3, 3])
    r_err = np.linalg.norm(T_est[:3, :3] - T_true[:3, :3])
    assert t_err < 0.05, (t_err, T_est, T_true)
    assert r_err < 0.01
    assert float(res.fitness) < 0.05


def test_gicp_rerank_orders_candidates(rng, gicp_cfg):
    tgt_good = _scene(rng)
    tgt_bad = _scene(np.random.default_rng(999)) + np.array([60, 60, 0], np.float32)
    src = tgt_good.copy()
    mask = jnp.asarray(np.ones(1024, bool))
    tgts = jnp.asarray(np.stack([tgt_good, tgt_bad]))
    masks = jnp.stack([mask, mask])
    inits = jnp.asarray(np.stack([np.eye(4), np.eye(4)]).astype(np.float32))
    res = gicp_rerank(jnp.asarray(src), mask, tgts, masks, inits, gicp_cfg)
    f = np.asarray(res.fitness)
    assert f[0] < 0.01
    assert f[1] > f[0] * 10
