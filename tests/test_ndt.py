"""NDT registration on synthetic structured clouds."""

import numpy as np
import jax.numpy as jnp

from sgtd_tpu.geom import se3
from sgtd_tpu.refine.ndt import build_ndt_map, ndt_align


def _scene(rng, n=2048):
    n_g = n // 2
    ground = np.column_stack(
        [rng.uniform(-20, 20, n_g), rng.uniform(-20, 20, n_g), rng.normal(0, 0.03, n_g)]
    )
    walls = []
    n_w = n - n_g
    for i, (cx, cy, ax) in enumerate([(10, 0, 0), (-5, 8, 1), (0, -12, 0)]):
        k = n_w // 3 if i < 2 else n_w - 2 * (n_w // 3)
        u = rng.uniform(-6, 6, k)
        z = rng.uniform(0, 4, k)
        if ax == 0:
            w = np.column_stack([np.full(k, cx) + rng.normal(0, 0.03, k), cy + u, z])
        else:
            w = np.column_stack([cx + u, np.full(k, cy) + rng.normal(0, 0.03, k), z])
        walls.append(w)
    return np.concatenate([ground] + walls).astype(np.float32)


def test_ndt_map_build():
    # Local deterministic rng: the session-scoped fixture's state depends on
    # test order, and the recovery tolerance below sits near NDT's
    # voxel-discretization floor — order-dependent scenes made it flaky.
    rng = np.random.default_rng(7)
    pts = _scene(rng)
    m = build_ndt_map(jnp.asarray(pts), jnp.asarray(np.ones(len(pts), bool)),
                      voxel_size=2.0, max_voxels=4096)
    n_valid = int(np.sum(np.asarray(m.valid)))
    assert n_valid > 50
    keys = np.asarray(m.keys)
    assert np.all(np.diff(keys.astype(np.int64)) >= 0)


def test_ndt_recovers_offset():
    rng = np.random.default_rng(7)  # see test_ndt_map_build
    tgt = _scene(rng)
    mask = jnp.asarray(np.ones(len(tgt), bool))
    ndt = build_ndt_map(jnp.asarray(tgt), mask, voxel_size=2.0, max_voxels=4096)

    xi = np.array([0.4, -0.3, 0.05, 0.01, -0.02, 0.04], np.float32)
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    Tinv = np.linalg.inv(T_true)
    src = (tgt @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(np.float32)

    res = ndt_align(jnp.asarray(src), mask, ndt, jnp.eye(4, dtype=jnp.float32))
    T_est = np.asarray(res.transform)
    t_err = np.linalg.norm(T_est[:3, 3] - T_true[:3, 3])
    r_err = np.linalg.norm(T_est[:3, :3] - T_true[:3, :3])
    assert t_err < 0.1, (t_err, T_est)
    assert r_err < 0.02
