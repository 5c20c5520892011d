"""VGICP (Gaussian voxel map) + Levenberg-Marquardt trust region."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtd_tpu.config import GicpConfig
from sgtd_tpu.geom import se3
from sgtd_tpu.refine.gicp import gicp_align, point_covariances
from sgtd_tpu.refine.lsq import gn_solve, lm_solve
from sgtd_tpu.refine.vgicp import (
    build_voxel_map,
    vgicp_align,
    vgicp_rerank,
)
from tests.test_gicp import _scene


@pytest.fixture(scope="module")
def world(rng):
    tgt = _scene(rng)
    n = tgt.shape[0]
    mask = jnp.asarray(np.ones(n, bool))
    cfg = GicpConfig(num_neighbors=10, max_iterations=10, max_points=n)
    covs = point_covariances(jnp.asarray(tgt), mask, cfg)
    return tgt, mask, cfg, covs


def test_voxel_map_matches_reference_accumulation(world):
    """build_voxel_map == the reference's per-voxel ADDITIVE accumulation
    (fast_vgicp_voxel.hpp:104-123, voxel_coord :158) on a dict oracle."""
    tgt, mask, cfg, covs = world
    vm = build_voxel_map(jnp.asarray(tgt), mask, covs, 1.0)
    cv = np.asarray(covs)
    acc = {}
    for i in range(tgt.shape[0]):
        c = tuple(np.floor(tgt[i] / 1.0 - 0.5).astype(int))
        s, cc, cnt = acc.setdefault(c, [np.zeros(3), np.zeros((3, 3)), 0])
        acc[c][0] = s + tgt[i]
        acc[c][1] = cc + cv[i]
        acc[c][2] = cnt + 1
    keys = np.asarray(vm.keys)
    n_arr = np.asarray(vm.n)
    assert int((n_arr > 0).sum()) == len(acc)
    mean = np.asarray(vm.mean)
    cov = np.asarray(vm.cov)
    for c, (s, cc, cnt) in acc.items():
        key = ((c[0] + 512) * 1024 + (c[1] + 512)) * 1024 + (c[2] + 512)
        j = int(np.searchsorted(keys, key))
        assert keys[j] == key
        assert n_arr[j] == cnt
        np.testing.assert_allclose(mean[j], s / cnt, atol=1e-4)
        np.testing.assert_allclose(cov[j], cc / cnt, atol=1e-4)


def test_voxel_map_multiplicative(world):
    """MULTIPLICATIVE mode (fast_vgicp_voxel.hpp:79-102): information-sum
    accumulation, verified against a dict oracle on a few voxels."""
    tgt, mask, cfg, covs = world
    vm = build_voxel_map(
        jnp.asarray(tgt), mask, covs, 2.0, mode="multiplicative"
    )
    cv = np.asarray(covs)
    acc = {}
    for i in range(tgt.shape[0]):
        c = tuple(np.floor(tgt[i] / 2.0 - 0.5).astype(int))
        s, cc = acc.setdefault(c, [np.zeros(3), np.zeros((3, 3))])
        inv = np.linalg.inv(cv[i].astype(np.float64))
        acc[c][0] = s + inv @ tgt[i]
        acc[c][1] = cc + inv
    keys = np.asarray(vm.keys)
    mean = np.asarray(vm.mean)
    for c, (s, cc) in list(acc.items())[:20]:
        key = ((c[0] + 512) * 1024 + (c[1] + 512)) * 1024 + (c[2] + 512)
        j = int(np.searchsorted(keys, key))
        assert keys[j] == key
        ref_cov = np.linalg.inv(cc)
        np.testing.assert_allclose(mean[j], ref_cov @ s, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize(
    "ns,opt",
    [
        ("direct1", "gn"),  # fast-path representative
        pytest.param("direct7", "lm", marks=pytest.mark.slow),
        pytest.param("direct27", "gn", marks=pytest.mark.slow),
    ],
)
def test_vgicp_recovers_offset(world, ns, opt):
    tgt, mask, _, _ = world
    n = tgt.shape[0]
    xi = np.array([0.5, -0.3, 0.1, 0.02, -0.01, 0.05], np.float32)
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    Tinv = np.linalg.inv(T_true)
    src = (tgt @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(np.float32)
    cfg = GicpConfig(
        num_neighbors=10, max_iterations=10, max_points=n,
        neighbor_search=ns, optimizer=opt,
    )
    res = vgicp_align(
        jnp.asarray(src), mask, jnp.asarray(tgt), mask,
        jnp.eye(4, dtype=jnp.float32), cfg,
    )
    T = np.asarray(res.transform)
    assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.05
    assert np.linalg.norm(T[:3, :3] - T_true[:3, :3]) < 0.01
    assert bool(res.converged)
    assert int(res.num_inliers) > 900


def test_vgicp_rerank_picks_true_candidate(world, rng):
    """Batched multi-candidate rerank: lowest fitness on the true target."""
    tgt, mask, _, _ = world
    n = tgt.shape[0]
    xi = np.array([0.3, -0.2, 0.05, 0.01, 0.0, 0.03], np.float32)
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    Tinv = np.linalg.inv(T_true)
    src = (tgt @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(np.float32)
    # Candidate 0: true map cloud; candidates 1, 2: unrelated scenes.
    others = [_scene(np.random.default_rng(s)) for s in (100, 200)]
    tgts = jnp.asarray(np.stack([tgt] + others))
    masks = jnp.asarray(np.ones((3, n), bool))
    inits = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (3, 1, 1)))
    cfg = GicpConfig(num_neighbors=10, max_iterations=10, max_points=n)
    out = vgicp_rerank(jnp.asarray(src), mask, tgts, masks, inits, cfg)
    fit = np.asarray(out.fitness)
    assert np.argmin(fit) == 0
    T = np.asarray(out.transform[0])
    assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.05


@pytest.mark.slow
def test_vgicp_rerank_prebuilt_vmaps_match(world, rng):
    """The prebuilt-voxel-map fast path (build once at map load, gather per
    candidate) must produce the same transforms/fitness as the per-call
    build path — the voxel map only depends on the target cloud."""
    from sgtd_tpu.refine.vgicp import build_voxel_maps

    tgt, mask, _, _ = world
    n = tgt.shape[0]
    xi = np.array([0.3, -0.2, 0.05, 0.01, 0.0, 0.03], np.float32)
    Tinv = np.linalg.inv(np.asarray(se3.se3_exp(jnp.asarray(xi))))
    src = (tgt @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(np.float32)
    others = [_scene(np.random.default_rng(s)) for s in (100, 200)]
    tgts = jnp.asarray(np.stack([tgt] + others))
    masks = jnp.asarray(np.ones((3, n), bool))
    inits = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (3, 1, 1)))
    cfg = GicpConfig(num_neighbors=10, max_iterations=10, max_points=n)
    covs = jax.vmap(lambda c, m: point_covariances(c, m, cfg))(tgts, masks)

    old = vgicp_rerank(
        jnp.asarray(src), mask, tgts, masks, inits, cfg, tgt_covs=covs
    )
    vmaps = build_voxel_maps(tgts, masks, covs, cfg)
    new = vgicp_rerank(
        jnp.asarray(src), mask, jnp.asarray(src), mask, inits, cfg,
        voxel_maps=vmaps,
    )
    np.testing.assert_allclose(
        np.asarray(new.transform), np.asarray(old.transform), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new.fitness), np.asarray(old.fitness), rtol=1e-4, atol=1e-5
    )


# ------------------------------------------------------------- LM mechanics


def _atan_problem(x_target=0.0):
    """Least squares 0.5 * atan(t_x)^2 embedded in SE(3): the classic
    Newton/GN divergence case — the undamped GN step
    x <- x - atan(x)(1 + x^2) overshoots for |x| > ~1.39 and diverges;
    the LM rho-test rejects those steps."""

    def linearize(T):
        x = T[0, 3] - x_target
        r = jnp.arctan(x)
        Jx = 1.0 / (1.0 + x * x)
        H = jnp.eye(6, dtype=T.dtype).at[0, 0].set(Jx * Jx)
        g = jnp.zeros(6, T.dtype).at[0].set(Jx * r)
        y0 = r * r
        return H, g, y0, None

    def error(T, aux):
        x = T[0, 3] - x_target
        return jnp.arctan(x) ** 2

    return linearize, error


def test_lm_converges_where_gn_diverges():
    """The reference keeps LM as its default optimizer because plain GN
    diverges on over-shooting steps (lsq_registration_impl.hpp:15). From a
    far init the undamped GN iteration explodes; lm_solve converges."""
    linearize, error = _atan_problem()
    T0 = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(3.0)  # far init

    gn = gn_solve(linearize, T0, max_iterations=20, damping=0.0)
    lm = lm_solve(linearize, error, T0, max_iterations=20)
    x_gn = float(np.asarray(gn.transform)[0, 3])
    x_lm = float(np.asarray(lm.transform)[0, 3])
    assert not abs(x_gn) < 1.0, x_gn  # GN diverged (oscillating, growing)
    assert abs(x_lm) < 1e-3, x_lm  # LM converged to the optimum
    assert bool(lm.converged)


def test_lm_matches_gn_when_steps_are_good():
    """On a well-conditioned quadratic basin LM accepts every GN step and
    the two solvers land on the same optimum."""
    linearize, error = _atan_problem()
    T0 = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.8)  # inside GN basin
    gn = gn_solve(linearize, T0, max_iterations=20, damping=0.0)
    lm = lm_solve(linearize, error, T0, max_iterations=20)
    assert abs(float(np.asarray(gn.transform)[0, 3])) < 1e-4
    assert abs(float(np.asarray(lm.transform)[0, 3])) < 1e-4


def test_gicp_lm_far_init(world):
    """30 deg / 5 m off init: LM-GICP still recovers the transform (the
    reference's headline configuration runs exactly this optimizer)."""
    tgt, mask, _, _ = world
    n = tgt.shape[0]
    ang = np.deg2rad(30.0)
    xi = np.array([4.0, -3.0, 0.0, 0.0, 0.0, ang], np.float32)
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    Tinv = np.linalg.inv(T_true)
    src = (tgt @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(np.float32)
    cfg = GicpConfig(
        num_neighbors=10, max_iterations=30, max_points=n, optimizer="lm"
    )
    res = gicp_align(
        jnp.asarray(src), mask, jnp.asarray(tgt), mask,
        jnp.eye(4, dtype=jnp.float32), cfg,
    )
    T = np.asarray(res.transform)
    assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.05
    assert np.linalg.norm(T[:3, :3] - T_true[:3, :3]) < 0.01
