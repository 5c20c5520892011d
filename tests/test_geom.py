"""SO(3)/SE(3) golden-value and round-trip tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from sgtd_tpu.geom import se3


def random_se3(rng, n, max_angle=2.5):
    w = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    norm = np.linalg.norm(w, axis=-1, keepdims=True)
    w = np.where(norm > max_angle, w * (max_angle / norm), w)
    v = rng.normal(0, 5.0, (n, 3)).astype(np.float32)
    return np.concatenate([v, w], axis=-1)


def test_so3_exp_log_roundtrip(rng):
    # Keep |w| comfortably below pi where the log is unique and f32-stable.
    w = rng.normal(0, 0.6, (32, 3)).astype(np.float32)
    w = np.clip(w, -1.2, 1.2)
    R = se3.so3_exp(jnp.asarray(w))
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)
    # Matrix-level roundtrip also holds for larger angles (kept below ~0.9pi:
    # the f32 log is ill-conditioned at the pi boundary).
    wl = rng.normal(0, 1.2, (32, 3)).astype(np.float32)
    norm = np.linalg.norm(wl, axis=-1, keepdims=True)
    wl = np.where(norm > 2.8, wl * (2.8 / norm), wl)
    Rl = se3.so3_exp(jnp.asarray(wl))
    Rl2 = se3.so3_exp(se3.so3_log(Rl))
    np.testing.assert_allclose(np.asarray(Rl2), np.asarray(Rl), atol=1e-4)


def test_so3_exp_orthonormal(rng):
    w = rng.normal(0, 2.0, (16, 3)).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_so3_exp_small_angle():
    w = jnp.asarray([[1e-6, -2e-6, 1e-6], [0.0, 0.0, 0.0]])
    R = np.asarray(se3.so3_exp(w))
    assert np.all(np.isfinite(R))
    np.testing.assert_allclose(R[1], np.eye(3), atol=1e-7)


def test_se3_exp_log_roundtrip(rng):
    xi = random_se3(rng, 32)
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-3)


def test_se3_inverse(rng):
    xi = random_se3(rng, 8)
    T = se3.se3_exp(jnp.asarray(xi))
    eye = np.asarray(T @ se3.mat_inverse(T))
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_relative_pose_error_zero(rng):
    xi = random_se3(rng, 4)
    T = se3.se3_exp(jnp.asarray(xi))
    te, re = se3.relative_pose_error(T, T)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(re), 0.0, atol=0.05)


def test_relative_pose_error_known():
    gt = np.eye(4, dtype=np.float32)
    est = np.eye(4, dtype=np.float32)
    est[:3, 3] = (3.0, 4.0, 0.0)
    te, re = se3.relative_pose_error(jnp.asarray(gt), jnp.asarray(est))
    assert float(te) == pytest.approx(5.0, abs=1e-5)
    assert float(re) == pytest.approx(0.0, abs=1e-3)


def test_transform_points():
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = (1.0, 2.0, 3.0)
    pts = np.zeros((1, 5, 3), dtype=np.float32)
    out = np.asarray(se3.transform_points(jnp.asarray(T)[None], jnp.asarray(pts)))
    np.testing.assert_allclose(out, np.tile([1.0, 2.0, 3.0], (1, 5, 1)))
