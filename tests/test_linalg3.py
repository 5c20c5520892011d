"""Closed-form 3x3 linear algebra vs reference implementations."""

import numpy as np
import jax.numpy as jnp

from sgtd_tpu.ops.linalg3 import inv3x3, kabsch, sym_eig3x3


def test_inv3x3(rng):
    m = rng.normal(0, 1, (64, 3, 3)).astype(np.float32)
    m += np.eye(3) * 2  # keep well-conditioned
    inv = np.asarray(inv3x3(jnp.asarray(m)))
    np.testing.assert_allclose(inv @ m, np.tile(np.eye(3), (64, 1, 1)), atol=1e-4)


def test_sym_eig3x3(rng):
    a = rng.normal(0, 1, (128, 3, 3)).astype(np.float32)
    m = a @ np.swapaxes(a, -1, -2)  # symmetric PSD
    vals, vecs = sym_eig3x3(jnp.asarray(m))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    ref_vals = np.linalg.eigvalsh(m)
    np.testing.assert_allclose(vals, ref_vals, atol=1e-3 * np.abs(ref_vals).max())
    # Ascending order and M v = lambda v.
    assert np.all(np.diff(vals, axis=-1) >= -1e-4)
    mv = np.einsum("nij,njk->nik", m, vecs)
    lv = vals[:, None, :] * vecs
    np.testing.assert_allclose(mv, lv, atol=5e-3 * np.abs(ref_vals).max())


def test_kabsch_exact(rng):
    from sgtd_tpu.geom import se3

    xi = np.array([2.0, -1.0, 0.5, 0.4, -0.3, 0.7], np.float32)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    src = rng.uniform(-10, 10, (32, 12, 3)).astype(np.float32)
    ref = src @ T[:3, :3].T + T[:3, 3]
    R, t = kabsch(jnp.asarray(src), jnp.asarray(ref))
    np.testing.assert_allclose(np.asarray(R), np.tile(T[:3, :3], (32, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.tile(T[:3, 3], (32, 1)), atol=1e-3)
    # Proper rotations.
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)


def test_kabsch_weighted_ignores_outliers(rng):
    from sgtd_tpu.geom import se3

    xi = np.array([1.0, 0.5, -0.2, 0.1, 0.2, -0.3], np.float32)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    src = rng.uniform(-5, 5, (8, 3)).astype(np.float32)
    ref = src @ T[:3, :3].T + T[:3, 3]
    # Corrupt half the pairs, weight them to zero.
    ref_bad = ref.copy()
    ref_bad[4:] += rng.normal(0, 50, (4, 3))
    w = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
    R, t = kabsch(jnp.asarray(src), jnp.asarray(ref_bad), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=1e-3)


def test_kabsch_degenerate_noisy(rng):
    """Noisy correspondences still produce a proper rotation near truth."""
    from sgtd_tpu.geom import se3

    xi = np.array([0.5, 0.2, 0.1, 0.05, -0.1, 0.3], np.float32)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    src = rng.uniform(-20, 20, (64, 3)).astype(np.float32)
    ref = src @ T[:3, :3].T + T[:3, 3] + rng.normal(0, 0.1, (64, 3))
    R, t = kabsch(jnp.asarray(src), jnp.asarray(ref))
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)
    err = np.linalg.norm(np.asarray(R) - T[:3, :3])
    assert err < 0.02
