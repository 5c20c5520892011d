"""Parity tests for the Pallas fused NN kernels (ops.pallas_nn).

On CPU these run in Pallas interpret mode; the TPU path compiles the same
kernel body, and tools/profile_cov2.py validated exact index parity on the
chip. Reference semantics: nn1 == argmin over the exact squared-distance
matrix; knn == the k smallest distances' indices, ascending, ties broken by
lower index (identical to lax.top_k on negated distances).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtd_tpu.ops.pallas_nn import knn, nn1


def _sqd(q, r):
    q = np.asarray(q, np.float32)
    r = np.asarray(r, np.float32)
    return (
        np.sum(q * q, 1)[:, None]
        + np.sum(r * r, 1)[None, :]
        - 2.0 * (q @ r.T)
    )


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_nn1_matches_argmin(rng):
    q = rng.uniform(-50, 50, (128, 3)).astype(np.float32)
    r = rng.uniform(-50, 50, (256, 3)).astype(np.float32)
    idx, d = nn1(jnp.asarray(q), jnp.asarray(r))
    ref = _sqd(q, r)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
    np.testing.assert_allclose(np.asarray(d), ref.min(1), atol=1e-2)


def test_nn1_ties_pick_lowest_index(rng):
    r0 = rng.uniform(-5, 5, (4, 3)).astype(np.float32)
    r = np.concatenate([r0, r0])  # exact duplicates -> distance ties
    q = r0 + 0.01
    idx, _ = nn1(jnp.asarray(q), jnp.asarray(r))
    assert np.all(np.asarray(idx) < 4)


def test_knn_matches_topk(rng):
    q = rng.uniform(-50, 50, (64, 3)).astype(np.float32)
    r = rng.uniform(-50, 50, (128, 3)).astype(np.float32)
    k = 7
    idx = np.asarray(knn(jnp.asarray(q), jnp.asarray(r), k))
    d = _sqd(q, r)
    _, ref = jax.lax.top_k(-jnp.asarray(d), k)
    np.testing.assert_array_equal(idx, np.asarray(ref))


def test_knn_sorted_by_distance(rng):
    q = rng.uniform(-10, 10, (32, 3)).astype(np.float32)
    idx = np.asarray(knn(jnp.asarray(q), jnp.asarray(q), 5))
    d = _sqd(q, q)
    picked = np.take_along_axis(d, idx, axis=1)
    assert np.all(np.diff(picked, axis=1) >= -1e-3)
    # self is its own nearest neighbour
    np.testing.assert_array_equal(idx[:, 0], np.arange(32))


def test_vmap_batches(rng):
    q = rng.uniform(-50, 50, (2, 64, 3)).astype(np.float32)
    r = rng.uniform(-50, 50, (2, 64, 3)).astype(np.float32)
    ib, db = jax.vmap(nn1)(jnp.asarray(q), jnp.asarray(r))
    for b in range(2):
        i1, d1 = nn1(jnp.asarray(q[b]), jnp.asarray(r[b]))
        np.testing.assert_array_equal(np.asarray(ib[b]), np.asarray(i1))
    kb = jax.vmap(lambda a, b: knn(a, b, 3))(jnp.asarray(q), jnp.asarray(r))
    for b in range(2):
        np.testing.assert_array_equal(
            np.asarray(kb[b]),
            np.asarray(knn(jnp.asarray(q[b]), jnp.asarray(r[b]), 3)),
        )


def test_non_power_of_two_rows(rng):
    # n with no tile divisor in {256..8} falls back to a single full block.
    q = rng.uniform(-50, 50, (100, 3)).astype(np.float32)
    r = rng.uniform(-50, 50, (50, 3)).astype(np.float32)
    idx, _ = nn1(jnp.asarray(q), jnp.asarray(r))
    np.testing.assert_array_equal(np.asarray(idx), _sqd(q, r).argmin(1))
