"""Fused hypothesis-vote kernel vs the straightforward XLA formulation."""

import numpy as np
import jax.numpy as jnp

from sgtd_tpu.ops.pallas_verify import hypothesis_votes


def _rand_rot(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    return np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(n, 3, 3)


def test_votes_match_dense_reference():
    rng = np.random.default_rng(7)
    c, h, p = 5, 16, 64
    thr = 3.0
    rot = _rand_rot(rng, c * h).reshape(c, h, 3, 3).astype(np.float32)
    t = rng.normal(0, 5, (c, h, 3)).astype(np.float32)
    vq = rng.normal(0, 10, (c, p, 3, 3)).astype(np.float32)
    # Half the pairs are near-consistent with hypothesis 0 of each candidate.
    vdb = rng.normal(0, 10, (c, p, 3, 3)).astype(np.float32)
    for ci in range(c):
        moved = vq[ci, : p // 2] @ rot[ci, 0].T + t[ci, 0]
        vdb[ci, : p // 2] = moved + rng.normal(0, 0.3, moved.shape)
    valid = rng.uniform(size=(c, p)) > 0.2

    votes = np.asarray(
        hypothesis_votes(
            jnp.asarray(rot), jnp.asarray(t), jnp.asarray(vq),
            jnp.asarray(vdb), jnp.asarray(valid), thr,
        )
    )

    moved = np.einsum("chij,cpkj->chpki", rot, vq) + t[:, :, None, None, :]
    d = np.linalg.norm(moved - vdb[:, None], axis=-1)
    inlier = np.all(d < thr, axis=-1) & valid[:, None, :]
    ref = inlier.sum(axis=-1).astype(np.int32)
    np.testing.assert_array_equal(votes, ref)
    assert (votes[:, 0] >= p // 2 * 0.5).all()  # the planted hypothesis wins
