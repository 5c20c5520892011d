"""expand_jobs kernel vs the delta-scatter reference: exact parity.

The sorted-heads Pallas expansion (ops.pallas_expand.expand_jobs) must
reproduce match.search's per-channel delta-scatter + cumsum expansion
bit-exactly on every VALID slot (slots beyond the job total are garbage
by contract and masked by the caller), including: empty jobs (shared
heads), totals above l_max (truncation), empty inputs, and values at the
2^24-exactness margin.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sgtd_tpu.ops.pallas_expand import expand_jobs


def _reference(length, payload, l_max):
    """The match.search._expand formulation, per channel."""
    heads = np.concatenate([[0], np.cumsum(length)[:-1]]).astype(np.int64)
    out = np.zeros((payload.shape[1], l_max), np.int64)
    for c in range(payload.shape[1]):
        buf = np.zeros(l_max, np.int64)
        per_job = payload[:, c].astype(np.int64)
        delta = np.concatenate([per_job[:1], np.diff(per_job)])
        for h, d in zip(heads, delta):
            if h < l_max:
                buf[h] += d
        out[c] = np.cumsum(buf)
    return out


@pytest.mark.parametrize("seed,l_max", [(0, 8192), (1, 16384), (2, 8192)])
def test_expand_jobs_parity(seed, l_max):
    rng = np.random.default_rng(seed)
    nj = 700
    # Skewed lengths with many empties; total may exceed l_max on seed 2.
    length = np.where(
        rng.uniform(size=nj) < 0.6,
        0,
        rng.pareto(1.2, nj).astype(np.int32) * (40 if seed == 2 else 8) + 1,
    ).astype(np.int32)
    payload = rng.integers(0, 1 << 24, (nj, 4), dtype=np.int32)
    got = np.asarray(
        expand_jobs(jnp.asarray(length), jnp.asarray(payload), l_max)
    )
    want = _reference(length, payload, l_max)
    total = min(int(length.sum()), l_max)
    np.testing.assert_array_equal(got[:, :total], want[:, :total])


def test_expand_jobs_all_empty():
    l_max = 8192
    length = np.zeros(100, np.int32)
    payload = np.arange(400, dtype=np.int32).reshape(100, 4)
    out = np.asarray(
        expand_jobs(jnp.asarray(length), jnp.asarray(payload), l_max)
    )
    assert out.shape == (4, l_max)  # no valid slots; values are don't-care


def test_expand_jobs_single_giant_job():
    l_max = 8192
    length = np.zeros(64, np.int32)
    length[3] = l_max + 500  # overflows the cap: truncated exactly
    payload = np.full((64, 2), 7, np.int32)
    payload[3] = (123, 456)
    out = np.asarray(
        expand_jobs(jnp.asarray(length), jnp.asarray(payload), l_max)
    )
    np.testing.assert_array_equal(out[0], np.full(l_max, 123))
    np.testing.assert_array_equal(out[1], np.full(l_max, 456))
