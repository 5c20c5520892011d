"""Vote-tally kernels vs segment_sum: bit-exact parity at every width.

frame_votes (flat one-hot, f_pad <= 2048) and frame_votes_wide
(hierarchical hi/lo one-hot outer product, any f_pad — the wide-frame
tally that replaces the 47.9 ms serialized scatter-add at 20k keyframes,
tools/scale_probe_prof.py) must both reproduce jax.ops.segment_sum
exactly, including sentinel ids == f_pad (dropped) and padding tails.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtd_tpu.ops.pallas_probe import frame_votes, frame_votes_wide


def _ref(hit, frame, f_pad):
    return jax.ops.segment_sum(
        hit.astype(jnp.float32), frame, num_segments=f_pad
    )


@pytest.mark.parametrize("f_pad", [8, 208, 1024, 2048])
def test_frame_votes_flat_parity(f_pad, rng):
    l = 5000
    hit = jnp.asarray(rng.uniform(size=l) < 0.3)
    # include sentinel ids == f_pad (must contribute nothing)
    frame = jnp.asarray(
        rng.integers(0, f_pad + 1, size=l, dtype=np.int32)
    )
    got = frame_votes(hit, frame, f_pad)
    want = _ref(hit, jnp.minimum(frame, f_pad), f_pad)
    want = jnp.where(
        jnp.arange(f_pad) >= 0, want, 0
    )
    # segment_sum with id == f_pad drops (out of range) — emulate:
    want = _ref(jnp.where(frame < f_pad, hit, False), frame, f_pad)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("f_pad", [208, 2056, 20016])
def test_frame_votes_wide_parity(f_pad, rng):
    l = 5000
    hit = jnp.asarray(rng.uniform(size=l) < 0.3)
    frame = jnp.asarray(
        rng.integers(0, f_pad + 1, size=l, dtype=np.int32)
    )
    got = frame_votes_wide(hit, frame, f_pad)
    want = _ref(jnp.where(frame < f_pad, hit, False), frame, f_pad)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_frame_votes_wide_dense_counts(rng):
    """Every bin hit many times: counts must be exact (f32 accumulate of
    one-hot products is exact for integer counts below 2^24)."""
    f_pad = 300
    l = 40000
    hit = jnp.ones(l, bool)
    frame = jnp.asarray(rng.integers(0, f_pad, size=l, dtype=np.int32))
    got = frame_votes_wide(hit, frame, f_pad)
    want = np.bincount(np.asarray(frame), minlength=f_pad).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(got), want)
