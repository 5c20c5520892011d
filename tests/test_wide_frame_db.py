"""End-to-end coverage of the >65536-keyframe fallback paths.

The reference hard-caps its vote array at MAX_FRAME_N=20000 keyframes
(src/sgtd/include/desc/STDesc.h:33). This framework lifts the ceiling: DBs
beyond 65536 keyframes cannot pack frame ids into packed2's high 16 bits,
so the search takes two static fallbacks (chosen by array shape alone):

  * `_frame_of_rows` / probe_and_hits gather `frame_ids` instead of
    unpacking packed2 word 1 (match/search.py);
  * `extract_pairs` uses the stable-argsort path when
    (f_pad + 1) * D * U would overflow the packed int32 sort.

This test localizes against the SAME rows presented both ways: a normal
small DB, and that DB with its frame axis padded beyond 65536 (extra frames
invalid). Every result field must be identical.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from sgtd_tpu.data.synthetic import make_map_and_queries
from sgtd_tpu.db.device_build import build_database_on_device
from sgtd_tpu.desc.triangles import build_descriptors
from sgtd_tpu.eval.runner import stack_graphs
from sgtd_tpu.match.pipeline import localize
from sgtd_tpu.match.search import _frame_of_rows


def _widen_frames(db, f_wide):
    """Pad the frame axis beyond the packed-frame limit (extra invalid)."""
    f_old = db.frame_poses.shape[0]
    fp = jnp.tile(jnp.eye(4, dtype=jnp.float32), (f_wide, 1, 1))
    fp = fp.at[:f_old].set(db.frame_poses)
    fv = jnp.zeros(f_wide, bool).at[:f_old].set(db.frame_valid)
    fs = jnp.full(
        (f_wide + 1,), db.frame_start[-1], jnp.int32
    ).at[: f_old + 1].set(db.frame_start)
    return db._replace(frame_poses=fp, frame_valid=fv, frame_start=fs)


@pytest.mark.slow
def test_wide_frame_db_end_to_end(small_config):
    cfg = small_config
    maps, queries, _ = make_map_and_queries(
        cfg, seed=11, num_map_frames=12, num_queries=4,
        center_noise_m=0.05, dropout=0.1,
    )
    batch = stack_graphs(maps)
    import functools

    build_many = jax.jit(
        jax.vmap(functools.partial(build_descriptors, cfg=cfg.desc, caps=cfg.caps))
    )
    db, _ = build_database_on_device(build_many(batch), batch.pose, cfg.desc)

    # Wide enough to trip BOTH fallbacks with the small test caps
    # (d_max=512, u=8): (f+1)*4096 >= 2^31 needs f >= 524287.
    f_wide = 524296  # 8-aligned
    db_wide = _widen_frames(db, f_wide)
    assert db_wide.frame_poses.shape[0] > 65536
    # The wide shape must actually trigger both fallbacks.
    d_max, u = cfg.caps.max_descriptors, cfg.caps.hits_per_descriptor
    assert (f_wide + 1) * d_max * u >= 2**31

    rows = jnp.arange(db.keys.shape[0], dtype=jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(_frame_of_rows(db, rows)),
        np.asarray(_frame_of_rows(db_wide, rows)),
    )

    for g in queries:
        a = localize(db, g, cfg)
        b = localize(db_wide, g, cfg)
        assert bool(a.found) == bool(b.found)
        assert int(a.best_frame) == int(b.best_frame)
        # The candidate axis itself widens (C = min(candidate_num, f_pad):
        # 16 -> 50) and zero-vote tail candidates are arbitrary top_k picks
        # over a much larger zero-vote pool — compare the score-sorted
        # prefix of candidates that actually gathered votes (identical
        # rows => identical live candidates in both layouts).
        live_a = np.asarray(a.votes) >= cfg.search.min_votes
        live_b = np.asarray(b.votes) >= cfg.search.min_votes
        n = int(live_a.sum())
        assert n >= 1 and n == int(live_b.sum())
        np.testing.assert_array_equal(
            np.asarray(a.frames)[:n], np.asarray(b.frames)[:n]
        )
        np.testing.assert_array_equal(
            np.asarray(a.scores)[:n], np.asarray(b.scores)[:n]
        )
        np.testing.assert_array_equal(
            np.asarray(a.votes)[:n], np.asarray(b.votes)[:n]
        )
        np.testing.assert_allclose(
            np.asarray(a.poses)[:n], np.asarray(b.poses)[:n], atol=1e-5
        )
