"""Query-time capacity-cap truncation: surfaced, never silent (VERDICT r1 #8).

The ragged probe scan pads to caps.max_scan_slots and pair lists cap at
hits_per_descriptor per query descriptor. A pathological scene (repetitive
structure -> deep buckets) must set the ``truncated`` flag, and the exact
fallback path must recover the full vote tally and candidate set.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtd_tpu.config import CapacityConfig, SGTDConfig
from sgtd_tpu.data.synthetic import make_map_and_queries
from sgtd_tpu.db.database import build_database, tuned_config
from sgtd_tpu.desc.triangles import build_descriptors
from sgtd_tpu.match.pipeline import localize, localize_exact
from sgtd_tpu.match.search import (
    TRUNC_PAIRS,
    TRUNC_SCAN,
    candidate_search,
    probe_and_hits,
)


@pytest.fixture(scope="module")
def world(small_config):
    cfg = small_config
    map_graphs, query_graphs, _ = make_map_and_queries(
        cfg, seed=13, num_map_frames=24, num_queries=4,
        center_noise_m=0.05, dropout=0.1, label_corrupt_rate=0.05,
    )
    descs = [build_descriptors(g, cfg.desc, cfg.caps) for g in map_graphs]
    db, report = build_database(
        descs, [np.asarray(g.pose) for g in map_graphs], cfg.desc, cfg.caps
    )
    cfg = tuned_config(cfg, report)
    return cfg, db, query_graphs


def _tiny_caps(cfg: SGTDConfig, **kw) -> SGTDConfig:
    return cfg.replace(caps=dataclasses.replace(cfg.caps, **kw))


def test_untruncated_query_reports_zero(world):
    cfg, db, queries = world
    res = localize(db, queries[0], cfg)
    assert int(res.truncated) == 0


@pytest.mark.slow
def test_scan_overflow_flagged_and_fallback_recovers_votes(world):
    cfg, db, queries = world
    g = queries[0]

    # Reference votes with an ample cap.
    q = build_descriptors(g, cfg.desc, cfg.caps)
    full = probe_and_hits(db, q, cfg.desc, cfg.search, cfg.caps)
    assert not bool(full.scan_overflow)
    total = int(np.asarray(jnp.sum(full.votes)))
    assert total > 0

    # Starve the scan: flag must be set and votes undercounted.
    small = _tiny_caps(cfg, max_scan_slots=32)
    starved = probe_and_hits(db, q, small.desc, small.search, small.caps)
    assert bool(starved.scan_overflow)
    assert int(np.asarray(jnp.sum(starved.votes))) < total

    cand = candidate_search(db, q, small.desc, small.search, small.caps)
    assert int(cand.truncated) & TRUNC_SCAN

    # The exact fallback recomputes with a fitted cap: votes identical to
    # the ample-cap run, flag cleared.
    res_small = localize(db, g, small)
    assert int(res_small.truncated) & TRUNC_SCAN
    res_exact = localize_exact(db, g, small)
    assert int(res_exact.truncated) == 0
    res_full = localize(db, g, cfg)
    np.testing.assert_array_equal(
        np.asarray(res_exact.frames), np.asarray(res_full.frames)
    )
    np.testing.assert_array_equal(
        np.asarray(res_exact.votes), np.asarray(res_full.votes)
    )
    assert bool(res_exact.found)
    np.testing.assert_allclose(
        np.asarray(res_exact.poses[0]), np.asarray(res_full.poses[0]), atol=2.0
    )


def test_exact_fallback_verify_semantics_match(world):
    """VERDICT r2 #8: the exact fallback must match the uncapped pipeline in
    SEMANTICS, not just pose-to-2-metres: same candidate pair SETS, and —
    verified on a canonically sorted pair order so hypothesis sampling is
    order-independent — identical verify scores and inlier sets."""
    from sgtd_tpu.match.search import (
        build_probe_table,
        extract_pairs_by_frame,
        probe_ranges,
    )
    from sgtd_tpu.match.verify import verify_pairs

    cfg, db, queries = world
    g = queries[0]
    q = build_descriptors(g, cfg.desc, cfg.caps)

    # Path A: the standard per-descriptor-capped extraction (uncapped in
    # effect: ample caps, no truncation on this scene).
    cand = candidate_search(db, q, cfg.desc, cfg.search, cfg.caps)
    assert int(cand.truncated) == 0

    # Path B: the exact fallback's candidate-major extraction.
    pkeys, pdesc = build_probe_table(q, cfg.desc)
    pb_qidx, pb_row, pb_valid = extract_pairs_by_frame(
        db, q, pkeys, pdesc, cand.frames, cand.valid, cfg.search, cfg.caps
    )

    def pair_sets(qidx, row, valid):
        out = []
        qidx, row, valid = map(np.asarray, (qidx, row, valid))
        for c in range(qidx.shape[0]):
            out.append(
                {(int(a), int(b))
                 for a, b in zip(qidx[c][valid[c]], row[c][valid[c]])}
            )
        return out

    sets_a = pair_sets(cand.pair_qidx, cand.pair_row, cand.pair_valid)
    sets_b = pair_sets(pb_qidx, pb_row, pb_valid)
    eq_ok = np.zeros(len(sets_a), bool)
    for c in range(len(sets_a)):
        if not bool(np.asarray(cand.valid)[c]):
            continue
        # Caps must not have clipped either side for a set comparison
        # (path A caps per descriptor, path B per candidate — where either
        # cap binds the retained SUBSETS legitimately differ).
        if (len(sets_a[c]) >= cfg.caps.pairs_per_candidate
                or len(sets_b[c]) >= cfg.caps.pairs_per_candidate):
            continue
        assert sets_a[c] == sets_b[c], f"candidate {c} pair sets differ"
        eq_ok[c] = True
    assert eq_ok.sum() > 0

    # Canonically sorted pair lists -> verification must agree exactly.
    def canon(qidx, row, valid):
        qidx, row, valid = map(np.asarray, (qidx, row, valid))
        c_n, p_n = qidx.shape
        oq = np.zeros_like(qidx)
        orow = np.zeros_like(row)
        ov = np.zeros_like(valid)
        for c in range(c_n):
            pairs = sorted(
                zip(qidx[c][valid[c]], row[c][valid[c]])
            )
            for j, (a, b) in enumerate(pairs):
                oq[c, j], orow[c, j], ov[c, j] = a, b, True
        return jnp.asarray(oq), jnp.asarray(orow), jnp.asarray(ov)

    ca = canon(cand.pair_qidx, cand.pair_row, cand.pair_valid)
    cb = canon(pb_qidx, pb_row, pb_valid)
    va = verify_pairs(q.vertices[ca[0]], db.vertices[ca[1]], ca[2],
                      cand.valid, cfg.search)
    vb = verify_pairs(q.vertices[cb[0]], db.vertices[cb[1]], cb[2],
                      cand.valid, cfg.search)
    np.testing.assert_array_equal(
        np.asarray(va.scores)[eq_ok], np.asarray(vb.scores)[eq_ok]
    )
    np.testing.assert_array_equal(
        np.asarray(va.inliers)[eq_ok], np.asarray(vb.inliers)[eq_ok]
    )
    np.testing.assert_allclose(
        np.asarray(va.trans)[eq_ok], np.asarray(vb.trans)[eq_ok], atol=1e-5
    )


def test_exact_fallback_top_candidate_tight(world):
    """Top-candidate agreement between localize_exact and the uncapped
    localize: same frame, same votes, pose within centimetres (was
    atol=2.0 — VERDICT r2 weak #4)."""
    cfg, db, queries = world
    g = queries[0]
    small = _tiny_caps(cfg, max_scan_slots=32)
    res_exact = localize_exact(db, g, small)
    res_full = localize(db, g, cfg)
    assert int(res_full.truncated) & TRUNC_SCAN == 0
    assert int(res_exact.best_frame) == int(res_full.best_frame)
    np.testing.assert_array_equal(
        np.asarray(res_exact.votes), np.asarray(res_full.votes)
    )
    # Scores/poses may differ only through pair-list ORDER (hypothesis
    # sampling); on the top candidate the inlier-polished poses must agree
    # to centimetres.
    np.testing.assert_allclose(
        np.asarray(res_exact.poses[0]), np.asarray(res_full.poses[0]),
        atol=0.05,
    )


def test_pair_saturation_flagged(world):
    cfg, db, queries = world
    g = queries[1]
    q = build_descriptors(g, cfg.desc, cfg.caps)
    small = _tiny_caps(cfg, hits_per_descriptor=1)
    ph = probe_and_hits(db, q, small.desc, small.search, small.caps)
    if not bool(ph.pair_overflow):
        pytest.skip("scene produced <=1 hit per descriptor")
    cand = candidate_search(db, q, small.desc, small.search, small.caps)
    assert int(cand.truncated) & TRUNC_PAIRS
    # Votes stay exact under pair saturation.
    full = probe_and_hits(db, q, cfg.desc, cfg.search, cfg.caps)
    np.testing.assert_array_equal(np.asarray(ph.votes), np.asarray(full.votes))


def test_runner_fallback_on_truncated_queries(world):
    from sgtd_tpu.db.database import DBBuildReport
    from sgtd_tpu.eval import runner

    cfg, db, queries = world
    small = _tiny_caps(cfg, max_scan_slots=32)
    index = runner.MapIndex(
        db=db, config=small, build_seconds=0.0,
        report=DBBuildReport(
            num_rows=int(np.sum(np.asarray(db.keys) != 2**31 - 1)),
            num_frames=int(np.sum(np.asarray(db.frame_valid))),
            num_cells=1, max_bucket=1, rows_beyond_cap=0,
        ),
    )
    out = runner.evaluate(index, queries, batch_size=2)
    # The starved cap alone would lose votes; the fallback restores accuracy.
    assert out["success_rate"] == 1.0, out


def test_strided_subsampling_is_frame_unbiased(world):
    """When a descriptor has more hits than hits_per_descriptor, the kept
    pair list must be a STRIDE of the full hit list (reference skip_len
    semantics, STDesc.cpp:467-468), not the first-u prefix — bucket rows
    sort frame-ascending within a key, so prefix clipping starves high-id
    frames' pair lists on aliased maps (round-4 bug)."""
    cfg, db, queries = world
    q = build_descriptors(queries[0], cfg.desc, cfg.caps)

    full = probe_and_hits(db, q, cfg.desc, cfg.search, cfg.caps)
    assert not bool(full.pair_overflow)
    n_per_desc = np.asarray(
        full.sel_frame < db.frame_poses.shape[0]
    ).sum(axis=1)
    # Pick a descriptor with several hits and force the cap below it.
    d = int(np.argmax(n_per_desc))
    n = int(n_per_desc[d])
    assert n >= 4, "fixture world lacks a multi-hit descriptor"
    u = max(2, n // 2)
    tiny = _tiny_caps(cfg, hits_per_descriptor=u)
    sub = probe_and_hits(db, q, tiny.desc, tiny.search, tiny.caps)
    assert bool(sub.pair_overflow)

    f_pad = db.frame_poses.shape[0]
    full_rows = np.asarray(full.sel_row)[d][
        np.asarray(full.sel_frame)[d] < f_pad
    ]
    sub_rows = np.asarray(sub.sel_row)[d][
        np.asarray(sub.sel_frame)[d] < f_pad
    ]
    stride = (n - 1) // u + 1
    expected = full_rows[::stride]
    np.testing.assert_array_equal(np.sort(sub_rows), np.sort(expected))
    # The stride spans the WHOLE hit list: the last kept hit comes from the
    # tail of the full list, not its prefix.
    assert sub_rows.max() == expected.max()
