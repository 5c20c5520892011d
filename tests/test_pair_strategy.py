"""sel-path vs candidate-major pair extraction: same localization.

The static strategy switch (CapacityConfig.sel_max_scan_slots) must not
change WHAT is found: votes are computed identically (same probe scan),
and the candidate-major pair lists are a superset-exact version of the
sel path's strided subsample, so the verified decision must agree on a
well-separated workload.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtd_tpu.data.synthetic import make_map_and_queries
from sgtd_tpu.db.database import build_database
from sgtd_tpu.desc.triangles import build_descriptors
from sgtd_tpu.eval.metrics import rpe
from sgtd_tpu.match.pipeline import localize


def test_candidate_major_matches_sel_path(small_config, rng):
    cfg = small_config
    maps, queries, _ = make_map_and_queries(
        cfg, seed=21, num_map_frames=16, num_queries=4,
        center_noise_m=0.05, dropout=0.1,
    )
    descs = [build_descriptors(g, cfg.desc, cfg.caps) for g in maps]
    db, _ = build_database(
        descs, [np.asarray(g.pose) for g in maps], cfg.desc, cfg.caps
    )

    cfg_sel = cfg  # default: sel path (max_scan_slots <= sel_max)
    assert cfg.caps.max_scan_slots <= cfg.caps.sel_max_scan_slots
    cfg_cm = cfg.replace(
        caps=dataclasses.replace(cfg.caps, sel_max_scan_slots=0)
    )

    for g in queries:
        a = localize(db, g, cfg_sel)
        b = localize(db, g, cfg_cm)
        # Identical probe scan -> identical votes.
        np.testing.assert_array_equal(
            np.asarray(a.votes), np.asarray(b.votes)
        )
        assert bool(a.found) == bool(b.found)
        assert int(b.truncated) & 2 == 0  # no pair subsampling flag
        gt = np.asarray(g.pose)
        for est in (np.asarray(a.poses[0]), np.asarray(b.poses[0])):
            t_err, r_err = rpe(gt, est)
            assert t_err < 2.0 and r_err < 5.0, (t_err, r_err)
