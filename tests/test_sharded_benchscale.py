"""Bench-scale multichip validation (VERDICT r4 next-#5 / weak #6).

The unit-scale sharded tests (tests/test_sharded_match.py) run at 64-node
/ 512-descriptor shapes; shard-boundary bucket splits and pair-quota
behavior at REAL occupancy (200 keyframes, ~400k rows, calibrated scan
budget) were never exercised on the virtual mesh. This runs the bench
workload itself through the (dp=2, db=4) sharded localizer on the
8-device CPU mesh and asserts:

  * per-frame VOTES bit-identical to the single-device pipeline (the psum
    over shard-partial bucket scans must reproduce the full scan exactly,
    including buckets split across shard boundaries);
  * the same localization decisions within the success gates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtd_tpu.config import SGTDConfig
from sgtd_tpu.eval.metrics import rpe
from sgtd_tpu.graph.types import SemanticGraph
from sgtd_tpu.match.pipeline import localize
from sgtd_tpu.parallel.mesh import make_mesh, shard_database
from sgtd_tpu.parallel.sharded_match import make_sharded_localizer


@pytest.mark.slow
def test_sharded_benchscale_votes_bit_identical():
    from sgtd_tpu.eval.benchworld import build_bench_world

    assert len(jax.devices()) == 8
    num_q = 8
    cfg, db, qall, report, _ = build_bench_world(num_map=200, num_q=num_q)
    assert report.num_rows > 300_000, report.num_rows  # real occupancy

    mesh = make_mesh(dp=2, db=4)
    sharded_db = shard_database(db, mesh)
    localizer = make_sharded_localizer(mesh, cfg)
    res = jax.block_until_ready(localizer(sharded_db, qall))

    import functools

    loc_one = jax.jit(
        functools.partial(localize, config=cfg), static_argnames=()
    )
    for i in range(num_q):
        g = jax.tree_util.tree_map(lambda x: x[i], qall)
        ref = loc_one(db, g)
        assert int(ref.truncated) & 1 == 0  # no vote loss on either side
        # Vote tallies bit-identical (sorted: candidate ordering of exact
        # ties is unspecified across topk implementations).
        np.testing.assert_array_equal(
            np.sort(np.asarray(res.votes[i])),
            np.sort(np.asarray(ref.votes)),
        )
        assert bool(res.found[i]) == bool(ref.found)
        gt = np.asarray(SemanticGraph(*(np.asarray(x[i]) for x in qall)).pose)
        for est in (np.asarray(ref.poses[0]), np.asarray(res.poses[i][0])):
            t_err, r_err = rpe(gt, est)
            assert t_err < 5.0 and r_err < 10.0, (i, t_err, r_err)
