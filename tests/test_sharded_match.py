"""Sharded matching on a virtual 8-device CPU mesh.

Asserts the DB-sharded + data-parallel pipeline agrees with the
single-device pipeline (SURVEY.md section 4: "sharded matching ==
single-device matching on the vote/top-k outputs").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtd_tpu.data.synthetic import make_map_and_queries
from sgtd_tpu.db.database import build_database
from sgtd_tpu.desc.triangles import build_descriptors
from sgtd_tpu.graph.types import SemanticGraph
from sgtd_tpu.match.pipeline import localize
from sgtd_tpu.parallel.mesh import make_mesh, shard_database
from sgtd_tpu.parallel.sharded_match import make_sharded_localizer


@pytest.fixture(scope="module")
def setup(small_config):
    cfg = small_config
    map_graphs, query_graphs, world = make_map_and_queries(
        cfg, seed=11, num_map_frames=24, num_queries=8,
        center_noise_m=0.05, dropout=0.1,
    )
    descs = [build_descriptors(g, cfg.desc, cfg.caps) for g in map_graphs]
    db, _ = build_database(
        descs, [np.asarray(g.pose) for g in map_graphs], cfg.desc, cfg.caps
    )
    return cfg, map_graphs, query_graphs, db


def _stack_graphs(graphs):
    return SemanticGraph(
        *(jnp.stack([getattr(g, f) for g in graphs]) for f in SemanticGraph._fields)
    )


@pytest.mark.parametrize(
    "dp,dbx",
    [
        pytest.param(1, 8, marks=pytest.mark.slow),
        pytest.param(2, 4, marks=pytest.mark.slow),
        (8, 1),  # fast-path representative of sharded exactness
    ],
)
def test_sharded_matches_single_device(setup, dp, dbx):
    cfg, _, query_graphs, db = setup
    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=dp, db=dbx)
    sharded_db = shard_database(db, mesh)
    localizer = make_sharded_localizer(mesh, cfg)

    batch = _stack_graphs(query_graphs)  # 8 queries over dp
    res = localizer(sharded_db, batch)

    from sgtd_tpu.eval.metrics import rpe

    for i, g in enumerate(query_graphs):
        ref = localize(db, g, cfg)
        assert bool(res.found[i]) == bool(ref.found)
        # Vote tallies are exact (psum over shards == full scan).
        np.testing.assert_allclose(
            np.sort(np.asarray(res.votes[i])),
            np.sort(np.asarray(ref.votes)),
            atol=0,
        )
        # Candidate ordering may differ for near-tie scores (pair lists are
        # split across shards, so verify scores are computed on different
        # subsamples); both pipelines must localize to the same place.
        gt = np.asarray(g.pose)
        for est in (np.asarray(ref.poses[0]), np.asarray(res.poses[i][0])):
            t_err, r_err = rpe(gt, est)
            assert t_err < 2.0 and r_err < 5.0, (t_err, r_err)


@pytest.mark.slow
def test_sharded_recall(setup):
    cfg, _, query_graphs, db = setup
    mesh = make_mesh(dp=2, db=4)
    sharded_db = shard_database(db, mesh)
    localizer = make_sharded_localizer(mesh, cfg)
    res = localizer(sharded_db, _stack_graphs(query_graphs))
    # All synthetic revisit queries localize.
    assert bool(np.all(np.asarray(res.found)))
    for i, g in enumerate(query_graphs):
        gt = np.asarray(g.pose)
        est = np.asarray(res.poses[i][0])
        err = np.linalg.norm(np.linalg.inv(est) @ gt - np.eye(4))
        assert err < 0.5
