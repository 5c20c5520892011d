"""Ring-sweep localization vs single-device, 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from sgtd_tpu.data.synthetic import make_map_and_queries
from sgtd_tpu.db.database import build_database
from sgtd_tpu.desc.triangles import build_descriptors
from sgtd_tpu.eval.metrics import rpe
from sgtd_tpu.eval.runner import stack_graphs
from sgtd_tpu.match.pipeline import localize
from sgtd_tpu.parallel.mesh import shard_database
from sgtd_tpu.parallel.ring_sweep import make_ring_localizer


@pytest.mark.slow
def test_ring_sweep_matches_single_device(small_config):
    cfg = small_config
    map_graphs, query_graphs, world = make_map_and_queries(
        cfg, seed=13, num_map_frames=24, num_queries=8,
        center_noise_m=0.05, dropout=0.1,
    )
    descs = [build_descriptors(g, cfg.desc, cfg.caps) for g in map_graphs]
    db, _ = build_database(
        descs, [np.asarray(g.pose) for g in map_graphs], cfg.desc, cfg.caps
    )

    devs = np.asarray(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devs, ("dp", "db"))
    # Place DB row arrays as blocks over 'dp'.
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sgtd_tpu.db.database import DescriptorDB

    sh = DescriptorDB(
        keys=NamedSharding(mesh, P("dp")),
        codes=NamedSharding(mesh, P("dp")),
        packed2=NamedSharding(mesh, P("dp", None)),
        vertices=NamedSharding(mesh, P("dp", None, None)),
        frame_ids=NamedSharding(mesh, P("dp")),
        cell_start=NamedSharding(mesh, P(None)),
        frame_rows=NamedSharding(mesh, P(None)),
        frame_start=NamedSharding(mesh, P(None)),
        frame_poses=NamedSharding(mesh, P(None, None, None)),
        frame_valid=NamedSharding(mesh, P(None)),
        bucket_table=NamedSharding(mesh, P(None)),
        cell_remap=NamedSharding(mesh, P(None)),
        code_remap=NamedSharding(mesh, P(None)),
        table_stride=NamedSharding(mesh, P(None)),
    )
    sdb = DescriptorDB(*(jax.device_put(x, s) for x, s in zip(tuple(db), tuple(sh))))

    ring = make_ring_localizer(mesh, cfg)
    res = ring(sdb, stack_graphs(query_graphs))

    for i, g in enumerate(query_graphs):
        ref = localize(db, g, cfg)
        assert bool(res.found[i]) == bool(ref.found)
        # Votes are exact (sum of per-block tallies == full scan).
        np.testing.assert_allclose(
            np.sort(np.asarray(res.votes[i])),
            np.sort(np.asarray(ref.votes)),
            atol=0,
        )
        gt = np.asarray(g.pose)
        for est in (np.asarray(ref.poses[0]), np.asarray(res.poses[i][0])):
            t_err, r_err = rpe(gt, est)
            assert t_err < 2.0 and r_err < 5.0, (i, t_err, r_err)
