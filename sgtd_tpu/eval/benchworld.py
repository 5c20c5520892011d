"""The bench.py workload as a reusable builder.

bench.py, the bench-scale multichip validation (tests/
test_sharded_benchscale.py, __graft_entry__.dryrun_multichip) and the
scale tools all need the SAME world: 200 keyframes / ~400k descriptor
rows / calibrated scan budget. This builds it once, with the chunked
descriptor builder (one small compile at any map size).
"""

from __future__ import annotations

import jax

from sgtd_tpu.config import SGTDConfig
from sgtd_tpu.data.synthetic import make_map_and_queries
from sgtd_tpu.db.database import tuned_config
from sgtd_tpu.db.device_build import build_database_on_device
from sgtd_tpu.eval.runner import build_descriptors_chunked, stack_graphs
from sgtd_tpu.match.search import calibrate_scan_slots


def build_bench_world(
    num_map: int = 200,
    num_q: int = 16,
    seed: int = 2026,
    config: SGTDConfig | None = None,
    calibrate_n: int = 16,
):
    """Returns (tuned_config, db, query_graph_batch, report, world).

    Same seed/noise profile as bench.py's headline workload; the query
    batch is a stacked SemanticGraph (leading axis num_q).
    """
    cfg = config or SGTDConfig()
    maps, queries, world = make_map_and_queries(
        cfg, seed=seed, num_map_frames=num_map, num_queries=num_q,
        center_noise_m=0.05, dropout=0.1, label_corrupt_rate=0.05,
    )
    batch = stack_graphs(maps)
    descs = build_descriptors_chunked(batch, cfg)
    db, report = build_database_on_device(descs, batch.pose, cfg.desc)
    qall = stack_graphs(queries)
    sample = jax.tree_util.tree_map(
        lambda x: x[: min(calibrate_n, num_q)], qall
    )
    sample_descs = build_descriptors_chunked(sample, cfg)
    cfg = tuned_config(cfg, report)
    cfg = calibrate_scan_slots(db, sample_descs, cfg)
    return cfg, db, qall, report, world
