"""Accuracy regression gate on the aliased hard workload (VERDICT r3 #3).

Small-scale version of tools/hard_eval.py: SR must be DISCRIMINATING
(not saturated at 1.0 — a 5-point regression must be detectable), GICP
refinement must IMPROVE the pose on the planar clouds, and the pipeline
must never lose accuracy to the reference-oracle semantics. Full-scale
numbers (200 keyframes / 64 queries) live in HARD_EVAL_r04.json.
"""

import numpy as np
import pytest

from sgtd_tpu.config import GicpConfig, SGTDConfig
from sgtd_tpu.data.synthetic import (
    make_hard_world,
    observe,
    render_planar_cloud,
)
from sgtd_tpu.eval.runner import build_map_index, evaluate
from sgtd_tpu.ops.voxel import load_query_cloud


@pytest.mark.slow
def test_hard_workload_gates():
    rng = np.random.default_rng(411)
    cfg = SGTDConfig()
    world = make_hard_world(
        rng, num_map_frames=64, num_queries=16,
        n_motifs=2, unique_per_block=2, grid=(5, 5),
    )
    maps = [observe(world, p, cfg, rng, center_noise_m=0.05)
            for p in world.map_poses]
    queries = [
        observe(world, p, cfg, rng, center_noise_m=0.45, dropout=0.35,
                label_corrupt_rate=0.15)
        for p in world.query_poses
    ]
    index = build_map_index(maps, cfg)

    out_desc = evaluate(index, queries, batch_size=16)
    sr = out_desc["success_rate"]
    # Discriminating band: failures must be possible (else a regression is
    # invisible), but the matcher must stay in the reference's regime.
    assert 0.6 <= sr <= 1.0, out_desc
    assert out_desc["recall_at_5"] >= sr

    # GICP refinement on the deterministic planar surfaces must IMPROVE
    # the (success-conditioned) pose RMSE.
    gcfg = index.config.replace(
        gicp=GicpConfig(
            enable=True, engine="gicp", max_points=1024,
            leaf_size=0.5, max_corr_dist_m=1.0, num_neighbors=8,
        )
    )
    index.config = gcfg

    def q_fn(i):
        pts, m = render_planar_cloud(
            world, world.query_poses[i], np.random.default_rng(7000 + i),
            max_points=2048,
        )
        return load_query_cloud(pts[m], 0.5, 1024)

    def m_fn(fid):
        return render_planar_cloud(
            world, world.map_poses[fid], np.random.default_rng(8000 + fid),
            max_points=2048,
        )

    out_gicp = evaluate(
        index, queries, batch_size=16,
        query_cloud_fn=q_fn, map_cloud_fn=m_fn, rerank_k=5,
    )
    # FRAME RESCUE gate (VERDICT r4 next-#1/#7): when the correct frame
    # sits in the top-5 but not at rank 1, the rerank must actually claim
    # it — SR_gicp > SR_desc, not merely >=. Zero rescue passed forever
    # under the old >= gate while ~8 SR points sat in R@5.
    if out_desc["recall_at_5"] >= sr + 2 / len(queries):
        assert out_gicp["success_rate"] >= sr + 0.02, (sr, out_gicp)
    else:
        assert out_gicp["success_rate"] >= sr - 1e-9, out_gicp
    assert out_gicp["rmse_trans_m"] < out_desc["rmse_trans_m"], (
        out_desc["rmse_trans_m"], out_gicp["rmse_trans_m"])


@pytest.mark.slow
def test_pipeline_not_worse_than_oracle():
    """Pipeline SR >= oracle SR on a subsample — the gate that caught the
    frame-biased pair clipping (round 4)."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tools")
    from hard_eval import oracle_agreement

    rng = np.random.default_rng(411)
    cfg = SGTDConfig()
    world = make_hard_world(
        rng, num_map_frames=48, num_queries=6,
        n_motifs=2, unique_per_block=2, grid=(4, 4),
    )
    maps = [observe(world, p, cfg, rng, center_noise_m=0.05)
            for p in world.map_poses]
    queries = [
        observe(world, p, cfg, rng, center_noise_m=0.45, dropout=0.35,
                label_corrupt_rate=0.15)
        for p in world.query_poses
    ]
    index = build_map_index(maps, cfg)
    agree = oracle_agreement(index, maps, queries, cfg)
    assert agree["pipeline_sr"] >= agree["oracle_sr"] - 1e-9, agree
