"""GICP rerank wired into the evaluation path (the reference's
SG-STD-gicp configuration)."""

import dataclasses
import functools

import numpy as np
import pytest

from sgtd_tpu.config import GicpConfig
from sgtd_tpu.data.synthetic import make_map_and_queries, render_cloud
from sgtd_tpu.eval.runner import build_map_index, evaluate


@pytest.mark.parametrize("with_gicp", [False, True])
def test_evaluate_with_gicp(small_config, with_gicp):
    cfg = small_config.replace(
        gicp=GicpConfig(
            enable=with_gicp,
            num_neighbors=8,
            max_iterations=6,
            max_points=1024,
            best_fitness=15.0,
        )
    )
    maps, queries, world = make_map_and_queries(
        cfg, seed=31, num_map_frames=16, num_queries=4,
        center_noise_m=0.05, dropout=0.1,
    )
    index = build_map_index(maps, cfg)

    def q_fn(i):
        return render_cloud(
            world, world.query_poses[i], np.random.default_rng(1000 + i),
            max_points=1024,
        )

    def m_fn(f):
        return render_cloud(
            world, world.map_poses[f], np.random.default_rng(2000 + f),
            max_points=1024,
        )

    out = evaluate(
        index, queries, batch_size=4,
        query_cloud_fn=q_fn if with_gicp else None,
        map_cloud_fn=m_fn if with_gicp else None,
        rerank_k=2,
    )
    assert out["success_rate"] == 1.0, out
    if with_gicp:
        # The two clouds are INDEPENDENT samplings of fuzzy synthetic blobs,
        # so GICP has an inherent ~0.2-0.5 m alignment floor here (verified:
        # it converges to the same pose from ground-truth init). The wiring
        # check is that refinement stays well within the 5 m success gate.
        assert out["rmse_trans_m"] < 4.0, out
