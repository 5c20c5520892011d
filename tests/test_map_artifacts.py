"""Persistent map artifacts: prebuilt clouds/covariances/voxel maps feed the
rerank with ZERO per-query target covariance or voxel work (VERDICT r3
next-#5; the reference recomputes both per setInputTarget,
fast_gicp_impl.hpp:60-72)."""

import numpy as np
import pytest

from sgtd_tpu.config import GicpConfig
from sgtd_tpu.data.synthetic import make_map_and_queries, render_cloud
from sgtd_tpu.db.artifacts import (
    build_map_artifacts,
    load_map_artifacts,
    save_map_artifacts,
)
from sgtd_tpu.eval.runner import build_map_index, evaluate


@pytest.fixture(scope="module")
def world_setup(small_config):
    cfg = small_config.replace(
        gicp=GicpConfig(
            enable=True, num_neighbors=8, max_iterations=6, max_points=512,
            best_fitness=15.0,
        )
    )
    maps, queries, world = make_map_and_queries(
        cfg, seed=31, num_map_frames=16, num_queries=3,
        center_noise_m=0.05, dropout=0.1,
    )
    index = build_map_index(maps, cfg)

    def m_fn(f):
        return render_cloud(
            world, world.map_poses[f], np.random.default_rng(2000 + f),
            max_points=512,
        )

    def q_fn(i):
        return render_cloud(
            world, world.query_poses[i], np.random.default_rng(1000 + i),
            max_points=512,
        )

    return cfg, maps, queries, world, index, m_fn, q_fn


@pytest.mark.parametrize("engine", ["gicp", "vgicp"])
def test_artifacts_rerank_zero_map_loads(world_setup, engine, tmp_path):
    import dataclasses

    cfg, maps, queries, world, index, m_fn, q_fn = world_setup
    ecfg = cfg.replace(gicp=dataclasses.replace(cfg.gicp, engine=engine))
    index.config = ecfg

    art = build_map_artifacts(
        m_fn, len(maps), ecfg.gicp, f_pad=index.db.frame_poses.shape[0]
    )
    if engine == "vgicp":
        assert art.vmaps is not None

    # Save/load roundtrip — load is the production path.
    p = str(tmp_path / f"art_{engine}.npz")
    save_map_artifacts(p, art)
    art2 = load_map_artifacts(p)
    np.testing.assert_allclose(
        np.asarray(art.covs), np.asarray(art2.covs), rtol=1e-6
    )

    def forbidden_map_cloud_fn(fid):  # pragma: no cover - must not run
        raise AssertionError(
            "map_cloud_fn called at query time despite prebuilt artifacts"
        )

    out = evaluate(
        index, queries, batch_size=4,
        query_cloud_fn=q_fn,
        map_cloud_fn=forbidden_map_cloud_fn,
        rerank_k=2,
        map_artifacts=art2,
    )
    assert out["success_rate"] == 1.0, out


def test_artifacts_format_version(tmp_path):
    p = str(tmp_path / "bad.npz")
    np.savez_compressed(p, clouds=np.zeros((1, 4, 3), np.float32))
    with pytest.raises(ValueError, match="rebuild"):
        load_map_artifacts(p)
