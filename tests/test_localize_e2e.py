"""End-to-end one-shot localization on a synthetic world.

The minimum E2E slice from SURVEY.md section 7: map keyframes -> descriptor
DB -> query localization -> pose recovery, all on CPU-sized capacities.
"""

import numpy as np
import jax.numpy as jnp

from sgtd_tpu.data.synthetic import make_map_and_queries
from sgtd_tpu.db.database import build_database, load_database, save_database
from sgtd_tpu.desc.triangles import build_descriptors
from sgtd_tpu.eval.metrics import EvalAccumulator, rpe
from sgtd_tpu.match.pipeline import localize
from sgtd_tpu.match.search import candidate_search
from sgtd_tpu.match.verify import triangle_solver
import pytest


@pytest.fixture(scope="module")
def world_setup(small_config):
    cfg = small_config
    map_graphs, query_graphs, world = make_map_and_queries(
        cfg, seed=7, num_map_frames=24, num_queries=8,
        center_noise_m=0.05, dropout=0.1, label_corrupt_rate=0.05,
    )
    descs = [build_descriptors(g, cfg.desc, cfg.caps) for g in map_graphs]
    db, report = build_database(descs, [np.asarray(g.pose) for g in map_graphs], cfg.desc, cfg.caps)
    return cfg, map_graphs, query_graphs, world, db, report


def test_db_build_report(world_setup):
    _, _, _, _, db, report = world_setup
    assert report.num_rows > 100
    assert report.num_frames == 24
    assert report.max_bucket >= 1
    # Sorted keys.
    keys = np.asarray(db.keys)
    assert np.all(np.diff(keys.astype(np.int64)) >= 0)


def test_triangle_solver_recovers_transform(rng):
    from sgtd_tpu.geom import se3

    xi = np.array([1.0, -2.0, 0.5, 0.3, -0.2, 0.8], np.float32)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    src = rng.uniform(-10, 10, (16, 3, 3)).astype(np.float32)
    ref = src @ T[:3, :3].T + T[:3, 3]
    R, t = triangle_solver(jnp.asarray(src), jnp.asarray(ref))
    np.testing.assert_allclose(np.asarray(R), np.tile(T[:3, :3], (16, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.tile(T[:3, 3], (16, 1)), atol=1e-3)


def test_candidate_search_finds_true_frame(world_setup):
    cfg, map_graphs, query_graphs, world, db, _ = world_setup
    g = query_graphs[0]
    q = build_descriptors(g, cfg.desc, cfg.caps)
    cand = candidate_search(db, q, cfg.desc, cfg.search, cfg.caps)
    assert bool(cand.valid[0])
    # The true nearest map keyframe should be among the candidates.
    qpos = np.asarray(g.pose)[:3, 3]
    dists = np.linalg.norm(world.map_poses[:, :3, 3] - qpos, axis=1)
    true_frame = int(np.argmin(dists))
    frames = np.asarray(cand.frames)[np.asarray(cand.valid)]
    assert true_frame in frames.tolist()


def test_localize_recovers_pose(world_setup):
    cfg, map_graphs, query_graphs, world, db, _ = world_setup
    acc = EvalAccumulator(cfg)
    for g in query_graphs:
        res = localize(db, g, cfg)
        assert bool(res.found), "loop not detected"
        est = np.asarray(res.poses[0])
        gt = np.asarray(g.pose)
        acc.add(gt, est, np.asarray(res.poses))
    s = acc.summary()
    assert s["success_rate"] == 1.0, s
    assert s["rmse_trans_m"] < 1.0, s
    assert s["rmse_rot_deg"] < 3.0, s
    assert s["recall_at_1"] == 1.0, s


def test_db_save_load_roundtrip(world_setup, tmp_path):
    cfg, _, query_graphs, _, db, _ = world_setup
    p = str(tmp_path / "db.npz")
    save_database(p, db)
    db2 = load_database(p)
    res1 = localize(db, query_graphs[0], cfg)
    res2 = localize(db2, query_graphs[0], cfg)
    assert int(res1.best_frame) == int(res2.best_frame)
    np.testing.assert_allclose(
        np.asarray(res1.poses), np.asarray(res2.poses), atol=1e-6
    )


def test_device_build_matches_host_build(world_setup):
    """On-device DB assembly produces results identical to the host build."""
    import jax
    from sgtd_tpu.db.database import build_database_stacked, stack_descriptor_arrays
    from sgtd_tpu.db.device_build import build_database_on_device
    from sgtd_tpu.desc.triangles import build_descriptors

    cfg, map_graphs, query_graphs, _, db_host, rep_host = world_setup
    descs = [build_descriptors(g, cfg.desc, cfg.caps) for g in map_graphs]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *descs
    )
    db_dev, rep_dev = build_database_on_device(
        stacked, jnp.stack([g.pose for g in map_graphs]), cfg.desc
    )
    assert rep_dev.num_rows == rep_host.num_rows
    assert rep_dev.max_bucket == rep_host.max_bucket
    assert rep_dev.num_cells == rep_host.num_cells
    # Same localization results.
    res_h = localize(db_host, query_graphs[0], cfg)
    res_d = localize(db_dev, query_graphs[0], cfg)
    assert int(res_h.best_frame) == int(res_d.best_frame)
    np.testing.assert_allclose(
        np.asarray(res_h.votes), np.asarray(res_d.votes), atol=0
    )


@pytest.mark.slow
def test_append_database(world_setup):
    """Incremental append == full rebuild over the same keyframes."""
    import jax
    from sgtd_tpu.db.device_build import append_database, build_database_on_device
    from sgtd_tpu.desc.triangles import build_descriptors

    cfg, map_graphs, query_graphs, _, _, _ = world_setup
    descs = [build_descriptors(g, cfg.desc, cfg.caps) for g in map_graphs]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *descs)
    poses = jnp.stack([g.pose for g in map_graphs])

    k = 16
    part = jax.tree_util.tree_map(lambda x: x[:k], stacked)
    rest = jax.tree_util.tree_map(lambda x: x[k:], stacked)
    db_part, _ = build_database_on_device(part, poses[:k], cfg.desc)
    db_inc, rep_inc = append_database(db_part, rest, poses[k:], cfg.desc)
    db_full, rep_full = build_database_on_device(stacked, poses, cfg.desc)

    assert rep_inc.num_rows == rep_full.num_rows
    assert rep_inc.num_frames == rep_full.num_frames
    res_i = localize(db_inc, query_graphs[1], cfg)
    res_f = localize(db_full, query_graphs[1], cfg)
    assert int(res_i.best_frame) == int(res_f.best_frame)
    np.testing.assert_allclose(
        np.asarray(res_i.votes), np.asarray(res_f.votes), atol=0
    )


@pytest.mark.slow
def test_frame_major_pair_extraction(world_setup):
    """The optional exact (candidate-major) pair pass agrees with the
    default per-descriptor-capped path on candidate scoring."""
    from sgtd_tpu.desc.triangles import build_descriptors
    from sgtd_tpu.match.search import (
        build_probe_table,
        candidate_search,
        extract_pairs_by_frame,
    )
    from sgtd_tpu.match.verify import verify_pairs

    cfg, _, query_graphs, _, db, _ = world_setup
    q = build_descriptors(query_graphs[0], cfg.desc, cfg.caps)
    cand = candidate_search(db, q, cfg.desc, cfg.search, cfg.caps)

    pkeys, pdesc = build_probe_table(q, cfg.desc)
    pq, pr, pv = extract_pairs_by_frame(
        db, q, pkeys, pdesc, cand.frames, cand.valid, cfg.search, cfg.caps
    )
    # Frame-major pairs are a superset-or-equal sampling: counts per valid
    # candidate must be >= the capped default (up to the same P cap).
    n_def = np.asarray(cand.pair_valid.sum(axis=1))
    n_fm = np.asarray(pv.sum(axis=1))
    valid = np.asarray(cand.valid)
    assert np.all(n_fm[valid] >= np.minimum(n_def[valid], n_fm[valid]))
    assert n_fm[valid].max() > 0

    # Verification on frame-major pairs picks the same best frame.
    vq = q.vertices[pq]
    vdb = db.vertices[pr]
    ver = verify_pairs(vq, vdb, pv, cand.valid, cfg.search)
    best_fm = int(np.asarray(cand.frames)[np.argmax(np.asarray(ver.scores))])
    res = localize(db, query_graphs[0], cfg)
    assert best_fm == int(res.best_frame)
