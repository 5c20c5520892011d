"""CLI integration: build-map / localize round trip through real files."""

import json
import os

import numpy as np
import pytest

from sgtd_tpu.config import SGTDConfig
from sgtd_tpu.data.synthetic import make_map_and_queries
from sgtd_tpu.io.graph_json import write_graph_json


def test_cli_localize_roundtrip(tmp_path, capsys, small_config):
    from sgtd_tpu import cli

    cfg = SGTDConfig()
    maps, queries, _ = make_map_and_queries(
        cfg, seed=9, num_map_frames=12, num_queries=4,
        center_noise_m=0.05,
    )
    mdir = tmp_path / "map_graphs"
    qdir = tmp_path / "query_graphs"
    mdir.mkdir(); qdir.mkdir()
    for i, g in enumerate(maps):
        write_graph_json(str(mdir / f"{i:06d}.json"), g)
    for i, g in enumerate(queries):
        write_graph_json(str(qdir / f"{i:06d}.json"), g)

    cli.main([
        "localize",
        "--map-graphs", str(mdir),
        "--query-graphs", str(qdir),
        "--batch-size", "4",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["total"] == 4
    assert out["success_rate"] == 1.0
    assert out["recall_at_1"] == 1.0


def test_cli_build_map_from_raw(tmp_path, capsys, rng):
    """build-map: raw .bin/.label files -> graph JSONs."""
    from sgtd_tpu import cli
    from sgtd_tpu.io.readers import write_bin, write_label

    sdir = tmp_path / "scans"; ldir = tmp_path / "labels"; odir = tmp_path / "graphs"
    sdir.mkdir(); ldir.mkdir()
    for i in range(2):
        # a pole-ish blob (raw KITTI label 80 -> train 18 -> ref 17) + ground
        pole = np.array([8.0, 3.0, 1.0]) + rng.normal(0, 0.15, (60, 3))
        ground = np.column_stack(
            [rng.uniform(-20, 20, 300), rng.uniform(-20, 20, 300), rng.normal(0, 0.05, 300)]
        )
        pts = np.concatenate([pole, ground]).astype(np.float32)
        sem_raw = np.concatenate([np.full(60, 80), np.full(300, 48)])  # pole, sidewalk
        write_bin(str(sdir / f"{i:06d}.bin"), pts)
        write_label(str(ldir / f"{i:06d}.label"), sem_raw)

    cli.main([
        "build-map",
        "--scans", str(sdir),
        "--labels", str(ldir),
        "--dataset", "kitti",
        "--out", str(odir),
    ])
    files = sorted(os.listdir(odir))
    assert files == ["000000.json", "000001.json"]
    g = json.loads((odir / "000000.json").read_text())
    # pole -> node 10, sidewalk -> node 3.
    assert 10 in g["nodes"]
    assert 3 in g["nodes"]


def test_cli_build_map_local_map(tmp_path, capsys, rng):
    """build-map --local-map-radius: neighbour scans merge before clustering."""
    from sgtd_tpu import cli
    from sgtd_tpu.io.readers import write_bin, write_label

    sdir = tmp_path / "scans"; ldir = tmp_path / "labels"; odir = tmp_path / "graphs"
    sdir.mkdir(); ldir.mkdir()
    # Two poses 5 m apart; the pole is split so each scan alone is too sparse
    # (min_seg 5 needs >= 5 pts; give each scan 3).
    poses = np.tile(np.eye(4), (2, 1, 1)); poses[1, 0, 3] = 5.0
    np.savetxt(tmp_path / "poses.txt", poses[:, :3, :].reshape(2, 12))
    for i in range(2):
        Tinv = np.linalg.inv(poses[i])
        pole_w = np.array([8.0, 3.0, 1.0])
        local = pole_w @ Tinv[:3, :3].T + Tinv[:3, 3]
        pts = (local + rng.normal(0, 0.1, (3, 3))).astype(np.float32)
        write_bin(str(sdir / f"{i:06d}.bin"), pts)
        write_label(str(ldir / f"{i:06d}.label"), np.full(3, 80))  # pole
    cli.main([
        "build-map", "--scans", str(sdir), "--labels", str(ldir),
        "--poses", str(tmp_path / "poses.txt"), "--dataset", "kitti",
        "--local-map-radius", "10", "--out", str(odir),
    ])
    import json, os
    g = json.loads((odir / "000000.json").read_text())
    assert 10 in g["nodes"]  # merged pole crosses min_seg


def _render_labeled(world, pose, rng, ppi=40, n_ground=400, view_radius=50.0):
    """Rendered .bin/.label scan: per-instance blobs with GT instance ids
    (train-id semantics, node label l <-> train class l + 7) + a sidewalk
    ground sheet (class 10, kept whole)."""
    Tinv = np.linalg.inv(pose)
    local = (world.instance_xyz @ Tinv[:3, :3].T) + Tinv[:3, 3]
    vis = np.where(np.linalg.norm(local[:, :2], axis=1) < view_radius)[0]
    pts, sem, inst = [], [], []
    for j in vis:
        c = local[j]
        blob = c + rng.normal(0, 0.15, (ppi, 3))
        pts.append(blob)
        sem.append(np.full(ppi, min(int(world.instance_label[j]), 11) + 7))
        inst.append(np.full(ppi, j + 1))
    pts.append(
        np.column_stack([
            rng.uniform(-view_radius, view_radius, n_ground),
            rng.uniform(-view_radius, view_radius, n_ground),
            rng.normal(0, 0.03, n_ground),
        ])
    )
    sem.append(np.full(n_ground, 10))
    inst.append(np.zeros(n_ground))
    return (
        np.concatenate(pts).astype(np.float32),
        np.concatenate(sem).astype(np.uint32),
        np.concatenate(inst).astype(np.uint32),
    )


@pytest.mark.slow
@pytest.mark.parametrize("engine", ["gicp", "vgicp"])
def test_cli_gicp_end_to_end(tmp_path, capsys, engine):
    """The headline configuration from raw files: build-map on .bin/.label
    scans for map AND queries, then localize --enable-gicp reranking from
    the same .bins (ref SG-STD-gicp path, semantic_graph_localization.cpp:
    651-723). VERDICT r1 item 5."""
    from sgtd_tpu import cli
    from sgtd_tpu.data.synthetic import make_world
    from sgtd_tpu.io.readers import write_bin, write_label

    rng = np.random.default_rng(3)
    world = make_world(
        rng, extent_m=150.0, instances_per_100m2=0.5,
        num_map_frames=8, num_queries=2, query_offset_m=2.0,
    )
    dirs = {}
    for name in ["mscans", "mlabels", "mgraphs", "qscans", "qlabels", "qgraphs"]:
        d = tmp_path / name
        d.mkdir()
        dirs[name] = str(d)
    for i, p in enumerate(world.map_poses):
        pts, sem, inst = _render_labeled(world, p, rng)
        write_bin(os.path.join(dirs["mscans"], f"{i:06d}.bin"), pts)
        write_label(os.path.join(dirs["mlabels"], f"{i:06d}.label"), sem, inst)
    for i, p in enumerate(world.query_poses):
        pts, sem, inst = _render_labeled(world, p, rng)
        write_bin(os.path.join(dirs["qscans"], f"{i:06d}.bin"), pts)
        write_label(os.path.join(dirs["qlabels"], f"{i:06d}.label"), sem, inst)

    # Graph poses: build-map without --poses writes identity poses; localize
    # reads GT from the graph JSON, so inject the true poses via a poses
    # file in KITTI layout (row-major 3x4).
    np.savetxt(tmp_path / "mposes.txt", world.map_poses[:, :3, :].reshape(8, 12))
    np.savetxt(tmp_path / "qposes.txt", world.query_poses[:, :3, :].reshape(2, 12))

    cli.main([
        "build-map", "--scans", dirs["mscans"], "--labels", dirs["mlabels"],
        "--dataset", "raw", "--poses", str(tmp_path / "mposes.txt"),
        "--out", dirs["mgraphs"],
    ])
    cli.main([
        "build-map", "--scans", dirs["qscans"], "--labels", dirs["qlabels"],
        "--dataset", "raw", "--poses", str(tmp_path / "qposes.txt"),
        "--out", dirs["qgraphs"],
    ])
    capsys.readouterr()
    cli.main([
        "localize",
        "--map-graphs", dirs["mgraphs"], "--query-graphs", dirs["qgraphs"],
        "--batch-size", "2",
        "--enable-gicp", "--engine", engine,
        "--query-scans", dirs["qscans"], "--map-scans", dirs["mscans"],
        "--leaf-size", "0.5", "--gicp-max-points", "4096", "--rerank-k", "2",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["total"] == 2
    assert out["success_rate"] == 1.0, out
    assert out["rmse_trans_m"] < 1.0, out
