"""MulRan on-disk layout conformance: the real-data path end-to-end from
FILES (VERDICT r4 next-#6).

A mini dataset is written in the reference's MulRan format — nanosecond-
timestamp .bin/.label scan names, a pose.txt of "stamp, r11..tz" rows in
raw UTM coordinates (ref get_json.cpp:427-490: timestamp association picks
the nearest pose row; per-sequence-family UTM offsets are subtracted) —
and driven through ``cli build-map --dataset mulran`` for both map and
query sides, then ``cli localize``. Proves the CLI path the reference's
users would take works from disk, not just from in-memory graphs.

A second leg drives the Wild-Places profile (``--dataset wild``): 3-float
.bin stride + 13-class identity routing (ref get_json_wild.cpp — declared
but never built in the reference, CMakeLists.txt:180-182).
"""

import json
import os

import numpy as np
import pytest

from sgtd_tpu.io.readers import (
    MULRAN_UTM_OFFSETS,
    write_bin,
    write_label,
)

from tests.test_cli import _render_labeled


def _write_mulran_side(world, poses, dirs, rng, t0_ns):
    """Write scans/labels with ns-stamp names + a pose.txt in raw UTM."""
    ox, oy, oz = MULRAN_UTM_OFFSETS["kaist"]
    stamps = t0_ns + np.arange(len(poses), dtype=np.int64) * 100_000_000
    for i, p in enumerate(poses):
        pts, sem, inst = _render_labeled(world, p, rng)
        write_bin(os.path.join(dirs["scans"], f"{stamps[i]}.bin"), pts)
        write_label(os.path.join(dirs["labels"], f"{stamps[i]}.label"),
                    sem, inst)
    # Pose stream denser than scans and offset by -23 ms, so the nearest-
    # stamp association (get_json.cpp:427-449) is actually exercised; rows
    # carry the RAW UTM translation (offset added back).
    rows = []
    for i, p in enumerate(poses):
        for k, dt in enumerate((-23_000_000, 27_000_000)):
            q = np.asarray(p, np.float64).copy()
            q[0, 3] += ox
            q[1, 3] += oy
            q[2, 3] += oz
            if k == 1:  # far row: must NOT be selected
                q[0, 3] += 500.0
            rows.append(
                f"{stamps[i] + dt},"
                + ",".join(f"{v:.6f}" for v in q[:3, :].reshape(12))
            )
    return stamps, "\n".join(rows) + "\n"


@pytest.mark.slow
def test_mulran_layout_end_to_end(tmp_path, capsys):
    from sgtd_tpu import cli
    from sgtd_tpu.data.synthetic import make_world

    rng = np.random.default_rng(12)
    world = make_world(
        rng, extent_m=150.0, instances_per_100m2=0.5,
        num_map_frames=8, num_queries=2, query_offset_m=2.0,
    )
    dirs = {}
    for side in ("m", "q"):
        for name in ("scans", "labels", "graphs"):
            d = tmp_path / f"{side}{name}"
            d.mkdir()
            dirs[f"{side}{name}"] = str(d)

    m_dirs = {"scans": dirs["mscans"], "labels": dirs["mlabels"]}
    q_dirs = {"scans": dirs["qscans"], "labels": dirs["qlabels"]}
    _, m_pose_txt = _write_mulran_side(
        world, world.map_poses, m_dirs, rng, 1_561_000_000_000_000_000
    )
    _, q_pose_txt = _write_mulran_side(
        world, world.query_poses, q_dirs, rng, 1_562_000_000_000_000_000
    )
    (tmp_path / "m_pose.txt").write_text(m_pose_txt)
    (tmp_path / "q_pose.txt").write_text(q_pose_txt)

    cli.main([
        "build-map", "--scans", dirs["mscans"], "--labels", dirs["mlabels"],
        "--dataset", "mulran", "--sequence", "KAIST02",
        "--poses", str(tmp_path / "m_pose.txt"), "--out", dirs["mgraphs"],
    ])
    cli.main([
        "build-map", "--scans", dirs["qscans"], "--labels", dirs["qlabels"],
        "--dataset", "mulran", "--sequence", "KAIST03",
        "--poses", str(tmp_path / "q_pose.txt"), "--out", dirs["qgraphs"],
    ])

    # The graph JSONs must carry the UTM-corrected (local-frame) poses:
    # timestamp association picked the -23 ms row, not the +27 ms decoy.
    g0 = json.loads(sorted(
        (tmp_path / "mgraphs").glob("*.json")
    )[0].read_text())
    gt0 = np.asarray(g0["poses"], np.float64).reshape(-1, 4)
    assert np.allclose(gt0[:3, 3], world.map_poses[0][:3, 3], atol=1e-3), (
        gt0[:3, 3], world.map_poses[0][:3, 3]
    )

    capsys.readouterr()
    cli.main([
        "localize",
        "--map-graphs", dirs["mgraphs"], "--query-graphs", dirs["qgraphs"],
        "--batch-size", "2",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["total"] == 2
    assert out["success_rate"] == 1.0, out


@pytest.mark.slow
def test_wild_profile_from_files(tmp_path, capsys, rng):
    """--dataset wild: 3-float stride scans + identity node labels."""
    from sgtd_tpu import cli

    sdir = tmp_path / "scans"
    ldir = tmp_path / "labels"
    odir = tmp_path / "graphs"
    sdir.mkdir(); ldir.mkdir()
    # dirt ground (class 1, kept whole) + a trunk blob (12) + foliage (11,
    # dropped) — the routing assertions of tests/test_cluster_graph.py's
    # unit test, but from FILES through the CLI.
    ground = np.column_stack([
        rng.uniform(-20, 20, 300), rng.uniform(-20, 20, 300),
        rng.normal(0, 0.05, 300),
    ])
    trunk = np.array([8.0, 3.0, 1.0]) + rng.normal(0, 0.2, (150, 3))
    foliage = np.array([-6.0, 5.0, 4.0]) + rng.normal(0, 0.5, (200, 3))
    pts = np.concatenate([ground, trunk, foliage]).astype(np.float32)
    sem = np.concatenate(
        [np.full(300, 1), np.full(150, 12), np.full(200, 11)]
    ).astype(np.uint32)
    # 3-float stride: no intensity column.
    pts.astype(np.float32).tofile(sdir / "000000.bin")
    write_label(str(ldir / "000000.label"), sem)

    cli.main([
        "build-map", "--scans", str(sdir), "--labels", str(ldir),
        "--dataset", "wild", "--out", str(odir),
    ])
    g = json.loads((odir / "000000.json").read_text())
    assert 1 in g["nodes"]      # dirt kept whole
    assert 12 in g["nodes"]     # trunk clustered
    assert 11 not in g["nodes"]  # foliage dropped
