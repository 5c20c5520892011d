"""Binary readers, label packing, pose association, remaps."""

import numpy as np

from sgtd_tpu.io.readers import (
    apply_mulran_utm_offset,
    associate_by_timestamp,
    corrupt_labels,
    read_bin,
    read_kitti_poses,
    read_label,
    read_mulran_poses,
    remap_semantic_kitti,
    to_reference_train_ids,
)


def test_bin_label_roundtrip(tmp_path, rng):
    pts = rng.normal(0, 10, (100, 4)).astype(np.float32)
    (tmp_path / "scan.bin").write_bytes(pts.tobytes())
    out = read_bin(str(tmp_path / "scan.bin"))
    np.testing.assert_array_equal(out, pts)

    sem = rng.integers(0, 260, 100).astype(np.uint32)
    inst = rng.integers(0, 1000, 100).astype(np.uint32)
    packed = (sem & 0xFFFF) | (inst << 16)
    (tmp_path / "scan.label").write_bytes(packed.astype(np.uint32).tobytes())
    s, i = read_label(str(tmp_path / "scan.label"))
    np.testing.assert_array_equal(s, sem & 0xFFFF)
    np.testing.assert_array_equal(i, inst)


def test_semantic_kitti_remap():
    raw = np.array([0, 10, 40, 50, 70, 81, 252])
    out = remap_semantic_kitti(raw)
    np.testing.assert_array_equal(out, [0, 1, 9, 13, 15, 19, 1])
    ref = to_reference_train_ids(out)
    # 0 (unlabeled) -> 19 (ignore), car train-id 1 -> reference class 0.
    np.testing.assert_array_equal(ref, [19, 0, 8, 12, 14, 18, 0])


def test_mulran_pose_parse_and_offset(tmp_path):
    line = "1561000000123456789," + ",".join(
        str(float(v)) for v in [1, 0, 0, 353060.0, 0, 1, 0, 4026801.0, 0, 0, 1, 20.0]
    )
    (tmp_path / "pose.txt").write_text(line + "\n")
    stamps, poses = read_mulran_poses(str(tmp_path / "pose.txt"))
    assert stamps[0] == 1561000000123456789
    off = apply_mulran_utm_offset(poses, "KAIST02")
    np.testing.assert_allclose(off[0, :3, 3], [10.0, 10.0, 1.0], atol=1e-6)


def test_timestamp_association():
    pose_stamps = np.array([100, 200, 300, 400])
    scans = np.array([95, 105, 250, 399, 401])
    idx = associate_by_timestamp(scans, pose_stamps)
    np.testing.assert_array_equal(idx, [0, 0, 1, 3, 3])


def test_kitti_poses_with_calib(tmp_path):
    rows = np.hstack([np.eye(3), np.array([[1.0], [2.0], [3.0]])]).reshape(1, 12)
    np.savetxt(tmp_path / "poses.txt", rows)
    (tmp_path / "calib.txt").write_text(
        "Tr: 1 0 0 0.5 0 1 0 0 0 0 1 -0.1\n"
    )
    poses = read_kitti_poses(
        str(tmp_path / "poses.txt"), str(tmp_path / "calib.txt")
    )
    assert poses.shape == (1, 4, 4)
    # Identity rotation: Tr^-1 T Tr keeps translation (pure translation case).
    np.testing.assert_allclose(poses[0, :3, 3], [1.0, 2.0, 3.0], atol=1e-5)


def test_corrupt_labels():
    rng = np.random.default_rng(0)
    sem = np.full(10000, 5, dtype=np.int32)
    out = corrupt_labels(sem, 0.3, rng)
    frac = np.mean(out == 20)
    assert 0.25 < frac < 0.35
    assert np.all((out == 5) | (out == 20))
    # rate 0 is a no-op.
    np.testing.assert_array_equal(corrupt_labels(sem, 0.0, rng), sem)


def test_write_bin_label_roundtrip(tmp_path, rng):
    from sgtd_tpu.io.readers import write_bin, write_label

    pts = rng.normal(0, 5, (50, 3)).astype(np.float32)
    write_bin(str(tmp_path / "w.bin"), pts)
    back = read_bin(str(tmp_path / "w.bin"))
    np.testing.assert_array_equal(back[:, :3], pts)

    sem = rng.integers(0, 20, 50)
    inst = rng.integers(0, 99, 50)
    write_label(str(tmp_path / "w.label"), sem, inst)
    s, i = read_label(str(tmp_path / "w.label"))
    np.testing.assert_array_equal(s, sem)
    np.testing.assert_array_equal(i, inst)


def test_config_from_reference_yaml(tmp_path):
    from sgtd_tpu.io.config_yaml import config_from_yaml

    (tmp_path / "cfg.yaml").write_text(
        """
descriptor_near_num: 12
descriptor_min_len: 0.7
descriptor_max_len: 40
std_side_resolution: 1
candidate_num: 30
rough_dis_threshold: 0.05
icp_threshold: 0.6
SG_data:
    leaf_size: 2.5
    best_fitness: 10
fast_gicp:
    enable_gicp: true
    num_neighbors: 15
    max_iterations: 7
"""
    )
    cfg = config_from_yaml(str(tmp_path / "cfg.yaml"))
    assert cfg.desc.near_num == 12
    assert cfg.desc.min_len == 0.7
    assert cfg.search.candidate_num == 30
    assert cfg.search.icp_threshold == 0.6
    assert cfg.gicp.enable and cfg.gicp.num_neighbors == 15
    assert cfg.gicp.leaf_size == 2.5
