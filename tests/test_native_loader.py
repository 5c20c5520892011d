"""Native C++ loader vs NumPy readers: identical results + prefetching."""

import numpy as np
import pytest

from sgtd_tpu import native
from sgtd_tpu.io import readers


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("scans")
    rng = np.random.default_rng(3)
    paths = []
    for i in range(6):
        pts = rng.normal(0, 20, (500 + 17 * i, 4)).astype(np.float32)
        # a few near-origin invalid points
        pts[:5, :3] = 1e-4
        sem = rng.integers(0, 20, len(pts)).astype(np.uint32)
        inst = rng.integers(0, 100, len(pts)).astype(np.uint32)
        packed = (sem & 0xFFFF) | (inst << 16)
        b = root / f"{i:06d}.bin"
        l = root / f"{i:06d}.label"
        b.write_bytes(pts.tobytes())
        l.write_bytes(packed.astype(np.uint32).tobytes())
        paths.append((str(b), str(l)))
    return paths


def test_native_builds():
    assert native.native_available(), "native loader failed to build"


def test_load_scan_matches_numpy(dataset):
    b, l = dataset[0]
    xyz, sem, inst = native.load_scan(b, l)
    ref_pts = readers.read_bin(b)
    ref_sem, ref_inst = readers.read_label(l)
    np.testing.assert_array_equal(xyz, ref_pts[:, :3])
    np.testing.assert_array_equal(sem, ref_sem)
    np.testing.assert_array_equal(inst, ref_inst)


def test_load_scan_min_norm_filter(dataset):
    b, l = dataset[0]
    xyz, sem, inst = native.load_scan(b, l, min_norm=0.1)
    assert np.all(np.linalg.norm(xyz, axis=1) >= 0.1)
    full, _, _ = native.load_scan(b, l)
    assert len(xyz) == len(full) - 5


def test_prefetching_loader(dataset):
    bins = [b for b, _ in dataset]
    labels = [l for _, l in dataset]
    loader = native.PrefetchingLoader(bins, labels, n_threads=2, depth=3)
    try:
        for i in [0, 1, 2, 5, 3, 0]:  # including out-of-order access
            xyz, sem, inst = loader.get(i)
            rxyz, rsem, rinst = native.load_scan(bins[i], labels[i])
            np.testing.assert_array_equal(xyz, rxyz)
            np.testing.assert_array_equal(sem, rsem)
            np.testing.assert_array_equal(inst, rinst)
    finally:
        loader.close()
