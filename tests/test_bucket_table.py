"""Direct-addressed bucket table vs in-cell bisection: exact parity.

The probe stage's fast path (db.bucket_table, built at DB assembly) must
return bit-identical votes and hit lists to the binary-search fallback used
for DBs beyond the table limits (2^31 rows / slot budget).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtd_tpu.data.synthetic import make_map_and_queries
from sgtd_tpu.db.database import (
    build_database,
    save_database,
    load_database,
)
from sgtd_tpu.db.device_build import build_database_on_device
from sgtd_tpu.desc.triangles import build_descriptors
from sgtd_tpu.eval.runner import stack_graphs
from sgtd_tpu.match.search import probe_and_hits, probe_ranges


@pytest.fixture(scope="module")
def setup(small_config):
    cfg = small_config
    map_graphs, query_graphs, _ = make_map_and_queries(
        cfg, seed=21, num_map_frames=16, num_queries=6,
        center_noise_m=0.05, dropout=0.1, label_corrupt_rate=0.05,
    )
    descs = [build_descriptors(g, cfg.desc, cfg.caps) for g in map_graphs]
    db, report = build_database(
        descs, [np.asarray(g.pose) for g in map_graphs], cfg.desc, cfg.caps
    )
    queries = [build_descriptors(g, cfg.desc, cfg.caps) for g in query_graphs]
    return cfg, db, report, queries


def _without_table(db):
    return db._replace(
        bucket_table=jnp.zeros((0, 2), jnp.uint32),
        cell_remap=jnp.zeros(0, jnp.int32),
        code_remap=jnp.zeros(0, jnp.int32),
    )


def test_host_build_has_table(setup):
    _, db, report, _ = setup
    assert db.has_direct_table
    # Every (cell, code) bucket of the sorted key table is in the direct
    # table with its exact range.
    keys = np.asarray(db.keys)
    real = keys != np.int32(2**31 - 1)
    uniq, starts, counts = np.unique(
        keys[real], return_index=True, return_counts=True
    )
    table = np.asarray(db.bucket_table)
    cell_remap = np.asarray(db.cell_remap)
    code_remap = np.asarray(db.code_remap)
    stride = int(db.table_stride[0])
    for k, s, c in zip(uniq, starts, counts):
        dc = cell_remap[k // 2197]
        dk = code_remap[k % 2197]
        assert dc >= 0 and dk >= 0
        start, length = table[dc * stride + dk]
        assert int(start) == s
        assert int(length) == c


def test_probe_parity_table_vs_bisection(setup):
    cfg, db, _, queries = setup
    db_nt = _without_table(db)
    for q in queries:
        v1, r1, f1 = probe_and_hits(db, q, cfg.desc, cfg.search, cfg.caps)[:3]
        v2, r2, f2 = probe_and_hits(db_nt, q, cfg.desc, cfg.search, cfg.caps)[:3]
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_probe_ranges_parity_with_offset(setup):
    cfg, db, _, queries = setup
    db_nt = _without_table(db)
    m = db.keys.shape[0]
    half = m // 2
    # Shard-local view of the second half of the rows.
    local = jax.tree_util.tree_map(
        lambda x: x[half:] if x.shape[:1] == (m,) else x, db
    )
    local_nt = jax.tree_util.tree_map(
        lambda x: x[half:] if x.shape[:1] == (m,) else x, db_nt
    )
    off = jnp.int32(half)
    for q in queries[:2]:
        s1, e1, ok1 = probe_ranges(local, q, cfg.desc, row_offset=off)
        s2, e2, ok2 = probe_ranges(local_nt, q, cfg.desc, row_offset=off)
        # The table path's ok additionally excludes provably-empty probes;
        # the contract consumers rely on is the masked scan LENGTH (and the
        # start row wherever the length is nonzero).
        l1 = np.where(np.asarray(ok1), np.asarray(e1 - s1), 0)
        l2 = np.where(np.asarray(ok2), np.asarray(e2 - s2), 0)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(
            np.where(l1 > 0, np.asarray(s1), 0), np.where(l2 > 0, np.asarray(s2), 0)
        )


def test_device_build_matches_host_table(setup):
    cfg, db, report, _ = setup
    # Rebuild the same DB on device from stacked descriptors and compare
    # probe results (table contents may order dense ids identically since
    # both derive from the same sorted key set).
    map_graphs, _, _ = make_map_and_queries(
        cfg, seed=21, num_map_frames=16, num_queries=6,
        center_noise_m=0.05, dropout=0.1, label_corrupt_rate=0.05,
    )
    batch = stack_graphs(map_graphs)
    descs = jax.vmap(
        lambda g: build_descriptors(g, cfg.desc, cfg.caps)
    )(batch)
    ddb, dreport = build_database_on_device(
        descs, batch.pose, cfg.desc, table_slots=cfg.caps.bucket_table_slots
    )
    assert ddb.has_direct_table
    assert dreport.num_rows == report.num_rows
    q_graphs = make_map_and_queries(
        cfg, seed=21, num_map_frames=16, num_queries=6,
        center_noise_m=0.05, dropout=0.1, label_corrupt_rate=0.05,
    )[1]
    for g in q_graphs[:3]:
        q = build_descriptors(g, cfg.desc, cfg.caps)
        v1, _, f1 = probe_and_hits(db, q, cfg.desc, cfg.search, cfg.caps)[:3]
        v2, _, f2 = probe_and_hits(ddb, q, cfg.desc, cfg.search, cfg.caps)[:3]
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_save_load_roundtrip_with_table(setup, tmp_path):
    _, db, _, _ = setup
    p = str(tmp_path / "db.npz")
    save_database(p, db)
    db2 = load_database(p)
    assert db2.has_direct_table
    np.testing.assert_array_equal(
        np.asarray(db.bucket_table), np.asarray(db2.bucket_table)
    )


def test_load_old_format_raises_clear_error(setup, tmp_path):
    """Pre-packed2 (v1) DB files fail with a 'rebuild' message, not a bare
    KeyError (ADVICE r3)."""
    import pytest

    _, db, _, _ = setup
    p = str(tmp_path / "old.npz")
    fields = {k: np.asarray(v) for k, v in db._asdict().items()}
    # Simulate the round-2 layout: no version tag, split packed words.
    del fields["packed2"]
    fields["packed_lo"] = np.zeros(db.keys.shape[0], np.uint32)
    fields["packed_hi"] = np.zeros(db.keys.shape[0], np.uint32)
    np.savez_compressed(p, **fields)
    with pytest.raises(ValueError, match="rebuild"):
        load_database(p)
