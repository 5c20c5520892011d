"""On-device descriptor-database assembly.

The host-side build (db.database.build_database_stacked) pulls every
descriptor field to the host; on remote-attached accelerators those bulk
transfers dominate map-build time (measured 100-400 s for a 200-keyframe
map). This path assembles the same DescriptorDB entirely on device — one
sort + gathers + a searchsorted cell table — so nothing crosses the wire
except the bucket-stat scalars used for config tuning.

Row capacity is static: F x max_descriptors rows with padding rows keyed
PAD_KEY and sorted to the end (same layout the host build produces, so the
two paths are interchangeable).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sgtd_tpu.config import DescriptorConfig
from sgtd_tpu.db.database import DBBuildReport, DescriptorDB, PAD_KEY
from sgtd_tpu.desc.keys import validate_key_space, _N_CODES
from sgtd_tpu.desc.triangles import Descriptors


@functools.partial(jax.jit, static_argnames=("cfg",))
def _assemble(descs: Descriptors, poses: jnp.ndarray, cfg: DescriptorConfig):
    extent = validate_key_space(cfg)
    f_n, d_n = descs.mask.shape
    m = f_n * d_n

    sides = descs.sides.reshape(m, 3)
    labels = descs.labels.reshape(m, 3)
    verts = descs.vertices.reshape(m, 3, 3)
    frames = jnp.repeat(jnp.arange(f_n, dtype=jnp.int32), d_n)
    valid = descs.mask.reshape(m)

    q = jnp.clip(jnp.floor(sides + 0.5).astype(jnp.int32), 0, extent - 1)
    l = jnp.clip(labels, 0, 12)
    code = (l[:, 0] * 13 + l[:, 1]) * 13 + l[:, 2]
    key = ((q[:, 0] * extent + q[:, 1]) * extent + q[:, 2]) * _N_CODES + code
    key = jnp.where(valid, key, jnp.int32(PAD_KEY))

    order = jnp.argsort(key)
    key_s = key[order]
    sides_s = sides[order]
    verts_s = verts[order]
    frames_s = frames[order]
    valid_s = valid[order]

    codes = jnp.where(valid_s, key_s % _N_CODES, -1)
    qs = jnp.clip(jnp.round(sides_s * 256.0), 0, 65535).astype(jnp.uint32)
    packed_lo = qs[:, 0] | (qs[:, 1] << 16)
    packed_hi = qs[:, 2] | (frames_s.astype(jnp.uint32) << 16)

    n_cells_total = extent * extent * extent
    cells = jnp.where(valid_s, key_s // _N_CODES, n_cells_total)
    cell_start = jnp.searchsorted(
        cells, jnp.arange(n_cells_total + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    # Bucket stats on device: run lengths over the sorted keys.
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
    ) & valid_s
    group = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    counts = jax.ops.segment_sum(
        valid_s.astype(jnp.int32), jnp.maximum(group, 0), num_segments=m
    )
    max_bucket = jnp.max(counts)
    n_buckets = jnp.sum(is_first.astype(jnp.int32))
    cfirst = jnp.concatenate(
        [jnp.ones((1,), bool), cells[1:] != cells[:-1]]
    ) & valid_s
    cgroup = jnp.cumsum(cfirst.astype(jnp.int32)) - 1
    ccounts = jax.ops.segment_sum(
        valid_s.astype(jnp.int32), jnp.maximum(cgroup, 0), num_segments=m
    )
    max_cell = jnp.max(ccounts)
    n_cells = jnp.sum(cfirst.astype(jnp.int32))
    n_rows = jnp.sum(valid_s.astype(jnp.int32))

    f_pad = max(-(-f_n // 8) * 8, 8)
    fp = jnp.tile(jnp.eye(4, dtype=jnp.float32), (f_pad, 1, 1))
    fp = fp.at[:f_n].set(poses.astype(jnp.float32))
    fv = jnp.zeros(f_pad, bool).at[:f_n].set(True)

    db = DescriptorDB(
        keys=key_s,
        codes=codes.astype(jnp.int32),
        packed_lo=packed_lo,
        packed_hi=packed_hi,
        vertices=verts_s,
        frame_ids=frames_s,
        cell_start=cell_start,
        frame_poses=fp,
        frame_valid=fv,
    )
    stats = jnp.stack([n_rows, n_buckets, max_bucket, n_cells, max_cell])
    return db, stats


def build_database_on_device(
    descs: Descriptors,
    poses: jnp.ndarray,
    cfg: DescriptorConfig = DescriptorConfig(),
    bucket_cap_for_report: int = 256,
) -> Tuple[DescriptorDB, DBBuildReport]:
    """Assemble the DB from stacked (F, D, ...) descriptors without bulk
    device->host transfers. ``poses``: (F, 4, 4)."""
    db, stats = _assemble(descs, jnp.asarray(poses), cfg)
    n_rows, n_buckets, max_bucket, n_cells, max_cell = (
        int(x) for x in np.asarray(stats)
    )
    if max_cell > 65536:
        raise ValueError(
            f"a quantised cell holds {max_cell} rows (> 65536); the probe's "
            "in-cell binary search cannot cover it"
        )
    report = DBBuildReport(
        num_rows=n_rows,
        num_frames=int(descs.mask.shape[0]),
        num_cells=n_cells,
        max_bucket=max_bucket,
        rows_beyond_cap=0 if max_bucket <= bucket_cap_for_report else -1,
        max_cell_bucket=max_cell,
    )
    return db, report
