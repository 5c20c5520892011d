"""Dense sorted descriptor database.

TPU-native replacement for the reference's in-memory hash DB
``std::unordered_map<STDesc_LOC, std::vector<STDesc>>`` filled by
``STDescManager::AddSTDescs`` (src/sgtd/src/STDesc.cpp:149-172, STDesc.h:370).

Design: all map keyframes' descriptors are flattened into one table sorted by
the packed int32 geometric-hash key. A "bucket" (all descriptors with an
identical key) is then a contiguous row range found with two searchsorted
calls — the TPU analog of a hash-bucket scan, with zero pointers and a fully
static access pattern.

The build runs host-side in NumPy (it is a one-off, ~seconds — the reference
also rebuilds its DB from JSON at startup, src/readme.txt:5) and the result is
a pytree of device arrays. Serialization is a plain ``.npz`` so loading a map
is a ``device_put``, not a rebuild.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from sgtd_tpu.config import CapacityConfig, DescriptorConfig
from sgtd_tpu.desc.keys import key_extent, validate_key_space, _N_CODES
from sgtd_tpu.desc.triangles import Descriptors

# Sentinel key for padding rows: larger than any real packed key.
PAD_KEY = np.int32(2**31 - 1)


class DescriptorDB(NamedTuple):
    """Sorted descriptor table + keyframe store.

    keys:        (M,) int32, ascending; padding rows hold PAD_KEY.
    sides:       (M, 3) float32 — scaled side lengths.
    vertices:    (M, 3, 3) float32 — rows A, B, C (map-keyframe local frame).
    frame_ids:   (M,) int32 — owning keyframe.
    frame_poses: (F, 4, 4) float32 — keyframe poses (world from sensor).
    frame_valid: (F,) bool.
    """

    keys: jnp.ndarray
    sides: jnp.ndarray
    vertices: jnp.ndarray
    frame_ids: jnp.ndarray
    frame_poses: jnp.ndarray
    frame_valid: jnp.ndarray

    @property
    def num_rows(self) -> int:
        return self.keys.shape[0]

    @property
    def num_frames(self) -> int:
        return self.frame_poses.shape[0]


@dataclasses.dataclass
class DBBuildReport:
    """Coverage stats — a DB build never truncates silently."""

    num_rows: int
    num_frames: int
    num_buckets: int
    max_bucket: int
    # Rows beyond ``bucket_cap`` in their bucket: probes will not see them.
    rows_beyond_cap: int

    def truncated_fraction(self) -> float:
        return self.rows_beyond_cap / max(self.num_rows, 1)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def build_database(
    desc_list: Sequence[Descriptors],
    poses: Sequence[np.ndarray],
    cfg: DescriptorConfig = DescriptorConfig(),
    caps: CapacityConfig = CapacityConfig(),
) -> Tuple[DescriptorDB, DBBuildReport]:
    """Assemble the sorted DB from per-keyframe descriptor sets.

    ``desc_list[i]`` are the descriptors of keyframe ``i`` (built with
    :func:`sgtd_tpu.desc.triangles.build_descriptors`), ``poses[i]`` its
     4x4 world-from-sensor pose.
    """
    extent = validate_key_space(cfg)

    all_keys, all_sides, all_verts, all_frames = [], [], [], []
    for fid, d in enumerate(desc_list):
        m = np.asarray(d.mask)
        sides = np.asarray(d.sides)[m]
        labels = np.asarray(d.labels)[m]
        verts = np.asarray(d.vertices)[m]
        # Insertion quantisation: round-half-up (ref STDesc.cpp:155-157).
        q = np.floor(sides + 0.5).astype(np.int64)
        q = np.clip(q, 0, extent - 1)
        l = np.clip(labels.astype(np.int64), 0, 12)
        code = (l[:, 0] * 13 + l[:, 1]) * 13 + l[:, 2]
        key = ((q[:, 0] * extent + q[:, 1]) * extent + q[:, 2]) * _N_CODES + code
        all_keys.append(key.astype(np.int32))
        all_sides.append(sides.astype(np.float32))
        all_verts.append(verts.astype(np.float32))
        all_frames.append(np.full(key.shape[0], fid, dtype=np.int32))

    keys = np.concatenate(all_keys) if all_keys else np.zeros(0, np.int32)
    sides = (
        np.concatenate(all_sides) if all_sides else np.zeros((0, 3), np.float32)
    )
    verts = (
        np.concatenate(all_verts)
        if all_verts
        else np.zeros((0, 3, 3), np.float32)
    )
    frames = (
        np.concatenate(all_frames) if all_frames else np.zeros(0, np.int32)
    )

    order = np.argsort(keys, kind="stable")
    keys, sides, verts, frames = keys[order], sides[order], verts[order], frames[order]

    # Bucket stats (buckets = runs of equal keys).
    if keys.size:
        uniq, counts = np.unique(keys, return_counts=True)
        max_bucket = int(counts.max())
        beyond = int(np.maximum(counts - caps.bucket_cap, 0).sum())
        n_buckets = int(uniq.size)
    else:
        max_bucket, beyond, n_buckets = 0, 0, 0

    n = keys.shape[0]
    m_pad = max(_round_up(n, 128), 128)
    pad = m_pad - n
    keys = np.pad(keys, (0, pad), constant_values=PAD_KEY)
    sides = np.pad(sides, ((0, pad), (0, 0)))
    verts = np.pad(verts, ((0, pad), (0, 0), (0, 0)))
    frames = np.pad(frames, (0, pad))

    f = len(desc_list)
    f_pad = max(_round_up(f, 8), 8)
    fp = np.tile(np.eye(4, dtype=np.float32), (f_pad, 1, 1))
    for i, p in enumerate(poses):
        fp[i] = np.asarray(p, dtype=np.float32).reshape(4, 4)
    fv = np.zeros(f_pad, dtype=bool)
    fv[:f] = True

    db = DescriptorDB(
        keys=jnp.asarray(keys),
        sides=jnp.asarray(sides),
        vertices=jnp.asarray(verts),
        frame_ids=jnp.asarray(frames),
        frame_poses=jnp.asarray(fp),
        frame_valid=jnp.asarray(fv),
    )
    report = DBBuildReport(
        num_rows=n,
        num_frames=f,
        num_buckets=n_buckets,
        max_bucket=max_bucket,
        rows_beyond_cap=beyond,
    )
    return db, report


def save_database(path: str, db: DescriptorDB) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in db._asdict().items()})


def load_database(path: str) -> DescriptorDB:
    z = np.load(path)
    return DescriptorDB(**{k: jnp.asarray(z[k]) for k in DescriptorDB._fields})
