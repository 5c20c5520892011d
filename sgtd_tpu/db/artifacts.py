"""Persistent per-keyframe map artifacts for the registration rerank.

The reference recomputes target covariances and (for VGICP) the Gaussian
voxel map on every ``setInputTarget`` — once per query x candidate
(fast_gicp_impl.hpp:60-72). Keyframe clouds are pose-independent map data,
so here they are computed ONCE at map build, persisted alongside the DB
``.npz``, and gathered per candidate at query time: the query path does
zero per-query target covariance or voxel work (VERDICT r3 next-#5).

``MapArtifacts`` carries, per keyframe: the (padded) cloud, its mask, the
plane-regularized GICP point covariances, and optionally the stacked
Gaussian voxel maps for the VGICP engine.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sgtd_tpu.config import GicpConfig
from sgtd_tpu.refine.gicp import point_covariances
from sgtd_tpu.refine.vgicp import GaussianVoxelMap, build_voxel_maps

ARTIFACTS_FORMAT_VERSION = 1


class MapArtifacts(NamedTuple):
    clouds: jnp.ndarray  # (F, P, 3) float32
    masks: jnp.ndarray  # (F, P) bool
    covs: jnp.ndarray  # (F, P, 3, 3) float32
    vmaps: Optional[GaussianVoxelMap]  # stacked leading F axis, or None


def build_map_artifacts(
    map_cloud_fn: Callable[[int], tuple],
    num_frames: int,
    cfg: GicpConfig,
    f_pad: int | None = None,
    with_vmaps: bool | None = None,
    batch: int = 64,
) -> MapArtifacts:
    """Compute all per-keyframe artifacts in batched device passes.

    map_cloud_fn(frame_id) -> (points (P, 3), mask (P,)) on host.
    ``f_pad``: pad the frame axis to this count (identity clouds) so the
    artifact arrays align with the DB's padded ``frame_poses``.
    ``with_vmaps`` defaults to (engine == "vgicp").
    """
    clouds, masks = zip(*(map_cloud_fn(i) for i in range(num_frames)))
    clouds = np.stack([np.asarray(c) for c in clouds]).astype(np.float32)
    masks = np.stack([np.asarray(m) for m in masks]).astype(bool)
    if f_pad is not None and f_pad > num_frames:
        pad = f_pad - num_frames
        clouds = np.pad(clouds, ((0, pad), (0, 0), (0, 0)))
        masks = np.pad(masks, ((0, pad), (0, 0)))
    clouds = jnp.asarray(clouds)
    masks = jnp.asarray(masks)

    cov_fn = jax.jit(jax.vmap(functools.partial(point_covariances, cfg=cfg)))
    covs = []
    f_n = clouds.shape[0]
    for i in range(0, f_n, batch):
        covs.append(cov_fn(clouds[i : i + batch], masks[i : i + batch]))
    covs = jnp.concatenate(covs, axis=0)

    if with_vmaps is None:
        with_vmaps = cfg.engine == "vgicp"
    vmaps = None
    if with_vmaps:
        vms = []
        vm_fn = jax.jit(
            functools.partial(build_voxel_maps, cfg=cfg)
        )
        for i in range(0, f_n, batch):
            vms.append(
                vm_fn(clouds[i : i + batch], masks[i : i + batch],
                      covs[i : i + batch])
            )
        vmaps = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *vms
        )
    return MapArtifacts(clouds=clouds, masks=masks, covs=covs, vmaps=vmaps)


def save_map_artifacts(path: str, art: MapArtifacts) -> None:
    """Persist next to the DB .npz; load is a device_put, not a rebuild."""
    fields = {
        "format_version": np.int32(ARTIFACTS_FORMAT_VERSION),
        "clouds": np.asarray(art.clouds),
        "masks": np.asarray(art.masks),
        "covs": np.asarray(art.covs),
    }
    if art.vmaps is not None:
        for k, v in art.vmaps._asdict().items():
            fields[f"vmap_{k}"] = np.asarray(v)
    np.savez_compressed(path, **fields)


def load_map_artifacts(path: str) -> MapArtifacts:
    z = np.load(path)
    version = int(z["format_version"]) if "format_version" in z else 0
    if version != ARTIFACTS_FORMAT_VERSION:
        raise ValueError(
            f"{path}: map-artifacts format v{version} is incompatible with "
            f"v{ARTIFACTS_FORMAT_VERSION} — rebuild with build_map_artifacts"
        )
    vmaps = None
    if "vmap_keys" in z:
        vmaps = GaussianVoxelMap(
            **{k: jnp.asarray(z[f"vmap_{k}"]) for k in GaussianVoxelMap._fields}
        )
    return MapArtifacts(
        clouds=jnp.asarray(z["clouds"]),
        masks=jnp.asarray(z["masks"]),
        covs=jnp.asarray(z["covs"]),
        vmaps=vmaps,
    )
