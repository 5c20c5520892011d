"""Micro-profiling of the rerank-path pieces on the real chip."""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label, fn, *args, reps=5):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"[prof] {label}: {dt*1000:.2f} ms", file=sys.stderr)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from sgtd_tpu.config import GicpConfig
    from sgtd_tpu.refine.gicp import (
        knn_indices, point_covariances, gicp_rerank,
    )
    from sgtd_tpu.refine.vgicp import vgicp_rerank, build_voxel_map
    from sgtd_tpu.ops.linalg3 import sym_eig3x3

    cfg = GicpConfig()
    B, N, K = 16, 4096, 4
    rng = np.random.default_rng(0)
    clouds = jnp.asarray(rng.uniform(-50, 50, (B, N, 3)).astype(np.float32))
    masks = jnp.ones((B, N), bool)
    tgts = jnp.asarray(
        rng.uniform(-50, 50, (B, K, N, 3)).astype(np.float32)
    )
    tmasks = jnp.ones((B, K, N), bool)
    inits = jnp.broadcast_to(jnp.eye(4), (B, K, 4, 4))

    knn = jax.jit(jax.vmap(lambda p, m: knn_indices(p, m, cfg.num_neighbors)))
    timed(f"knn_indices ({B}x{N}, k={cfg.num_neighbors})", knn, clouds, masks)

    covs_in = jnp.asarray(rng.normal(size=(B, N, 3, 3)).astype(np.float32))
    covs_in = covs_in @ jnp.swapaxes(covs_in, -1, -2)
    eig = jax.jit(jax.vmap(sym_eig3x3))
    timed(f"sym_eig3x3 ({B}x{N})", eig, covs_in)

    pcov = jax.jit(jax.vmap(functools.partial(point_covariances, cfg=cfg)))
    timed(f"point_covariances ({B}x{N})", pcov, clouds, masks)

    tcovs = jax.vmap(jax.vmap(functools.partial(point_covariances, cfg=cfg)))(
        tgts, tmasks
    )
    tcovs = jax.block_until_ready(tcovs)

    gr = jax.jit(
        jax.vmap(functools.partial(gicp_rerank, cfg=cfg), in_axes=(0, 0, 0, 0, 0, 0)),
        static_argnames=(),
    )
    def grf(c, m, t, tm, i, tc):
        return jax.vmap(functools.partial(gicp_rerank, cfg=cfg))(c, m, t, tm, i, tgt_covs=tc)
    grj = jax.jit(grf)
    timed(f"gicp_rerank ({B}q K={K})", grj, clouds, masks, tgts, tmasks, inits, tcovs)

    def vrf(c, m, t, tm, i, tc):
        return jax.vmap(functools.partial(vgicp_rerank, cfg=cfg))(c, m, t, tm, i, tgt_covs=tc)
    vrj = jax.jit(vrf)
    timed(f"vgicp_rerank ({B}q K={K})", vrj, clouds, masks, tgts, tmasks, inits, tcovs)

    # voxel map build alone (per candidate per query)
    def vmb(t, tm, tc):
        return jax.vmap(jax.vmap(
            lambda a, b, c: build_voxel_map(a, b, c, cfg.voxel_resolution)
        ))(t, tm, tc)
    vmbj = jax.jit(vmb)
    timed(f"build_voxel_map ({B}x{K})", vmbj, tgts, tmasks, tcovs)


if __name__ == "__main__":
    main()
