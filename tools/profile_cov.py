"""Settle the point_covariances discrepancy: 155 ms/dispatch (profile_stages,
render_cloud data) vs 0.04 ms (profile_gicp, random data) for the identical
op. Times the op with the slope method (k dispatches chained by a dummy
dependency are impossible for independent ops, so instead: N pipelined
dispatches, block once, vary N — overhead cancels in the difference).

Also splits knn vs eig on the real data, and times the approx_min_k variant.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from sgtd_tpu.config import GicpConfig, SGTDConfig
from sgtd_tpu.data.synthetic import make_map_and_queries, render_cloud
from sgtd_tpu.ops.linalg3 import sym_eig3x3
from sgtd_tpu.refine.gicp import knn_indices, point_covariances


def slope_time(label, fn, args_list, n_lo=2, n_hi=8):
    """Pipelined-dispatch slope: (t(n_hi) - t(n_lo)) / (n_hi - n_lo).

    args_list must hold >= n_hi distinct argument tuples (distinct buffers,
    so neither XLA nor the relay can alias anything)."""
    out = jax.block_until_ready(fn(*args_list[0]))  # compile + warm

    def run(n):
        t0 = time.time()
        o = None
        for i in range(n):
            o = fn(*args_list[i % len(args_list)])
        jax.block_until_ready(o)
        return time.time() - t0

    run(2)
    t_lo, t_hi = run(n_lo), run(n_hi)
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    print(f"[cov] {label:44s} {dt*1000:8.2f} ms/dispatch "
          f"({dt*1000/16:6.2f} ms/query)")
    return dt


def main():
    cfg = SGTDConfig()
    gcfg = cfg.gicp
    rng = np.random.default_rng(77)

    # Real bench clouds.
    _, queries, world = make_map_and_queries(
        cfg, seed=2026, num_map_frames=8, num_queries=32,
        center_noise_m=0.05, dropout=0.1, label_corrupt_rate=0.05,
    )
    qk = [render_cloud(world, p, rng, max_points=4096)
          for p in world.query_poses]
    clouds = np.stack([c for c, _ in qk])
    masks = np.stack([m for _, m in qk])
    print(f"[cov] real clouds: {clouds.shape}, mask fill "
          f"{masks.mean():.3f}", file=sys.stderr)
    real = [(jnp.asarray(clouds[i:i+16]), jnp.asarray(masks[i:i+16]))
            for i in range(0, 17, 2)]  # 9 overlapping distinct batches

    # Random clouds (profile_gicp's workload).
    rand = []
    for i in range(9):
        c = rng.normal(size=(16, 4096, 3)).astype(np.float32) * 30
        rand.append((jnp.asarray(c), jnp.ones((16, 4096), bool)))

    pc = jax.jit(jax.vmap(functools.partial(point_covariances, cfg=gcfg)))
    slope_time("point_covariances REAL clouds", pc, real)
    slope_time("point_covariances RANDOM clouds", pc, rand)

    knn = jax.jit(jax.vmap(
        lambda p, m: knn_indices(p, m, gcfg.num_neighbors)))
    slope_time("knn_indices REAL", knn, real)
    slope_time("knn_indices RANDOM", knn, rand)

    # eig on the covariance inputs from real data
    def cov_only(points, mask):
        idx = knn_indices(points, mask, gcfg.num_neighbors)
        neigh = points[idx]
        mu = jnp.mean(neigh, axis=1, keepdims=True)
        d = neigh - mu
        return jnp.sum(d[..., :, None] * d[..., None, :], axis=-3)

    co = jax.jit(jax.vmap(cov_only))
    slope_time("knn+cov (no eig) REAL", co, real)

    eigf = jax.jit(jax.vmap(sym_eig3x3))
    covs = [(jax.block_until_ready(co(*a)),) for a in real[:9]]
    slope_time("sym_eig3x3 on real covs", eigf, covs)


if __name__ == "__main__":
    main()
