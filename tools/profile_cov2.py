"""Micro-profile point_covariances internals with dependent chains.

Splits the 9.4 ms/query source-covariance stage (tools/profile_refined.py,
BENCH_NOTES stage table) into: kNN (matmul+top_k), neighbour gather + outer
product, closed-form eig3 + reconstruction. Chain timing per chain_prof.py:
iteration i+1's input depends on iteration i's output, so ops cannot
pipeline and the relay's dispatch/sync overhead cancels.

Run: python tools/profile_cov2.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

CHUNK = 16
N = 4096
K = 20


def chain_time(label, carry0, step_fn, k_lo=1, k_hi=7, reps=3, batch=CHUNK):
    def prog(k):
        @jax.jit
        def f(carry):
            for _ in range(k):
                carry = step_fn(carry)
            return jnp.sum(carry.ravel()[:1].astype(jnp.float32))
        return f

    f_lo, f_hi = prog(k_lo), prog(k_hi)
    float(f_lo(carry0)); float(f_hi(carry0))
    t_lo = t_hi = 0.0
    for _ in range(reps):
        t0 = time.time(); float(f_lo(carry0)); t_lo += time.time() - t0
        t0 = time.time(); float(f_hi(carry0)); t_hi += time.time() - t0
    dt = (t_hi - t_lo) / ((k_hi - k_lo) * reps)
    print(f"[cov2] {label:44s} {dt*1000:8.2f} ms/op ({dt*1000/batch:6.3f} ms/query)")
    return dt


def main():
    from sgtd_tpu.config import GicpConfig
    from sgtd_tpu.ops.linalg3 import sym_eig3x3
    from sgtd_tpu.refine.gicp import knn_indices, point_covariances, _bsum_mm

    cfg = GicpConfig()
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-50, 50, (CHUNK, N, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((CHUNK, N), bool))
    eps = jnp.float32(1e-9)

    # 1. full point_covariances
    pc = jax.vmap(functools.partial(point_covariances, cfg=cfg))
    chain_time("point_covariances FULL", pts,
               lambda c: c + eps * pc(c, mask)[:, :1, :1, 0], k_hi=5)

    # 2. kNN alone (matmul + top_k under lax.map)
    knn = jax.vmap(functools.partial(knn_indices, k=K))
    chain_time("knn_indices (matmul+top_k)", pts,
               lambda c: c + eps * knn(c, mask)[:, :1, :1].astype(jnp.float32),
               k_hi=5)

    # 3. distance matmul alone (no top_k): same chunked form
    def dists_only(p):
        ref_sq = jnp.sum(p * p, axis=-1)
        def body(qc):
            q_sq = jnp.sum(qc * qc, axis=-1)
            cross = jnp.dot(qc, p.T, precision=jax.lax.Precision.HIGHEST)
            d = q_sq[:, None] + ref_sq[None, :] - 2.0 * cross
            return jnp.min(d, axis=1)  # cheap reduce to avoid huge output
        return jax.lax.map(body, p.reshape(4, 1024, 3)).reshape(N)
    dd = jax.vmap(dists_only)
    chain_time("dist matmul + min (no top_k)", pts,
               lambda c: c + eps * dd(c)[:, :1, None], k_hi=5)

    # 3b. distance matmul + top_k WITHOUT lax.map (one (4096,4096) block)
    def knn_nomap(p):
        ref_sq = jnp.sum(p * p, axis=-1)
        q_sq = ref_sq
        cross = jnp.dot(p, p.T, precision=jax.lax.Precision.HIGHEST)
        d = q_sq[:, None] + ref_sq[None, :] - 2.0 * cross
        _, idx = jax.lax.top_k(-d, K)
        return idx
    km = jax.vmap(knn_nomap)
    chain_time("knn one-block (4096x4096 top_k)", pts,
               lambda c: c + eps * km(c)[:, :1, :1].astype(jnp.float32),
               k_hi=3)

    # 4. gather + outer product + eig3 + reconstruct, fixed idx
    idx0 = jax.block_until_ready(knn(pts, mask))
    def cov_from_idx(p, idx):
        neigh = p[idx]
        mu = jnp.mean(neigh, axis=1, keepdims=True)
        d = neigh - mu
        cov = jnp.sum(d[..., :, None] * d[..., None, :], axis=-3) / K
        _, vecs = sym_eig3x3(cov)
        vals_reg = jnp.asarray([cfg.plane_eps, 1.0, 1.0], cov.dtype)
        return _bsum_mm(vecs * vals_reg[None, None, :],
                        jnp.swapaxes(vecs, -1, -2))
    cf = jax.vmap(cov_from_idx)
    chain_time("gather+outer+eig3+reconstruct", pts,
               lambda c: c + eps * cf(c, idx0)[:, :1, 0, 0, None], k_hi=7)

    # 5. eig3 alone on fixed covs
    def eig_only(p):
        # build trivially varying symmetric matrices from points
        a = p[:, :, None] * p[:, None, :] + jnp.eye(3) * 0.1
        _, vecs = sym_eig3x3(a)
        return vecs
    eo = jax.vmap(eig_only)
    chain_time("sym_eig3x3 (4096 mats)", pts,
               lambda c: c + eps * eo(c)[:, :1, 0, 0, None], k_hi=9)


if __name__ == "__main__":
    main()
