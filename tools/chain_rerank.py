"""Dependent-chain timing of the GICP rerank at bench shapes (round 4).

The bench's full pipeline is 13.1 ms/query with localize measured at 8.0
(tools/chain_localize.py); this attributes the remaining ~5 ms: source
covariances, the batched K=4 rerank (LM), its nn1 passes in isolation,
and a GN variant for comparison. Full-output consumption everywhere (a
partial reduction lets XLA dead-code stages out of the measurement).

Run: timeout 1200 python -u tools/chain_rerank.py
"""

import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CHUNK = 16


def chain_time(label, carry0, step_fn, k_lo=1, k_hi=3, reps=3, batch=CHUNK):
    def prog(k):
        @jax.jit
        def f(carry):
            for _ in range(k):
                carry = step_fn(carry)
            return jnp.sum(carry.ravel()[:1])
        return f

    f_lo, f_hi = prog(k_lo), prog(k_hi)
    float(f_lo(carry0)); float(f_hi(carry0))
    t_lo = t_hi = 0.0
    for _ in range(reps):
        t0 = time.time(); float(f_lo(carry0)); t_lo += time.time() - t0
        t0 = time.time(); float(f_hi(carry0)); t_hi += time.time() - t0
    dt = (t_hi - t_lo) / ((k_hi - k_lo) * reps)
    print(f"[rr] {label:44s} {dt*1000:8.2f} ms/op ({dt*1000/batch:6.3f} ms/query)")
    return dt


def main():
    from sgtd_tpu import SGTDConfig
    from sgtd_tpu.ops import pallas_nn
    from sgtd_tpu.refine.gicp import gicp_rerank, point_covariances

    cfg = SGTDConfig().gicp
    rng = np.random.default_rng(0)
    B, K, S, T = CHUNK, 4, 1024, 4096
    src = jnp.asarray(rng.normal(0, 20, (B, S, 3)).astype(np.float32))
    smask = jnp.ones((B, S), bool)
    tgts = jnp.asarray(rng.normal(0, 20, (B, K, T, 3)).astype(np.float32))
    tmask = jnp.ones((B, K, T), bool)
    inits = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32), (B, K, 1, 1))
    )
    cov_fn = jax.vmap(functools.partial(point_covariances, cfg=cfg))
    tcovs = jax.block_until_ready(
        jax.jit(jax.vmap(cov_fn))(
            tgts.reshape(B * K, T, 3).reshape(B, K, T, 3),
            tmask,
        )
    )
    carry0 = jnp.zeros((B,), jnp.float32)
    eps = jnp.float32(1e-30)

    # source covariances (k=20 Pallas knn + eig3)
    def cov_step(c):
        out = cov_fn(src + c[:, None, None] * 0, smask)
        return c + eps * jnp.sum(out, axis=(1, 2, 3))
    chain_time("point_covariances (src 1024)", carry0, cov_step)

    # nn1 in isolation: K passes per query (one rerank iteration's worth)
    def nn_step(c):
        def one(s, tg):
            def onek(t):
                i, d = pallas_nn.nn1(s, t)
                return jnp.sum(d) + jnp.sum(i.astype(jnp.float32))
            return jnp.sum(jax.vmap(onek)(tg))
        tot = jax.vmap(one)(src + c[:, None, None] * 0, tgts)
        return c + eps * tot
    chain_time("nn1 x K=4 (one iteration's passes)", carry0, nn_step)

    # full rerank, LM (the bench path)
    def rr_step_lm(c):
        def one(s, tg, tm, T0, tc):
            return gicp_rerank(s, smask[0], tg, tm, T0, cfg, tgt_covs=tc)
        out = jax.vmap(one)(src + c[:, None, None] * 0, tgts, tmask, inits, tcovs)
        return c + eps * (
            jnp.sum(out.transform, axis=(1, 2, 3)) + jnp.sum(out.fitness, axis=1)
        )
    chain_time("gicp_rerank K=4 LM (full)", carry0, rr_step_lm)

    # GN variant
    cfg_gn = dataclasses.replace(cfg, optimizer="gn")

    def rr_step_gn(c):
        def one(s, tg, tm, T0, tc):
            return gicp_rerank(s, smask[0], tg, tm, T0, cfg_gn, tgt_covs=tc)
        out = jax.vmap(one)(src + c[:, None, None] * 0, tgts, tmask, inits, tcovs)
        return c + eps * (
            jnp.sum(out.transform, axis=(1, 2, 3)) + jnp.sum(out.fitness, axis=1)
        )
    chain_time("gicp_rerank K=4 GN (full)", carry0, rr_step_gn)


if __name__ == "__main__":
    main()
