"""Probe-stage optimization experiments (round 4).

Dependent-chain timings of candidate replacements for the probe stage's
non-gather ops (the roofline notes name gather issue + L-sized
cumsum/scatter passes as the stage's cost, BENCH_NOTES.md:130-139):

  A. votes via jax.ops.segment_sum (current) at bench shapes
  B. votes via a Pallas one-hot-matmul kernel (ops.pallas_probe)
  C. Pallas VMEM-resident vector gather lowering test (does Mosaic
     lower `table[idx]` for a traced index vector at all, and how fast)
  D. the 3 delta-scatter expansions (current) in isolation
  E. compaction cumsum+scatter (current) in isolation

Run standalone on the TPU: timeout 900 python -u tools/probe_opt_bench.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

L = 106496  # bench-calibrated scan slots
F_PAD = 208  # bench frame padding
M_ROWS = 399104  # bench DB rows (padded)
CHUNK = 16


def chain_time(label, carry0, step_fn, k_lo=1, k_hi=5, reps=3, batch=CHUNK):
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
    print(f"[popt] {label:46s} {dt*1000:8.2f} ms/op ({dt*1000/batch:6.3f} ms/query)")
    return dt


def main():
    rng = np.random.default_rng(0)
    hit0 = jnp.asarray(rng.uniform(size=(CHUNK, L)) < 0.3)
    frame0 = jnp.asarray(rng.integers(0, F_PAD, (CHUNK, L), dtype=np.int32))
    carry0 = jnp.zeros((CHUNK,), jnp.float32)

    def z_of(c):
        return (jnp.sum(c) * 0).astype(jnp.int32)

    # A. segment_sum votes (the current formulation)
    def seg_votes(carry):
        z = z_of(carry)
        def one(h, f):
            return jnp.sum(jax.ops.segment_sum(
                h.astype(jnp.float32), f + z, num_segments=F_PAD))
        tot = jax.vmap(one)(hit0, frame0)
        return carry + jnp.float32(1e-30) * tot

    chain_time("A. segment_sum votes (F=208)", carry0, seg_votes)

    # B. Pallas one-hot matmul votes
    from sgtd_tpu.ops.pallas_probe import frame_votes

    def pallas_votes(carry):
        z = z_of(carry)
        def one(h, f):
            return jnp.sum(frame_votes(h, f + z, F_PAD))
        tot = jax.vmap(one)(hit0, frame0)
        return carry + jnp.float32(1e-30) * tot

    chain_time("B. pallas one-hot matmul votes", carry0, pallas_votes)

    # Parity check A vs B
    va = jax.vmap(lambda h, f: jax.ops.segment_sum(
        h.astype(jnp.float32), f, num_segments=F_PAD))(hit0, frame0)
    vb = jax.vmap(lambda h, f: frame_votes(h, f, F_PAD))(hit0, frame0)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    print("[popt] votes parity A == B ok")

    # C. Pallas VMEM vector gather lowering test
    tbl = jnp.asarray(rng.integers(0, 2**31, (M_ROWS, 2), dtype=np.int64).astype(np.uint32))
    idx0 = jnp.asarray(rng.integers(0, M_ROWS, (CHUNK, L), dtype=np.int32))
    try:
        from sgtd_tpu.ops.pallas_probe import gather_rows

        out = gather_rows(tbl, idx0[0])
        ref = tbl[idx0[0]]
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        print("[popt] pallas vmem gather lowers + parity ok")

        def pg(carry):
            z = z_of(carry)
            def one(ii):
                w = gather_rows(tbl, ii + z)
                return jnp.sum(w[:, 0].astype(jnp.float32))
            tot = jax.vmap(one)(idx0)
            return carry + jnp.float32(1e-30) * tot
        chain_time("C. pallas vmem gather (L rows)", carry0, pg)
    except Exception as e:
        print(f"[popt] pallas vmem gather FAILED to lower: {type(e).__name__}: {e}")

    # XLA gather baseline for C
    def xg(carry):
        z = z_of(carry)
        w = tbl[jnp.clip(idx0 + z, 0, M_ROWS - 1)]
        tot = jnp.sum(w[..., 0].astype(jnp.float32), axis=1)
        return carry + jnp.float32(1e-30) * tot
    chain_time("C'. XLA gather baseline (L rows x 8B)", carry0, xg)

    # D. the three delta-scatter expansions at bench job counts
    n_jobs = 2048 * 27
    starts0 = jnp.asarray(rng.integers(0, M_ROWS, (CHUNK, n_jobs), dtype=np.int32))
    len0 = jnp.asarray(rng.integers(0, 4, (CHUNK, n_jobs), dtype=np.int32))

    def expansions(carry):
        z = z_of(carry)
        def one(starts, lens):
            length = lens + z
            offsets = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(length, dtype=jnp.int32)]
            )
            heads = offsets[:-1]
            slot = jnp.arange(L, dtype=jnp.int32)

            def _expand(per_job):
                delta = jnp.concatenate([per_job[:1], per_job[1:] - per_job[:-1]])
                buf = jnp.zeros(L, jnp.int32).at[heads].add(delta, mode="drop")
                return jnp.cumsum(buf)

            row = _expand(starts - heads) + slot
            a = _expand(starts // 7)
            b = _expand(starts // 13)
            return jnp.sum(row) + jnp.sum(a) + jnp.sum(b)
        tot = jax.vmap(one)(starts0, len0)
        return carry + jnp.float32(1e-30) * tot.astype(jnp.float32)

    chain_time("D. 3x delta-scatter expansions", carry0, expansions)

    # E. compaction: cumsum over L + (D+1, U) scatter
    d_max, u = 2048, 16
    desc0 = jnp.asarray(
        np.sort(rng.integers(0, d_max, (CHUNK, L)).astype(np.int32), axis=1)
    )
    rowc0 = idx0

    def compaction(carry):
        z = z_of(carry)
        def one(h, desc, rowc):
            hcum = jnp.cumsum(h.astype(jnp.int32) + z * 0)
            rank = hcum - 1
            keep = h & (rank < u)
            sd = jnp.where(keep, desc, d_max)
            si = jnp.where(keep, rank % u, 0)
            sel = (
                jnp.zeros((d_max + 1, u), jnp.int32)
                .at[sd, si].set(rowc + 1)[:d_max]
            )
            return jnp.sum(sel)
        tot = jax.vmap(one)(hit0, desc0, rowc0 + z_of(carry))
        return carry + jnp.float32(1e-30) * tot.astype(jnp.float32)

    chain_time("E. compaction cumsum+scatter", carry0, compaction)


if __name__ == "__main__":
    main()
