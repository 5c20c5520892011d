"""Candidate-major pair-extraction cost at scale shapes, in isolation.

The 20k-keyframe run regressed 316 -> 710 ms/query when the pair path
switched to extract_pairs_by_frame; this measures that function (and its
pieces) against a synthetic 39.7M-row DB at the real shapes with
dependent-chain timing.

Run on TPU: ONLY=... timeout 560 python tools/cm_prof.py [m_rows]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def chain_time(label, carry0, step_fn, k_lo=1, k_hi=4, reps=3):
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
    print(f"[cmprof] {label:40s} {dt*1000:9.2f} ms/op")
    return dt


def main():
    m_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 39_725_641
    c_n, r_max, pk_max, p_cap = 50, 2048, 8, 512
    n_probes = 2048 * 27
    rng = np.random.default_rng(0)

    keys = jnp.asarray(np.sort(rng.integers(0, 2**31 - 2, m_rows, np.int32)))
    packed2 = jnp.asarray(rng.integers(0, 2**32, (m_rows, 2), np.uint32))
    frame_rows = jnp.asarray(rng.integers(0, m_rows, m_rows, np.int32))
    pkeys = jnp.asarray(np.sort(rng.integers(0, 2**31 - 2, n_probes, np.int32)))
    pdesc = jnp.asarray(rng.integers(0, 2048, n_probes, np.int32))
    pos0 = jnp.asarray(rng.integers(0, m_rows, (c_n, r_max), np.int32))
    carry0 = jnp.zeros((8,), jnp.float32)
    z_of = lambda c: (jnp.sum(c.ravel()[:1]) * 0).astype(jnp.int32)
    only = os.environ.get("ONLY", "")

    def row_gathers(carry):
        z = z_of(carry)
        rows = frame_rows[jnp.clip(pos0 + z, 0, m_rows - 1)]
        rowkey = keys[rows]
        w2 = packed2[rows]
        tot = jnp.sum(rowkey) + jnp.sum(w2[..., 0].astype(jnp.int32))
        return carry + jnp.float32(1e-30) * tot.astype(jnp.float32)

    if not only or "rowg" in only:
        chain_time("frame_rows+keys+packed2 gathers (C,R)", carry0, row_gathers)

    rowkey0 = keys[frame_rows[pos0]]

    def bisect(carry):
        z = z_of(carry)
        tgt = rowkey0 + z
        lo = jnp.zeros_like(tgt)
        hi = jnp.full_like(tgt, n_probes)
        steps = 17

        def step(_, state):
            lo, hi = state
            active = lo < hi
            mid = (lo + hi) >> 1
            kmid = pkeys[jnp.minimum(mid, n_probes - 1)]
            go_right = kmid < tgt
            lo = jnp.where(active & go_right, mid + 1, lo)
            hi = jnp.where(active & ~go_right, mid, hi)
            return lo, hi

        lo, _ = jax.lax.fori_loop(0, steps, step, (lo, hi))
        return carry + jnp.float32(1e-30) * jnp.sum(lo).astype(jnp.float32)

    if not only or "bisect" in only:
        chain_time("bisect probes (C,R,17 steps)", carry0, bisect)

    p_lo0 = jnp.asarray(rng.integers(0, n_probes - pk_max, (c_n, r_max), np.int32))

    def slice8(carry):
        z = z_of(carry)
        starts = (p_lo0 + z).reshape(-1)
        pk = jax.vmap(
            lambda s: jax.lax.dynamic_slice(pkeys, (s,), (pk_max,))
        )(starts)
        qd = jax.vmap(
            lambda s: jax.lax.dynamic_slice(pdesc, (s,), (pk_max,))
        )(starts)
        tot = jnp.sum(pk) + jnp.sum(qd)
        return carry + jnp.float32(1e-30) * tot.astype(jnp.float32)

    if not only or "slice8" in only:
        chain_time("pk/pdesc 8-wide slice gathers", carry0, slice8)

    def passes8(carry):
        z = z_of(carry)
        tot = jnp.int32(0)
        for j in range(pk_max):
            p = jnp.minimum(p_lo0 + j + z, n_probes - 1)
            tot = tot + jnp.sum(pkeys[p]) + jnp.sum(pdesc[p])
        return carry + jnp.float32(1e-30) * tot.astype(jnp.float32)

    if not only or "passes" in only:
        chain_time("pk/pdesc 8 separate gather passes", carry0, passes8)

    match0 = jnp.asarray(rng.uniform(size=(c_n, r_max, pk_max)) < 0.01)
    qd0 = jnp.asarray(
        rng.integers(0, 2048, (c_n, r_max, pk_max), np.int32)
    )
    rows0 = jnp.asarray(rng.integers(0, m_rows, (c_n, r_max), np.int32))

    def compact1(carry):
        z = z_of(carry)
        flat_m = match0.reshape(c_n, -1)
        flat_d = (qd0 + z).reshape(c_n, -1)
        flat_r = jnp.broadcast_to(
            rows0[..., None], match0.shape
        ).reshape(c_n, -1)
        rank = jnp.cumsum(flat_m.astype(jnp.int32), axis=-1) - 1
        keep = flat_m & (rank < p_cap)
        ci = jnp.broadcast_to(
            jnp.arange(c_n, dtype=jnp.int32)[:, None], flat_m.shape
        )
        sc_c = jnp.where(keep, ci, c_n)
        sc_p = jnp.where(keep, rank, 0)
        payload = jnp.stack([flat_d, flat_r, jnp.ones_like(flat_d)], axis=-1)
        packed = (
            jnp.zeros((c_n + 1, p_cap, 3), jnp.int32)
            .at[sc_c, sc_p].set(payload)[:c_n]
        )
        return carry + jnp.float32(1e-30) * jnp.sum(packed).astype(jnp.float32)

    if not only or "compact1" in only:
        chain_time("compaction: ONE 3-vector scatter", carry0, compact1)

    def compact3(carry):
        z = z_of(carry)
        flat_m = match0.reshape(c_n, -1)
        flat_d = (qd0 + z).reshape(c_n, -1)
        flat_r = jnp.broadcast_to(
            rows0[..., None], match0.shape
        ).reshape(c_n, -1)
        rank = jnp.cumsum(flat_m.astype(jnp.int32), axis=-1) - 1
        keep = flat_m & (rank < p_cap)
        ci = jnp.broadcast_to(
            jnp.arange(c_n, dtype=jnp.int32)[:, None], flat_m.shape
        )
        sc_c = jnp.where(keep, ci, c_n)
        sc_p = jnp.where(keep, rank, 0)
        a = jnp.zeros((c_n + 1, p_cap), jnp.int32).at[sc_c, sc_p].set(flat_d)
        b = jnp.zeros((c_n + 1, p_cap), jnp.int32).at[sc_c, sc_p].set(flat_r)
        c = jnp.zeros((c_n + 1, p_cap), bool).at[sc_c, sc_p].set(True)
        tot = jnp.sum(a) + jnp.sum(b) + jnp.sum(c)
        return carry + jnp.float32(1e-30) * tot.astype(jnp.float32)

    if not only or "compact3" in only:
        chain_time("compaction: THREE scatters (old)", carry0, compact3)


if __name__ == "__main__":
    main()
