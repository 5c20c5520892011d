"""Probe-stage cost attribution at SCALE shapes (VERDICT r4 next-#3).

SCALE_r04 measured 316 ms/query at 20k keyframes (L = 7.3M scan slots,
f_pad = 20016) and attributed it to bucket depth, but which OP dominates —
the delta-scatter expansions (NJ-sized scatters + L-sized cumsums), the
packed2 row gather (L random rows), the vote segment_sum (L-element
serialized scatter-add at wide f_pad), or the sel-compaction scatter
(L-element .at[].set)? This measures each in isolation at synthetic scale
shapes with dependent-chain timing (batch=1 queries; real shapes, fake
data — op cost depends on shapes and index distributions only).

Run on TPU: timeout 590 python tools/scale_probe_prof.py [L_slots] [f_pad]
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

NJ = 2048 * 27  # jobs per query (bench descriptor cap)


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
    print(f"[scaleprobe] {label:44s} {dt*1000:9.2f} ms/op")
    return dt


def main():
    l_max = int(sys.argv[1]) if len(sys.argv) > 1 else 7_307_264
    f_pad = int(sys.argv[2]) if len(sys.argv) > 2 else 20_016
    m_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 39_726_261
    print(f"[scaleprobe] L={l_max} f_pad={f_pad} m_rows={m_rows}",
          file=sys.stderr)
    rng = np.random.default_rng(0)

    # Job lengths: skewed like deep buckets (mean L/NJ).
    raw = rng.pareto(1.5, NJ) + 0.1
    length0 = (raw / raw.sum() * l_max * 0.98).astype(np.int32)
    length0 = jnp.asarray(length0)
    z_of = lambda c: (jnp.sum(c.ravel()[:1]) * 0).astype(jnp.int32)
    carry0 = jnp.zeros((8,), jnp.float32)

    def expansions(carry):
        z = z_of(carry)
        length = length0 + z
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(length, dtype=jnp.int32)]
        )
        heads = offsets[:-1]
        slot = jnp.arange(l_max, dtype=jnp.int32)

        def _expand(per_job):
            delta = jnp.concatenate([per_job[:1], per_job[1:] - per_job[:-1]])
            buf = jnp.zeros(l_max, jnp.int32).at[heads].add(delta, mode="drop")
            return jnp.cumsum(buf)

        v1 = _expand(heads % 32768) + slot
        v2 = _expand((jnp.arange(NJ, dtype=jnp.int32) // 27 << 15) | 7)
        v3 = _expand(heads % 1024)
        v4 = _expand(heads % 7)
        tot = jnp.sum(v1) + jnp.sum(v2) + jnp.sum(v3) + jnp.sum(v4)
        return carry + jnp.float32(1e-30) * tot.astype(jnp.float32)

    only = os.environ.get("ONLY", "")
    if not only or "expand" in only:
        chain_time("4x delta-scatter expansions", carry0, expansions)

    packed2 = jnp.asarray(
        rng.integers(0, 2**32, (m_rows, 2), dtype=np.uint32)
    )
    rows_fixed = jnp.asarray(
        rng.integers(0, m_rows, (l_max,), dtype=np.int32)
    )

    def gathers(carry):
        z = z_of(carry)
        w2 = packed2[rows_fixed + z]
        tot = jnp.sum(w2[:, 0]) + jnp.sum(w2[:, 1])
        return carry + jnp.float32(1e-30) * tot.astype(jnp.float32)

    if not only or "gather" in only:
        chain_time("packed2 slice gather (L rows x 8B)", carry0, gathers)

    frames_fixed = jnp.asarray(
        rng.integers(0, f_pad, (l_max,), dtype=np.int32)
    )
    hits_fixed = jnp.asarray(rng.uniform(size=l_max) < 0.1)

    def votes_segsum(carry):
        z = z_of(carry)
        votes = jax.ops.segment_sum(
            hits_fixed.astype(jnp.float32), frames_fixed + z,
            num_segments=f_pad,
        )
        return carry + jnp.float32(1e-30) * jnp.sum(votes)

    if not only or "votes" in only:
        chain_time("vote segment_sum (wide f_pad)", carry0, votes_segsum)

    def votes_wide_kernel(carry):
        from sgtd_tpu.ops.pallas_probe import frame_votes_wide

        z = z_of(carry)
        votes = frame_votes_wide(hits_fixed, frames_fixed + z, f_pad)
        return carry + jnp.float32(1e-30) * jnp.sum(votes)

    if not only or "wide" in only:
        chain_time("frame_votes_wide Pallas kernel", carry0, votes_wide_kernel)

    def cumsum_l(carry):
        z = z_of(carry)
        return carry + jnp.float32(1e-30) * jnp.sum(
            jnp.cumsum(rows_fixed + z)
        ).astype(jnp.float32)

    if not only or "cumsum" in only:
        chain_time("one L-sized cumsum", carry0, cumsum_l)

    d_max, u = 2048, 16
    rank_fixed = jnp.asarray(
        rng.integers(0, u, (l_max,), dtype=np.int32)
    )
    desc_fixed = jnp.sort(jnp.asarray(
        rng.integers(0, d_max + 1, (l_max,), dtype=np.int32)
    ))

    def sel_scatter(carry):
        z = z_of(carry)
        sel = (
            jnp.zeros((d_max + 1, u), jnp.int32)
            .at[desc_fixed, rank_fixed + z].set(rows_fixed)[:d_max]
        )
        return carry + jnp.float32(1e-30) * jnp.sum(sel).astype(jnp.float32)

    if not only or "sel" in only:
        chain_time("sel compaction scatter (L .at[].set)", carry0, sel_scatter)

    # elementwise rough filter over L (reads 8B, ~20 int ops)
    lo0 = jnp.asarray(rng.integers(0, 2**32, (l_max,), dtype=np.uint32))
    hi0 = jnp.asarray(rng.integers(0, 2**32, (l_max,), dtype=np.uint32))

    def rough(carry):
        z = z_of(carry).astype(jnp.uint32)
        lo_w, hi_w = lo0 + z, hi0 + z
        da = (lo_w & 0xFFFF).astype(jnp.int32) - 1000
        db_ = (lo_w >> 16).astype(jnp.int32) - 1000
        dc = (hi_w & 0xFFFF).astype(jnp.int32) - 1000
        dis2 = (da * da + db_ * db_ + dc * dc).astype(jnp.float32)
        return carry + jnp.float32(1e-30) * jnp.sum(
            (dis2 < 1e6).astype(jnp.float32)
        )

    if not only or "rough" in only:
        chain_time("rough filter elementwise over L", carry0, rough)


if __name__ == "__main__":
    main()
