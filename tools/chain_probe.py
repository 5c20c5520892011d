"""Dependent-chain micro-profile of probe_and_hits internals.

Splits the probe stage (the descriptor pipeline's dominant term,
tools/chain_localize.py) into: key computation + bucket lookup, the
delta-scatter ragged expansions, the packed-word gathers, the rough filter
+ vote segment-sum, and the hit compaction. Carry-derived perturbations on
every fixed operand prevent XLA CSE collapse (see chain_localize.py).

Run: python tools/chain_probe.py
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
    print(f"[probe] {label:44s} {dt*1000:8.2f} ms/op ({dt*1000/batch:6.2f} ms/query)")
    return dt


def main():
    from sgtd_tpu import SGTDConfig
    from sgtd_tpu.data.synthetic import make_map_and_queries
    from sgtd_tpu.db.device_build import build_database_on_device
    from sgtd_tpu.db.database import tuned_config
    from sgtd_tpu.desc import build_descriptors
    from sgtd_tpu.desc.keys import probe_cells
    from sgtd_tpu.match.search import _bucket_lookup, calibrate_scan_slots
    from sgtd_tpu.eval.runner import stack_graphs as stack

    cfg = SGTDConfig()
    maps, queries, world = make_map_and_queries(
        cfg, seed=2026, num_map_frames=200, num_queries=64,
        center_noise_m=0.05, dropout=0.1, label_corrupt_rate=0.05,
    )
    map_batch = stack(maps)
    from sgtd_tpu.eval.runner import build_descriptors_chunked
    build_many = lambda b, _c=cfg: build_descriptors_chunked(b, _c)  # bind cfg eagerly: later tuned_config reassignments must not recompile the builder
    map_descs = build_many(map_batch)
    db, report = build_database_on_device(map_descs, map_batch.pose, cfg.desc)
    cfg = tuned_config(cfg, report)
    qall = stack(queries)
    sample = jax.tree_util.tree_map(lambda x: x[:16], qall)
    cfg = calibrate_scan_slots(db, build_many(sample), cfg)
    print(f"[probe] rows={report.num_rows} slots={cfg.caps.max_scan_slots}",
          file=sys.stderr)
    g16 = jax.tree_util.tree_map(lambda x: x[:CHUNK], qall)
    q16 = jax.block_until_ready(build_many(g16))

    l_max = cfg.caps.max_scan_slots
    d_max = q16.sides.shape[1]
    m_rows = db.keys.shape[0]
    sides0 = q16.sides

    # A. probe keys + bucket lookup (searchsorted/remap gathers)
    def keys_lookup(sides):
        def one(s, lab, msk):
            cells, code, gate = probe_cells(s, lab, cfg.desc)
            st, en, ok = _bucket_lookup(db, cells, code, gate & msk[:, None], None)
            return jnp.sum(en - st)
        tot = jax.vmap(one)(sides, q16.labels, q16.mask)
        return sides + jnp.float32(1e-30) * tot[:, None, None].astype(jnp.float32)
    chain_time("keys+bucket_lookup", sides0, keys_lookup, k_hi=9)

    # precompute fixed ranges
    @jax.jit
    def ranges(sides):
        def one(s, lab, msk):
            cells, code, gate = probe_cells(s, lab, cfg.desc)
            return _bucket_lookup(db, cells, code, gate & msk[:, None], None)
        return jax.vmap(one)(sides, q16.labels, q16.mask)
    start0, end0, ok0 = jax.block_until_ready(ranges(sides0))

    def expansions_only(carry):
        z = (jnp.sum(carry[0, 0, 0]) * 0).astype(jnp.int32)
        def one(start, end, ok):
            length = jnp.where(ok, end - start, 0).ravel() + z
            offsets = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(length, dtype=jnp.int32)]
            )
            heads = offsets[:-1]
            slot = jnp.arange(l_max, dtype=jnp.int32)

            def _expand(per_job):
                delta = jnp.concatenate([per_job[:1], per_job[1:] - per_job[:-1]])
                buf = jnp.zeros(l_max, jnp.int32).at[heads].add(delta, mode="drop")
                return jnp.cumsum(buf)

            row = _expand(start.ravel() - heads) + slot
            job_desc = jnp.arange(d_max * 27, dtype=jnp.int32) // 27
            desc = _expand(job_desc)
            qq = jnp.clip(jnp.round(sides0[0] * 256.0), 0, 32767).astype(jnp.int32)
            qq_j = qq[job_desc]
            q_ab = _expand((qq_j[:, 0] << 15) | qq_j[:, 1])
            q_c = _expand(qq_j[:, 2])
            return jnp.sum(row) + jnp.sum(desc) + jnp.sum(q_ab) + jnp.sum(q_c)
        tot = jax.vmap(one)(start0 + z_of(carry), end0 + z_of(carry), ok0)
        return carry + jnp.float32(1e-30) * tot[:, None, None].astype(jnp.float32)

    def z_of(carry):
        return (jnp.sum(carry[0, 0, 0]) * 0).astype(jnp.int32)

    chain_time("4x delta-scatter expansions", sides0, expansions_only, k_hi=5)

    # C. the packed-word slice gather at random rows
    rng = np.random.default_rng(0)
    rows_fixed = jnp.asarray(
        rng.integers(0, m_rows, (CHUNK, l_max), dtype=np.int32)
    )
    def gathers_only(carry):
        z = z_of(carry)
        w2 = db.packed2[rows_fixed + z]  # (CHUNK, L, 2)
        tot = jnp.sum(w2[..., 0], axis=1) + jnp.sum(w2[..., 1], axis=1)
        return carry + jnp.float32(1e-30) * tot[:, None, None].astype(jnp.float32)
    chain_time("packed2 slice gather (L rows x 8B)", sides0, gathers_only, k_hi=5)

    # D. rough filter + vote segment_sum on fixed gathered words
    w20 = jax.block_until_ready(jax.jit(lambda: db.packed2[rows_fixed])())
    lo0, hi0 = w20[..., 0], w20[..., 1]
    f_pad = db.frame_poses.shape[0]
    def filter_votes(carry):
        z = z_of(carry)
        def one(lo_w, hi_w):
            frame = (hi_w >> 16).astype(jnp.int32)
            da = (lo_w & 0xFFFF).astype(jnp.int32) - 1000
            db_ = (lo_w >> 16).astype(jnp.int32) - 1000
            dc = (hi_w & 0xFFFF).astype(jnp.int32) - 1000
            dis2 = (da * da + db_ * db_ + dc * dc).astype(jnp.float32)
            hit = dis2 < 1e6
            votes = jax.ops.segment_sum(
                hit.astype(jnp.float32), frame, num_segments=f_pad
            )
            return jnp.sum(votes)
        tot = jax.vmap(one)(lo0 + z.astype(jnp.uint32), hi0 + z.astype(jnp.uint32))
        return carry + jnp.float32(1e-30) * tot[:, None, None].astype(jnp.float32)
    chain_time("rough filter + vote segment_sum", sides0, filter_votes, k_hi=5)


if __name__ == "__main__":
    main()
