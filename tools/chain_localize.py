"""Dependent-chain stage profile of the descriptor pipeline (localize).

Splits the ~15.3 ms/query `localize` stage (tools/profile_refined.py) into
its sub-stages with the chain methodology (tools/chain_prof.py): descriptor
build, probe+votes (stage 1), top-K + pair extraction, verification, and
the sort/pose epilogue. Feeds the BENCH_NOTES stage table.

Run: python tools/chain_localize.py
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
            return jax.tree_util.tree_reduce(
                lambda a, x: a
                + jnp.sum(x[..., None].ravel()[:1].astype(jnp.float32)),
                carry,
                jnp.float32(0.0),
            )
        return f

    f_lo, f_hi = prog(k_lo), prog(k_hi)
    float(f_lo(carry0)); float(f_hi(carry0))
    t_lo = t_hi = 0.0
    for _ in range(reps):
        t0 = time.time(); float(f_lo(carry0)); t_lo += time.time() - t0
        t0 = time.time(); float(f_hi(carry0)); t_hi += time.time() - t0
    dt = (t_hi - t_lo) / ((k_hi - k_lo) * reps)
    print(f"[loc] {label:44s} {dt*1000:8.2f} ms/op ({dt*1000/batch:6.2f} ms/query)")
    return dt


def main():
    from sgtd_tpu import SGTDConfig
    from sgtd_tpu.data.synthetic import make_map_and_queries
    from sgtd_tpu.db.device_build import build_database_on_device
    from sgtd_tpu.db.database import tuned_config
    from sgtd_tpu.desc import build_descriptors
    from sgtd_tpu.match.pipeline import localize
    from sgtd_tpu.match.search import (
        calibrate_scan_slots,
        candidate_search,
        extract_pairs,
        probe_and_hits,
        select_candidates,
    )
    from sgtd_tpu.match.verify import verify_candidates
    from sgtd_tpu.eval.runner import stack_graphs as stack

    cfg = SGTDConfig()
    num_map, num_q = 200, 64
    t0 = time.time()
    maps, queries, world = make_map_and_queries(
        cfg, seed=2026, num_map_frames=num_map, num_queries=num_q,
        center_noise_m=0.05, dropout=0.1, label_corrupt_rate=0.05,
    )
    map_batch = stack(maps)
    from sgtd_tpu.eval.runner import build_descriptors_chunked
    build_many = lambda b, _c=cfg: build_descriptors_chunked(b, _c)  # bind cfg eagerly: later tuned_config reassignments must not recompile the builder
    map_descs = build_many(map_batch)
    db, report = build_database_on_device(map_descs, map_batch.pose, cfg.desc)
    cfg = tuned_config(cfg, report)
    query_batch_all = stack(queries)
    sample = jax.tree_util.tree_map(lambda x: x[:16], query_batch_all)
    cfg = calibrate_scan_slots(db, build_many(sample), cfg)
    print(
        f"[loc] setup {time.time()-t0:.0f}s rows={report.num_rows} "
        f"slots={cfg.caps.max_scan_slots}",
        file=sys.stderr,
    )
    g16 = jax.tree_util.tree_map(lambda x: x[:CHUNK], query_batch_all)
    eps = jnp.float32(1e-12)

    # full localize
    loc = jax.vmap(functools.partial(localize, config=cfg), in_axes=(None, 0))
    chain_time(
        "localize FULL", g16,
        lambda g: g._replace(centers=g.centers + eps * jnp.sum(loc(db, g).best_score)),
        k_hi=3,
    )

    # 1. descriptor build
    bd = jax.vmap(functools.partial(build_descriptors, cfg=cfg.desc, caps=cfg.caps))
    chain_time(
        "build_descriptors", g16,
        lambda g: g._replace(centers=g.centers + eps * jnp.sum(bd(g).sides[:, :1, 0])),
        k_hi=9,
    )

    # fixed query descriptors for downstream stages
    q16 = jax.block_until_ready(jax.jit(bd)(g16))

    # 2. probe + votes (stage 1)
    ph_fn = jax.vmap(
        lambda q: probe_and_hits(db, q, cfg.desc, cfg.search, cfg.caps)
    )
    def probe_step(q):
        ph = ph_fn(q)
        # Consume EVERY output: reducing only votes lets XLA dead-code the
        # hit compaction (sel_row/sel_frame) out of the measurement.
        tot = (jnp.sum(ph.votes) + jnp.sum(ph.sel_row)
               + jnp.sum(ph.sel_frame)
               + jnp.sum(ph.scan_overflow) + jnp.sum(ph.pair_overflow))
        return q._replace(sides=q.sides + eps * tot.astype(jnp.float32))
    chain_time("probe_and_hits (votes+hits+compaction)", q16, probe_step, k_hi=3)

    # 3. candidate select + pair extraction (needs stage-1 output).
    # The fixed stage-1 arrays must be perturbed by a CARRY-DERIVED zero:
    # otherwise every chain iteration is structurally identical over
    # constants and XLA CSEs the whole stage away (first run measured
    # 0.01 ms — pure collapse).
    ph0 = jax.block_until_ready(jax.jit(ph_fn)(q16))

    def sel_ext(q):
        z = (jnp.sum(q.sides[0, 0]) * 0).astype(jnp.int32)
        def one(votes, sel_row, sel_frame):
            cv, cf, ca = select_candidates(votes, cfg.search)
            return extract_pairs(sel_row + z, sel_frame, cf, ca,
                                 cfg.caps.pairs_per_candidate)
        pq, pr, pv = jax.vmap(one)(ph0.votes + z.astype(jnp.float32),
                                   ph0.sel_row, ph0.sel_frame)
        tot = jnp.sum(pq) + jnp.sum(pr) + jnp.sum(pv)
        return q._replace(
            sides=q.sides + eps * tot.astype(jnp.float32)
        )
    chain_time("select+extract_pairs", q16, sel_ext, k_hi=5)

    # 4. verification (same carry-dependence trick on the candidate set)
    cs = jax.jit(jax.vmap(
        lambda q: candidate_search(db, q, cfg.desc, cfg.search, cfg.caps)
    ))
    cand0 = jax.block_until_ready(cs(q16))
    ver_fn = jax.vmap(lambda q, c: verify_candidates(db, q, c, cfg.search))

    def ver_step(q):
        z = (jnp.sum(q.sides[0, 0]) * 0).astype(jnp.int32)
        c = cand0._replace(pair_row=cand0.pair_row + z,
                           pair_qidx=cand0.pair_qidx + z)
        v = ver_fn(q, c)
        # Consume rot/trans/inliers too: otherwise the all-inlier pose
        # polish (weighted Kabsch) is dead code in this measurement.
        tot = (jnp.sum(v.scores) + jnp.sum(v.rot) + jnp.sum(v.trans)
               + jnp.sum(v.inliers))
        return q._replace(sides=q.sides + eps * tot.astype(jnp.float32))
    chain_time("verify_candidates", q16, ver_step, k_hi=5)


if __name__ == "__main__":
    main()
