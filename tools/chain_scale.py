"""Dependent-chain stage split of `localize` at SCALE shapes (real DB).

Builds the 20k-keyframe (or [num_map]) world DB exactly like
tools/scale_bench.py, then chain-times the pipeline stages per query:
probe_and_hits (votes), select_candidates (top_k over f_pad),
extract_pairs (sel) / extract_pairs_by_frame (cm), verify, and the FULL
localize — the ground truth for the scale roofline (the per-op synthetic
numbers live in tools/scale_probe_prof.py).

Run on TPU: timeout 1150 python -u tools/chain_scale.py [num_map]
"""

import dataclasses
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


def chain_time(label, carry0, step_fn, k_lo=1, k_hi=2, reps=3):
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
    print(f"[chainscale] {label:40s} {dt*1000:9.2f} ms/query")
    return dt


def main():
    from sgtd_tpu import SGTDConfig
    from sgtd_tpu.data.synthetic import make_world, observe
    from sgtd_tpu.db.database import tuned_config
    from sgtd_tpu.db.device_build import build_database_calibrated
    from sgtd_tpu.eval.runner import build_descriptors_chunked, stack_graphs
    from sgtd_tpu.match.search import (
        build_probe_table,
        extract_pairs,
        extract_pairs_by_frame,
        fit_scan_slots,
        probe_and_hits,
        select_candidates,
    )
    from sgtd_tpu.match.pipeline import localize_descriptors
    from sgtd_tpu.match.verify import verify_candidates

    num_map = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cfg = SGTDConfig()
    rng = np.random.default_rng(2027)
    extent = max(400.0, 8.0 * np.sqrt(num_map) * 4.0)
    t0 = time.time()
    world = make_world(rng, extent_m=extent, num_map_frames=num_map,
                       num_queries=4)
    maps = [observe(world, p, cfg, rng) for p in world.map_poses]
    queries = [observe(world, p, cfg, rng, center_noise_m=0.05, dropout=0.1)
               for p in world.query_poses]
    print(f"[chainscale] world: {time.time()-t0:.0f}s", file=sys.stderr)

    cfg = cfg.replace(
        caps=dataclasses.replace(cfg.caps, max_scan_slots=1 << 23)
    )
    t0 = time.time()
    map_batch = stack_graphs(maps)
    map_descs = build_descriptors_chunked(map_batch, cfg)
    qb = stack_graphs(queries)
    sample_descs = build_descriptors_chunked(qb, cfg)
    db, report, totals = build_database_calibrated(
        map_descs, map_batch.pose, sample_descs, cfg.desc
    )
    jax.block_until_ready(db.keys)
    cfg = tuned_config(cfg, report)
    cfg = fit_scan_slots(int(np.asarray(totals).max()), cfg)
    print(f"[chainscale] db: {time.time()-t0:.0f}s rows={report.num_rows} "
          f"slots={cfg.caps.max_scan_slots}", file=sys.stderr)

    q0 = jax.tree_util.tree_map(lambda x: x[0], sample_descs)
    sides0 = q0.sides
    f_pad = db.frame_poses.shape[0]

    def perturbed(carry):
        return q0._replace(sides=q0.sides + carry[:1, :1] * 0)

    # full localize (descriptor path)
    def full(carry):
        q = q0._replace(sides=q0.sides + jnp.float32(1e-30) * carry[:1, :1])
        res = localize_descriptors(db, q, cfg)
        return carry + jnp.float32(1e-30) * (
            res.best_score + jnp.sum(res.votes) + jnp.sum(res.poses)
        )

    carry0 = jnp.zeros((8, 8), jnp.float32)
    only = os.environ.get("ONLY", "")
    if not only or "full" in only:
        chain_time("localize FULL (desc path)", carry0, full)

    # probe stage only (votes consumed)
    for with_sel, label in ((True, "probe_and_hits with_sel"),
                            (False, "probe_and_hits no-sel")):
        def probe_only(carry, _ws=with_sel):
            q = q0._replace(
                sides=q0.sides + jnp.float32(1e-30) * carry[:1, :1]
            )
            ph = probe_and_hits(db, q, cfg.desc, cfg.search, cfg.caps,
                                with_sel=_ws)
            out = jnp.sum(ph.votes)
            if _ws:
                out = out + jnp.sum(ph.sel_row) + jnp.sum(ph.sel_frame)
            return carry + jnp.float32(1e-30) * out.astype(jnp.float32)
        if not only or "probe" in only:
            chain_time(label, carry0, probe_only)

    # select (top_k over f_pad)
    votes0 = jax.block_until_ready(
        jax.jit(lambda: probe_and_hits(
            db, q0, cfg.desc, cfg.search, cfg.caps, with_sel=False
        ).votes)()
    )

    def select_only(carry):
        v = votes0 + jnp.float32(1e-30) * carry[0, 0]
        cv, cf, ok = select_candidates(v, cfg.search)
        return carry + jnp.float32(1e-30) * (
            jnp.sum(cv) + jnp.sum(cf).astype(jnp.float32)
        )

    if not only or "select" in only:
        chain_time(f"select_candidates top_k (f_pad={f_pad})", carry0, select_only)

    # candidate-major pair extraction + verify
    cv0, cf0, ok0 = jax.jit(
        lambda: select_candidates(votes0, cfg.search)
    )()
    pkeys0, pdesc0 = jax.jit(
        lambda: build_probe_table(q0, cfg.desc)
    )()

    def cm_extract(carry):
        z = (carry[0, 0] * 0).astype(jnp.int32)
        pq, pr, pv = extract_pairs_by_frame(
            db, q0, pkeys0, pdesc0, cf0 + z, ok0, cfg.search, cfg.caps
        )
        return carry + jnp.float32(1e-30) * (
            jnp.sum(pq) + jnp.sum(pr) + jnp.sum(pv)
        ).astype(jnp.float32)

    if not only or "cm" in only:
        chain_time("extract_pairs_by_frame (cm)", carry0, cm_extract)


if __name__ == "__main__":
    main()
