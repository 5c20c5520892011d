"""Large-map scale proof: build and query a >=10M-row descriptor DB on one chip.

Round-1 VERDICT item 9: the 20k-keyframe capacity the config advertises
(caps.max_frames; the reference's MAX_FRAME_N=20000 vote-array ceiling,
STDesc.h:33) was claimed but never exercised in-tree. This script builds a
synthetic world at thousands of keyframes, assembles the DB fully on device,
and measures end-to-end query latency against it, with the usual accuracy
gate (revisit queries must localize). Results recorded in BENCH_NOTES.md.

Run standalone on the TPU (not under pytest, and never concurrently with
other TPU/CPU-heavy jobs — see .claude/skills/verify):

    timeout 1150 python -u tools/scale_bench.py [num_map_frames]
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    from sgtd_tpu import SGTDConfig
    from sgtd_tpu.data.synthetic import make_world, observe
    from sgtd_tpu.db.database import tuned_config
    from sgtd_tpu.db.device_build import build_database_on_device
    from sgtd_tpu.desc import build_descriptors
    from sgtd_tpu.eval.metrics import rpe
    from sgtd_tpu.eval.runner import stack_graphs
    from sgtd_tpu.match.pipeline import localize
    from sgtd_tpu.match.search import calibrate_scan_slots

    num_map = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    num_q = 32
    cfg = SGTDConfig()
    rng = np.random.default_rng(2027)

    # A world big enough that keyframes do not all alias to the same cells:
    # area scales with the frame count at fixed keyframe spacing.
    extent = max(400.0, 8.0 * np.sqrt(num_map) * 4.0)
    t0 = time.time()
    world = make_world(
        rng,
        extent_m=extent,
        num_map_frames=num_map,
        num_queries=num_q,
    )
    maps = [observe(world, p, cfg, rng) for p in world.map_poses]
    queries = [
        observe(world, p, cfg, rng, center_noise_m=0.05, dropout=0.1)
        for p in world.query_poses
    ]
    print(f"[scale] world+graphs: {time.time()-t0:.1f}s "
          f"({num_map} keyframes, extent {extent:.0f} m)", file=sys.stderr)

    # Device DB build via the 32-frame chunked builder (ONE small compiled
    # program at any map size, VERDICT r4 next-#4) + the merged
    # assemble+calibrate program. Deep buckets at scale need a bigger
    # ragged-scan budget than the bench default, so the budget cap is
    # raised BEFORE any building (caps are a static arg of the builder —
    # changing them afterwards would recompile it).
    import dataclasses

    from sgtd_tpu.db.device_build import build_database_calibrated
    from sgtd_tpu.eval.runner import build_descriptors_chunked
    from sgtd_tpu.match.search import fit_scan_slots

    import os

    sel_override = os.environ.get("SCALE_SEL", "")
    sel_max = (1 << 30) if sel_override == "1" else (
        0 if sel_override == "0" else SGTDConfig().caps.sel_max_scan_slots
    )
    cfg = cfg.replace(
        caps=dataclasses.replace(
            cfg.caps, max_scan_slots=1 << 23, sel_max_scan_slots=sel_max
        )
    )
    t0 = time.time()
    map_batch = stack_graphs(maps)
    map_descs = build_descriptors_chunked(map_batch, cfg)
    qb = stack_graphs(queries)
    sample = jax.tree_util.tree_map(lambda x: x[:16], qb)
    sample_descs = build_descriptors_chunked(sample, cfg)
    db, report, totals = build_database_calibrated(
        map_descs, map_batch.pose, sample_descs, cfg.desc
    )
    jax.block_until_ready(db.keys)
    build_s = time.time() - t0
    rows = report.num_rows
    print(
        f"[scale] DB build: {build_s:.1f}s rows={rows} "
        f"direct_table={db.has_direct_table} "
        f"truncated={report.truncated_fraction():.4f}",
        file=sys.stderr,
    )
    cfg = tuned_config(cfg, report)
    cfg = fit_scan_slots(int(np.asarray(totals).max()), cfg)
    print(f"[scale] scan_slots={cfg.caps.max_scan_slots} "
          f"bucket_cap={cfg.caps.bucket_cap}", file=sys.stderr)

    # Chunked queries: the ragged-scan workspace is (batch, L) — at
    # deep-bucket scale (L up to 2^23) a 32-wide vmap would hold multiple
    # GB-sized L-buffers; 8-query chunks bound it.
    chunk = 8
    loc_fn = jax.jit(
        jax.vmap(functools.partial(localize, config=cfg), in_axes=(None, 0))
    )
    take = lambda t, i: jax.tree_util.tree_map(
        lambda x: x[i * chunk : (i + 1) * chunk], t
    )
    t0 = time.time()
    res = jax.block_until_ready(loc_fn(db, take(qb, 0)))
    print(f"[scale] compile+first chunk: {time.time()-t0:.1f}s", file=sys.stderr)

    # Per-rep epsilon-jittered inputs, all reps blocked on: identical
    # buffers can be served from the relay's dispatch cache (bench.py got
    # the same fix, VERDICT r3 next-#7) and blocking only on the last rep
    # measures nothing.
    reps = 2
    jrng = np.random.default_rng(5)
    rep_batches = [
        qb._replace(
            centers=qb.centers
            + jnp.asarray(
                jrng.normal(0, 1e-4, qb.centers.shape).astype(np.float32)
            )
        )
        for _ in range(reps)
    ]
    jax.block_until_ready(rep_batches)
    n_chunks = num_q // chunk
    t0 = time.time()
    outs = []
    for r, b in enumerate(rep_batches):
        # Chunk dispatches pipeline within a rep; the rep boundary blocks.
        chunks_out = [loc_fn(db, take(b, i)) for i in range(n_chunks)]
        jax.block_until_ready(chunks_out)
        outs = chunks_out
        print(f"[scale] rep {r}: {time.time()-t0:.1f}s cumulative",
              file=sys.stderr)
    per_query_ms = (time.time() - t0) / (reps * num_q) * 1000.0
    res = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *outs
    )

    from sgtd_tpu.match.search import TRUNC_SCAN

    n_trunc = int(np.sum((np.asarray(res.truncated) & TRUNC_SCAN) != 0))
    found = np.asarray(res.found)
    poses = np.asarray(res.poses[:, 0])
    n_succ = 0
    for i, g in enumerate(queries):
        if not found[i]:
            continue
        t_err, r_err = rpe(np.asarray(g.pose), poses[i])
        if t_err < cfg.success_trans_m and r_err < cfg.success_rot_deg:
            n_succ += 1
    sr = n_succ / num_q
    out = {
        "keyframes": num_map,
        "db_rows": rows,
        "db_build_s": round(build_s, 1),
        "query_ms": round(per_query_ms, 2),
        "sr": round(sr, 3),
        "scan_slots": cfg.caps.max_scan_slots,
        "bucket_cap": cfg.caps.bucket_cap,
        "truncated_queries": n_trunc,
        "num_queries": num_q,
    }
    print(json.dumps(out))
    if sr < 0.9:
        print(f"[scale] FAIL: SR={sr:.3f} < 0.9", file=sys.stderr)
        sys.exit(1)
    if n_trunc:
        print(f"[scale] FAIL: {n_trunc} truncated probe scans", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
