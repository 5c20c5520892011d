"""Benchmark: one-shot localization throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's best per-query latency on its headline split
(KAIST02 -> KAIST03, 69 ms/query on a 24-thread desktop CPU,
reference src/readme.txt:298-299, see BASELINE.md) = 14.49 scans/s.
vs_baseline = our scans/s / 14.49 (higher is better).

The workload mirrors the reference benchmark loop in its FULL headline
configuration (SG-STD-gicp-multi, semantic_graph_localization.cpp:567-723):
per query, build triangle descriptors from the semantic graph, vote-search
the descriptor DB of all map keyframes, geometrically verify candidates,
GICP-align the top candidates against their keyframe clouds with the
early-accept pick, output the refined pose — all one jitted program
(match.pipeline.localize_refined). Map-DB build time and map-cloud
covariance precomputation are excluded, as the reference excludes its map
build (src/readme.txt:5); query clouds are pre-staged on device (the
reference reads them from disk inside the loop — our native loader
prefetches, so disk is off the critical path either way). Synthetic world
(the reference's datasets are not distributable); recall/pose gates are
asserted so throughput can't be gamed by breaking accuracy.
"""

import functools
import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: repeat bench runs skip the ~60 s of
# one-off compiles (DB build time is excluded from the metric either way).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)


def main():
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from sgtd_tpu import SGTDConfig
    from sgtd_tpu.data.synthetic import make_map_and_queries
    from sgtd_tpu.db.database import tuned_config
    from sgtd_tpu.desc import build_descriptors
    from sgtd_tpu.eval.metrics import rpe
    from sgtd_tpu.match.pipeline import localize

    from sgtd_tpu.eval.runner import stack_graphs as stack

    cfg = SGTDConfig()
    num_map, num_q = 200, 64
    t0 = time.time()
    maps, queries, world = make_map_and_queries(
        cfg,
        seed=2026,
        num_map_frames=num_map,
        num_queries=num_q,
        center_noise_m=0.05,
        dropout=0.1,
        label_corrupt_rate=0.05,
    )
    print(f"[bench] world: {time.time()-t0:.1f}s", file=sys.stderr)

    # Map DB build: CHUNKED vmapped descriptor passes (round 5, VERDICT r4
    # next-#4) — every dispatch carries a fixed 32-frame batch, so the
    # remote compile is of one SMALL program reused across map sizes and
    # across processes via the server-side compile cache. The previous
    # whole-map vmapped program's compile scaled with map size and
    # dominated the 152-300 s cold db phase (compute is seconds).
    import threading

    from sgtd_tpu.db.device_build import build_database_calibrated
    from sgtd_tpu.eval.runner import BUILD_CHUNK, build_descriptors_chunked
    from sgtd_tpu.match.search import fit_scan_slots

    t0 = time.time()
    map_batch = stack(maps)
    n_sample = 16

    # The db phase's floor is PER-PROGRAM compile-service latency (~25-70 s
    # per distinct jit program on the relay, independent of the server
    # compile cache — tools/db_build_prof.py). Two levers applied here:
    # the assembler and the scan-slot calibration are ONE merged program
    # (build_database_calibrated), and its compile is OVERLAPPED with the
    # descriptor builder's by warming it on shape-identical zero dummies
    # in a background thread while the main thread compiles the builder.
    def _warm_assembler():
        g_shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                (BUILD_CHUNK,) + x.shape[1:], x.dtype
            ),
            map_batch,
        )
        d_shapes = jax.eval_shape(
            lambda b: jax.vmap(
                functools.partial(
                    build_descriptors, cfg=cfg.desc, caps=cfg.caps
                )
            )(b),
            g_shapes,
        )
        n_map = map_batch.centers.shape[0]
        dd = jax.tree_util.tree_map(
            lambda s: jnp.zeros((n_map,) + s.shape[1:], s.dtype), d_shapes
        )
        ds = jax.tree_util.tree_map(
            lambda s: jnp.zeros((n_sample,) + s.shape[1:], s.dtype), d_shapes
        )
        dposes = jnp.zeros((n_map, 4, 4), jnp.float32)
        jax.block_until_ready(
            build_database_calibrated(dd, dposes, ds, cfg.desc)[0].keys
        )

    warm = threading.Thread(target=_warm_assembler)
    warm.start()
    map_descs = jax.block_until_ready(
        build_descriptors_chunked(map_batch, cfg)
    )
    t_desc = time.time() - t0
    query_batch_all = stack(queries)
    sample = jax.tree_util.tree_map(
        lambda x: x[:n_sample], query_batch_all
    )
    sample_descs = build_descriptors_chunked(sample, cfg)
    warm.join()
    t1 = time.time()
    db, report, totals = build_database_calibrated(
        map_descs, map_batch.pose, sample_descs, cfg.desc
    )
    jax.block_until_ready(db.keys)
    t_asm = time.time() - t1
    cfg = tuned_config(cfg, report)
    t1 = time.time()
    cfg = fit_scan_slots(int(np.asarray(totals).max()), cfg)
    t_cal = time.time() - t1
    print(
        f"[bench] db: {time.time()-t0:.1f}s rows={report.num_rows} "
        f"(descs {t_desc:.1f}s + assemble {t_asm:.1f}s + calibrate {t_cal:.1f}s) "
        f"bucket_cap={cfg.caps.bucket_cap} "
        f"scan_slots={cfg.caps.max_scan_slots} "
        f"direct_table={db.has_direct_table} "
        f"truncated={report.truncated_fraction():.4f}",
        file=sys.stderr,
    )

    # Map keyframe clouds + GICP covariances: per-keyframe, pose-independent
    # -> precomputed once, pinned on device (map-build side, excluded).
    from sgtd_tpu.data.synthetic import render_planar_cloud
    from sgtd_tpu.refine.gicp import point_covariances
    from sgtd_tpu.match.pipeline import localize_refined

    t0 = time.time()
    # Reference cloud preprocessing (semantic_graph_localization.cpp:653-662):
    # the query/source cloud is voxel-downsampled at SG_data/leaf_size (3.0,
    # config/SG_localization.yaml:14) before GICP; the map/target keyframe
    # cloud is used RAW (its downsample is commented out, :681-688).
    # Clouds are DETERMINISTIC-surface renders (panels + ground) since
    # round 5: map and query clouds sample the same world surfaces, so the
    # GICP rerank aligns real geometry — like the reference's LiDAR clouds.
    # The legacy per-observation random blobs gave refinement no true
    # optimum, and its noise was what the divergence guard had to absorb
    # (the round-4 SR dip, BENCH_NOTES r4 caveats).
    cloud_pts = 4096  # raw render size (map targets stay at this)
    # Post-downsample static cap for query sources: measured max over the
    # bench's 64 queries is 849 voxels at leaf 3.0 (min 636, mean 789) —
    # 1024 covers it with margin; load_query_cloud thins deterministically
    # if a cloud ever exceeds the cap.
    src_pts = 1024
    from sgtd_tpu.ops.voxel import load_query_cloud

    rng = np.random.default_rng(77)
    m_clouds, m_masks = zip(
        *(render_planar_cloud(world, p, rng, max_points=cloud_pts)
          for p in world.map_poses)
    )
    map_clouds = jnp.asarray(np.stack(m_clouds))
    map_masks = jnp.asarray(np.stack(m_masks))
    map_covs = jax.jit(
        jax.vmap(functools.partial(point_covariances, cfg=cfg.gicp))
    )(map_clouds, map_masks)
    q_clouds, q_masks = [], []
    for p in world.query_poses:
        c, m = render_planar_cloud(world, p, rng, max_points=cloud_pts)
        qc, qm = load_query_cloud(c[m], cfg.gicp.leaf_size, src_pts)
        q_clouds.append(qc)
        q_masks.append(qm)
    query_clouds = jnp.asarray(np.stack(q_clouds))
    query_masks = jnp.asarray(np.stack(q_masks))
    print(
        f"[bench] clouds+covs: {time.time()-t0:.1f}s "
        f"(src pts after leaf-{cfg.gicp.leaf_size} downsample: "
        f"{int(np.asarray(query_masks).sum(1).mean())} avg)",
        file=sys.stderr,
    )

    # Localization: jit over query chunks (vmap); chunking bounds the padded
    # probe workspace while dispatches stay pipelined.
    chunk = 16
    def chunked(x):
        return x.reshape((num_q // chunk, chunk) + x.shape[1:])
    loc_fn = jax.jit(
        jax.vmap(
            functools.partial(localize_refined, config=cfg, rerank_k=4),
            in_axes=(None, 0, 0, 0, None, None, None),
        )
    )
    take = lambda t, i: jax.tree_util.tree_map(lambda x: x[i], t)

    # Per-rep perturbed inputs (VERDICT r3 weak #4 / next-#7): every rep gets
    # its own epsilon-jittered copy of the query graphs and clouds (0.1 mm —
    # three orders below the 5 cm observation noise, irrelevant to accuracy)
    # so no dispatch layer (the axon relay dedups identical buffers) can ever
    # serve a rep from cache. All variants are staged on device before timing.
    reps = 3
    jrng = np.random.default_rng(40121)
    eps = 1e-4
    rep_inputs = []
    host_centers = np.asarray(query_batch_all.centers)
    host_clouds = np.asarray(query_clouds)
    for _ in range(reps):
        qb = query_batch_all._replace(
            centers=jnp.asarray(
                host_centers
                + jrng.normal(0, eps, host_centers.shape).astype(np.float32)
            )
        )
        qc = jnp.asarray(
            host_clouds
            + jrng.normal(0, eps, host_clouds.shape).astype(np.float32)
        )
        rep_inputs.append(
            (
                jax.tree_util.tree_map(chunked, qb),
                chunked(qc),
                chunked(query_masks),
            )
        )
    jax.block_until_ready(rep_inputs)

    t0 = time.time()
    res = jax.block_until_ready(
        loc_fn(db, take(rep_inputs[0][0], 0), rep_inputs[0][1][0],
               rep_inputs[0][2][0], map_clouds, map_masks, map_covs)
    )
    compile_s = time.time() - t0
    print(f"[bench] compile+first chunk: {compile_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    outs = []
    for r, (chunks, qc_chunks, qm_chunks) in enumerate(rep_inputs):
        # Chunk dispatches pipeline within a rep; every rep's results are
        # explicitly synced — blocking only on the final rep's handles
        # produced a fantasy number once the chunk count shrank (the relay
        # does not guarantee earlier dispatches completed).
        outs = [
            loc_fn(db, take(chunks, i), qc_chunks[i], qm_chunks[i],
                   map_clouds, map_masks, map_covs)
            for i in range(num_q // chunk)
        ]
        jax.block_until_ready(outs)
        print(f"[bench] rep {r}: {time.time()-t0:.2f}s cumulative",
              file=sys.stderr)
    elapsed = time.time() - t0
    scans_per_sec = num_q * reps / elapsed

    # Accuracy gates (the throughput number is invalid if these fail).
    # Pull results to host in one transfer per field.
    host = [jax.tree_util.tree_map(np.asarray, o) for o in outs]
    found = np.concatenate([h.result.found for h in host])
    poses = np.concatenate([h.pose for h in host])

    # Truncation gate (VERDICT r3 next-#6): a probe scan that overflowed
    # max_scan_slots lost votes — the benched path has no exact-fallback
    # rerun (the runner's eval path does), so undercounted votes here would
    # silently distort the metric. Fail loudly instead. TRUNC_PAIRS alone is
    # benign (votes exact; pair lists subsampled like the reference's own
    # skip_len sampling, STDesc.cpp:467-468).
    from sgtd_tpu.match.search import TRUNC_SCAN

    truncated = np.concatenate([h.result.truncated for h in host])
    n_trunc = int(np.sum((truncated & TRUNC_SCAN) != 0))
    if n_trunc:
        print(
            f"[bench] FAIL: {n_trunc}/{num_q} queries overflowed the "
            f"calibrated scan cap ({cfg.caps.max_scan_slots} slots) — votes "
            "undercounted; raise the calibration margin or use the runner's "
            "exact-fallback path. Metric withheld.",
            file=sys.stderr,
        )
        sys.exit(1)

    n_succ = 0
    for i, g in enumerate(queries):
        if not bool(found[i]):
            continue
        t_err, r_err = rpe(np.asarray(g.pose), poses[i])
        if t_err < cfg.success_trans_m and r_err < cfg.success_rot_deg:
            n_succ += 1
    sr = n_succ / num_q
    # "ms/query (pipelined)" is inverse throughput over pipelined chunk
    # dispatches — NOT single-query latency (relay dispatch overhead is
    # amortised across the pipeline; see BENCH_NOTES stage table for true
    # dependent-chain per-stage latency).
    print(
        f"[bench] scans/s={scans_per_sec:.1f} "
        f"ms/query (pipelined)={1000/scans_per_sec:.2f} "
        f"SR={sr:.3f}",
        file=sys.stderr,
    )
    if sr < 0.95:
        # Hard gate: a throughput number with broken accuracy is invalid.
        # Emit no metric line and exit nonzero so the driver records failure.
        # 0.9 -> 0.95 in round 5 (VERDICT r4 next-#7): with deterministic
        # surface clouds + the per-candidate guard the expected SR is 1.000,
        # so a two-query slide now fails loudly.
        print(
            f"[bench] FAIL: success rate {sr:.3f} below 0.95 gate — "
            "throughput metric withheld",
            file=sys.stderr,
        )
        sys.exit(1)

    baseline_scans_per_sec = 1000.0 / 69.0  # reference KAIST03 69 ms/query
    print(
        json.dumps(
            {
                "metric": "localization_throughput_1chip",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / baseline_scans_per_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
