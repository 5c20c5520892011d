"""Stage-level profiling of localize_refined on the real chip.

VERDICT.md (round 1, weak #1) flags ~24 ms/query unaccounted between the
15.1 ms descriptor stage and the 39.7 ms recorded full pipeline. This script
times each stage in isolation on the bench workload so the delta is
attributable: descriptor pipeline alone, query-cloud source covariances
alone, the GICP rerank alone, and the fused full program.

Run:  python tools/profile_refined.py
"""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _first_leaf(out):
    import jax

    return jax.tree_util.tree_leaves(out)[0]


def timed(label, fn, *args, **kw):
    """Relay-safe timing: block_until_ready does not reliably block on the
    axon relay backend, so completion is forced by fetching a leaf of the
    LAST output (the device queue is sequential). Fixed relay overhead is
    cancelled by differencing two pipelined rep counts."""
    out = fn(*args, **kw)
    np.asarray(_first_leaf(out))  # compile + settle

    def run(reps):
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = fn(*args, **kw)
        np.asarray(_first_leaf(out))
        return time.time() - t0

    run(2)  # warm the dispatch path
    lo, hi = 4, 12
    t_lo, t_hi = run(lo), run(hi)
    dt = (t_hi - t_lo) / (hi - lo)
    print(f"[prof] {label}: {dt*1000:.2f} ms", file=sys.stderr)
    return out, dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sgtd_tpu import SGTDConfig
    from sgtd_tpu.data.synthetic import make_map_and_queries, render_cloud
    from sgtd_tpu.db.device_build import build_database_on_device
    from sgtd_tpu.db.database import tuned_config
    from sgtd_tpu.desc import build_descriptors
    from sgtd_tpu.match.pipeline import localize, localize_refined
    from sgtd_tpu.match.search import calibrate_scan_slots
    from sgtd_tpu.eval.runner import stack_graphs as stack
    from sgtd_tpu.refine.gicp import point_covariances, gicp_rerank
    from sgtd_tpu.geom import se3

    cfg = SGTDConfig()
    num_map, num_q = 200, 64
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
    sample_descs = build_many(sample)
    cfg = calibrate_scan_slots(db, sample_descs, cfg)
    print(f"[prof] db rows={report.num_rows}", file=sys.stderr)

    # Bench cloud preprocessing (bench.py): raw 4096-pt map targets,
    # leaf-3.0 voxel-downsampled query sources capped at 1024
    # (reference semantics, semantic_graph_localization.cpp:653-688).
    from sgtd_tpu.ops.voxel import load_query_cloud

    cloud_pts, src_pts = 4096, 1024
    rng = np.random.default_rng(77)
    m_clouds, m_masks = zip(
        *(render_cloud(world, p, rng, max_points=cloud_pts) for p in world.map_poses)
    )
    map_clouds = jnp.asarray(np.stack(m_clouds))
    map_masks = jnp.asarray(np.stack(m_masks))
    map_covs = jax.jit(jax.vmap(functools.partial(point_covariances, cfg=cfg.gicp)))(
        map_clouds, map_masks
    )
    q_clouds, q_masks = [], []
    for p_ in world.query_poses:
        c, m = render_cloud(world, p_, rng, max_points=cloud_pts)
        qc, qm = load_query_cloud(c[m], cfg.gicp.leaf_size, src_pts)
        q_clouds.append(qc)
        q_masks.append(qm)
    query_clouds = jnp.asarray(np.stack(q_clouds))
    query_masks = jnp.asarray(np.stack(q_masks))

    chunk = 16
    def chunked(x):
        return x.reshape((num_q // chunk, chunk) + x.shape[1:])
    chunks = jax.tree_util.tree_map(chunked, query_batch_all)
    qc, qm = chunked(query_clouds), chunked(query_masks)
    take = lambda t, i: jax.tree_util.tree_map(lambda x: x[i], t)
    g0, c0, m0 = take(chunks, 0), qc[0], qm[0]

    # 1. Descriptor pipeline alone (chunk of 16).
    loc = jax.jit(jax.vmap(functools.partial(localize, config=cfg), in_axes=(None, 0)))
    _, dt = timed("localize (16q)", loc, db, g0)
    print(f"[prof]   = {dt*1000/chunk:.2f} ms/query", file=sys.stderr)

    # 2. Source covariances alone (chunk of 16 query clouds).
    cov = jax.jit(jax.vmap(functools.partial(point_covariances, cfg=cfg.gicp)))
    _, dt = timed("src point_covariances (16q)", cov, c0, m0)
    print(f"[prof]   = {dt*1000/chunk:.2f} ms/query", file=sys.stderr)

    # 3. Rerank alone with fixed inits (chunk of 16).
    res = jax.block_until_ready(loc(db, g0))
    k = 4
    frames_k = res.frames[:, :k]
    inits = jax.vmap(se3.rt_to_mat)(res.rot[:, :k], res.trans[:, :k])
    def rr(qcld, qmask, fk, init):
        return gicp_rerank(
            qcld, qmask, map_clouds[fk], map_masks[fk], init, cfg.gicp,
            tgt_covs=map_covs[fk],
        )
    rrj = jax.jit(jax.vmap(rr, in_axes=(0, 0, 0, 0)))
    _, dt = timed("gicp_rerank (16q, K=4)", rrj, c0, m0, frames_k, inits)
    print(f"[prof]   = {dt*1000/chunk:.2f} ms/query", file=sys.stderr)

    # 3b. VGICP rerank (no per-iteration NN search).
    from sgtd_tpu.refine.vgicp import vgicp_rerank

    def vr(qcld, qmask, fk, init):
        return vgicp_rerank(
            qcld, qmask, map_clouds[fk], map_masks[fk], init, cfg.gicp,
            tgt_covs=map_covs[fk],
        )
    vrj = jax.jit(jax.vmap(vr, in_axes=(0, 0, 0, 0)))
    _, dt = timed("vgicp_rerank (16q, K=4)", vrj, c0, m0, frames_k, inits)
    print(f"[prof]   = {dt*1000/chunk:.2f} ms/query", file=sys.stderr)

    # 4. Full fused program.
    full = jax.jit(
        jax.vmap(
            functools.partial(localize_refined, config=cfg, rerank_k=k),
            in_axes=(None, 0, 0, 0, None, None, None),
        )
    )
    _, dt = timed(
        "localize_refined (16q)", full, db, g0, c0, m0,
        map_clouds, map_masks, map_covs,
    )
    print(f"[prof]   = {dt*1000/chunk:.2f} ms/query", file=sys.stderr)


if __name__ == "__main__":
    main()
