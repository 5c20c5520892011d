"""Stage-level profiling of the bench workload (VERDICT item 2).

Times each jitted stage of localize_refined separately on the real chip so
the per-query latency has a stage table that sums to the measured total.
Run: python tools/profile_stages.py
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

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgtd_tpu import SGTDConfig
from sgtd_tpu.data.synthetic import make_map_and_queries, render_cloud
from sgtd_tpu.db.device_build import build_database_on_device
from sgtd_tpu.db.database import tuned_config
from sgtd_tpu.desc import build_descriptors
from sgtd_tpu.match.pipeline import localize, localize_refined
from sgtd_tpu.match.search import calibrate_scan_slots
from sgtd_tpu.eval.runner import stack_graphs as stack
from sgtd_tpu.refine.gicp import point_covariances, gicp_rerank
from sgtd_tpu.refine.vgicp import vgicp_rerank
from sgtd_tpu.geom import se3


def timeit(label, fn, *args, reps=3, inner=4):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    for _ in range(reps):
        for _ in range(inner):
            out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / (reps * inner)
    print(f"{label:45s} {dt*1000:9.2f} ms/call")
    return out, dt


def main():
    cfg = SGTDConfig()
    num_map, num_q = 200, 64
    maps, queries, world = make_map_and_queries(
        cfg, seed=2026, num_map_frames=num_map, num_queries=num_q,
        center_noise_m=0.05, dropout=0.1, label_corrupt_rate=0.05,
    )
    map_batch = stack(maps)
    build_many = jax.jit(jax.vmap(functools.partial(build_descriptors, cfg=cfg.desc, caps=cfg.caps)))
    map_descs = build_many(map_batch)
    db, report = build_database_on_device(map_descs, map_batch.pose, cfg.desc)
    cfg = tuned_config(cfg, report)
    query_batch_all = stack(queries)
    sample = jax.tree_util.tree_map(lambda x: x[:16], query_batch_all)
    sample_descs = build_many(sample)
    cfg = calibrate_scan_slots(db, sample_descs, cfg)
    print(f"db rows={report.num_rows} scan_slots={cfg.caps.max_scan_slots}", file=sys.stderr)

    cloud_pts = 4096
    rng = np.random.default_rng(77)
    m_clouds, m_masks = zip(*(render_cloud(world, p, rng, max_points=cloud_pts) for p in world.map_poses))
    map_clouds = jnp.asarray(np.stack(m_clouds))
    map_masks = jnp.asarray(np.stack(m_masks))
    map_covs = jax.jit(jax.vmap(functools.partial(point_covariances, cfg=cfg.gicp)))(map_clouds, map_masks)
    q_clouds, q_masks = zip(*(render_cloud(world, p, rng, max_points=cloud_pts) for p in world.query_poses))
    query_clouds = jnp.asarray(np.stack(q_clouds))
    query_masks = jnp.asarray(np.stack(q_masks))

    chunk = 16
    def chunked(x):
        return x.reshape((num_q // chunk, chunk) + x.shape[1:])
    chunks = jax.tree_util.tree_map(chunked, query_batch_all)
    qc, qm = chunked(query_clouds), chunked(query_masks)
    take = lambda t, i: jax.tree_util.tree_map(lambda x: x[i], t)
    g0, qc0, qm0 = take(chunks, 0), qc[0], qm[0]

    # 1. full refined pipeline (what bench measures)
    loc_ref = jax.jit(jax.vmap(
        functools.partial(localize_refined, config=cfg, rerank_k=4),
        in_axes=(None, 0, 0, 0, None, None, None)))
    _, t_full = timeit("localize_refined (full)", loc_ref, db, g0, qc0, qm0, map_clouds, map_masks, map_covs)

    # 2. descriptor pipeline only
    loc = jax.jit(jax.vmap(functools.partial(localize, config=cfg), in_axes=(None, 0)))
    res, t_desc = timeit("localize (descriptor pipeline)", loc, db, g0)

    # 3. query-cloud covariances alone
    covs_fn = jax.jit(jax.vmap(functools.partial(point_covariances, cfg=cfg.gicp)))
    _, t_cov = timeit("point_covariances (query cloud)", covs_fn, qc0, qm0)

    # 4. rerank alone, given precomputed results
    rerank_k = 4
    frames_k = res.frames[:, :rerank_k]
    inits = jax.vmap(se3.rt_to_mat)(res.rot[:, :rerank_k], res.trans[:, :rerank_k])
    rerank = vgicp_rerank if cfg.gicp.engine == "vgicp" else gicp_rerank
    def rer(qcl, qml, fk, ini):
        return rerank(qcl, qml, map_clouds[fk], map_masks[fk], ini, cfg.gicp, tgt_covs=map_covs[fk])
    rer_fn = jax.jit(jax.vmap(rer))
    _, t_rer = timeit(f"{cfg.gicp.engine} rerank (incl. src covs)", rer_fn, qc0, qm0, frames_k, inits)

    per_q = 1000.0 / chunk
    print(f"\nper-query: full={t_full*per_q:.2f} desc={t_desc*per_q:.2f} "
          f"qcov={t_cov*per_q:.2f} rerank={t_rer*per_q:.2f} "
          f"residual={(t_full-t_desc-t_rer)*per_q:.2f} ms")


if __name__ == "__main__":
    main()
