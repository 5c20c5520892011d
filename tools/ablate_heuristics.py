"""Ablation of the two extra-reference heuristics in localize_refined.

VERDICT r2 weak #6: `max_refine_shift_m` (divergence guard) and the batched
argmax-of-good pick deviate from the reference's literal serial
early-break candidate loop (semantic_graph_localization.cpp:703-720).
This measures their SR impact on the bench workload by evaluating every
pick variant from ONE set of rerank outputs:

  prod        = early-accept pick (first candidate in score order with
                fitness < best_fitness, else min fitness) + divergence guard
  no-guard    = early-accept pick, guard disabled
  argmin      = pure min-fitness pick + guard
  descriptor  = no GICP refinement at all

Results go to BENCH_NOTES.md ("Heuristic ablation").

Run: python tools/ablate_heuristics.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from sgtd_tpu import SGTDConfig
    from sgtd_tpu.data.synthetic import make_map_and_queries, render_cloud
    from sgtd_tpu.db.device_build import build_database_on_device
    from sgtd_tpu.db.database import tuned_config
    from sgtd_tpu.desc import build_descriptors
    from sgtd_tpu.eval.metrics import rpe
    from sgtd_tpu.eval.runner import stack_graphs as stack
    from sgtd_tpu.geom import se3
    from sgtd_tpu.match.pipeline import localize
    from sgtd_tpu.match.search import calibrate_scan_slots
    from sgtd_tpu.ops.voxel import load_query_cloud
    from sgtd_tpu.refine.gicp import gicp_rerank, point_covariances

    cfg = SGTDConfig()
    num_map, num_q, K = 200, 64, 4
    maps, queries, world = make_map_and_queries(
        cfg, seed=2026, num_map_frames=num_map, num_queries=num_q,
        center_noise_m=0.05, dropout=0.1, label_corrupt_rate=0.05,
    )
    map_batch = stack(maps)
    build_many = jax.jit(
        jax.vmap(functools.partial(build_descriptors, cfg=cfg.desc, caps=cfg.caps))
    )
    db, report = build_database_on_device(
        build_many(map_batch), map_batch.pose, cfg.desc
    )
    cfg = tuned_config(cfg, report)
    qall = stack(queries)
    cfg = calibrate_scan_slots(
        db, build_many(jax.tree_util.tree_map(lambda x: x[:16], qall)), cfg
    )
    print(f"[abl] rows={report.num_rows}", file=sys.stderr)

    rng = np.random.default_rng(77)
    m = [render_cloud(world, p, rng, max_points=4096) for p in world.map_poses]
    map_clouds = jnp.asarray(np.stack([c for c, _ in m]))
    map_masks = jnp.asarray(np.stack([k for _, k in m]))
    map_covs = jax.jit(
        jax.vmap(functools.partial(point_covariances, cfg=cfg.gicp))
    )(map_clouds, map_masks)
    q = []
    for p_ in world.query_poses:
        c, mk = render_cloud(world, p_, rng, max_points=4096)
        q.append(load_query_cloud(c[mk], cfg.gicp.leaf_size, 1024))
    qc = jnp.asarray(np.stack([c for c, _ in q]))
    qm = jnp.asarray(np.stack([k for _, k in q]))

    chunk = 16
    loc = jax.jit(jax.vmap(functools.partial(localize, config=cfg),
                           in_axes=(None, 0)))
    rr = jax.jit(jax.vmap(
        lambda s, sm, t, tm, T0, tc: gicp_rerank(
            s, sm, t, tm, T0, cfg.gicp, tgt_covs=tc
        )
    ))

    frames_all, fits_all, tfs_all, desc_poses = [], [], [], []
    for i in range(0, num_q, chunk):
        g = jax.tree_util.tree_map(lambda x: x[i:i + chunk], qall)
        res = jax.block_until_ready(loc(db, g))
        fk = res.frames[:, :K]
        inits = jax.vmap(se3.rt_to_mat)(res.rot[:, :K], res.trans[:, :K])
        out = jax.block_until_ready(rr(
            qc[i:i + chunk], qm[i:i + chunk],
            map_clouds[fk], map_masks[fk], inits, map_covs[fk],
        ))
        frames_all.append(np.asarray(fk))
        fits_all.append(np.asarray(out.fitness))
        tfs_all.append(np.asarray(out.transform))
        desc_poses.append(np.asarray(res.poses[:, 0]))
    frames_all = np.concatenate(frames_all)
    fits_all = np.concatenate(fits_all)
    tfs_all = np.concatenate(tfs_all)
    desc_poses = np.concatenate(desc_poses)
    frame_poses = np.asarray(db.frame_poses)

    def refined_pose(i, pick):
        return frame_poses[frames_all[i, pick]] @ tfs_all[i, pick]

    def sr_of(variant):
        n_succ, errs = 0, []
        for i, g in enumerate(queries):
            best = desc_poses[i]
            if variant == "descriptor":
                pose = best
            else:
                good = fits_all[i] < cfg.gicp.best_fitness
                if variant in ("prod", "no-guard"):
                    pick = int(np.argmax(good)) if good.any() else int(
                        np.argmin(fits_all[i])
                    )
                else:  # argmin
                    pick = int(np.argmin(fits_all[i]))
                pose = refined_pose(i, pick)
                if variant in ("prod", "argmin"):
                    shift = np.linalg.norm(pose[:3, 3] - best[:3, 3])
                    if shift > cfg.gicp.max_refine_shift_m:
                        pose = best
            t_err, r_err = rpe(np.asarray(g.pose), pose)
            errs.append(t_err)
            if t_err < cfg.success_trans_m and r_err < cfg.success_rot_deg:
                n_succ += 1
        return n_succ / num_q, float(np.sqrt(np.mean(np.square(errs))))

    for v in ("descriptor", "prod", "no-guard", "argmin"):
        sr, rmse = sr_of(v)
        print(f"[abl] {v:12s} SR={sr:.4f} RMSE_T={rmse:.3f} m")


if __name__ == "__main__":
    main()
