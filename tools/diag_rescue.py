"""Diagnose GICP rerank frame flips on the hard workload.

For every query where the descriptor decision and the reranked decision
disagree (either direction), print the per-candidate fitness / guard /
pose-error table so the pick logic can be tuned on evidence.

Run: JAX_PLATFORMS=cpu python tools/diag_rescue.py [num_map] [num_q]
"""

import functools
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from sgtd_tpu.config import GicpConfig, SGTDConfig
from sgtd_tpu.data.synthetic import (
    make_hard_world, observe, render_planar_cloud,
)
from sgtd_tpu.db.artifacts import build_map_artifacts
from sgtd_tpu.eval.metrics import rpe
from sgtd_tpu.eval.runner import build_map_index, stack_graphs
from sgtd_tpu.match.pipeline import localize
from sgtd_tpu.ops.voxel import load_query_cloud
from sgtd_tpu.refine.gicp import gicp_rerank


def main():
    num_map = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    num_q = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rerank_k = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    rng = np.random.default_rng(411)
    cfg = SGTDConfig()
    world = make_hard_world(
        rng, num_map_frames=num_map, num_queries=num_q,
        n_motifs=2, unique_per_block=2, grid=(5, 5),
    )
    maps = [observe(world, p, cfg, rng, center_noise_m=0.05)
            for p in world.map_poses]
    queries = [
        observe(world, p, cfg, rng, center_noise_m=0.45, dropout=0.35,
                label_corrupt_rate=0.15)
        for p in world.query_poses
    ]
    index = build_map_index(maps, cfg)
    gcfg = index.config.replace(
        gicp=GicpConfig(
            enable=True, engine="gicp", max_points=1024,
            leaf_size=0.5, max_corr_dist_m=1.0, num_neighbors=8,
        )
    )
    cfg = gcfg

    def q_fn(i):
        pts, m = render_planar_cloud(
            world, world.query_poses[i], np.random.default_rng(7000 + i),
            max_points=2048,
        )
        return load_query_cloud(pts[m], 0.5, 1024)

    def m_fn(fid):
        return render_planar_cloud(
            world, world.map_poses[fid], np.random.default_rng(8000 + fid),
            max_points=2048,
        )

    art = build_map_artifacts(
        m_fn, index.db.num_frames, cfg.gicp,
        f_pad=index.db.frame_poses.shape[0],
    )

    loc = jax.jit(jax.vmap(functools.partial(localize, config=cfg),
                           in_axes=(None, 0)))
    res = loc(index.db, stack_graphs(queries))
    frame_poses = np.asarray(index.db.frame_poses)

    rr = jax.jit(functools.partial(gicp_rerank, cfg=cfg.gicp))
    gt_frame_ok = lambda q, f: np.linalg.norm(
        world.map_poses[f][:3, 3] - world.query_poses[q][:3, 3]) < 10.0

    for q in range(num_q):
        gt = np.asarray(queries[q].pose)
        frames_k = np.asarray(res.frames[q])[:rerank_k]
        init_poses = np.asarray(res.poses[q])[:rerank_k]
        desc_te, desc_re = rpe(gt, init_poses[0])
        desc_ok = desc_te < 5 and desc_re < 10
        qc, qm = q_fn(q)
        inits = np.tile(np.eye(4, dtype=np.float32), (rerank_k, 1, 1))
        inits[:, :3, :3] = np.asarray(res.rot[q])[:rerank_k]
        inits[:, :3, 3] = np.asarray(res.trans[q])[:rerank_k]
        out = rr(jnp.asarray(qc), jnp.asarray(qm),
                 art.clouds[frames_k], art.masks[frames_k],
                 jnp.asarray(inits), tgt_covs=art.covs[frames_k])
        fit = np.asarray(out.fitness)
        fitg = np.asarray(out.fitness_gated)
        frac = np.asarray(out.inlier_frac)
        tf = np.asarray(out.transform)
        ninl = np.asarray(out.num_inliers)
        refined = frame_poses[frames_k] @ tf
        shift = np.linalg.norm(refined[:, :3, 3] - init_poses[:, :3, 3], axis=-1)
        dR = refined[:, :3, :3] @ np.swapaxes(init_poses[:, :3, :3], -1, -2)
        tr = np.clip((np.trace(dR, axis1=-2, axis2=-1) - 1) / 2, -1, 1)
        rot = np.degrees(np.arccos(tr))
        guard = (shift <= cfg.gicp.max_refine_shift_m) & (
            rot <= cfg.gicp.max_refine_rot_deg)
        # The PRODUCTION pick (match.pipeline.rerank_pick): overlap-
        # normalized score argmax among guard-passing candidates.
        score = np.where(guard, frac - 0.1 * fitg, -np.inf)
        pick = int(score.argmax())
        final = refined[pick] if guard.any() else init_poses[0]
        fin_te, fin_re = rpe(gt, final)
        fin_ok = fin_te < 5 and fin_re < 10
        if fin_ok == desc_ok and (pick == 0 or not desc_ok):
            continue  # uninteresting
        print(f"\n=== q{q}: desc_ok={desc_ok} (te={desc_te:.2f}) "
              f"final_ok={fin_ok} (te={fin_te:.2f} re={fin_re:.1f}) "
              f"pick={pick}")
        for c in range(rerank_k):
            te_i, _ = rpe(gt, init_poses[c])
            te_r, re_r = rpe(gt, refined[c])
            print(f"  c{c}: frame={frames_k[c]} "
                  f"fit={fit[c]:.3f} fitg={fitg[c]:.4f} frac={frac[c]:.3f} "
                  f"inl={ninl[c]} shift={shift[c]:.2f} "
                  f"rot={rot[c]:.1f} guard={guard[c]} "
                  f"init_te={te_i:.2f} ref_te={te_r:.2f} ref_re={re_r:.1f}")


if __name__ == "__main__":
    main()
