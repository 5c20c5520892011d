"""Trustworthy stage profiler: in-program dependent chains.

Pipelined-dispatch timing on the axon relay hides op cost behind ~2.5 ms
Python dispatch + 27 ms sync overhead (tools/relay_check2.py); the only
method that measured a 4096^3 matmul at its true 0.70 ms is a DEPENDENT
chain inside ONE jit program with a scalar output. This tool applies that to
the bench stages: each stage is wrapped as chain(k) where iteration i+1's
input is perturbed by iteration i's (tiny-scaled) output, forcing strictly
sequential execution; per-op time = (t(k_hi) - t(k_lo)) / (k_hi - k_lo).

Results feed BENCH_NOTES.md's stage table (VERDICT r2 next-#1).
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


def chain_time(label, make_step, k_lo=1, k_hi=5, reps=3, batch=CHUNK):
    """make_step() -> (init_carry, step_fn); step_fn(carry) -> carry with a
    data dependency on the previous iteration. Returns true s/op."""

    def prog(k):
        @jax.jit
        def f(carry):
            for _ in range(k):
                carry = step_fn(carry)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x[..., None].ravel()[:1].astype(jnp.float32)),
                carry, jnp.float32(0.0),
            )
        return f

    carry0, step_fn = make_step()
    f_lo, f_hi = prog(k_lo), prog(k_hi)
    float(f_lo(carry0)); float(f_hi(carry0))  # compile
    t_lo = t_hi = 0.0
    for _ in range(reps):
        t0 = time.time(); float(f_lo(carry0)); t_lo += time.time() - t0
        t0 = time.time(); float(f_hi(carry0)); t_hi += time.time() - t0
    dt = (t_hi - t_lo) / ((k_hi - k_lo) * reps)
    print(f"[chain] {label:48s} {dt*1000:8.2f} ms/op ({dt*1000/batch:6.2f} ms/query)")
    return dt


def main():
    from sgtd_tpu import SGTDConfig
    from sgtd_tpu.data.synthetic import make_map_and_queries, render_cloud
    from sgtd_tpu.db.device_build import build_database_on_device
    from sgtd_tpu.db.database import tuned_config
    from sgtd_tpu.desc import build_descriptors
    from sgtd_tpu.match.pipeline import localize, localize_refined
    from sgtd_tpu.match.search import calibrate_scan_slots
    from sgtd_tpu.eval.runner import stack_graphs as stack
    from sgtd_tpu.refine.gicp import point_covariances, gicp_rerank
    from sgtd_tpu.refine.vgicp import build_voxel_maps, vgicp_rerank
    from sgtd_tpu.geom import se3

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
    print(f"[chain] setup {time.time()-t0:.0f}s rows={report.num_rows} "
          f"slots={cfg.caps.max_scan_slots}", file=sys.stderr)

    # Bench cloud preprocessing (bench.py): raw 4096-pt map targets,
    # leaf-3.0 downsampled query sources capped at 1024.
    from sgtd_tpu.ops.voxel import load_query_cloud

    cloud_pts, src_pts = 4096, 1024
    rng = np.random.default_rng(77)
    m = [render_cloud(world, p, rng, max_points=cloud_pts) for p in world.map_poses]
    map_clouds = jnp.asarray(np.stack([c for c, _ in m]))
    map_masks = jnp.asarray(np.stack([k for _, k in m]))
    map_covs = jax.jit(jax.vmap(functools.partial(point_covariances, cfg=cfg.gicp)))(
        map_clouds, map_masks)
    q = []
    for p_ in world.query_poses[:CHUNK]:
        c, mk = render_cloud(world, p_, rng, max_points=cloud_pts)
        q.append(load_query_cloud(c[mk], cfg.gicp.leaf_size, src_pts))
    qc = jnp.asarray(np.stack([c for c, _ in q]))
    qm = jnp.asarray(np.stack([k for _, k in q]))
    g16 = jax.tree_util.tree_map(lambda x: x[:CHUNK], query_batch_all)
    vmaps = build_voxel_maps(map_clouds, map_masks, map_covs, cfg.gicp)
    jax.block_until_ready(vmaps)

    eps = jnp.float32(1e-12)

    # 1. localize (descriptor pipeline), 16 queries
    def mk_localize():
        loc = jax.vmap(functools.partial(localize, config=cfg), in_axes=(None, 0))
        def step(g):
            r = loc(db, g)
            return g._replace(centers=g.centers + eps * jnp.sum(r.best_score))
        return g16, step
    chain_time("localize (16q)", mk_localize, k_hi=3)

    # 2. point_covariances src clouds
    def mk_cov():
        pc = jax.vmap(functools.partial(point_covariances, cfg=cfg.gicp))
        def step(c):
            covs = pc(c, qm)
            return c + eps * jnp.sum(covs[:, :1, 0, 0])
        return qc, step
    chain_time("src point_covariances (16x1024, pallas knn)", mk_cov, k_hi=9)

    # pick candidate frames once for rerank chains
    locj = jax.jit(jax.vmap(functools.partial(localize, config=cfg),
                            in_axes=(None, 0)))
    res = jax.block_until_ready(locj(db, g16))
    K = 4
    frames_k = res.frames[:, :K]
    inits = jax.vmap(se3.rt_to_mat)(res.rot[:, :K], res.trans[:, :K])
    tg, tm_, tc = map_clouds[frames_k], map_masks[frames_k], map_covs[frames_k]
    vm_k = jax.tree_util.tree_map(lambda x: x[frames_k], vmaps)

    # 3. gicp rerank (incl src covs)
    def mk_gicp():
        def rr(c):
            o = jax.vmap(lambda a, b, t, tm2, T0, tcv: gicp_rerank(
                a, b, t, tm2, T0, cfg.gicp, tgt_covs=tcv))(
                c, qm, tg, tm_, inits, tc)
            return c + eps * jnp.sum(o.fitness)
        return qc, rr
    chain_time("gicp_rerank K=4 (incl src covs)", mk_gicp)

    # 4. vgicp rerank, per-query voxel build (old path)
    def mk_vg_old():
        def rr(c):
            o = jax.vmap(lambda a, b, t, tm2, T0, tcv: vgicp_rerank(
                a, b, t, tm2, T0, cfg.gicp, tgt_covs=tcv))(
                c, qm, tg, tm_, inits, tc)
            return c + eps * jnp.sum(o.fitness)
        return qc, rr
    chain_time("vgicp_rerank (per-query vm build)", mk_vg_old)

    # 5. vgicp rerank, PREBUILT voxel maps
    def mk_vg_new():
        def rr(c):
            o = jax.vmap(lambda a, b, T0, vm: vgicp_rerank(
                a, b, a, b, T0, cfg.gicp, voxel_maps=vm))(
                c, qm, inits, vm_k)
            return c + eps * jnp.sum(o.fitness)
        return qc, rr
    chain_time("vgicp_rerank (PREBUILT vmaps)", mk_vg_new)

    # 6. full fused localize_refined (gicp engine, current bench config)
    def mk_full():
        full = jax.vmap(
            functools.partial(localize_refined, config=cfg, rerank_k=K),
            in_axes=(None, 0, 0, 0, None, None, None),
        )
        def step(g):
            r = full(db, g, qc, qm, map_clouds, map_masks, map_covs)
            return g._replace(centers=g.centers + eps * jnp.sum(r.fitness))
        return g16, step
    chain_time("localize_refined FULL (gicp)", mk_full, k_hi=3)

    # 7. full fused with vgicp + prebuilt vmaps
    import dataclasses
    cfg_v = cfg.replace(gicp=dataclasses.replace(cfg.gicp, engine="vgicp"))
    def mk_full_v():
        full = jax.vmap(
            functools.partial(localize_refined, config=cfg_v, rerank_k=K,
                              map_vmaps=vmaps),
            in_axes=(None, 0, 0, 0, None, None, None),
        )
        def step(g):
            r = full(db, g, qc, qm, map_clouds, map_masks, None)
            return g._replace(centers=g.centers + eps * jnp.sum(r.fitness))
        return g16, step
    chain_time("localize_refined FULL (vgicp+prebuilt)", mk_full_v, k_hi=3)


if __name__ == "__main__":
    main()
