"""Cold/warm map-DB build attribution (VERDICT r4 next-#4).

Times each dispatch of the chunked descriptor builder separately (first
dispatch carries the remote compile; the rest are pure dispatch+compute),
plus the DB assembly and calibration. Run twice back-to-back to see the
server-side compile-cache hit.

Run: timeout 590 python tools/db_build_prof.py [num_map] [chunk]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402


def main():
    import functools

    from sgtd_tpu import SGTDConfig
    from sgtd_tpu.data.synthetic import make_map_and_queries
    from sgtd_tpu.db.device_build import build_database_on_device
    from sgtd_tpu.db.database import tuned_config
    from sgtd_tpu.desc import build_descriptors
    from sgtd_tpu.eval.runner import stack_graphs
    from sgtd_tpu.match.search import calibrate_scan_slots

    num_map = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cfg = SGTDConfig()
    maps, queries, _ = make_map_and_queries(
        cfg, seed=2026, num_map_frames=num_map, num_queries=16,
        center_noise_m=0.05, dropout=0.1, label_corrupt_rate=0.05,
    )
    batch = stack_graphs(maps)
    fn = jax.jit(
        jax.vmap(
            functools.partial(build_descriptors, cfg=cfg.desc, caps=cfg.caps)
        )
    )
    outs = []
    t_first = None
    t0 = time.time()
    for i in range(0, num_map, chunk):
        sl = jax.tree_util.tree_map(lambda x: x[i : i + chunk], batch)
        short = chunk - sl.centers.shape[0]
        if short:
            sl = jax.tree_util.tree_map(
                lambda x: jnp.concatenate(
                    [x, jnp.repeat(x[:1], short, axis=0)], axis=0
                ),
                sl,
            )
        out = fn(sl)
        if t_first is None:
            jax.block_until_ready(out)
            t_first = time.time() - t0
            print(f"[dbprof] first dispatch (compile+run): {t_first:.1f}s",
                  file=sys.stderr)
        outs.append(out)
    jax.block_until_ready(outs)
    t_all = time.time() - t0
    print(f"[dbprof] all {-(-num_map // chunk)} dispatches: {t_all:.1f}s "
          f"(rest after first: {t_all - t_first:.1f}s)", file=sys.stderr)

    descs = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0)[:num_map], *outs
    )
    t0 = time.time()
    db, report = build_database_on_device(descs, batch.pose, cfg.desc)
    jax.block_until_ready(db.keys)
    print(f"[dbprof] assemble: {time.time()-t0:.1f}s rows={report.num_rows}",
          file=sys.stderr)

    qall = stack_graphs(queries)
    sample = jax.tree_util.tree_map(lambda x: x[:16], qall)
    t0 = time.time()
    souts = []
    for i in range(0, 16, chunk):
        sl = jax.tree_util.tree_map(lambda x: x[i : i + chunk], sample)
        short = chunk - sl.centers.shape[0]
        if short:
            sl = jax.tree_util.tree_map(
                lambda x: jnp.concatenate(
                    [x, jnp.repeat(x[:1], short, axis=0)], axis=0
                ),
                sl,
            )
        souts.append(fn(sl))
    sample_descs = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0)[:16], *souts
    )
    cfg2 = tuned_config(cfg, report)
    cfg2 = calibrate_scan_slots(db, sample_descs, cfg2)
    print(f"[dbprof] calibrate: {time.time()-t0:.1f}s "
          f"slots={cfg2.caps.max_scan_slots}", file=sys.stderr)


if __name__ == "__main__":
    main()
