"""On-chip parity + timing of the sorted-heads expansion kernel.

Runs the FULL localize pipeline on the bench world twice — expansion
kernel vs the XLA delta-scatter path (SGTD_NO_EXPAND_KERNEL toggles the
static gate) — and asserts bit-identical votes/decisions, then
chain-times probe_and_hits both ways.

Run on TPU: timeout 1500 python -u tools/expand_parity_tpu.py [num_map]
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


def chain_time(label, carry0, step_fn, k_lo=1, k_hi=3, reps=3):
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
    print(f"[expand] {label:44s} {dt*1000:9.2f} ms/query")
    return dt


def main():
    import sgtd_tpu.match.search as search
    from sgtd_tpu.eval.benchworld import build_bench_world
    from sgtd_tpu.match.pipeline import localize_descriptors
    from sgtd_tpu.eval.runner import build_descriptors_chunked

    num_map = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    cfg, db, qall, report, _ = build_bench_world(num_map=num_map, num_q=8)
    print(f"[expand] rows={report.num_rows} slots={cfg.caps.max_scan_slots}",
          file=sys.stderr)
    descs = build_descriptors_chunked(qall, cfg)

    results = {}
    for mode, env in (("kernel", ""), ("xla", "1")):
        os.environ["SGTD_NO_EXPAND_KERNEL"] = env
        # The gate is read at TRACE time: drop every cached jaxpr so the
        # second mode really retraces (nested-jit caches would otherwise
        # silently reuse the first mode's program).
        jax.clear_caches()

        @jax.jit
        def loc(q):
            return localize_descriptors(db, q, cfg)

        outs = []
        for i in range(8):
            q = jax.tree_util.tree_map(lambda x: x[i], descs)
            outs.append(jax.tree_util.tree_map(np.asarray, loc(q)))
        results[mode] = outs

        q0 = jax.tree_util.tree_map(lambda x: x[0], descs)

        def probe_only(carry):
            qq = q0._replace(
                sides=q0.sides + jnp.float32(1e-30) * carry[:1, :1]
            )
            ph = search.probe_and_hits(
                db, qq, cfg.desc, cfg.search, cfg.caps
            )
            return carry + jnp.float32(1e-30) * (
                jnp.sum(ph.votes)
                + jnp.sum(ph.sel_row).astype(jnp.float32)
                + jnp.sum(ph.sel_frame).astype(jnp.float32)
            )

        chain_time(f"probe_and_hits [{mode}]", jnp.zeros((8, 8), jnp.float32),
                   probe_only)

    os.environ["SGTD_NO_EXPAND_KERNEL"] = ""
    for i in range(8):
        a, b = results["kernel"][i], results["xla"][i]
        np.testing.assert_array_equal(a.votes, b.votes)
        np.testing.assert_array_equal(a.frames, b.frames)
        assert bool(a.found) == bool(b.found)
        np.testing.assert_allclose(a.poses, b.poses, atol=1e-5)
    print("[expand] PARITY OK: votes/frames/decisions bit-identical "
          "across 8 queries")


if __name__ == "__main__":
    main()
