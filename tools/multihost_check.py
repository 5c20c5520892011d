"""True multi-process (multi-controller) validation of sharded matching.

Round-1 VERDICT missing #6: every distributed test ran as ONE process with a
virtual 8-device mesh, leaving the DCN-facing multi-controller half of
SURVEY.md section 2.3's plan untested. This script runs the real thing on one
host: two `jax.distributed`-initialized CPU processes (4 virtual devices
each -> one global 8-device mesh), the descriptor DB sharded across BOTH
processes' devices, one SPMD program launched from both controllers — then
each process asserts its data-parallel slice of the sharded result against
the single-device pipeline it computes locally.

Usage:
    python tools/multihost_check.py            # parent: spawns 2 workers
    python tools/multihost_check.py --process-id N --num-processes 2 \
        --coordinator localhost:PORT           # worker (internal)

Exit code 0 = multi-controller result matches single-process; the parity
assertions mirror tests/test_sharded_match.py.
"""

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEVICES_PER_PROC = 4
NUM_QUERIES = 8


def worker(coordinator: str, process_id: int, num_processes: int) -> None:
    # Env must be set before jax import (the container sitecustomize
    # pre-registers the axon TPU plugin; force CPU first).
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert len(jax.devices()) == DEVICES_PER_PROC * num_processes
    assert len(jax.local_devices()) == DEVICES_PER_PROC

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from sgtd_tpu.config import CapacityConfig, SGTDConfig
    from sgtd_tpu.data.synthetic import make_map_and_queries
    from sgtd_tpu.db.database import build_database
    from sgtd_tpu.desc.triangles import build_descriptors
    from sgtd_tpu.graph.types import SemanticGraph
    from sgtd_tpu.match.pipeline import localize
    from sgtd_tpu.parallel.mesh import make_mesh, db_sharding
    from sgtd_tpu.parallel.sharded_match import make_sharded_localizer
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = SGTDConfig().replace(
        caps=CapacityConfig(
            max_nodes=64,
            max_descriptors=512,
            bucket_cap=32,
            hits_per_descriptor=8,
            pairs_per_candidate=128,
        )
    )
    # Deterministic world: every process builds identical host-side data.
    map_graphs, query_graphs, _ = make_map_and_queries(
        cfg, seed=11, num_map_frames=24, num_queries=NUM_QUERIES,
        center_noise_m=0.05, dropout=0.1,
    )
    descs = [build_descriptors(g, cfg.desc, cfg.caps) for g in map_graphs]
    db, _ = build_database(
        descs, [np.asarray(g.pose) for g in map_graphs], cfg.desc, cfg.caps
    )

    dp = num_processes
    mesh = make_mesh(dp=dp, db=(DEVICES_PER_PROC * num_processes) // dp)

    def put(x, sharding):
        # multi-controller-safe placement from replicated host data
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: np.asarray(x)[idx]
        )

    sharded_db = jax.tree_util.tree_map(put, db, db_sharding(mesh))
    batch = SemanticGraph(
        *(
            jnp.stack([np.asarray(getattr(g, f)) for g in query_graphs])
            for f in SemanticGraph._fields
        )
    )
    graph_sharding = SemanticGraph(
        centers=NamedSharding(mesh, P("dp", None, None)),
        labels=NamedSharding(mesh, P("dp", None)),
        density=NamedSharding(mesh, P("dp", None)),
        mask=NamedSharding(mesh, P("dp", None)),
        pose=NamedSharding(mesh, P("dp", None, None)),
    )
    batch = jax.tree_util.tree_map(put, batch, graph_sharding)

    localizer = make_sharded_localizer(mesh, cfg)
    res = localizer(sharded_db, batch)

    # Each process checks its own dp slice against the local single-device
    # pipeline (full DB on one local CPU device).
    per_proc = NUM_QUERIES // num_processes
    lo = process_id * per_proc

    def local_slice(x):
        return np.asarray(x.addressable_shards[0].data)

    found = local_slice(res.found)
    votes = local_slice(res.votes)
    poses = local_slice(res.poses)

    from sgtd_tpu.eval.metrics import rpe

    for k in range(per_proc):
        g = query_graphs[lo + k]
        ref = localize(db, g, cfg)
        assert bool(found[k]) == bool(ref.found), (lo + k,)
        np.testing.assert_allclose(
            np.sort(votes[k]), np.sort(np.asarray(ref.votes)), atol=0
        )
        gt = np.asarray(g.pose)
        t_err, r_err = rpe(gt, poses[k][0])
        assert t_err < 2.0 and r_err < 5.0, (lo + k, t_err, r_err)

    print(f"[multihost] process {process_id}: {per_proc} queries OK",
          flush=True)


def parent() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Force exactly DEVICES_PER_PROC virtual devices per worker, replacing
    # any inherited count (pytest's conftest sets 8 for in-process tests).
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROC}"
    )
    env["XLA_FLAGS"] = " ".join(flags)

    procs = [
        subprocess.Popen(
            [
                sys.executable, os.path.abspath(__file__),
                "--coordinator", coordinator,
                "--process-id", str(i),
                "--num-processes", "2",
            ],
            env=env,
        )
        for i in range(2)
    ]
    rcs = [p.wait(timeout=900) for p in procs]
    if any(rcs):
        print(f"[multihost] FAIL rcs={rcs}", file=sys.stderr)
        return 1
    print("[multihost] PASS: 2-process multi-controller == single-process")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator")
    ap.add_argument("--process-id", type=int)
    ap.add_argument("--num-processes", type=int, default=2)
    args = ap.parse_args()
    if args.coordinator is None:
        sys.exit(parent())
    worker(args.coordinator, args.process_id, args.num_processes)


if __name__ == "__main__":
    main()
