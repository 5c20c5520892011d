"""End-to-end evaluation runner: the analog of the reference's benchmark node.

Replicates the main loop of ``semantic_graph_localization``
(src/sgtd/src/semantic_graph_localization.cpp:352-646): load map keyframe
graphs, build the descriptor DB, localize every query graph, and report
SR/RMSE/Recall@K/timing with the reference's metric definitions. Works from
reference-format JSON graph directories or in-memory SemanticGraph lists.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from sgtd_tpu.config import SGTDConfig
from sgtd_tpu.db.database import DescriptorDB, tuned_config
from sgtd_tpu.db.device_build import build_database_on_device
from sgtd_tpu.desc.triangles import build_descriptors
from sgtd_tpu.eval.metrics import EvalAccumulator
from sgtd_tpu.graph.types import SemanticGraph
from sgtd_tpu.match.pipeline import localize, localize_exact


def stack_graphs(graphs: Sequence[SemanticGraph]) -> SemanticGraph:
    # Stack on host, transfer once per field: jnp.stack over per-graph
    # arrays issues one device transfer per graph per field (measured ~10 s
    # for 200 graphs on a remote-attached chip vs ~ms this way).
    return SemanticGraph(
        *(
            jnp.asarray(np.stack([np.asarray(getattr(g, f)) for g in graphs]))
            for f in SemanticGraph._fields
        )
    )


@dataclasses.dataclass
class MapIndex:
    db: DescriptorDB
    config: SGTDConfig  # bucket-cap-tuned
    build_seconds: float
    report: object


def build_map_index(
    map_graphs: Sequence[SemanticGraph], config: SGTDConfig
) -> MapIndex:
    """Build the descriptor DB from keyframe graphs (one vmapped pass).

    The ~seconds cost matches the reference's startup DB rebuild
    (src/readme.txt:5) and is excluded from query timing, as there.
    """
    t0 = time.time()
    batch = stack_graphs(map_graphs)
    build_many = jax.jit(
        jax.vmap(
            functools.partial(
                build_descriptors, cfg=config.desc, caps=config.caps
            )
        )
    )
    descs = build_many(batch)
    db, report = build_database_on_device(descs, batch.pose, config.desc)
    return MapIndex(
        db=db,
        config=tuned_config(config, report),
        build_seconds=time.time() - t0,
        report=report,
    )


def evaluate(
    index: MapIndex,
    query_graphs: Sequence[SemanticGraph],
    batch_size: int = 16,
    gt_poses: Optional[Sequence[np.ndarray]] = None,
    query_cloud_fn=None,
    map_cloud_fn=None,
    rerank_k: int = 4,
) -> dict:
    """Localize every query; return the reference-style metric summary.

    gt_poses defaults to each query graph's own pose field (the reference
    reads GT from the graph JSON the same way,
    semantic_graph_localization.cpp:627-638).

    When ``config.gicp.enable`` and cloud loaders are given
    (query_cloud_fn(i) / map_cloud_fn(frame_id) -> (points, mask)), the top
    ``rerank_k`` candidates are GICP-refined and re-ranked by fitness with
    the reference's best_fitness early accept
    (semantic_graph_localization.cpp:672-722).
    """
    cfg = index.config
    loc_fn = jax.jit(
        jax.vmap(functools.partial(localize, config=cfg), in_axes=(None, 0))
    )
    acc = EvalAccumulator(cfg)
    n = len(query_graphs)
    if gt_poses is None:
        gt_poses = [np.asarray(g.pose) for g in query_graphs]

    i = 0
    while i < n:
        chunk = list(query_graphs[i : i + batch_size])
        pad = batch_size - len(chunk)
        chunk_p = chunk + [chunk[-1]] * pad
        batch = stack_graphs(chunk_p)
        t0 = time.time()
        res = jax.block_until_ready(loc_fn(index.db, batch))
        # Capacity-cap fallback: a query whose probe scan overflowed
        # max_scan_slots lost votes — rerun it through the uncapped exact
        # path (one cached recompile per cap size). TRUNC_PAIRS alone is
        # benign (votes exact; pair lists subsampled, as the reference's own
        # skip_len sampling does, STDesc.cpp:467-468) and does not rerun.
        from sgtd_tpu.match.search import TRUNC_SCAN

        trunc = np.asarray(res.truncated) & TRUNC_SCAN
        if np.any(trunc[: len(chunk)] != 0):
            res_fields = {
                f: np.array(getattr(res, f)) for f in res._fields
            }
            for k in np.nonzero(trunc[: len(chunk)])[0]:
                ex = localize_exact(index.db, chunk[int(k)], cfg)
                for f in res._fields:
                    res_fields[f][int(k)] = np.asarray(getattr(ex, f))
            res = type(res)(**res_fields)
        use_gicp = (
            cfg.gicp.enable
            and query_cloud_fn is not None
            and map_cloud_fn is not None
        )
        best_poses = np.array(res.poses[:, 0])
        if use_gicp:
            from sgtd_tpu.geom import se3 as _se3
            from sgtd_tpu.refine.gicp import gicp_rerank, point_covariances
            from sgtd_tpu.refine.vgicp import vgicp_rerank

            rerank_fn = (
                vgicp_rerank if cfg.gicp.engine == "vgicp" else gicp_rerank
            )

            if not hasattr(index, "_gicp_cov_cache"):
                index._gicp_cov_cache = {}
            cov_cache = index._gicp_cov_cache
            frame_poses = np.asarray(index.db.frame_poses)
            for k in range(len(chunk)):
                if not bool(res.found[k]):
                    continue
                frames_k = np.asarray(res.frames[k][:rerank_k])
                src, src_mask = query_cloud_fn(i + k)
                tgts, tmasks, tcovs, inits = [], [], [], []
                for c in range(rerank_k):
                    fid = int(frames_k[c])
                    tp, tm = map_cloud_fn(fid)
                    # Map keyframe covariances are pose-independent: compute
                    # once per keyframe, reuse across queries/candidates.
                    if fid not in cov_cache:
                        cov_cache[fid] = point_covariances(
                            jnp.asarray(tp), jnp.asarray(tm), cfg.gicp
                        )
                    tgts.append(tp)
                    tmasks.append(tm)
                    tcovs.append(cov_cache[fid])
                    T_loop = np.eye(4, dtype=np.float32)
                    T_loop[:3, :3] = np.asarray(res.rot[k][c])
                    T_loop[:3, 3] = np.asarray(res.trans[k][c])
                    inits.append(T_loop)
                out = rerank_fn(
                    jnp.asarray(src), jnp.asarray(src_mask),
                    jnp.asarray(np.stack(tgts)), jnp.asarray(np.stack(tmasks)),
                    jnp.asarray(np.stack(inits)), cfg.gicp,
                    tgt_covs=jnp.stack(tcovs),
                )
                fit = np.asarray(out.fitness)
                # best_fitness early accept in candidate order, else min
                # fitness (ref :703-720).
                pick = None
                for c in range(rerank_k):
                    if fit[c] < cfg.gicp.best_fitness:
                        pick = c
                        break
                if pick is None:
                    pick = int(np.argmin(fit))
                T_ref = np.asarray(out.transform[pick])
                refined = frame_poses[frames_k[pick]] @ T_ref
                # Divergence guard: a refinement that leaves the verified
                # descriptor pose's neighbourhood is a wrong-basin ICP.
                shift = np.linalg.norm(refined[:3, 3] - best_poses[k][:3, 3])
                if shift <= cfg.gicp.max_refine_shift_m:
                    best_poses[k] = refined
        dt_ms = (time.time() - t0) * 1000.0 / len(chunk)
        for k in range(len(chunk)):
            acc.add(
                np.asarray(gt_poses[i + k]),
                best_poses[k],
                np.asarray(res.poses[k]),
                time_ms=dt_ms,
            )
        i += batch_size

    out = acc.summary()
    out["map_build_seconds"] = index.build_seconds
    out["db_rows"] = index.report.num_rows
    return out
