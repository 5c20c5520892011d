"""Pallas TPU kernels: fused nearest-neighbour search over point clouds.

The GICP hot loop (refine/gicp.py) needs, per iteration, the nearest target
point of every transformed source point, and the covariance stage needs each
point's k=20 nearest neighbours (ref fast_gicp kd-tree queries,
src/sgtd/include/fast_gicp/gicp/impl/fast_gicp_impl.hpp:118-155, 244-290;
the reference's CUDA tier does the same as a brute-force device kernel,
src/sgtd/src/fast_gicp/cuda/brute_force_knn.cu:36-40).

The XLA formulation (distance matmul -> argmin / top_k) materialises the
(N, T) f32 distance matrix in HBM every pass and, for k>1, lowers top_k to
a full per-row sort — measured 8.7 ms/query of the 9.4 ms covariance stage
at N=T=4096 (tools/profile_cov2.py). These kernels keep each distance tile
in VMEM and reduce it in place:

  * ``nn1``:  distances + argmin fused; outputs only (idx, sqdist) per row.
  * ``knn``:  distances + iterative k-smallest extraction (k unrolled VPU
              min/select passes over the VMEM tile — no sort, no HBM
              round-trip).

Distance identity: d(q, r) = |q|^2 + |r|^2 - 2 q.r with the cross term on
the MXU at float32 (coordinate magnitudes ~50 m make bf16 cancellation
unacceptable — measured O(10) m^2 cancellation error). Masking follows the
displaced-point convention (refine.gicp.knn_indices): callers move masked
points to a far coordinate; no epilogue edits the distance expression.

On non-TPU backends (CPU tests) the kernels run in Pallas interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _q_tile(n: int) -> int:
    for t in (256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return n


def _sq_dists(q, r):
    """(BQ, T) squared distances; cross term on the MXU in f32."""
    cross = jax.lax.dot_general(
        q, r,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # f32 multiplies: the MXU's default bf16 input cast loses ~0.2 m at
        # |coords| ~ 50 — enough to corrupt neighbours. K=3 makes the
        # extra passes free.
        precision=jax.lax.Precision.HIGHEST,
    )
    qsq = jnp.sum(q * q, axis=1, keepdims=True)
    rsq = jnp.sum(r * r, axis=1)[None, :]
    return qsq + rsq - 2.0 * cross


def _nn1_kernel(q_ref, r_ref, idx_ref, d_ref):
    d = _sq_dists(q_ref[:], r_ref[:])
    t = d.shape[1]
    dmin = jnp.min(d, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    # First index attaining the min (ties -> lowest, = jnp.argmin).
    idx = jnp.min(jnp.where(d <= dmin, cols, t), axis=1)
    i = pl.program_id(0)
    idx_ref[i, :] = idx.astype(jnp.int32)
    d_ref[i, :] = dmin[:, 0]


@functools.partial(jax.jit, static_argnames=())
def nn1(query: jnp.ndarray, ref: jnp.ndarray):
    """Nearest ``ref`` index + squared distance for each ``query`` point.

    query (N, 3), ref (T, 3) — masked points pre-displaced by the caller.
    Returns (idx (N,) int32, sqdist (N,) float32). The (N, T) distance
    matrix lives tile-by-tile in VMEM only.
    """
    n = query.shape[0]
    bq = _q_tile(n)
    # 1-D blocked outputs hit an XLA/Mosaic layout mismatch; emit 2-D
    # (tile, lane) blocks and flatten after.
    idx, d = pl.pallas_call(
        _nn1_kernel,
        grid=(n // bq,),
        in_specs=[
            pl.BlockSpec((bq, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # Whole (tiles, bq) result stays VMEM-resident (tiny); each grid
            # step writes its own row — blocked 1-row specs trip the
            # (8, 128)-divisibility rule.
            pl.BlockSpec(
                (n // bq, bq), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n // bq, bq), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n // bq, bq), jnp.int32),
            jax.ShapeDtypeStruct((n // bq, bq), jnp.float32),
        ],
        interpret=_interpret(),
    )(query, ref)
    return idx.reshape(n), d.reshape(n)


def _knn_kernel(q_ref, r_ref, idx_ref, *, k: int):
    d = _sq_dists(q_ref[:], r_ref[:])
    t = d.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    big = jnp.float32(np.inf)
    for j in range(k):
        dmin = jnp.min(d, axis=1, keepdims=True)
        sel = d <= dmin
        idx = jnp.min(jnp.where(sel, cols, t), axis=1, keepdims=True)
        idx_ref[:, j] = idx[:, 0]
        d = jnp.where(cols == idx, big, d)


@functools.partial(jax.jit, static_argnames=("k",))
def knn(query: jnp.ndarray, ref: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k nearest ``ref`` points per ``query`` point: (N, k).

    k unrolled min-extraction passes over the VMEM-resident distance tile
    (ties broken by lowest index; distance-sorted output order, like
    lax.top_k on negated distances).
    """
    n = query.shape[0]
    bq = _q_tile(n)
    return pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        grid=(n // bq,),
        in_specs=[
            pl.BlockSpec((bq, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bq, k), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, k), jnp.int32),
        interpret=_interpret(),
    )(query, ref)
