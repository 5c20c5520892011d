"""Pallas TPU kernel: fused hypothesis-inlier voting for verification.

The geometric-verification stage (match/verify.py, the analog of
``STDescManager::candidate_verify``, src/sgtd/src/STDesc.cpp:462-547) scores
every rigid-transform hypothesis by counting match pairs whose three
transformed vertices all land within ``dis_threshold`` of their DB
counterparts. The XLA formulation materialises the transformed-vertex
tensor (C, H, P, 3, 3) and its distances in HBM — 46 MB + 15 MB per query
at bench shapes (C=50 candidates, H=50 hypotheses, P=512 pairs), making
the stage HBM-traffic-bound, not FLOP-bound.

This kernel keeps everything per-candidate in VMEM: the (H, P) transformed
coordinate planes come from nine tiny (H, 3) @ (3, P) MXU matmuls (one per
vertex x coordinate), squared distances and the inlier mask stay in VMEM,
and only the (H,) vote counts are written out. The best hypothesis' inlier
mask is recomputed afterwards by XLA for the argmax hypothesis only —
O(C, P) instead of O(C, H, P).

Layouts chosen for Mosaic: hypothesis rotations split into three (H, 3)
row blocks (lane-dim indexing of a packed (H, 9) array does not lower);
vertices pre-transposed to (9, P) so per-coordinate selection is a static
sublane slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _votes_kernel(r0_ref, r1_ref, r2_ref, t_ref, vq_ref, vdb_ref, valid_ref,
                  votes_ref, *, thr2: float):
    rows = (r0_ref[0], r1_ref[0], r2_ref[0])  # each (H, 3)
    t = t_ref[0]  # (H, 3)
    vqT = vq_ref[0]  # (9, P)
    vdbT = vdb_ref[0]  # (9, P)
    valid = valid_ref[0]  # (1, P) f32

    h = t.shape[0]
    p = vqT.shape[1]
    inlier = jnp.ones((h, p), jnp.bool_)
    for a in range(3):  # vertex A/B/C
        va = vqT[3 * a : 3 * a + 3, :]  # (3, P)
        d2 = jnp.zeros((h, p), jnp.float32)
        for i in range(3):  # coordinate
            # moved[h, p] = R_row_i[h] . vq_vertex_a[p] + t[h, i]
            m = jax.lax.dot_general(
                rows[i], va,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            diff = m + t[:, i : i + 1] - vdbT[3 * a + i : 3 * a + i + 1, :]
            d2 = d2 + diff * diff
        inlier = inlier & (d2 < jnp.float32(thr2))
    votes = jnp.sum(inlier.astype(jnp.float32) * valid, axis=1)  # (H,)
    # The whole (C, H) output stays VMEM-resident (tiny); each grid step
    # writes its own row — a (1, H) blocked output trips the (8, 128)
    # tiling rule on TPU (same pattern as pallas_nn.nn1).
    votes_ref[pl.program_id(0), :] = votes.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("thr",))
def hypothesis_votes(
    rot_h: jnp.ndarray,
    t_h: jnp.ndarray,
    vq: jnp.ndarray,
    vdb: jnp.ndarray,
    pair_valid: jnp.ndarray,
    thr: float,
) -> jnp.ndarray:
    """Inlier vote count of every (candidate, hypothesis): (C, H) int32.

    rot_h (C, H, 3, 3); t_h (C, H, 3); vq/vdb (C, P, 3, 3) vertex rows
    A,B,C; pair_valid (C, P) bool. A pair votes for hypothesis h when all
    three of its transformed query vertices lie within ``thr`` metres of
    the DB vertices (ref STDesc.cpp:487-502).
    """
    c, h = rot_h.shape[:2]
    p = vq.shape[1]
    r0 = rot_h[:, :, 0, :]  # (C, H, 3)
    r1 = rot_h[:, :, 1, :]
    r2 = rot_h[:, :, 2, :]
    vqT = vq.reshape(c, p, 9).swapaxes(1, 2)  # (C, 9, P)
    vdbT = vdb.reshape(c, p, 9).swapaxes(1, 2)
    vmask = pair_valid.astype(jnp.float32)[:, None, :]  # (C, 1, P)
    spec3 = lambda *_: pl.BlockSpec(
        (1, h, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_votes_kernel, thr2=float(thr) ** 2),
        grid=(c,),
        in_specs=[
            spec3(), spec3(), spec3(), spec3(),
            pl.BlockSpec((1, 9, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (c, h), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, h), jnp.int32),
        interpret=_interpret(),
    )(r0, r1, r2, t_h, vqT, vdbT, vmask)
