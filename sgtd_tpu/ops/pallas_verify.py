"""Pallas TPU kernel: fused hypothesis-inlier voting for verification.

The geometric-verification stage (match/verify.py, the analog of
``STDescManager::candidate_verify``, src/sgtd/src/STDesc.cpp:462-547) scores
every rigid-transform hypothesis by counting match pairs whose three
transformed vertices all land within ``dis_threshold`` of their DB
counterparts. The XLA formulation materialises the transformed-vertex
tensor (C, H, P, 3, 3) and its distances in HBM — 46 MB + 15 MB per query
at bench shapes (C=50 candidates, H=50 hypotheses, P=512 pairs), making
the stage HBM-traffic-bound, not FLOP-bound.

This kernel tiles CANDIDATE BLOCKS into VMEM (a per-candidate grid spent
more in grid-step overhead than the whole XLA stage — 800 steps/chunk; a
no-grid whole-array version blew the 16 MB VMEM budget under the query
vmap): each grid step loops over its block's candidates, forming the
(H, P) transformed coordinate planes from nine tiny (H, 3) @ (3, P) MXU
matmuls, keeping squared distances and the inlier mask in VMEM, and
writing only the (H,) vote counts. The best hypothesis' inlier mask is
recomputed afterwards by XLA for the argmax hypothesis only — O(C, P)
instead of O(C, H, P).

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
                  votes_ref, *, thr2: float, cblk: int):
    base = pl.program_id(0) * cblk

    def one(c, _):
        rows = (r0_ref[c], r1_ref[c], r2_ref[c])  # each (H, 3)
        t = t_ref[c]  # (H, 3)
        vqT = vq_ref[c]  # (9, P)
        vdbT = vdb_ref[c]  # (9, P)
        valid = valid_ref[c]  # (1, P) f32

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
                diff = (
                    m + t[:, i : i + 1]
                    - vdbT[3 * a + i : 3 * a + i + 1, :]
                )
                d2 = d2 + diff * diff
            inlier = inlier & (d2 < jnp.float32(thr2))
        votes = jnp.sum(inlier.astype(jnp.float32) * valid, axis=1)  # (H,)
        # Whole (C_pad, H) output stays VMEM-resident; each step writes its
        # block's rows (a (cblk, H) blocked output trips the (8, 128)
        # tiling rule when cblk isn't a sublane multiple).
        votes_ref[base + c, :] = votes.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, cblk, one, 0)


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
    # Candidate-block tiling: ~25 candidates/step keeps VMEM ~2 MB per
    # step while amortising grid-step overhead over the in-kernel loop.
    cblk = c if c <= 32 else 25
    c_pad = -(-c // cblk) * cblk
    pad = c_pad - c

    def padc(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x

    r0 = padc(rot_h[:, :, 0, :])  # (Cp, H, 3)
    r1 = padc(rot_h[:, :, 1, :])
    r2 = padc(rot_h[:, :, 2, :])
    t_p = padc(t_h)
    vqT = padc(vq.reshape(c, p, 9).swapaxes(1, 2))  # (Cp, 9, P)
    vdbT = padc(vdb.reshape(c, p, 9).swapaxes(1, 2))
    vmask = padc(pair_valid.astype(jnp.float32)[:, None, :])  # (Cp, 1, P)

    spec = lambda d1, d2: pl.BlockSpec(
        (cblk, d1, d2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_votes_kernel, thr2=float(thr) ** 2, cblk=cblk),
        grid=(c_pad // cblk,),
        in_specs=[
            spec(h, 3), spec(h, 3), spec(h, 3), spec(h, 3),
            spec(9, p), spec(9, p), spec(1, p),
        ],
        out_specs=pl.BlockSpec(
            (c_pad, h), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c_pad, h), jnp.int32),
        interpret=_interpret(),
    )(r0, r1, r2, t_p, vqT, vdbT, vmask)
    return out[:c]
