"""Pallas TPU kernel: fused GICP linearization.

One GICP iteration (refine/gicp.py linearize, the analog of
fast_gicp_impl.hpp:118-176) needs, per source point: the nearest target
under the current transform, the target's point covariance, the
Mahalanobis weight M = (C_B + R C_A R^T)^-1, and the accumulation of
H = J^T M J w, g = J^T M r w, y0 = sum w r^T M r. The XLA formulation
chains ~100 small elementwise ops over (K, N, 3, 3) intermediates in HBM
— per-op scheduling overhead and HBM churn dominate (chain_rerank.py:
the nn1 passes are ~0.7-1.7 ms/query of the 3.87 ms rerank; the rest is
this algebra).

This kernel does the whole iteration per source tile in VMEM:

  * squared distances to all targets — MXU f32 cross term (same
    precision contract as ops.pallas_nn: bf16 would corrupt neighbours);
  * first-argmin one-hot — and since Mosaic cannot vector-gather from
    VMEM ("Cannot do int indexing on TPU"), the target payload
    [xyz | cov9 | mask] is gathered by ONE one-hot (bq, T) @ (T, 13) MXU
    matmul;
  * closed-form symmetric 3x3 inverse, residuals, and the 21 unique H
    entries + 6 g entries + y0 reduced per tile into a VMEM accumulator.

Outputs a (33,) packed vector: H (21 upper-triangular), g (6), y0,
n_valid, sum_sqd (fitness numerator pieces), pad. The caller unpacks.
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


# Packed output layout (lane indices in the (1, 64) accumulator row).
_H_IDX = [(i, j) for i in range(6) for j in range(i, 6)]  # 21 upper-tri
_N_OUT = 64


def _sym_inv3(m_xx, m_xy, m_xz, m_yy, m_yz, m_zz):
    """Closed-form inverse of a symmetric 3x3 given upper-tri components
    (each a (bq,) vector). Returns the 6 upper-tri components of the
    inverse (adjugate / det)."""
    c_xx = m_yy * m_zz - m_yz * m_yz
    c_xy = m_xz * m_yz - m_xy * m_zz
    c_xz = m_xy * m_yz - m_xz * m_yy
    c_yy = m_xx * m_zz - m_xz * m_xz
    c_yz = m_xy * m_xz - m_xx * m_yz
    c_zz = m_xx * m_yy - m_xy * m_xy
    det = m_xx * c_xx + m_xy * c_xy + m_xz * c_xz
    inv = 1.0 / det
    return c_xx * inv, c_xy * inv, c_xz * inv, c_yy * inv, c_yz * inv, c_zz * inv


def _linearize_kernel(T_ref, src_ref, scov_ref, smask_ref, tgt_ref,
                      payload_ref, out_ref, aux_ref, acc_ref, *, gate2: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    R00 = T_ref[0, 0]; R01 = T_ref[0, 1]; R02 = T_ref[0, 2]; t0 = T_ref[0, 3]
    R10 = T_ref[1, 0]; R11 = T_ref[1, 1]; R12 = T_ref[1, 2]; t1 = T_ref[1, 3]
    R20 = T_ref[2, 0]; R21 = T_ref[2, 1]; R22 = T_ref[2, 2]; t2 = T_ref[2, 3]

    src = src_ref[:]  # (bq, 3)
    sx = src[:, 0]; sy = src[:, 1]; sz = src[:, 2]
    mx = R00 * sx + R01 * sy + R02 * sz + t0  # (bq,)
    my = R10 * sx + R11 * sy + R12 * sz + t1
    mz = R20 * sx + R21 * sy + R22 * sz + t2
    moved = jnp.stack([mx, my, mz], axis=1)  # (bq, 3)

    tgt = tgt_ref[:]  # (T, 3) displaced-masked coordinates
    cross = jax.lax.dot_general(
        moved, tgt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (bq, T)
    msq = mx * mx + my * my + mz * mz
    tsq = jnp.sum(tgt * tgt, axis=1)
    d = msq[:, None] + tsq[None, :] - 2.0 * cross
    t_n = d.shape[1]
    dmin = jnp.min(d, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    idx = jnp.min(jnp.where(d <= dmin, cols, t_n), axis=1)  # first tie
    onehot = (cols == idx[:, None]).astype(jnp.float32)  # (bq, T)
    sel = jax.lax.dot_general(
        onehot, payload_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # f32 multiplies: the MXU's default bf16 cast would QUANTIZE the
        # gathered coordinates (~2 cm at 20 m — observed as a bf16-grid
        # pose on chip). The one-hot is exact either way; the payload
        # is not.
        precision=jax.lax.Precision.HIGHEST,
    )  # (bq, 13): [bx by bz | cb 6 upper-tri | pad pad pad | mask]

    bx = sel[:, 0]; by = sel[:, 1]; bz = sel[:, 2]
    cbxx = sel[:, 3]; cbxy = sel[:, 4]; cbxz = sel[:, 5]
    cbyy = sel[:, 6]; cbyz = sel[:, 7]; cbzz = sel[:, 8]
    tmask = sel[:, 12]

    sqd = jnp.maximum(dmin[:, 0], 0.0)
    w = smask_ref[:][:, 0] * tmask
    if np.isfinite(gate2):
        w = w * (sqd < jnp.float32(gate2)).astype(jnp.float32)

    # R C_A R^T for the symmetric per-point source covariance (6 comps).
    ca = scov_ref[:]  # (bq, 6) upper-tri xx xy xz yy yz zz
    axx = ca[:, 0]; axy = ca[:, 1]; axz = ca[:, 2]
    ayy = ca[:, 3]; ayz = ca[:, 4]; azz = ca[:, 5]

    def rrow(Ra, Rb, Rc):
        # (C_A @ R_row^T) components for one rotation row (Ra, Rb, Rc).
        vx = axx * Ra + axy * Rb + axz * Rc
        vy = axy * Ra + ayy * Rb + ayz * Rc
        vz = axz * Ra + ayz * Rb + azz * Rc
        return vx, vy, vz

    v0 = rrow(R00, R01, R02)
    v1 = rrow(R10, R11, R12)
    v2 = rrow(R20, R21, R22)

    def dotrow(Ra, Rb, Rc, v):
        return Ra * v[0] + Rb * v[1] + Rc * v[2]

    rcr_xx = dotrow(R00, R01, R02, v0) + cbxx
    rcr_xy = dotrow(R00, R01, R02, v1) + cbxy
    rcr_xz = dotrow(R00, R01, R02, v2) + cbxz
    rcr_yy = dotrow(R10, R11, R12, v1) + cbyy
    rcr_yz = dotrow(R10, R11, R12, v2) + cbyz
    rcr_zz = dotrow(R20, R21, R22, v2) + cbzz
    Mxx, Mxy, Mxz, Myy, Myz, Mzz = _sym_inv3(
        rcr_xx, rcr_xy, rcr_xz, rcr_yy, rcr_yz, rcr_zz
    )

    rx = bx - mx; ry = by - my; rz = bz - mz
    Mrx = Mxx * rx + Mxy * ry + Mxz * rz
    Mry = Mxy * rx + Myy * ry + Myz * rz
    Mrz = Mxz * rx + Myz * ry + Mzz * rz

    # J = [-I | S], S = skew(moved):
    #   S = [[0, -mz, my], [mz, 0, -mx], [-my, mx, 0]]
    # H = [[M, -M S], [-S^T M, S^T M S]] accumulated with weight w;
    # g = [-M r ; S^T M r] ... matching refine/gicp.py's J convention
    # gives H = J^T M J and g = J^T M r with J rows scaled by w.
    # Build the 6 J columns' images under M implicitly:
    # columns of J: c0..c2 = -e0..-e2 ; c3..c5 = S[:, 0..2].
    # S columns: S[:,0] = (0, mz, -my); S[:,1] = (-mz, 0, mx);
    #            S[:,2] = (my, -mx, 0).
    sc = [
        (jnp.zeros_like(mx), mz, -my),
        (-mz, jnp.zeros_like(mx), mx),
        (my, -mx, jnp.zeros_like(mx)),
    ]

    def Mv(vx, vy, vz):
        return (
            Mxx * vx + Mxy * vy + Mxz * vz,
            Mxy * vx + Myy * vy + Myz * vz,
            Mxz * vx + Myz * vy + Mzz * vz,
        )

    Msc = [Mv(*c) for c in sc]  # M @ S columns
    cols6 = [
        (-jnp.ones_like(mx), jnp.zeros_like(mx), jnp.zeros_like(mx)),
        (jnp.zeros_like(mx), -jnp.ones_like(mx), jnp.zeros_like(mx)),
        (jnp.zeros_like(mx), jnp.zeros_like(mx), -jnp.ones_like(mx)),
        sc[0], sc[1], sc[2],
    ]
    Mcols = [
        (-Mxx, -Mxy, -Mxz), (-Mxy, -Myy, -Myz), (-Mxz, -Myz, -Mzz),
        Msc[0], Msc[1], Msc[2],
    ]

    # Per-row contribution columns stacked to ONE (bq, 64) 2-D array and
    # reduced over the sublane axis — Mosaic rejects scalar reductions of
    # relayouted 1-D vectors ("Not implemented: Offset change").
    cols = []
    for a, b in _H_IDX:
        ca_ = cols6[a]; mb = Mcols[b]
        cols.append(w * (ca_[0] * mb[0] + ca_[1] * mb[1] + ca_[2] * mb[2]))
    for a in range(6):
        c6 = cols6[a]
        cols.append(w * (c6[0] * Mrx + c6[1] * Mry + c6[2] * Mrz))
    cols.append(w * (rx * Mrx + ry * Mry + rz * Mrz))  # y0
    cols.append(w)
    cols.append(w * sqd)
    zero = jnp.zeros_like(w)
    cols.extend([zero] * (_N_OUT - len(cols)))
    contrib = jnp.stack(cols, axis=1)  # (bq, 64)
    acc_ref[0, :] += jnp.sum(contrib, axis=0)

    # Per-point correspondence data for the trust region's error() calls
    # (compute_error reuses the linearization's correspondences,
    # fast_gicp_impl.hpp:178-200): [b_pts | M 6 upper-tri | w | pad x6].
    aux_ref[:] = jnp.stack(
        [bx, by, bz, Mxx, Mxy, Mxz, Myy, Myz, Mzz, w,
         jnp.zeros_like(w), jnp.zeros_like(w), jnp.zeros_like(w),
         jnp.zeros_like(w), jnp.zeros_like(w), jnp.zeros_like(w)],
        axis=1,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _tri6(packed21: jnp.ndarray) -> jnp.ndarray:
    """(21,) upper-tri -> symmetric (6, 6)."""
    H = jnp.zeros((6, 6), jnp.float32)
    k = 0
    for i, j in _H_IDX:
        H = H.at[i, j].set(packed21[k])
        H = H.at[j, i].set(packed21[k])
        k += 1
    return H


@functools.partial(jax.jit, static_argnames=("gate",))
def linearize_gicp(
    T: jnp.ndarray,
    src: jnp.ndarray,
    src_cov6: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_eff: jnp.ndarray,
    payload: jnp.ndarray,
    gate: float,
):
    """Fused GICP linearization at transform ``T``.

    src (S, 3); src_cov6 (S, 6) upper-tri source covariances;
    src_mask (S,) bool; tgt_eff (T, 3) displaced-masked target coords;
    payload (T, 13) = [xyz | cov 6 upper-tri | 3 pad | mask] (see
    build_gicp_payload). Returns (H (6,6), g (6,), y0, aux (S, 16)) with
    aux = [b_pts | M upper-tri 6 | w | pad] for compute_error reuse.
    """
    s = src.shape[0]
    # 128-row tiles: the (bq, T) distance + one-hot planes are the VMEM
    # budget (2 MB each at T=4096); 256-row tiles flirt with the 16 MB cap
    # under double buffering.
    bq = 128 if s % 128 == 0 else s
    out, aux = pl.pallas_call(
        functools.partial(
            _linearize_kernel,
            gate2=float(gate) ** 2 if np.isfinite(gate) else np.inf,
        ),
        grid=(s // bq,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # T (4, 4) -> (3, 4) rows used
            pl.BlockSpec((bq, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 6), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tgt_eff (T, 3)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # payload (T, 13)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, _N_OUT), jnp.float32),
            jax.ShapeDtypeStruct((s, 16), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, _N_OUT), jnp.float32)],
        interpret=_interpret(),
    )(
        T.astype(jnp.float32),
        src,
        src_cov6,
        src_mask.astype(jnp.float32)[:, None],
        tgt_eff,
        payload,
    )
    v = out[0]
    H = _tri6(v[:21])
    g = v[21:27]
    return H, g, v[27], aux


def build_gicp_payload(tgt: jnp.ndarray, tgt_mask: jnp.ndarray,
                       tgt_cov: jnp.ndarray) -> jnp.ndarray:
    """(T, 13) one-hot-gatherable target payload: [xyz | cov6 | pad3 | mask].

    Coordinates are the RAW target points (residuals use them; masked
    points' contributions are killed by the mask lane, and the distance
    search uses the separately displaced tgt_eff)."""
    c = tgt_cov
    cov6 = jnp.stack(
        [c[:, 0, 0], c[:, 0, 1], c[:, 0, 2], c[:, 1, 1], c[:, 1, 2], c[:, 2, 2]],
        axis=1,
    )
    t_n = tgt.shape[0]
    return jnp.concatenate(
        [
            tgt,
            cov6,
            jnp.zeros((t_n, 3), jnp.float32),
            tgt_mask.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )
