"""Pallas TPU kernels for the probe/vote stage.

The probe stage (match/search.py, analog of the reference's
``candidate_selector`` bucket probing + match_array voting,
src/sgtd/src/STDesc.cpp:318-460) is bound by random row gathers and
L-sized scatter/cumsum passes, not FLOPs (BENCH_NOTES roofline). These
kernels move the reducible parts onto VMEM-resident compute:

  * ``frame_votes``: per-frame vote tally as tiled one-hot MXU matmuls —
    replaces ``jax.ops.segment_sum`` whose TPU lowering is a serialized
    HBM scatter-add.
  * ``gather_rows``: vector gather of (M, 2) uint32 rows with the table
    VMEM-resident (only valid for DBs that fit VMEM; the caller falls
    back to the XLA gather otherwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_TILE = 2048  # L-tile per grid step for the vote kernel
_F_CHUNK = 512  # frame-axis chunk of the in-kernel one-hot (bounds VMEM)


def _votes_kernel(hit_ref, frame_ref, out_ref, acc_ref, *, f_pad_p: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    hit = hit_ref[:].astype(jnp.float32)  # (1, T)
    frame = frame_ref[:]  # (1, T)
    # One-hot in VMEM, CHUNKED along the frame axis (ADVICE r4 low: a full
    # (T, f_pad) one-hot is 16 MiB at f_pad=2048 — at or above per-core
    # VMEM once double-buffered inputs join it). Each chunk is a
    # (T, _F_CHUNK) tile (4 MiB) consumed by one (1, T) @ (T, _F_CHUNK)
    # MXU accumulate into the persistent (1, f_pad_p) accumulator.
    for f0 in range(0, f_pad_p, _F_CHUNK):
        fw = min(_F_CHUNK, f_pad_p - f0)
        onehot = (
            frame[0][:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (_TILE, fw), 1) + f0
        ).astype(jnp.float32)
        acc_ref[:, f0 : f0 + fw] += jax.lax.dot_general(
            hit, onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("f_pad",))
def frame_votes(hit: jnp.ndarray, frame: jnp.ndarray, f_pad: int) -> jnp.ndarray:
    """Sum of ``hit`` per ``frame`` id: (f_pad,) float32.

    hit (L,) bool; frame (L,) int32 in [0, f_pad). Ids outside the range
    contribute nothing (mirrors segment_sum's drop semantics for the
    sentinel id).
    """
    l = hit.shape[0]
    pad = (-l) % _TILE
    if pad:
        hit = jnp.concatenate([hit, jnp.zeros((pad,), hit.dtype)])
        frame = jnp.concatenate([frame, jnp.full((pad,), f_pad, jnp.int32)])
    lt = hit.shape[0]
    f_pad_p = -(-f_pad // 128) * 128  # lane-aligned accumulator/chunks
    out = pl.pallas_call(
        functools.partial(_votes_kernel, f_pad_p=f_pad_p),
        grid=(lt // _TILE,),
        in_specs=[
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, f_pad_p), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, f_pad_p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, f_pad_p), jnp.float32)],
        interpret=_interpret(),
    )(hit.reshape(1, lt), frame.reshape(1, lt))
    return out[0, :f_pad]


_LO = 128  # lane-width low-bits split of the frame id


def _votes_wide_kernel(hit_ref, frame_ref, out_ref, acc_ref, *, f_hi: int):
    """Hierarchical one-hot tally: votes[hi, lo] += hit · [frame>>7==hi] ·
    [frame&127==lo], accumulated per L-tile as ONE (F_hi, T) x (T, 128)
    MXU outer-product matmul.

    The wide-frame vote tally was the dominant probe op at 20k keyframes:
    jax.ops.segment_sum lowers to a serialized HBM scatter-add measured at
    47.9 ms for L=7.3M / f_pad=20016 (tools/scale_probe_prof.py). Here the
    compare cost is L x (F_hi + 128) ~ L x sqrt-ish instead of L x f_pad
    (the flat one-hot kernel above), and the f_pad-proportional work rides
    the MXU: L x f_pad MACs ~ 146G at scale shapes, a few ms."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    hit = hit_ref[:].astype(jnp.float32)  # (1, T)
    frame = frame_ref[:]  # (1, T)
    hi = frame[0] >> 7
    lo = frame[0] & 127
    # hit folds into the hi-side one-hot; out-of-range ids match nothing.
    # bf16 one-hots: 0/1 are exact in bf16 and the MXU runs bf16 at 2x;
    # the f32 accumulate (preferred_element_type) keeps integer counts
    # exact below 2^24.
    oh_hi = (
        (hi[:, None] == jax.lax.broadcasted_iota(jnp.int32, (_TILE, f_hi), 1))
        & (hit[0][:, None] > 0)
    ).astype(jnp.bfloat16)  # (T, F_hi)
    oh_lo = (
        lo[:, None] == jax.lax.broadcasted_iota(jnp.int32, (_TILE, _LO), 1)
    ).astype(jnp.bfloat16)  # (T, 128)
    acc_ref[:] += jax.lax.dot_general(
        oh_hi, oh_lo,
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract T
        preferred_element_type=jnp.float32,
    )  # (F_hi, 128)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("f_pad",))
def frame_votes_wide(
    hit: jnp.ndarray, frame: jnp.ndarray, f_pad: int
) -> jnp.ndarray:
    """Wide-frame variant of :func:`frame_votes`: same contract, any f_pad."""
    l = hit.shape[0]
    pad = (-l) % _TILE
    if pad:
        hit = jnp.concatenate([hit, jnp.zeros((pad,), hit.dtype)])
        frame = jnp.concatenate([frame, jnp.full((pad,), f_pad, jnp.int32)])
    lt = hit.shape[0]
    f_hi = -(-f_pad // _LO) + 1  # +1 row absorbs the f_pad sentinel ids
    out = pl.pallas_call(
        functools.partial(_votes_wide_kernel, f_hi=f_hi),
        grid=(lt // _TILE,),
        in_specs=[
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (f_hi, _LO), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((f_hi, _LO), jnp.float32),
        scratch_shapes=[pltpu.VMEM((f_hi, _LO), jnp.float32)],
        interpret=_interpret(),
    )(hit.reshape(1, lt), frame.reshape(1, lt))
    return out.reshape(-1)[:f_pad]


def _gather_kernel(tbl_ref, idx_ref, out_ref):
    out_ref[:] = tbl_ref[idx_ref[:], :]


@jax.jit
def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[i] = table[idx[i]] with the whole table VMEM-resident.

    table (M, W); idx (L,) int32. Lowering experiment — Mosaic may reject
    the traced-vector gather; callers must be ready to fall back.
    """
    l = idx.shape[0]
    w = table.shape[1]
    return pl.pallas_call(
        _gather_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, w), table.dtype),
        interpret=_interpret(),
    )(table, idx)
