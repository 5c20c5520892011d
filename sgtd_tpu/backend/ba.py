"""Landmark-based bundle adjustment with Schur-complement reduction.

New capability relative to the reference (its GTSAM/Ceres deps are declared
but never used, SURVEY.md 2.4). The natural BA problem for this framework:
keyframe poses + semantic-instance landmark positions, with each observation
being the instance centroid measured in a keyframe's sensor frame (the graph
nodes that feed descriptor matching).

    residual r = R_f^T (p_l - t_f) - z_{f,l}   in R^3

The landmark block of the normal equations is 3x3 block-diagonal, so
landmarks are eliminated in closed form (Schur complement) and only the
reduced pose system (6F x 6F) is solved densely — the classic structure,
laid out TPU-first: observations are a padded (L, O_max) table, every
Jacobian/Hessian block batches over it, and the Schur outer products are one
einsum + scatter-add.

The reduced system S is exactly what a multi-host deployment psum-reduces
across observation shards (each host holds a slice of the observation table;
S and g are dense (6F)^2/(6F) accumulators) — see sgtd_tpu.parallel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sgtd_tpu.geom import se3
from sgtd_tpu.ops.linalg3 import inv3x3


class BAProblem(NamedTuple):
    """Padded BA problem.

    poses:     (F, 4, 4) float32 — initial keyframe poses.
    landmarks: (L, 3) float32 — initial landmark positions (world).
    obs_frame: (L, O) int32 — observing keyframe per observation slot.
    obs_local: (L, O, 3) float32 — measured local-frame positions z.
    obs_valid: (L, O) bool.
    anchor:    (F,) bool — poses held fixed (gauge).
    """

    poses: jnp.ndarray
    landmarks: jnp.ndarray
    obs_frame: jnp.ndarray
    obs_local: jnp.ndarray
    obs_valid: jnp.ndarray
    anchor: jnp.ndarray


class BAResult(NamedTuple):
    poses: jnp.ndarray
    landmarks: jnp.ndarray
    costs: jnp.ndarray  # (iterations,) sum squared residual per iteration


@functools.partial(jax.jit, static_argnames=("iterations", "damping"))
def optimize_ba(
    ba: BAProblem, iterations: int = 10, damping: float = 1e-5
) -> BAResult:
    f_n = ba.poses.shape[0]
    l_n, o_n = ba.obs_frame.shape

    def step(carry, _):
        poses, lms = carry
        R = poses[ba.obs_frame][..., :3, :3]  # (L, O, 3, 3)
        t = poses[ba.obs_frame][..., :3, 3]  # (L, O, 3)
        Rt = jnp.swapaxes(R, -1, -2)
        y = jnp.einsum("loij,loj->loi", Rt, lms[:, None, :] - t)  # local pos
        r = y - ba.obs_local  # (L, O, 3)
        w = ba.obs_valid.astype(poses.dtype)[..., None]

        # Jacobians: wrt landmark Jl = R^T; wrt pose Jp = [-I | hat(y)].
        Jl = Rt  # (L, O, 3, 3)
        Jp = jnp.concatenate(
            [
                -jnp.broadcast_to(jnp.eye(3, dtype=poses.dtype), Rt.shape),
                se3.hat(y),
            ],
            axis=-1,
        )  # (L, O, 3, 6)

        wm = w[..., None]  # (L, O, 3, 1)
        # Landmark blocks (3x3, block diagonal over L).
        Hll = jnp.einsum("loai,loaj->lij", Jl * wm, Jl)  # (L, 3, 3)
        gl = jnp.einsum("loai,loa->li", Jl * wm, r)  # (L, 3)
        Hll_inv = inv3x3(
            Hll + damping * jnp.eye(3, dtype=poses.dtype)
        )

        # Pose blocks.
        HppD = jnp.einsum("loai,loaj->loij", Jp * wm, Jp)  # (L, O, 6, 6)
        gp_o = jnp.einsum("loai,loa->loi", Jp * wm, r)  # (L, O, 6)
        W = jnp.einsum("loai,loaj->loij", Jp * wm, Jl)  # (L, O, 6, 3)

        # Schur: S = Hpp - W Hll^-1 W^T (cross-frame fill per landmark),
        #        g = gp - W Hll^-1 gl.
        WHinv = jnp.einsum("loij,ljk->loik", W, Hll_inv)  # (L, O, 6, 3)
        S_fill = jnp.einsum("loik,lpjk->lopij", WHinv, W)  # (L, O, O, 6, 6)
        g_fill = jnp.einsum("loik,lk->loi", WHinv, gl)  # (L, O, 6)

        S = jnp.zeros((f_n, f_n, 6, 6), poses.dtype)
        S = S.at[ba.obs_frame, ba.obs_frame].add(HppD)
        fi = jnp.broadcast_to(ba.obs_frame[:, :, None], (l_n, o_n, o_n))
        fj = jnp.broadcast_to(ba.obs_frame[:, None, :], (l_n, o_n, o_n))
        S = S.at[fi, fj].add(-S_fill)
        g = jnp.zeros((f_n, 6), poses.dtype)
        g = g.at[ba.obs_frame].add(gp_o - g_fill)

        anchor_w = jnp.where(ba.anchor, 1e8, 0.0)
        S = S.at[jnp.arange(f_n), jnp.arange(f_n)].add(
            (anchor_w[:, None, None] + damping)
            * jnp.eye(6, dtype=poses.dtype)
        )

        Sd = S.transpose(0, 2, 1, 3).reshape(f_n * 6, f_n * 6)
        dp = jnp.linalg.solve(Sd, -g.reshape(f_n * 6)).reshape(f_n, 6)

        # Back-substitute landmarks: dl = -Hll^-1 (gl + W^T dp).
        Wt_dp = jnp.einsum("loij,loi->lj", W, dp[ba.obs_frame])
        dl = -jnp.einsum("lij,lj->li", Hll_inv, gl + Wt_dp)

        new_poses = poses @ se3.se3_exp(dp)
        new_lms = lms + dl
        cost = jnp.sum((r * w) ** 2)
        return (new_poses, new_lms), cost

    (poses, lms), costs = jax.lax.scan(
        step, (ba.poses, ba.landmarks), None, length=iterations
    )
    return BAResult(poses=poses, landmarks=lms, costs=costs)
