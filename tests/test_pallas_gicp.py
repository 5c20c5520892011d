"""Fused Pallas GICP linearization vs the XLA reference formulation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sgtd_tpu.config import GicpConfig
from sgtd_tpu.refine import gicp as G


def _cloud(rng, n, planar=True):
    pts = np.column_stack(
        [rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
         rng.normal(0, 0.05, n) if planar else rng.uniform(0, 6, n)]
    ).astype(np.float32)
    # add some vertical structure so the pose is fully constrained
    k = n // 4
    pts[:k, 2] = rng.uniform(0, 5, k)
    pts[:k, 0] = np.round(pts[:k, 0] / 5) * 5 + rng.normal(0, 0.03, k)
    return pts


@pytest.mark.parametrize("gate", [float("inf"), 2.0])
def test_fused_align_matches_xla(gate, monkeypatch):
    import dataclasses

    rng = np.random.default_rng(3)
    tgt = _cloud(rng, 512)
    # Source = subsampled noisy copy under a known offset.
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, 3] = [0.4, -0.3, 0.1]
    src_w = tgt[::2] + rng.normal(0, 0.02, tgt[::2].shape).astype(np.float32)
    Tinv = np.linalg.inv(T_true)
    src = (src_w @ Tinv[:3, :3].T) + Tinv[:3, 3]
    smask = np.ones(len(src), bool)
    tmask = np.ones(len(tgt), bool)

    cfg = GicpConfig(
        num_neighbors=8, max_iterations=8, max_corr_dist_m=gate
    )
    args = (
        jnp.asarray(src), jnp.asarray(smask), jnp.asarray(tgt),
        jnp.asarray(tmask), jnp.asarray(np.eye(4, dtype=np.float32)), cfg,
    )

    monkeypatch.setattr(G, "_USE_FUSED_LINEARIZE", True)
    fused = G.gicp_align(*args)
    monkeypatch.setattr(G, "_USE_FUSED_LINEARIZE", False)
    ref = G.gicp_align(*args)

    Tf = np.asarray(fused.transform)
    Tr = np.asarray(ref.transform)
    # Same optimum within f32 accumulation-order noise.
    np.testing.assert_allclose(Tf[:3, 3], Tr[:3, 3], atol=2e-3)
    np.testing.assert_allclose(Tf[:3, :3], Tr[:3, :3], atol=2e-4)
    np.testing.assert_allclose(
        float(fused.fitness), float(ref.fitness), rtol=0.05, atol=1e-4
    )
    # And both recover the planted offset.
    np.testing.assert_allclose(Tf[:3, 3], T_true[:3, 3], atol=0.05)


def test_linearize_outputs_match_xla_formulation():
    """H, g, y0, and the per-point aux match a NumPy re-derivation."""
    from sgtd_tpu.ops.pallas_gicp import build_gicp_payload, linearize_gicp

    rng = np.random.default_rng(5)
    s_n, t_n = 128, 256
    src = rng.normal(0, 10, (s_n, 3)).astype(np.float32)
    tgt = rng.normal(0, 10, (t_n, 3)).astype(np.float32)
    smask = rng.uniform(size=s_n) > 0.1
    tmask = rng.uniform(size=t_n) > 0.1
    tgt_eff = np.where(tmask[:, None], tgt, 1e6).astype(np.float32)

    def rand_cov(n):
        a = rng.normal(0, 1, (n, 3, 3)).astype(np.float32)
        return a @ a.transpose(0, 2, 1) + 0.1 * np.eye(3, dtype=np.float32)

    scov = rand_cov(s_n)
    tcov = rand_cov(t_n)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.5, -0.2, 0.3]

    scov6 = np.stack(
        [scov[:, 0, 0], scov[:, 0, 1], scov[:, 0, 2],
         scov[:, 1, 1], scov[:, 1, 2], scov[:, 2, 2]], axis=1
    )
    payload = build_gicp_payload(
        jnp.asarray(tgt), jnp.asarray(tmask), jnp.asarray(tcov)
    )
    H, g, y0, aux = linearize_gicp(
        jnp.asarray(T), jnp.asarray(src), jnp.asarray(scov6),
        jnp.asarray(smask), jnp.asarray(tgt_eff), payload, float("inf"),
    )

    # NumPy reference (the XLA formulation from refine/gicp.py).
    R = T[:3, :3]
    moved = src @ R.T + T[:3, 3]
    d = ((moved[:, None, :] - tgt_eff[None]) ** 2).sum(-1)
    nn = d.argmin(1)
    b = tgt[nn]
    M = np.linalg.inv(tcov[nn] + R @ scov @ R.T)
    w = (smask & tmask[nn]).astype(np.float32)
    r = b - moved
    J = np.zeros((s_n, 3, 6), np.float32)
    J[:, :, :3] = -np.eye(3)
    mxs, mys, mzs = moved[:, 0], moved[:, 1], moved[:, 2]
    J[:, 0, 4] = mzs; J[:, 0, 5] = -mys
    J[:, 1, 3] = -mzs; J[:, 1, 5] = mxs
    J[:, 2, 3] = mys; J[:, 2, 4] = -mxs
    # NOTE the production J uses S = skew(moved) with J = [-I | S]:
    from sgtd_tpu.geom import se3
    S = np.asarray(jax.vmap(se3.hat)(jnp.asarray(moved)))
    J[:, :, 3:] = S
    MJ = M @ J
    H_ref = np.einsum("nij,nik->jk", J * w[:, None, None], MJ)
    Mr = np.einsum("nij,nj->ni", M, r)
    g_ref = np.einsum("nij,ni->j", J * w[:, None, None], Mr)
    y0_ref = np.sum(w * np.einsum("ni,ni->n", r, Mr))

    np.testing.assert_allclose(np.asarray(H), H_ref, rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(float(y0), y0_ref, rtol=1e-4)
    aux = np.asarray(aux)
    np.testing.assert_allclose(aux[:, :3], b, atol=1e-5)
    np.testing.assert_allclose(aux[:, 9], w, atol=0)
