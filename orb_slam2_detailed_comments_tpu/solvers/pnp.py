"""Batched RANSAC PnP for relocalization.

Replaces the reference's embedded EPnP + RANSAC (reference:
src/PnPsolver.cc, Lepetit's EPnP per Dependencies.md:12-14). TPU-first
formulation: all RANSAC hypotheses are solved simultaneously — each from a
6-point DLT estimate of the 3x4 projection matrix (batched SVD) followed by
orthonormalization of the rotation block — then scored against all
correspondences in one masked reduction. The reference's RANSAC parameters
(P=0.99, 300 iterations, per-octave chi2 gating, minimum inliers) are kept
(reference: Tracking.cc:2308-2318 sets them for relocalization).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

N_HYPOTHESES = 300
MIN_SET = 6


class PnPResult(NamedTuple):
    Tcw: np.ndarray       # (4, 4)
    inliers: np.ndarray   # (M,) bool
    n_inliers: int


def _fit_projection_dlt(pts3d, uv):
    """Batched DLT: (B, 6, 3) + (B, 6, 2) -> (B, 3, 4) projection matrices."""
    B, S, _ = pts3d.shape
    X = jnp.concatenate([pts3d, jnp.ones((B, S, 1))], axis=-1)  # (B, 6, 4)
    zeros = jnp.zeros_like(X)
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    r1 = jnp.concatenate([X, zeros, -u * X], axis=-1)  # (B, 6, 12)
    r2 = jnp.concatenate([zeros, X, -v * X], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)  # (B, 12, 12)
    _, _, vt = jnp.linalg.svd(A)
    return vt[..., 11, :].reshape(B, 3, 4)


def _decompose_projection(P, K_inv):
    """(B, 3, 4) -> (R (B,3,3), t (B,3)) with R orthonormalized via SVD and
    cheirality-normalized sign."""
    M = K_inv @ P  # (B, 3, 4) normalized projection [R|t] up to scale
    R_raw = M[..., :3]
    t_raw = M[..., 3]
    # scale: det(R) should be +1; normalize by cbrt(det)
    det = jnp.linalg.det(R_raw)
    sign = jnp.sign(jnp.where(jnp.abs(det) < 1e-12, 1.0, det))
    scale = jnp.cbrt(jnp.abs(det)) * sign
    scale = jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    R_n = R_raw / scale[..., None, None]
    t = t_raw / scale[..., None]
    u, _, vt = jnp.linalg.svd(R_n)
    R = u @ vt
    # keep det +1
    d = jnp.linalg.det(R)
    u_fix = u.at[..., :, 2].multiply(jnp.where(d < 0, -1.0, 1.0)[..., None])
    R = u_fix @ vt
    return R, t


@jax.jit
def _ransac_pnp(pts3d, uv, valid, octave, sample_idx, K, K_inv, inv_sigma2_levels):
    """Evaluate all hypotheses; returns (best R, best t, inlier mask, count)."""
    p_s = pts3d[sample_idx]   # (B, 6, 3)
    uv_s = uv[sample_idx]     # (B, 6, 2)
    P = _fit_projection_dlt(p_s, uv_s)
    R, t = _decompose_projection(P, K_inv)

    # score: per-octave chi2 < 5.991 (reference: PnPsolver sets
    # mvMaxError = 5.991 * sigma2(octave), Tracking.cc:2317)
    pc = jnp.einsum("bij,mj->bmi", R, pts3d) + t[:, None, :]
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u_p = K[0, 0] * pc[..., 0] / zs + K[0, 2]
    v_p = K[1, 1] * pc[..., 1] / zs + K[1, 2]
    err = (u_p - uv[None, :, 0]) ** 2 + (v_p - uv[None, :, 1]) ** 2
    chi2 = err * inv_sigma2_levels[octave][None, :]
    inl = (chi2 < 5.991) & (z > 0) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    return R[best], t[best], inl[best], counts[best]


def solve_pnp_ransac(pts3d: np.ndarray, uv: np.ndarray, valid: np.ndarray,
                     octave: np.ndarray, K: np.ndarray,
                     inv_sigma2_levels: np.ndarray,
                     min_inliers: int = 10, seed: int = 0) -> Optional[PnPResult]:
    """RANSAC PnP over the valid 2D-3D correspondences.

    Returns None if no hypothesis reaches min_inliers (reference:
    PnPsolver::iterate returns no-pose, Tracking.cc:2352-2366).
    """
    vidx = np.nonzero(valid)[0]
    if vidx.size < MIN_SET:
        return None
    rng = np.random.default_rng(seed)
    samples = np.stack([rng.choice(vidx, MIN_SET, replace=False)
                        for _ in range(N_HYPOTHESES)])
    K = np.asarray(K, np.float32)
    R, t, inl, n = _ransac_pnp(
        jnp.asarray(pts3d, jnp.float32), jnp.asarray(uv, jnp.float32),
        jnp.asarray(valid), jnp.asarray(octave, jnp.int32),
        jnp.asarray(samples, jnp.int32), jnp.asarray(K),
        jnp.asarray(np.linalg.inv(K), jnp.float32),
        jnp.asarray(inv_sigma2_levels, jnp.float32))
    n = int(n)
    if n < min_inliers:
        return None
    Tcw = np.eye(4, dtype=np.float32)
    Tcw[:3, :3] = np.asarray(R)
    Tcw[:3, 3] = np.asarray(t)
    return PnPResult(Tcw=Tcw, inliers=np.asarray(inl), n_inliers=n)
