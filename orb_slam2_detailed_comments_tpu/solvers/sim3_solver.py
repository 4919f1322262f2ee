"""Batched Sim3 RANSAC via Horn's closed-form absolute orientation.

TPU-native replacement for Sim3Solver (reference: src/Sim3Solver.cc):
every RANSAC hypothesis (3-point minimal set) is solved simultaneously —
Horn's quaternion method is an eigen-decomposition of a 4x4 matrix, which
jnp.linalg.eigh batches trivially — and all hypotheses are scored against
all correspondences with one bidirectional reprojection pass.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.so3 import quat_to_rotmat

N_HYPOTHESES = 300  # reference: RANSAC 300 iterations (LoopClosing.cc:487)
CHI2_SIM3 = 9.210   # reference: Sim3Solver.cc mvnMaxError chi2 th


class Sim3Result(NamedTuple):
    R: np.ndarray
    t: np.ndarray
    s: float
    inliers: np.ndarray
    n_inliers: int


def _horn_batched(p1, p2, fix_scale):
    """p1, p2: (B, S, 3) matched camera-frame points; returns (R (B,3,3),
    t (B,3), s (B,)) with p2 ~ s R p1 + t (Horn 1987, as in
    Sim3Solver::ComputeSim3, reference :329-445)."""
    c1 = p1.mean(axis=1, keepdims=True)
    c2 = p2.mean(axis=1, keepdims=True)
    q1 = p1 - c1
    q2 = p2 - c2
    M = jnp.einsum("bsi,bsj->bij", q1, q2)  # Horn's M; R(q_max) maps 1 -> 2
    # Horn's N matrix
    Sxx, Sxy, Sxz = M[:, 0, 0], M[:, 0, 1], M[:, 0, 2]
    Syx, Syy, Syz = M[:, 1, 0], M[:, 1, 1], M[:, 1, 2]
    Szx, Szy, Szz = M[:, 2, 0], M[:, 2, 1], M[:, 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], axis=-2)  # (B, 4, 4)
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[..., :, 3]  # largest eigenvalue -> rotation quaternion (w,x,y,z)
    R = quat_to_rotmat(q)

    # symmetric scale (reference uses the asymmetric D/Syy form for mono)
    rot_q1 = jnp.einsum("bij,bsj->bsi", R, q1)
    num = jnp.sum(q2 * rot_q1, axis=(1, 2))
    den = jnp.sum(q1 * q1, axis=(1, 2))
    s = jnp.where(fix_scale, 1.0, num / jnp.maximum(den, 1e-12))
    t = c2[:, 0] - s[:, None] * jnp.einsum("bij,bj->bi", R, c1[:, 0])
    return R, t, s


@jax.jit
def _ransac_sim3(p1, p2, uv1, uv2, valid, max_err1, max_err2, sample_idx,
                 K, fix_scale):
    """Score all hypotheses; p1/p2 (M, 3) cam-frame points; uv1/uv2 (M, 2)
    observed pixels in each KF; max_err* per-correspondence chi2 limits."""
    s1 = p1[sample_idx]  # (B, 3, 3)
    s2 = p2[sample_idx]
    R, t, s = _horn_batched(s1, s2, fix_scale)

    def project(P):
        z = jnp.where(jnp.abs(P[..., 2]) < 1e-9, 1e-9, P[..., 2])
        return jnp.stack([K[0, 0] * P[..., 0] / z + K[0, 2],
                          K[1, 1] * P[..., 1] / z + K[1, 2]], axis=-1)

    # forward: p1 -> frame 2
    p12 = s[:, None, None] * jnp.einsum("bij,mj->bmi", R, p1) + t[:, None, :]
    e2 = jnp.sum((project(p12) - uv2[None]) ** 2, axis=-1)
    # inverse: p2 -> frame 1
    Rt = jnp.swapaxes(R, -1, -2)
    p21 = jnp.einsum("bij,bmj->bmi", Rt, (p2[None] - t[:, None, :])) / s[:, None, None]
    e1 = jnp.sum((project(p21) - uv1[None]) ** 2, axis=-1)

    inl = (e1 < max_err1[None]) & (e2 < max_err2[None]) & valid[None]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    return R[best], t[best], s[best], inl[best], counts[best]


def solve_sim3_ransac(p1: np.ndarray, p2: np.ndarray, uv1: np.ndarray,
                      uv2: np.ndarray, valid: np.ndarray,
                      octave1: np.ndarray, octave2: np.ndarray,
                      sigma2_levels: np.ndarray, K: np.ndarray,
                      fix_scale: bool, min_inliers: int = 20,
                      seed: int = 0) -> Optional[Sim3Result]:
    """RANSAC Sim3 between two matched camera-frame point sets
    (reference: Sim3Solver::iterate, called with minInliers=20,
    LoopClosing.cc:487-509)."""
    vidx = np.nonzero(valid)[0]
    if vidx.size < 3:
        return None
    rng = np.random.default_rng(seed)
    samples = np.stack([rng.choice(vidx, 3, replace=False)
                        for _ in range(N_HYPOTHESES)])
    max_err1 = CHI2_SIM3 * sigma2_levels[octave1]
    max_err2 = CHI2_SIM3 * sigma2_levels[octave2]
    R, t, s, inl, n = _ransac_sim3(
        jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32),
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.asarray(valid), jnp.asarray(max_err1, jnp.float32),
        jnp.asarray(max_err2, jnp.float32), jnp.asarray(samples, jnp.int32),
        jnp.asarray(K, jnp.float32), jnp.asarray(fix_scale))
    n = int(n)
    if n < min_inliers:
        return None
    return Sim3Result(R=np.asarray(R), t=np.asarray(t), s=float(s),
                      inliers=np.asarray(inl), n_inliers=n)
