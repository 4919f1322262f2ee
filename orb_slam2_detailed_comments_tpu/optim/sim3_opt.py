"""Sim3 refinement between two keyframes (loop-closure transform polish).

TPU-native replacement for Optimizer::OptimizeSim3
(reference: src/Optimizer.cc:1383-1617): one Sim3 vertex with paired
forward (points of KF2 projected into KF1) and inverse (points of KF1 into
KF2) reprojection edges, Huber kernel, mid-schedule chi2 pruning (th2 = 10),
acceptance at >= 20 inliers. Batched IRLS GN with autodiff Jacobians on the
7-dim tangent.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.sim3 import exp_sim3, sim3_inverse

CHI2_SIM3_OPT = 10.0  # reference: th2=10 (LoopClosing.cc:552)
DELTA = CHI2_SIM3_OPT ** 0.5


def _project(K, p):
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
    return jnp.stack([K[0, 0] * p[..., 0] / z + K[0, 2],
                      K[1, 1] * p[..., 1] / z + K[1, 2]], axis=-1)


class Sim3OptResult(NamedTuple):
    S12: jnp.ndarray      # (4, 4) optimized Sim3 (cam2 -> cam1 convention)
    inliers: jnp.ndarray  # (M,) bool
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("fix_scale", "n_iters"))
def optimize_sim3(S12_0, p1, p2, uv1, uv2, valid, inv_sigma2_1, inv_sigma2_2,
                  K, fix_scale: bool = False, n_iters: int = 10,
                  damping: float = 1e-6):
    """Optimize S12 mapping cam2-frame points into cam1.

    p1/p2: (M, 3) matched points in each camera frame; uv1/uv2: (M, 2)
    observed pixels; inv_sigma2_*: per-match information weights.
    """

    def residuals(xi, S_base):
        S12 = exp_sim3(xi) @ S_base
        S21 = sim3_inverse(S12)
        q1 = jnp.einsum("ij,mj->mi", S12[:3, :3], p2) + S12[:3, 3]
        r1 = _project(K, q1) - uv1          # forward edge error in image 1
        q2 = jnp.einsum("ij,mj->mi", S21[:3, :3], p1) + S21[:3, 3]
        r2 = _project(K, q2) - uv2          # inverse edge error in image 2
        return jnp.concatenate([r1, r2], axis=-1)  # (M, 4)

    def chi2_of(r):
        c1 = jnp.sum(r[:, :2] ** 2, axis=-1) * inv_sigma2_1
        c2 = jnp.sum(r[:, 2:] ** 2, axis=-1) * inv_sigma2_2
        return c1, c2

    def gn_round(S12, active, n):
        def body(_, S):
            xi0 = jnp.zeros(7)
            r = residuals(xi0, S)
            J = jax.jacfwd(residuals)(xi0, S)  # (M, 4, 7)
            if fix_scale:
                J = J.at[..., 6].set(0.0)
            c1, c2 = chi2_of(r)
            w1 = jnp.minimum(1.0, DELTA / jnp.sqrt(jnp.maximum(c1, 1e-12))) * inv_sigma2_1
            w2 = jnp.minimum(1.0, DELTA / jnp.sqrt(jnp.maximum(c2, 1e-12))) * inv_sigma2_2
            w = jnp.stack([w1, w1, w2, w2], axis=-1) * active[:, None]
            H = jnp.einsum("mri,mr,mrj->ij", J, w, J)
            b = jnp.einsum("mri,mr,mr->i", J, w, r)
            H = H + damping * jnp.eye(7) * (1.0 + jnp.trace(H) / 7.0)
            if fix_scale:
                H = H.at[6, 6].add(1.0)
            dx = -jnp.linalg.solve(H, b)
            return exp_sim3(dx) @ S

        return jax.lax.fori_loop(0, n, body, S12)

    # phase 1: 5 iterations, then prune chi2 > 10 (reference :1539-1573)
    S12 = gn_round(S12_0, valid.astype(jnp.float32), 5)
    r = residuals(jnp.zeros(7), S12)
    c1, c2 = chi2_of(r)
    active = valid & (c1 <= CHI2_SIM3_OPT) & (c2 <= CHI2_SIM3_OPT)
    # phase 2
    S12 = gn_round(S12, active.astype(jnp.float32), n_iters)
    r = residuals(jnp.zeros(7), S12)
    c1, c2 = chi2_of(r)
    inl = valid & (c1 <= CHI2_SIM3_OPT) & (c2 <= CHI2_SIM3_OPT)
    return Sim3OptResult(S12=S12, inliers=inl, n_inliers=jnp.sum(inl))
