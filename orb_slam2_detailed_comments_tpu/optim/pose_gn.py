"""Motion-only pose optimization (batched Gauss-Newton with IRLS Huber).

TPU-native replacement for Optimizer::PoseOptimization
(reference: src/Optimizer.cc:363-607): one SE3 vertex, unary reprojection
edges to fixed map points, Huber kernel, 4 rounds x 10 iterations with
chi2-based inlier reclassification between rounds, kernel dropped for the
last two rounds. Here every edge is a lane of a batched residual/Jacobian
computation and the 6x6 normal system is a single reduction — the whole
optimization is one jitted lax.fori_loop program.

Residuals are stacked (u, v, u_right): monocular observations mask the
third row (the reference uses separate 2D/3D edge types,
types_six_dof_expmap.h:59-208).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry.se3 import exp_se3, se3_renormalize
from .robust import CHI2_MONO, CHI2_STEREO, DELTA_MONO, DELTA_STEREO, huber_weight

N_ROUNDS = 4        # reference: Optimizer.cc:536 "its[4]"
ITERS_PER_ROUND = 10


def _residual_jacobian(Tcw, pts_w, obs, cam_params):
    """Per-edge residual r (E, 3) and Jacobian J = dr/dxi (E, 3, 6) for the
    left-multiplicative update Tcw <- exp(xi) Tcw (g2o's convention).

    obs: (E, 3) of (u, v, ur); cam_params = (fx, fy, cx, cy, bf).
    """
    fx, fy, cx, cy, bf = cam_params
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = pts_w @ R.T + t  # (E, 3)
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zs = jnp.maximum(z, 1e-6)
    iz = 1.0 / zs
    iz2 = iz * iz

    u = fx * x * iz + cx
    v = fy * y * iz + cy
    ur = u - bf * iz
    pred = jnp.stack([u, v, ur], axis=-1)
    r = obs - pred  # (E, 3)

    # d(pred)/d(pc)
    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
    dv = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
    dur = jnp.stack([fx * iz, zero, -fx * x * iz2 + bf * iz2], axis=-1)
    dpred_dpc = jnp.stack([du, dv, dur], axis=-2)  # (E, 3, 3)

    # d(pc)/d(xi) for left update: [ I | -hat(pc) ]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    px = jnp.zeros(pc.shape[:-1] + (3, 3), pc.dtype)
    px = px.at[..., 0, 1].set(-pc[..., 2]).at[..., 0, 2].set(pc[..., 1])
    px = px.at[..., 1, 0].set(pc[..., 2]).at[..., 1, 2].set(-pc[..., 0])
    px = px.at[..., 2, 0].set(-pc[..., 1]).at[..., 2, 1].set(pc[..., 0])
    dpc_dxi = jnp.concatenate([eye, -px], axis=-1)  # (E, 3, 6)

    J = -(dpred_dpc @ dpc_dxi)  # (E, 3, 6); r = obs - pred
    behind = z <= 0.0
    return r, J, behind


def _edge_chi2(r, inv_sigma2, is_stereo):
    """Per-edge chi2 with the mono third-row mask."""
    w3 = jnp.where(is_stereo, 1.0, 0.0)
    rw = r * jnp.stack([jnp.ones_like(w3), jnp.ones_like(w3), w3], axis=-1)
    return jnp.sum(rw * rw, axis=-1) * inv_sigma2


@functools.partial(jax.jit, static_argnames=("cam",))
def pose_optimization(Tcw0, pts_w, obs_uvr, octave, edge_valid, cam, inv_sigma2_levels,
                      damping: float = 1e-5):
    """Optimize a single camera pose against fixed map points.

    Args:
      Tcw0: (4, 4) initial world->camera pose.
      pts_w: (E, 3) map point positions.
      obs_uvr: (E, 3) observations (u, v, ur); ur < 0 marks monocular.
      octave: (E,) int32 keypoint octave (selects the information weight,
        reference: Optimizer.cc invSigma2 per edge).
      edge_valid: (E,) bool.
      cam: PinholeCamera (static).
      inv_sigma2_levels: (n_levels,) per-octave inverse sigma^2.

    Returns:
      (Tcw, inlier_mask, n_inliers) — mirrors the reference's return of the
      optimized pose plus per-feature outlier flags (Optimizer.cc:576-603).
    """
    cam_params = (cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    is_stereo = obs_uvr[:, 2] >= 0.0
    inv_s2 = inv_sigma2_levels[octave]
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    delta = jnp.where(is_stereo, DELTA_STEREO, DELTA_MONO)
    row_mask = jnp.stack([jnp.ones_like(inv_s2), jnp.ones_like(inv_s2),
                          is_stereo.astype(jnp.float32)], axis=-1)  # (E, 3)

    def gn_iter(carry, use_kernel):
        Tcw, active = carry
        r, J, behind = _residual_jacobian(Tcw, pts_w, obs_uvr, cam_params)
        ok = active & ~behind
        chi2 = _edge_chi2(r, inv_s2, is_stereo)
        w = jnp.where(use_kernel, huber_weight(chi2, delta), 1.0)
        w = jnp.where(ok, w * inv_s2, 0.0)  # (E,)
        rw = r * row_mask
        Jw = J * row_mask[:, :, None]
        H = jnp.einsum("eri,erj,e->ij", Jw, Jw, w)
        b = jnp.einsum("eri,er,e->i", Jw, rw, w)
        H = H + damping * jnp.eye(6, dtype=H.dtype) * (1.0 + jnp.trace(H) / 6.0)
        dx = jnp.linalg.solve(H, -b)  # note: r = obs - pred, J = d r/d xi
        Tcw_new = exp_se3(dx) @ Tcw
        return (Tcw_new, active), dx

    def round_body(i, state):
        Tcw, active = state
        use_kernel = i < 2  # reference drops the robust kernel after round 2

        # up to 10 GN iterations with step-size early exit: once |dx| drops
        # below f32 significance further iterations are no-ops, and with a
        # motion-model warm start GN converges in 3-4 — the fixed 4x10
        # schedule (reference: Optimizer.cc:536-541) spends >2/3 of its
        # sequential device iterations changing nothing. Same fixpoint.
        def cond(c):
            (_, _), it, dxn = c
            return (it < ITERS_PER_ROUND) & (dxn > 1e-6)

        def body(c):
            carry, it, _ = c
            carry, dx = gn_iter(carry, use_kernel)
            return carry, it + 1, jnp.max(jnp.abs(dx))

        (Tcw, _), _, _ = jax.lax.while_loop(
            cond, body, ((Tcw, active), jnp.int32(0), jnp.float32(jnp.inf)))
        # reclassify: recompute chi2 at the new pose over ALL valid edges
        r, _, behind = _residual_jacobian(Tcw, pts_w, obs_uvr, cam_params)
        chi2 = _edge_chi2(r, inv_s2, is_stereo)
        active = edge_valid & (chi2 <= chi2_th) & ~behind
        return (Tcw, active)

    state = (se3_renormalize(Tcw0), edge_valid)
    state = jax.lax.fori_loop(0, N_ROUNDS, round_body, state)
    Tcw, inliers = state
    return se3_renormalize(Tcw), inliers, jnp.sum(inliers.astype(jnp.int32))
