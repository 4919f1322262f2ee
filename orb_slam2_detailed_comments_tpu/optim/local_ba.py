"""Bundle adjustment with Schur-complement camera reduction, batched for TPU.

TPU-native replacement for Optimizer::LocalBundleAdjustment and
Optimizer::BundleAdjustment (reference: src/Optimizer.cc:631-1030 and
:62-361), which build a g2o sparse graph with marginalized point vertices.
Here the problem is a fixed-capacity *edge list*:

  cameras  (C, 4, 4)  world->cam poses, free or fixed per camera
  points   (P, 3)     map point positions (all free; invalid masked)
  edges    (E,)       (cam, point, obs(u,v,ur), octave, valid)

Each GN/LM iteration is a fully batched program:
  1. residuals + Jacobians per edge (VPU),
  2. Huber IRLS weights,
  3. block accumulations via scatter-add: Hpp (P,3,3), Hcc (C,6,6),
     b_p, b_c, and the cam-point coupling A = (P, C, 6, 3),
  4. the Schur complement S = Hcc - A Hpp^-1 A^T collapses to ONE large
     matmul (C*6, P*3) @ (P*3, C*6) — this is where the MXU earns its keep
     (the reference's sparse CHOLMOD solve becomes a dense systolic pass),
  5. dense Cholesky solve of the reduced (6C x 6C) system, then point
     back-substitution.

The iteration schedule mirrors the reference: 5 iterations, chi2-gate
outlier edges (5.991 mono / 7.815 stereo), 10 more iterations
(Optimizer.cc:893-935). BA "interruption" (mbAbortBA) becomes a bounded
iteration budget chosen by the caller.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import exp_se3, se3_renormalize
from .robust import CHI2_MONO, CHI2_STEREO, DELTA_MONO, DELTA_STEREO, huber_weight


class BAProblem(NamedTuple):
    """Static-capacity BA problem. Pad all arrays to fixed sizes."""
    cam_Tcw: jnp.ndarray      # (C, 4, 4)
    cam_free: jnp.ndarray     # (C,) bool — False = fixed vertex
    cam_valid: jnp.ndarray    # (C,) bool
    points: jnp.ndarray       # (P, 3)
    point_valid: jnp.ndarray  # (P,) bool
    edge_cam: jnp.ndarray     # (E,) int32
    edge_point: jnp.ndarray   # (E,) int32
    edge_obs: jnp.ndarray     # (E, 3) (u, v, ur); ur<0 => monocular
    edge_octave: jnp.ndarray  # (E,) int32
    edge_valid: jnp.ndarray   # (E,) bool


def _edge_terms(cam_Tcw, points, prob: BAProblem, cam_params):
    """Residuals r (E,3), J_cam (E,3,6), J_pt (E,3,3), behind-camera mask."""
    fx, fy, cx, cy, bf = cam_params
    T = cam_Tcw[prob.edge_cam]         # (E, 4, 4)
    X = points[prob.edge_point]        # (E, 3)
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    pc = jnp.einsum("eij,ej->ei", R, X) + t
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zs = jnp.maximum(z, 1e-6)
    iz = 1.0 / zs
    iz2 = iz * iz

    u = fx * x * iz + cx
    v = fy * y * iz + cy
    ur = u - bf * iz
    pred = jnp.stack([u, v, ur], axis=-1)
    r = prob.edge_obs - pred

    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
    dv = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
    dur = jnp.stack([fx * iz, zero, -fx * x * iz2 + bf * iz2], axis=-1)
    dpred_dpc = jnp.stack([du, dv, dur], axis=-2)  # (E, 3, 3)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    px = jnp.zeros(pc.shape[:-1] + (3, 3), pc.dtype)
    px = px.at[..., 0, 1].set(-pc[..., 2]).at[..., 0, 2].set(pc[..., 1])
    px = px.at[..., 1, 0].set(pc[..., 2]).at[..., 1, 2].set(-pc[..., 0])
    px = px.at[..., 2, 0].set(-pc[..., 1]).at[..., 2, 1].set(pc[..., 0])
    dpc_dxi = jnp.concatenate([eye, -px], axis=-1)      # (E, 3, 6)

    J_cam = -(dpred_dpc @ dpc_dxi)                      # (E, 3, 6)
    J_pt = -(dpred_dpc @ R)                             # (E, 3, 3)  d pc/dX = R
    return r, J_cam, J_pt, z <= 0.0


def _inv3x3(M):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-1),
        jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def _ba_iteration(cam_Tcw, points, prob: BAProblem, active, cam_params,
                  inv_sigma2_levels, use_kernel, damping):
    C = cam_Tcw.shape[0]
    P = points.shape[0]
    r, J_cam, J_pt, behind = _edge_terms(cam_Tcw, points, prob, cam_params)

    is_stereo = prob.edge_obs[:, 2] >= 0.0
    row_mask = jnp.stack([jnp.ones_like(is_stereo, jnp.float32),
                          jnp.ones_like(is_stereo, jnp.float32),
                          is_stereo.astype(jnp.float32)], axis=-1)
    inv_s2 = inv_sigma2_levels[prob.edge_octave]
    rw = r * row_mask
    chi2 = jnp.sum(rw * rw, axis=-1) * inv_s2
    delta = jnp.where(is_stereo, DELTA_STEREO, DELTA_MONO)
    w = jnp.where(use_kernel, huber_weight(chi2, delta), 1.0)
    ok = active & ~behind
    w = jnp.where(ok, w * inv_s2, 0.0)

    Jc = J_cam * row_mask[:, :, None]
    Jp = J_pt * row_mask[:, :, None]

    # block accumulations
    Hcc = jnp.zeros((C, 6, 6)).at[prob.edge_cam].add(
        jnp.einsum("eri,erj,e->eij", Jc, Jc, w))
    Hpp = jnp.zeros((P, 3, 3)).at[prob.edge_point].add(
        jnp.einsum("eri,erj,e->eij", Jp, Jp, w))
    b_c = jnp.zeros((C, 6)).at[prob.edge_cam].add(
        jnp.einsum("eri,er,e->ei", Jc, rw, w))
    b_p = jnp.zeros((P, 3)).at[prob.edge_point].add(
        jnp.einsum("eri,er,e->ei", Jp, rw, w))
    Y = jnp.einsum("eri,erj,e->eij", Jc, Jp, w)  # (E, 6, 3) cam-point coupling
    A = jnp.zeros((P, C, 6, 3)).at[prob.edge_point, prob.edge_cam].add(Y)

    # damping (LM): scale diagonals
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)
    Hpp_d = Hpp + damping * (jnp.einsum("pii->p", Hpp)[:, None, None] / 3.0 + 1e-6) * eye3
    Hcc_d = Hcc + damping * (jnp.einsum("cii->c", Hcc)[:, None, None] / 6.0 + 1e-6) * eye6

    Hpp_inv = _inv3x3(Hpp_d)                                # (P, 3, 3)
    T = jnp.einsum("pcix,pxy->pciy", A, Hpp_inv)            # (P, C, 6, 3)

    # Schur fill: one big MXU matmul (C6, P*3) @ (P*3, C6)
    T2 = T.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    A2 = A.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    S_fill = T2 @ A2.T                                      # (C6, C6)

    S = jax.scipy.linalg.block_diag(*[jnp.zeros(())])  # placeholder avoided below
    Hcc_big = jnp.zeros((C * 6, C * 6))
    idx = jnp.arange(C) * 6
    # scatter Hcc blocks onto the diagonal
    Hcc_big = Hcc_big.reshape(C, 6, C, 6).at[jnp.arange(C), :, jnp.arange(C), :].set(Hcc_d).reshape(C * 6, C * 6)
    S = Hcc_big - S_fill
    b_sc = (b_c - jnp.einsum("pcix,px->ci", T, b_p)).reshape(C * 6)

    # fix cameras: identity rows/cols + zero rhs for fixed or invalid cams
    free = (prob.cam_free & prob.cam_valid)
    free6 = jnp.repeat(free, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
    b_sc = jnp.where(free6, b_sc, 0.0)

    # solve (GN step is delta = -H^-1 b since b = J^T W r, r = obs - pred)
    L, low = jax.scipy.linalg.cho_factor(S + 1e-8 * jnp.eye(C * 6), lower=True)
    dc = -jax.scipy.linalg.cho_solve((L, low), b_sc).reshape(C, 6)

    rhs_p = b_p + jnp.einsum("pcix,ci->px", A, dc)          # b_p - A^T(-dc)
    dp = -jnp.einsum("pxy,py->px", Hpp_inv, rhs_p)

    # apply updates
    dc = jnp.where(free[:, None], dc, 0.0)
    cam_new = jax.vmap(lambda d, Tc: exp_se3(d) @ Tc)(dc, cam_Tcw)
    dp = jnp.where(prob.point_valid[:, None], dp, 0.0)
    pts_new = points + dp
    return cam_new, pts_new, chi2


def robust_cost(cam_Tcw, points, prob: BAProblem, active, cam_params,
                inv_sigma2_levels, use_kernel):
    """Total (optionally Huber-robustified) cost over active edges."""
    chi2, behind = edge_chi2(cam_Tcw, points, prob, cam_params, inv_sigma2_levels)
    is_stereo = prob.edge_obs[:, 2] >= 0.0
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    c = jnp.where(use_kernel,
                  jnp.where(chi2 <= delta2, chi2,
                            2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2),
                  chi2)
    w = active & ~behind
    return jnp.sum(jnp.where(w, c, 0.0))


def edge_chi2(cam_Tcw, points, prob: BAProblem, cam_params, inv_sigma2_levels):
    r, _, _, behind = _edge_terms(cam_Tcw, points, prob, cam_params)
    is_stereo = prob.edge_obs[:, 2] >= 0.0
    row_mask = jnp.stack([jnp.ones_like(is_stereo, jnp.float32),
                          jnp.ones_like(is_stereo, jnp.float32),
                          is_stereo.astype(jnp.float32)], axis=-1)
    rw = r * row_mask
    chi2 = jnp.sum(rw * rw, axis=-1) * inv_sigma2_levels[prob.edge_octave]
    return chi2, behind


@functools.partial(jax.jit, static_argnames=("cam", "n_iters_pre", "n_iters_post"))
def local_bundle_adjustment(prob: BAProblem, cam, inv_sigma2_levels,
                            n_iters_pre: int = 5, n_iters_post: int = 10,
                            damping: float = 1e-5):
    """Run the reference's local-BA schedule on a BAProblem.

    Returns (cam_Tcw, points, edge_inlier): optimized poses/points and the
    final chi2-based edge classification (the caller erases outlier
    observations from the map, reference: Optimizer.cc:940-1007).
    """
    cam_params = (cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    is_stereo = prob.edge_obs[:, 2] >= 0.0
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)

    def lm_body(use_kernel):
        def body(_, state):
            cam_Tcw, points, active, lam = state
            cand_c, cand_p, _ = _ba_iteration(
                cam_Tcw, points, prob, active, cam_params, inv_sigma2_levels,
                use_kernel=use_kernel, damping=lam)
            # LM step acceptance (g2o rejects cost-increasing steps too):
            # accept -> shrink damping; reject -> keep state, grow damping
            c_old = robust_cost(cam_Tcw, points, prob, active, cam_params,
                                inv_sigma2_levels, use_kernel)
            c_new = robust_cost(cand_c, cand_p, prob, active, cam_params,
                                inv_sigma2_levels, use_kernel)
            accept = c_new <= c_old
            cam_Tcw = jnp.where(accept, cand_c, cam_Tcw)
            points = jnp.where(accept, cand_p, points)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7),
                            jnp.minimum(lam * 8.0, 1e2))
            return cam_Tcw, points, active, lam
        return body

    lam0 = jnp.float32(damping)
    state = (prob.cam_Tcw, prob.points, prob.edge_valid, lam0)
    state = jax.lax.fori_loop(0, n_iters_pre, lm_body(True), state)

    # chi2 gate (reference: Optimizer.cc:916-929)
    cam_Tcw, points, active, lam = state
    chi2, behind = edge_chi2(cam_Tcw, points, prob, cam_params, inv_sigma2_levels)
    active = prob.edge_valid & (chi2 <= chi2_th) & ~behind

    state = jax.lax.fori_loop(0, n_iters_post, lm_body(False),
                              (cam_Tcw, points, active, lam0))
    cam_Tcw, points, active, _ = state

    cam_Tcw = se3_renormalize(cam_Tcw)
    chi2, behind = edge_chi2(cam_Tcw, points, prob, cam_params, inv_sigma2_levels)
    inlier = prob.edge_valid & (chi2 <= chi2_th) & ~behind
    return cam_Tcw, points, inlier
