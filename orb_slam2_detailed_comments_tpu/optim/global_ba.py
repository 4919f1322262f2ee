"""Global bundle adjustment via matrix-free preconditioned CG on the
Schur-reduced camera system.

TPU-native replacement for Optimizer::BundleAdjustment /
GlobalBundleAdjustemnt [sic] (reference: src/Optimizer.cc:62-361). The
reference builds an explicit sparse system and runs CHOLMOD; at map scale
(thousands of cameras, 10^5 points) the TPU-first formulation is *implicit*:
the Schur complement S = Hcc - A Hpp^-1 A^t is never materialized — its
matvec is three edge-parallel gather/scatter passes, so PCG with a
block-Jacobi (6x6 Hcc) preconditioner runs entirely out of edge arrays.
This same matvec is what parallel/distributed_ba.py shards across the
device mesh (edges partitioned, psum for the reductions).

Shares the BAProblem edge-list format with local_ba.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry.se3 import exp_se3, se3_renormalize
from .local_ba import BAProblem, _edge_terms, _inv3x3, edge_chi2
from .robust import CHI2_MONO, CHI2_STEREO, DELTA_MONO, DELTA_STEREO, huber_weight


def _robust_cost(cam_Tcw, points, prob: BAProblem, active, cam_params,
                 inv_sigma2_levels, use_kernel):
    """Total robust objective: sum of Huber rho(chi2) over active edges.

    Matches g2o's activeRobustChi2() which LM uses for step acceptance
    (reference: g2o optimization_algorithm_levenberg.cpp computes the
    error before/after applying the increment and rolls back on increase).
    """
    chi2, behind = edge_chi2(cam_Tcw, points, prob, cam_params,
                             inv_sigma2_levels)
    is_stereo = prob.edge_obs[:, 2] >= 0.0
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    rho = jnp.where(chi2 <= delta2, chi2,
                    2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2)
    c = jnp.where(use_kernel, rho, chi2)
    return jnp.sum(jnp.where(active & ~behind, c, 0.0))


def _assemble(cam_Tcw, points, prob: BAProblem, active, cam_params,
              inv_sigma2_levels, use_kernel, damping):
    """Per-iteration linearization: returns (Hcc_d, Hpp_inv, Y, g_c, g_p)."""
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

    Hcc = jnp.zeros((C, 6, 6)).at[prob.edge_cam].add(
        jnp.einsum("eri,erj,e->eij", Jc, Jc, w))
    Hpp = jnp.zeros((P, 3, 3)).at[prob.edge_point].add(
        jnp.einsum("eri,erj,e->eij", Jp, Jp, w))
    g_c = jnp.zeros((C, 6)).at[prob.edge_cam].add(
        jnp.einsum("eri,er,e->ei", Jc, rw, w))
    g_p = jnp.zeros((P, 3)).at[prob.edge_point].add(
        jnp.einsum("eri,er,e->ei", Jp, rw, w))
    Y = jnp.einsum("eri,erj,e->eij", Jc, Jp, w)  # (E, 6, 3)

    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)
    Hpp_d = Hpp + damping * (jnp.einsum("pii->p", Hpp)[:, None, None] / 3.0 + 1e-6) * eye3
    Hcc_d = Hcc + damping * (jnp.einsum("cii->c", Hcc)[:, None, None] / 6.0 + 1e-6) * eye6
    return Hcc_d, _inv3x3(Hpp_d), Y, g_c, g_p


def _schur_matvec(x, Hcc_d, Hpp_inv, Y, edge_cam, edge_point, free_mask, n_points):
    """S x = Hcc x - A Hpp^-1 A^T x, all edge-parallel."""
    x = x * free_mask[:, None]
    u = jnp.einsum("cij,cj->ci", Hcc_d, x)
    xe = x[edge_cam]                                       # (E, 6)
    v = jnp.zeros((n_points, 3)).at[edge_point].add(
        jnp.einsum("eij,ei->ej", Y, xe))                   # A^T x
    wv = jnp.einsum("pij,pj->pi", Hpp_inv, v)              # Hpp^-1 A^T x
    u = u.at[edge_cam].add(-jnp.einsum("eij,ej->ei", Y, wv[edge_point]))
    return u * free_mask[:, None]


def _pcg(matvec, b, Minv, n_iters: int):
    """Fixed-iteration preconditioned CG (jit-friendly)."""
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = jnp.einsum("cij,cj->ci", Minv, r0)
    p0 = z0

    def body(_, state):
        x, r, z, p, rz = state
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = jnp.einsum("cij,cj->ci", Minv, r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        p = z + beta * p
        return x, r, z, p, rz_new

    state = (x0, r0, z0, p0, jnp.sum(r0 * z0))
    state = jax.lax.fori_loop(0, n_iters, body, state)
    return state[0]


def _gba_iteration(cam_Tcw, points, prob: BAProblem, active, cam_params,
                   inv_sigma2_levels, use_kernel, damping, cg_iters):
    Hcc_d, Hpp_inv, Y, g_c, g_p = _assemble(
        cam_Tcw, points, prob, active, cam_params, inv_sigma2_levels,
        use_kernel, damping)
    free = (prob.cam_free & prob.cam_valid).astype(jnp.float32)
    P = points.shape[0]

    # rhs: -(g_c - A Hpp^-1 g_p)
    hg = jnp.einsum("pij,pj->pi", Hpp_inv, g_p)
    rhs = -(g_c - jnp.zeros_like(g_c).at[prob.edge_cam].add(
        jnp.einsum("eij,ej->ei", Y, hg[prob.edge_point])))
    rhs = rhs * free[:, None]

    Minv = jnp.linalg.inv(Hcc_d + (1.0 - free)[:, None, None] * jnp.eye(6))
    mv = lambda x: _schur_matvec(x, Hcc_d, Hpp_inv, Y, prob.edge_cam,
                                 prob.edge_point, free, P)
    dc = _pcg(mv, rhs, Minv, cg_iters)

    # back-substitute points: dp = -Hpp^-1 (g_p + A^T dc)
    atdc = jnp.zeros((P, 3)).at[prob.edge_point].add(
        jnp.einsum("eij,ei->ej", Y, dc[prob.edge_cam]))
    dp = -jnp.einsum("pij,pj->pi", Hpp_inv, g_p + atdc)

    dc = dc * free[:, None]
    cam_new = jax.vmap(lambda d, Tc: exp_se3(d) @ Tc)(dc, cam_Tcw)
    dp = jnp.where(prob.point_valid[:, None], dp, 0.0)
    return cam_new, points + dp


@functools.partial(jax.jit, static_argnames=("cam", "n_iters", "cg_iters"))
def global_bundle_adjustment(prob: BAProblem, cam, inv_sigma2_levels,
                             n_iters: int = 10, cg_iters: int = 50,
                             damping: float = 1e-5):
    """LM iterations with PCG-Schur inner solves (reference runs 10 or 20 LM
    iterations for global BA, Optimizer.cc:80 / Tracking.cc:1089). Robust
    kernel active on the first half of the iterations only. Each step is
    accepted only if it does not increase the robust objective; rejected
    steps raise the damping (g2o's Levenberg rollback), so ill-conditioned
    maps cannot diverge the way fixed-damping GN could."""
    cam_params = (cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    is_stereo = prob.edge_obs[:, 2] >= 0.0
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)

    n_pre = max(n_iters // 2, 1)

    def lm_body(active, use_kernel):
        def body(_, state):
            cam_Tcw, points, lam, c_cur = state
            cand_c, cand_p = _gba_iteration(
                cam_Tcw, points, prob, active, cam_params,
                inv_sigma2_levels, use_kernel, lam, cg_iters)
            c_new = _robust_cost(cand_c, cand_p, prob, active, cam_params,
                                 inv_sigma2_levels, use_kernel)
            accept = c_new <= c_cur
            cam_Tcw = jnp.where(accept, cand_c, cam_Tcw)
            points = jnp.where(accept, cand_p, points)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7),
                            jnp.minimum(lam * 8.0, 1e2))
            return cam_Tcw, points, lam, jnp.where(accept, c_new, c_cur)
        return body

    lam0 = jnp.float32(damping)
    c0 = _robust_cost(prob.cam_Tcw, prob.points, prob, prob.edge_valid,
                      cam_params, inv_sigma2_levels, True)
    cam_Tcw, points, _, _ = jax.lax.fori_loop(
        0, n_pre, lm_body(prob.edge_valid, True),
        (prob.cam_Tcw, prob.points, lam0, c0))

    # chi2-gate outliers before dropping the robust kernel (matches the
    # local-BA schedule; the reference erases outlier edges between its
    # two optimize() calls, Optimizer.cc:916-935)
    chi2_mid, behind_mid = edge_chi2(cam_Tcw, points, prob, cam_params, inv_sigma2_levels)
    active = prob.edge_valid & (chi2_mid <= chi2_th) & ~behind_mid

    c1 = _robust_cost(cam_Tcw, points, prob, active, cam_params,
                      inv_sigma2_levels, False)
    cam_Tcw, points, _, _ = jax.lax.fori_loop(
        0, n_iters - n_pre, lm_body(active, False),
        (cam_Tcw, points, lam0, c1))
    cam_Tcw = se3_renormalize(cam_Tcw)
    chi2, behind = edge_chi2(cam_Tcw, points, prob, cam_params, inv_sigma2_levels)
    inlier = prob.edge_valid & (chi2 <= chi2_th) & ~behind
    return cam_Tcw, points, inlier
