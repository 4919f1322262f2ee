"""Scatter-free grouped global bundle adjustment (PCG on the Schur system).

Drop-in faster formulation of optim/global_ba.py (the TPU-native
replacement for Optimizer::GlobalBundleAdjustemnt [sic], reference:
src/Optimizer.cc:62-361). The flat edge-list PCG there spends nearly all
its time in `.at[idx].add` scatter-adds with duplicate indices — two per
CG matvec, ~600 per solve — which serialize on TPU (the same lesson the
local BA learned: its k-major rewrite was 11x).

Layout here, built ONCE per solve on the host:

  * point-major grid (Kp, P): slot (k, p) holds point p's k-th observation.
    Every per-point reduction (Hpp, g_p, A^T x) is a sum over the Kp
    sublane blocks — no scatter. P rides the 128-lane axis.
  * camera-major permutation (Kc, C): slot (k, c) holds a flat *storage
    index* into the point-major edge storage. Every per-camera reduction
    (Hcc, g_c, A Hpp^-1 A^T x) is one `take` + a sum over Kc — no scatter.
  * exact spill: points with more than Kp observations (or cameras with
    more than Kc) overflow into small flat lists reduced with scatter-add;
    the lists are tiny by construction (caps are chosen from the actual
    degree distribution), so the result is numerically the SAME problem as
    the flat path — no observations are dropped (unlike local BA's K cap).

All per-edge quantities live as lists of 2D (Kp, P) columns (local_ba's
column style) so XLA never materializes arrays with two small trailing
dims (tiled to (8,128) with 14-40x padding waste).

Two interchangeable camera-side backends (point-side is always free
sublane sums in this layout):

  * backend="gather" — the original formulation: camera-major
    permutation `take` for reductions, (C,)-table gathers for expands.
    MEASURED SLOW on TPU: 1742 ms/GN iter at 1408 cams / 360k edges vs
    the flat solver's 527 ms (examples/bench_gba.py) — random-access
    gathers don't ride any wide unit.
  * backend="gemm" — every camera expand/reduce is a matmul against a
    bfloat16 one-hot matrix (C, S) built once per solve: selection by
    one-hot is EXACT (entries are 1.0/0.0), and f32 values are split
    into k bfloat16 limbs (hi + residual(s)) multiplied separately and
    accumulated in f32 (k=3 recovers full f32 for pose expansion; k=2
    gives ~1e-5 relative for Hessian assembly; the CG matvec k is a
    precision/speed knob). Micro-benchmarked on v5e (C=1408, E=480k,
    examples/bench_gba_ops.py): one-hot GEMM ~3.0 ms (= dispatch
    floor) vs `take` 5.5 ms (+297 s compile!), scatter 6.3 ms, table
    gather 21.7 ms — the MXU eats the one-hot for free.

End-to-end on v5e (1408 cams / 60k pts / 360k edges, 30 CG iters,
examples/bench_gba.py), ms per GN iteration: gather 1742, flat
edge-list PCG (optim/global_ba.py) 536, gemm k_mv=2 206, gemm k_mv=1
146 — the gemm backend is the production path for large problems
(wired in backend/local_mapping.py at E>=4096); agreement tests pass
at the same tolerances for every backend.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import exp_se3, se3_renormalize
from .local_ba import (BAProblem, _edge_cols, _inv3x3_cols, _chi2_cols,
                       _huber_cost_cols)
from .robust import CHI2_MONO, CHI2_STEREO, DELTA_MONO, DELTA_STEREO, huber_weight


class GroupedGBA(NamedTuple):
    """Host-preprocessed grouped problem (all static shapes)."""
    # original states
    cam_Tcw: jnp.ndarray      # (C, 4, 4)
    cam_free: jnp.ndarray     # (C,) bool
    points: jnp.ndarray       # (P, 3)
    point_valid: jnp.ndarray  # (P,) bool
    # point-major grid, shapes (Kp, P)
    g_cam: jnp.ndarray        # int32 camera id per slot
    g_obs: jnp.ndarray        # (3, Kp, P) u, v, ur
    g_inv_s2: jnp.ndarray     # (Kp, P) per-edge information weight
    g_valid: jnp.ndarray      # (Kp, P) bool
    g_edge: jnp.ndarray       # (Kp, P) int32 original edge index (for inliers)
    # point spill (edges beyond Kp for a point), shape (Sp,)
    sp_cam: jnp.ndarray
    sp_point: jnp.ndarray
    sp_obs: jnp.ndarray       # (3, Sp)
    sp_inv_s2: jnp.ndarray
    sp_valid: jnp.ndarray
    sp_edge: jnp.ndarray
    # camera-major permutation into storage = [grid flat (Kp*P); spill (Sp)]
    c_sel: jnp.ndarray        # (Kc, C) int32 storage index
    c_valid: jnp.ndarray      # (Kc, C) bool
    # camera spill: storage indices + camera ids, shape (Sc,)
    cs_sel: jnp.ndarray
    cs_cam: jnp.ndarray
    cs_valid: jnp.ndarray


def group_global_problem(prob: BAProblem, inv_sigma2_levels,
                         kp_cap: int = 32, kc_cap: int = 1024,
                         force_kp: int = 0, force_kc: int = 0,
                         min_sp: int = 0, min_sc: int = 0) -> GroupedGBA:
    """Build the grouped layout on the host (numpy). Caps adapt to the
    degree distribution: Kp = min(max point degree, kp_cap), Kc likewise;
    overflow edges go to the exact spill lists. force_kp/force_kc/min_sp/
    min_sc pin the static shapes (used to give every shard of a sharded
    problem a common layout)."""
    e_pt = np.asarray(prob.edge_point)
    e_cam = np.asarray(prob.edge_cam)
    e_obs = np.asarray(prob.edge_obs)
    e_oct = np.asarray(prob.edge_octave)
    e_val = np.asarray(prob.edge_valid)
    inv_s2_lv = np.asarray(inv_sigma2_levels)
    P = int(np.asarray(prob.points).shape[0])
    C = int(np.asarray(prob.cam_Tcw).shape[0])
    E = e_pt.shape[0]
    eids = np.arange(E, dtype=np.int64)

    ve = eids[e_val]
    # ---- point-major grouping ----
    order = ve[np.argsort(e_pt[ve], kind="stable")]
    pts_sorted = e_pt[order]
    start = np.searchsorted(pts_sorted, np.arange(P), side="left")
    deg = np.searchsorted(pts_sorted, np.arange(P), side="right") - start
    Kp = int(min(max(int(deg.max()) if len(order) else 1, 1), kp_cap))
    if force_kp:
        Kp = int(force_kp)
    k = np.arange(Kp)
    gidx = start[:, None] + k[None, :]                     # (P, Kp)
    gval = k[None, :] < np.minimum(deg, Kp)[:, None]
    if len(order) == 0:                    # no valid edges: all-masked grid
        order = np.zeros(1, np.int64)
    gsel = order[np.minimum(gidx, max(len(order) - 1, 0))]
    gsel = np.where(gval, gsel, 0)
    # spill: slots Kp.. for points with deg > Kp
    sp_mask = np.zeros(E, bool)
    sp_mask[order] = True
    sp_mask[gsel[gval]] = False
    sp = eids[sp_mask & e_val]
    Sp = max(int(max(8, -(-len(sp) // 8) * 8)) if len(sp) else 8, int(min_sp))
    sp_pad = np.zeros(Sp, np.int64)
    sp_pad[:len(sp)] = sp
    sp_valid = np.zeros(Sp, bool)
    sp_valid[:len(sp)] = True

    g_sel_kp = gsel.T                                      # (Kp, P)
    g_val_kp = gval.T

    def grid(a, fill=0):
        out = a[g_sel_kp]
        return np.where(g_val_kp if out.ndim == 2 else g_val_kp[..., None],
                        out, fill)

    g_cam = grid(e_cam).astype(np.int32)
    g_obs = np.stack([np.where(g_val_kp, e_obs[:, j][g_sel_kp], 0.0)
                      for j in range(3)], axis=0).astype(np.float32)
    # invalid slots must read as monocular (ur<0), not stereo
    g_obs[2] = np.where(g_val_kp, g_obs[2], -1.0)
    g_inv = np.where(g_val_kp, inv_s2_lv[e_oct[g_sel_kp]], 0.0).astype(np.float32)

    sp_cam = e_cam[sp_pad].astype(np.int32) * sp_valid
    sp_point = e_pt[sp_pad].astype(np.int32) * sp_valid
    sp_obs = np.stack([e_obs[:, j][sp_pad] for j in range(3)], 0).astype(np.float32)
    sp_obs[2] = np.where(sp_valid, sp_obs[2], -1.0)
    sp_inv = np.where(sp_valid, inv_s2_lv[e_oct[sp_pad]], 0.0).astype(np.float32)

    # ---- camera-major permutation over storage order ----
    # storage index: grid slot (k, p) -> k * P + p ; spill s -> Kp*P + s
    store_of_edge = np.full(E, -1, np.int64)
    kk, pp = np.nonzero(g_val_kp)
    store_of_edge[g_sel_kp[kk, pp]] = kk * P + pp
    store_of_edge[sp_pad[sp_valid]] = Kp * P + np.nonzero(sp_valid)[0]
    stored = eids[(store_of_edge >= 0)]

    corder = stored[np.argsort(e_cam[stored], kind="stable")]
    cams_sorted = e_cam[corder]
    cstart = np.searchsorted(cams_sorted, np.arange(C), side="left")
    cdeg = np.searchsorted(cams_sorted, np.arange(C), side="right") - cstart
    Kc = int(min(max(int(cdeg.max()) if len(corder) else 1, 1), kc_cap))
    if force_kc:
        Kc = int(force_kc)
    ck = np.arange(Kc)
    cgidx = cstart[:, None] + ck[None, :]
    cgval = ck[None, :] < np.minimum(cdeg, Kc)[:, None]
    if len(corder) == 0:
        corder = np.zeros(1, np.int64)
    cgsel = corder[np.minimum(cgidx, max(len(corder) - 1, 0))]
    c_sel = np.where(cgval, store_of_edge[cgsel], 0).astype(np.int32).T  # (Kc, C)
    c_val = cgval.T
    # camera spill
    cs_mask = np.zeros(E, bool)
    cs_mask[corder] = True
    cs_mask[cgsel[cgval]] = False
    cs = eids[cs_mask & (store_of_edge >= 0)]
    Sc = max(int(max(8, -(-len(cs) // 8) * 8)) if len(cs) else 8, int(min_sc))
    cs_pad = np.zeros(Sc, np.int64)
    cs_pad[:len(cs)] = cs
    cs_valid = np.zeros(Sc, bool)
    cs_valid[:len(cs)] = True
    cs_sel = (store_of_edge[cs_pad] * cs_valid).astype(np.int32)
    cs_cam = (e_cam[cs_pad] * cs_valid).astype(np.int32)

    return GroupedGBA(
        cam_Tcw=prob.cam_Tcw,
        cam_free=prob.cam_free & prob.cam_valid,
        points=prob.points,
        point_valid=prob.point_valid,
        g_cam=jnp.asarray(g_cam), g_obs=jnp.asarray(g_obs),
        g_inv_s2=jnp.asarray(g_inv), g_valid=jnp.asarray(g_val_kp),
        g_edge=jnp.asarray(np.where(g_val_kp, g_sel_kp, -1).astype(np.int32)),
        sp_cam=jnp.asarray(sp_cam), sp_point=jnp.asarray(sp_point),
        sp_obs=jnp.asarray(sp_obs), sp_inv_s2=jnp.asarray(sp_inv),
        sp_valid=jnp.asarray(sp_valid),
        sp_edge=jnp.asarray(np.where(sp_valid, sp_pad, -1).astype(np.int32)),
        c_sel=jnp.asarray(c_sel), c_valid=jnp.asarray(c_val),
        cs_sel=jnp.asarray(cs_sel), cs_cam=jnp.asarray(cs_cam),
        cs_valid=jnp.asarray(cs_valid),
    )


def _build_onehot(gp: GroupedGBA, C: int):
    """(C, S) bfloat16 one-hot over the storage order [grid flat; spill].
    Exact: entries are 1.0/0.0, both representable in bfloat16. Built once
    per solve inside the jit; all camera expands/reductions become matmuls
    against it (the MXU path; see module docstring for measurements)."""
    ids = jnp.concatenate([gp.g_cam.reshape(-1), gp.sp_cam])
    return (jnp.arange(C, dtype=jnp.int32)[:, None] == ids[None, :]
            ).astype(jnp.bfloat16)


def _split_bf16(m, k: int):
    """f32 -> k bfloat16 limbs with m ~= sum(limbs). k=1: plain rounding
    (~8 mantissa bits); k=2: ~16 bits; k=3: full f32 (24 bits)."""
    parts = []
    res = m
    for i in range(k):
        p = res.astype(jnp.bfloat16)
        parts.append(p)
        if i + 1 < k:
            res = res - p.astype(jnp.float32)
    return parts


def _oh_reduce(oh, store, k: int):
    """Per-camera sum of per-edge values: (n, S) f32 -> (n, C) f32 via
    k split-limb GEMMs against the one-hot, f32 accumulation."""
    out = None
    for part in _split_bf16(store, k):
        o = jax.lax.dot_general(part, oh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out = o if out is None else out + o
    return out


def _oh_expand(oh, x, k: int):
    """Per-edge selection of per-camera values: (n, C) f32 -> (n, S)."""
    out = None
    for part in _split_bf16(x, k):
        o = jax.lax.dot_general(part, oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out = o if out is None else out + o
    return out


def _edge_state(gp: GroupedGBA, cam_Tcw, points, cam_params, oh=None):
    """Residual/Jacobian columns for the grid and the point-spill list.
    With oh, camera poses are expanded to edges by exact one-hot GEMM
    (k=3 limbs = full f32); without, by table gathers."""
    camflat = cam_Tcw.reshape(-1, 16)
    KpP = gp.g_cam.size
    if oh is not None:
        Tall = _oh_expand(oh, camflat.T, 3)                # (16, S)
        Tg = [Tall[i, :KpP].reshape(gp.g_cam.shape) for i in range(16)]
        Ts = [Tall[i, KpP:] for i in range(16)]
    else:
        Tg = [camflat[:, i][gp.g_cam] for i in range(16)]  # 16 x (Kp, P)
        Ts = [camflat[:, i][gp.sp_cam] for i in range(16)]
    Xg = [jnp.broadcast_to(points[:, j][None, :], gp.g_cam.shape)
          for j in range(3)]
    og = [gp.g_obs[j] for j in range(3)]
    rg, Jcg, Jpg, behind_g = _edge_cols(Tg, Xg, og, cam_params)

    Xs = [points[:, j][gp.sp_point] for j in range(3)]
    os_ = [gp.sp_obs[j] for j in range(3)]
    rs, Jcs, Jps, behind_s = _edge_cols(Ts, Xs, os_, cam_params)
    return (rg, Jcg, Jpg, behind_g), (rs, Jcs, Jps, behind_s)


def _weights(r, inv_s2, stereo_w, active, behind, use_kernel, delta):
    chi2 = _chi2_cols(r, stereo_w, inv_s2)
    w = jnp.where(use_kernel, huber_weight(chi2, delta), 1.0)
    return jnp.where(active & ~behind, w * inv_s2, 0.0), chi2


def _cam_reduce(gp: GroupedGBA, cols_g, cols_s, psum_fn=None, oh=None,
                k: int = 2):
    """Reduce per-edge columns per camera. With oh: k-limb one-hot GEMM
    (S is covered exactly once by the one-hot, no spill handling needed).
    Without: one take + Kc-sum + tiny scatter over the camera-major
    permutation.

    cols_g: list of (Kp, P) grid columns; cols_s: matching (Sp,) spill
    columns. Returns list of (C,) columns. psum_fn (if given) sums the
    partial per-camera totals across a point-sharded device mesh."""
    n = len(cols_g)
    store = jnp.concatenate(
        [jnp.stack([c.reshape(-1) for c in cols_g], 0),
         jnp.stack(cols_s, 0)], axis=1)                    # (n, Kp*P + Sp)
    if oh is not None:
        out = _oh_reduce(oh, store, k)
    else:
        Kc, C = gp.c_sel.shape
        picked = jnp.take(store, gp.c_sel.reshape(-1), axis=1)
        picked = picked.reshape(n, Kc, C) * gp.c_valid[None]
        out = jnp.sum(picked, axis=1)                      # (n, C)
        # camera spill (rare): scatter-add of a tiny list
        spill = jnp.take(store, gp.cs_sel, axis=1) * gp.cs_valid[None]
        out = out.T.at[gp.cs_cam].add(spill.T).T
    if psum_fn is not None:
        out = psum_fn(out)
    return [out[i] for i in range(n)]


def _pt_reduce(gp: GroupedGBA, cols_g, cols_s):
    """Per-point reduction: Kp-sublane sum + tiny spill scatter."""
    out = [jnp.sum(c, axis=0) for c in cols_g]              # (P,)
    stacked = jnp.stack(out, 0)                             # (n, P)
    sp = jnp.stack(cols_s, 0)                               # (n, Sp)
    stacked = stacked.T.at[gp.sp_point].add(sp.T).T
    return [stacked[i] for i in range(len(out))]


def _assemble_grouped(gp: GroupedGBA, cam_Tcw, points, act_g, act_s,
                      cam_params, use_kernel, damping, psum_fn=None,
                      oh=None):
    """Shared per-iteration linearization: residual/Jacobian columns,
    Huber IRLS weights, damped camera/point Hessian blocks, gradients,
    coupling columns. Used by both the CG and the dense direct solve."""
    (rg, Jcg, Jpg, bg), (rs, Jcs, Jps, bs) = _edge_state(
        gp, cam_Tcw, points, cam_params, oh=oh)
    stw_g = (gp.g_obs[2] >= 0.0).astype(jnp.float32)
    stw_s = (gp.sp_obs[2] >= 0.0).astype(jnp.float32)
    del_g = jnp.where(stw_g > 0, DELTA_STEREO, DELTA_MONO)
    del_s = jnp.where(stw_s > 0, DELTA_STEREO, DELTA_MONO)
    wg, _ = _weights(rg, gp.g_inv_s2, stw_g, act_g, bg, use_kernel, del_g)
    ws, _ = _weights(rs, gp.sp_inv_s2, stw_s, act_s, bs, use_kernel, del_s)
    wrow_g = [wg, wg, wg * stw_g]
    wrow_s = [ws, ws, ws * stw_s]

    Hpp = _pt_reduce(
        gp,
        [sum(wrow_g[rr] * Jpg[rr][y] * Jpg[rr][z] for rr in range(3))
         for y in range(3) for z in range(3)],
        [sum(wrow_s[rr] * Jps[rr][y] * Jps[rr][z] for rr in range(3))
         for y in range(3) for z in range(3)])
    g_p = _pt_reduce(
        gp,
        [sum(wrow_g[rr] * Jpg[rr][y] * rg[rr] for rr in range(3))
         for y in range(3)],
        [sum(wrow_s[rr] * Jps[rr][y] * rs[rr] for rr in range(3))
         for y in range(3)])

    # ---- camera blocks ----
    cc = _cam_reduce(
        gp,
        [sum(wrow_g[rr] * Jcg[rr][i] * Jcg[rr][j] for rr in range(3))
         for i in range(6) for j in range(i, 6)]
        + [sum(wrow_g[rr] * Jcg[rr][i] * rg[rr] for rr in range(3))
           for i in range(6)],
        [sum(wrow_s[rr] * Jcs[rr][i] * Jcs[rr][j] for rr in range(3))
         for i in range(6) for j in range(i, 6)]
        + [sum(wrow_s[rr] * Jcs[rr][i] * rs[rr] for rr in range(3))
           for i in range(6)],
        psum_fn=psum_fn, oh=oh, k=2)
    ut = [[None] * 6 for _ in range(6)]
    n = 0
    for i in range(6):
        for j in range(i, 6):
            ut[i][j] = cc[n]
            ut[j][i] = cc[n]
            n += 1
    g_c = [cc[21 + i] for i in range(6)]                    # 6 x (C,)

    # ---- damping ----
    trc = ut[0][0] + ut[1][1] + ut[2][2] + ut[3][3] + ut[4][4] + ut[5][5]
    dc_scale = damping * (trc / 6.0 + 1e-6)
    Hcc_d = [[ut[i][j] + jnp.where(i == j, dc_scale, 0.0) for j in range(6)]
             for i in range(6)]
    trp = Hpp[0] + Hpp[4] + Hpp[8]
    dp_scale = damping * (trp / 3.0 + 1e-6)
    Hpp_d = [Hpp[z] + (dp_scale if z in (0, 4, 8) else 0.0) for z in range(9)]
    Hinv = _inv3x3_cols(Hpp_d)                              # 9 x (P,)

    # ---- coupling Y columns, both layouts ----
    Yg = [[sum(wrow_g[rr] * Jcg[rr][i] * Jpg[rr][y] for rr in range(3))
           for y in range(3)] for i in range(6)]            # 6x3 of (Kp,P)
    Ys = [[sum(wrow_s[rr] * Jcs[rr][i] * Jps[rr][y] for rr in range(3))
           for y in range(3)] for i in range(6)]
    return Hcc_d, g_c, Hinv, g_p, Yg, Ys


def _gba_grouped_iteration(gp: GroupedGBA, cam_Tcw, points, act_g, act_s,
                           cam_params, use_kernel, damping, cg_iters,
                           psum_fn=None, oh=None, k_mv: int = 1):
    """One GN step (PCG inner solve on the implicit Schur system). With
    psum_fn (inside shard_map over a point-sharded mesh) every per-camera
    reduction is summed across devices, making the camera-side quantities
    replicated; point-side quantities stay local to the shard that owns
    the points. With oh, camera expands/reductions ride the MXU as one-hot
    GEMMs (k_mv = CG-matvec limb count: 1 is fastest, 2 matches f32 to
    ~1e-5; assembly always uses 2, pose expansion 3)."""
    KpP = gp.g_cam.size

    def expand6(xm, k=None):
        """6 x (C,) -> ((6 x (Kp,P) grid), (6 x (Sp,) spill))."""
        if oh is not None:
            xall = _oh_expand(oh, jnp.stack(xm, 0), k or k_mv)  # (6, S)
            return ([xall[i, :KpP].reshape(gp.g_cam.shape) for i in range(6)],
                    [xall[i, KpP:] for i in range(6)])
        return ([xm[i][gp.g_cam] for i in range(6)],
                [xm[i][gp.sp_cam] for i in range(6)])

    def pt_reduce(cols_g, cols_s):
        return _pt_reduce(gp, cols_g, cols_s)

    Hcc_d, g_c, Hinv, g_p, Yg, Ys = _assemble_grouped(
        gp, cam_Tcw, points, act_g, act_s, cam_params, use_kernel, damping,
        psum_fn=psum_fn, oh=oh)
    freef = gp.cam_free.astype(jnp.float32)

    def matvec(xcols):
        """S x = Hcc_d x - A Hpp^-1 A^T x; x as 6 columns (C,)."""
        xm = [xcols[i] * freef for i in range(6)]
        u = [sum(Hcc_d[i][j] * xm[j] for j in range(6)) for i in range(6)]
        xe, xs = expand6(xm)
        # v = A^T x per point
        v = pt_reduce(
            [sum(Yg[i][y] * xe[i] for i in range(6)) for y in range(3)],
            [sum(Ys[i][y] * xs[i] for i in range(6)) for y in range(3)])
        wv = [Hinv[y * 3] * v[0] + Hinv[y * 3 + 1] * v[1]
              + Hinv[y * 3 + 2] * v[2] for y in range(3)]
        # du = A (Hpp^-1 v) per camera
        du = _cam_reduce(
            gp,
            [sum(Yg[i][y] * wv[y][None, :] for y in range(3))
             for i in range(6)],
            [sum(Ys[i][y] * wv[y][gp.sp_point] for y in range(3))
             for i in range(6)],
            psum_fn=psum_fn, oh=oh, k=k_mv)
        return [(u[i] - du[i]) * freef for i in range(6)]

    # rhs = -(g_c - A Hpp^-1 g_p)
    hg = [Hinv[y * 3] * g_p[0] + Hinv[y * 3 + 1] * g_p[1]
          + Hinv[y * 3 + 2] * g_p[2] for y in range(3)]
    corr = _cam_reduce(
        gp,
        [sum(Yg[i][y] * hg[y][None, :] for y in range(3)) for i in range(6)],
        [sum(Ys[i][y] * hg[y][gp.sp_point] for y in range(3))
         for i in range(6)],
        psum_fn=psum_fn, oh=oh, k=2)
    rhs = [-(g_c[i] - corr[i]) * freef for i in range(6)]

    # block-Jacobi preconditioner (6x6 per camera; identity where fixed)
    Hcc_blk = jnp.stack([jnp.stack(Hcc_d[i], -1) for i in range(6)], -2)
    Minv = jnp.linalg.inv(Hcc_blk + (1.0 - freef)[:, None, None] * jnp.eye(6))
    Mi = [[Minv[:, i, j] for j in range(6)] for i in range(6)]

    def precond(rc):
        return [sum(Mi[i][j] * rc[j] for j in range(6)) for i in range(6)]

    def dot(a, b):
        return sum(jnp.sum(a[i] * b[i]) for i in range(6))

    x0 = [jnp.zeros_like(rhs[0]) for _ in range(6)]
    z0 = precond(rhs)

    def cg_body(_, st):
        x, r, z, p, rz = st
        Ap = matvec(p)
        pAp = dot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
        x = [x[i] + alpha * p[i] for i in range(6)]
        r = [r[i] - alpha * Ap[i] for i in range(6)]
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        p = [z[i] + beta * p[i] for i in range(6)]
        return x, r, z, p, rz_new

    st = (x0, list(rhs), z0, list(z0), dot(rhs, z0))
    st = jax.lax.fori_loop(0, cg_iters, cg_body, st)
    dc = [st[0][i] * freef for i in range(6)]

    # back-substitute points: dp = -Hpp^-1 (g_p + A^T dc)
    dce, dcs = expand6(dc, k=3)    # point update wants full-precision dc
    atdc = pt_reduce(
        [sum(Yg[i][y] * dce[i] for i in range(6)) for y in range(3)],
        [sum(Ys[i][y] * dcs[i] for i in range(6)) for y in range(3)])
    rhs_p = [g_p[y] + atdc[y] for y in range(3)]
    dp = [-(Hinv[y * 3] * rhs_p[0] + Hinv[y * 3 + 1] * rhs_p[1]
            + Hinv[y * 3 + 2] * rhs_p[2]) for y in range(3)]

    dc_rows = jnp.stack(dc, axis=-1)                        # (C, 6)
    cam_new = jax.vmap(lambda d, Tc: exp_se3(d) @ Tc)(dc_rows, cam_Tcw)
    dp_rows = jnp.stack(dp, axis=-1)
    points_new = points + jnp.where(gp.point_valid[:, None], dp_rows, 0.0)
    return cam_new, points_new


def _gba_dense_iteration(gp: GroupedGBA, cam_Tcw, points, act_g, act_s,
                         cam_params, use_kernel, damping, oh,
                         psum_fn=None):
    """One GN step with the Schur complement MATERIALIZED:
    S = Hcc_d - A Hpp^-1 A^T as a dense (6C, 6C) matrix, solved directly
    (LU) instead of by CG. The dense coupling A (P, C, 6, 3) is built by a
    P-batched one-hot GEMM from the point-major grid, so the two O(C^2 P)
    GEMMs building S are pure MXU work. Exact inner solve -> better GN
    steps than 30-iteration CG; preferred at moderate camera counts where
    (6C)^2 * 3P FLOPs stay cheap (the caller picks dense vs CG).

    Distributed: A is built per point-shard, S and the gradient correction
    are partial sums psum'd ONCE per GN iteration (psum_fn), and every
    device runs the same replicated dense solve — the classic distributed
    Schur reduction (SURVEY.md section 2.3) with one collective per
    Newton step instead of one per CG matvec."""
    C = cam_Tcw.shape[0]
    P = points.shape[0]
    Kp, _ = gp.g_cam.shape
    KpP = gp.g_cam.size

    Hcc_d, g_c, Hinv, g_p, Yg, Ys = _assemble_grouped(
        gp, cam_Tcw, points, act_g, act_s, cam_params, use_kernel, damping,
        psum_fn=psum_fn, oh=oh)
    freef = gp.cam_free.astype(jnp.float32)

    # ---- dense coupling A[p, c, i, y] = sum_k oh[c, (k,p)] Y[k, p, i, y]
    ohg = oh[:, :KpP].reshape(C, Kp, P).transpose(2, 0, 1)   # (P, C, Kp)
    Yb = jnp.stack([jnp.stack([Yg[i][y] for y in range(3)], -1)
                    for i in range(6)], -2)                  # (Kp, P, 6, 3)
    Yb = Yb.transpose(1, 0, 2, 3).reshape(P, Kp, 18)
    A = None
    for part in _split_bf16(Yb, 2):
        o = jax.lax.dot_general(ohg, part, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        A = o if A is None else A + o                        # (P, C, 18)
    Ysb = jnp.stack([jnp.stack([Ys[i][y] for y in range(3)], -1)
                     for i in range(6)], -2).reshape(-1, 18)  # (Sp, 18)
    A = A.at[gp.sp_point, gp.sp_cam].add(Ysb)                # exact spill
    A4 = A.reshape(P, C, 6, 3)

    Hm = jnp.stack(Hinv, 1).reshape(P, 3, 3)
    G = jnp.einsum("pciy,pyz->pciz", A4, Hm)                 # A Hpp^-1
    S_pt = jax.lax.dot_general(G, A4, (((0, 3), (0, 3)), ((), ())))
    gp3 = jnp.stack(g_p, 1)                                  # (P, 3)
    hg = jnp.einsum("pyz,pz->py", Hm, gp3)
    corr = jax.lax.dot_general(A4, hg, (((0, 3), (0, 1)), ((), ())))
    if psum_fn is not None:
        S_pt = psum_fn(S_pt)
        corr = psum_fn(corr)

    Hblk = jnp.stack([jnp.stack(Hcc_d[i], -1) for i in range(6)], -2)
    S4 = (-S_pt).at[jnp.arange(C), :, jnp.arange(C), :].add(Hblk)
    m = jnp.repeat(freef, 6)
    S = S4.reshape(6 * C, 6 * C) * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
    g_cm = jnp.stack(g_c, 1)                                 # (C, 6)
    rhs = (-(g_cm - corr) * freef[:, None]).reshape(-1)

    dc = jnp.linalg.solve(S, rhs).reshape(C, 6) * freef[:, None]

    # back-substitute points: dp = -Hpp^-1 (g_p + A^T dc)
    atdc = jax.lax.dot_general(A4, dc, (((1, 2), (0, 1)), ((), ())))
    dp = -jnp.einsum("pyz,pz->py", Hm, gp3 + atdc)

    cam_new = jax.vmap(lambda d, Tc: exp_se3(d) @ Tc)(dc, cam_Tcw)
    points_new = points + jnp.where(gp.point_valid[:, None], dp, 0.0)
    return cam_new, points_new


def _grouped_chi2(gp: GroupedGBA, cam_Tcw, points, cam_params, oh=None):
    (rg, _, _, bg), (rs, _, _, bs) = _edge_state(gp, cam_Tcw, points,
                                                 cam_params, oh=oh)
    stw_g = (gp.g_obs[2] >= 0.0).astype(jnp.float32)
    stw_s = (gp.sp_obs[2] >= 0.0).astype(jnp.float32)
    chi_g = _chi2_cols(rg, stw_g, gp.g_inv_s2)
    chi_s = _chi2_cols(rs, stw_s, gp.sp_inv_s2)
    return (chi_g, bg), (chi_s, bs)


def _grouped_robust_cost(gp: GroupedGBA, cam_Tcw, points, cam_params,
                         act_g, act_s, use_kernel, oh=None):
    """Total (Huber-rho or plain) objective over active edges — the grouped
    equivalent of g2o's activeRobustChi2(), used for LM step acceptance.
    The unused Jacobian columns inside _edge_state are dead-code-eliminated
    by XLA, so this costs one residual pass."""
    (chi_g, bg), (chi_s, bs) = _grouped_chi2(gp, cam_Tcw, points, cam_params,
                                             oh=oh)

    def rho(chi2, is_stereo):
        delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        r = jnp.where(chi2 <= delta2, chi2,
                      2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2)
        return jnp.where(use_kernel, r, chi2)

    cg = jnp.where(act_g & ~bg, rho(chi_g, gp.g_obs[2] >= 0.0), 0.0)
    cs = jnp.where(act_s & ~bs, rho(chi_s, gp.sp_obs[2] >= 0.0), 0.0)
    return jnp.sum(cg) + jnp.sum(cs)


@functools.partial(jax.jit, static_argnames=("cam", "n_iters", "cg_iters",
                                              "backend", "k_mv",
                                              "use_kernel"))
def _solve_grouped_phase(gp: GroupedGBA, cam, n_iters: int, cg_iters: int,
                         backend: str, k_mv: int, use_kernel: bool,
                         act_g, act_s, lam, c_cur, oh=None):
    """One LM phase (robust or plain) of `n_iters` iterations starting
    from carried (lam, cost). Exposing the phase with explicit carried
    state lets the async chunked path (backend/gba_runner via
    solve_global_ba) run the EXACT sync schedule across chunk boundaries
    instead of restarting the lambda/phase/activation per chunk."""
    cam_params = (cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    C = gp.cam_Tcw.shape[0]
    if oh is None:
        oh = _build_onehot(gp, C) if backend in ("gemm", "dense") else None

    def step(cam_Tcw, points, lam):
        if backend == "dense":
            return _gba_dense_iteration(gp, cam_Tcw, points, act_g, act_s,
                                        cam_params, use_kernel, lam, oh)
        return _gba_grouped_iteration(gp, cam_Tcw, points, act_g, act_s,
                                      cam_params, use_kernel, lam,
                                      cg_iters, oh=oh, k_mv=k_mv)

    # LM acceptance (g2o's Levenberg rollback, same schedule as the flat
    # solver): a candidate step is kept only if it does not increase the
    # robust objective; rejected steps raise the damping.
    def body(_, state):
        cam_Tcw, points, lam, c_cur = state
        cand_c, cand_p = step(cam_Tcw, points, lam)
        c_new = _grouped_robust_cost(gp, cand_c, cand_p, cam_params,
                                     act_g, act_s, use_kernel, oh=oh)
        accept = c_new <= c_cur
        cam_Tcw = jnp.where(accept, cand_c, cam_Tcw)
        points = jnp.where(accept, cand_p, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7),
                        jnp.minimum(lam * 8.0, 1e2))
        return cam_Tcw, points, lam, jnp.where(accept, c_new, c_cur)

    return jax.lax.fori_loop(0, n_iters, body,
                             (gp.cam_Tcw, gp.points, lam, c_cur))


@functools.partial(jax.jit, static_argnames=("cam", "backend"))
def _grouped_activation(gp: GroupedGBA, cam, backend: str = "gemm", oh=None):
    """Per-edge chi2 inlier activation at the CURRENT gp poses/points
    (the gate between the robust and plain LM phases, and the final
    inlier report)."""
    cam_params = (cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    C = gp.cam_Tcw.shape[0]
    if oh is None:
        oh = _build_onehot(gp, C) if backend in ("gemm", "dense") else None
    th_g = jnp.where(gp.g_obs[2] >= 0, CHI2_STEREO, CHI2_MONO)
    th_s = jnp.where(gp.sp_obs[2] >= 0, CHI2_STEREO, CHI2_MONO)
    (chi_g, bg), (chi_s, bs) = _grouped_chi2(gp, gp.cam_Tcw, gp.points,
                                             cam_params, oh=oh)
    act_g = gp.g_valid & (chi_g <= th_g) & ~bg
    act_s = gp.sp_valid & (chi_s <= th_s) & ~bs
    return act_g, act_s


@functools.partial(jax.jit, static_argnames=("cam", "backend", "use_kernel"))
def _grouped_cost(gp: GroupedGBA, cam, use_kernel: bool, act_g, act_s,
                  backend: str = "gemm", oh=None):
    cam_params = (cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    C = gp.cam_Tcw.shape[0]
    if oh is None:
        oh = _build_onehot(gp, C) if backend in ("gemm", "dense") else None
    return _grouped_robust_cost(gp, gp.cam_Tcw, gp.points, cam_params,
                                act_g, act_s, use_kernel, oh=oh)


@functools.partial(jax.jit, static_argnames=("backend",))
def _onehot_for(gp: GroupedGBA, backend: str = "gemm"):
    """Materialize the (C, S) one-hot ONCE per solve so the separately
    jitted phase/activation/cost pieces (and the async chunk loop) reuse
    it instead of rebuilding it per call (it is hundreds of MB at GBA
    scale)."""
    C = gp.cam_Tcw.shape[0]
    return _build_onehot(gp, C) if backend in ("gemm", "dense") else None


def _solve_grouped(gp: GroupedGBA, cam, n_iters: int, cg_iters: int,
                   damping: float, backend: str = "gemm", k_mv: int = 1):
    """Full two-phase LM schedule: n_pre robust-kernel iterations over all
    valid edges, chi2 activation gate, then plain iterations over the
    inlier set (lambda resets at the phase boundary, as before)."""
    n_pre = max(n_iters // 2, 1)
    lam0 = jnp.float32(damping)
    oh = _onehot_for(gp, backend)
    c0 = _grouped_cost(gp, cam, True, gp.g_valid, gp.sp_valid, backend, oh)
    cam_Tcw, points, _, _ = _solve_grouped_phase(
        gp, cam, n_pre, cg_iters, backend, k_mv, True,
        gp.g_valid, gp.sp_valid, lam0, c0, oh)

    gp1 = gp._replace(cam_Tcw=cam_Tcw, points=points)
    act_g, act_s = _grouped_activation(gp1, cam, backend, oh)
    c1 = _grouped_cost(gp1, cam, False, act_g, act_s, backend, oh)
    cam_Tcw, points, _, _ = _solve_grouped_phase(
        gp1, cam, n_iters - n_pre, cg_iters, backend, k_mv, False,
        act_g, act_s, lam0, c1, oh)
    cam_Tcw = se3_renormalize(cam_Tcw)

    in_g, in_s = _grouped_activation(
        gp._replace(cam_Tcw=cam_Tcw, points=points), cam, backend, oh)
    return cam_Tcw, points, in_g, in_s


DENSE_MAX_CAMS = 512  # direct solve while (6C)^2*3P GEMMs stay cheap


def global_bundle_adjustment_grouped(prob: BAProblem, cam, inv_sigma2_levels,
                                     n_iters: int = 10, cg_iters: int = 50,
                                     damping: float = 1e-5,
                                     backend: str = "auto", k_mv: int = 1):
    """API-compatible with optim.global_ba.global_bundle_adjustment:
    returns (cam_Tcw, points, edge_inlier (E,) bool). backend="auto" =
    "gemm": single-device the one-hot-GEMM CG solver wins at every
    measured scale (v5e, ms/GN iter: 25.4 vs dense 57.3 vs flat 90.6 at
    C=256/65k edges; 146 vs flat 536 at C=1408/360k) — the dense path's
    per-point batched GEMMs and the serial LU don't pay off without a
    collective to amortize (see the distributed variant, where dense is
    one psum per GN step instead of one per CG matvec)."""
    if backend == "auto":
        backend = "gemm"
    gp = group_global_problem(prob, inv_sigma2_levels)
    cam_Tcw, points, in_g, in_s = _solve_grouped(
        gp, cam, n_iters, cg_iters, damping, backend, k_mv)
    E = prob.edge_cam.shape[0]
    inlier = np.zeros(E, bool)
    ge = np.asarray(gp.g_edge).reshape(-1)
    gi = np.asarray(in_g).reshape(-1)
    sel = ge >= 0
    inlier[ge[sel]] = gi[sel]
    se = np.asarray(gp.sp_edge)
    si = np.asarray(in_s)
    sel = se >= 0
    inlier[se[sel]] = si[sel]
    return cam_Tcw, points, jnp.asarray(inlier)
