"""Monocular two-view initialization: batched H/F RANSAC + reconstruction.

TPU-native replacement for the reference Initializer
(reference: src/Initializer.cc): instead of two host threads racing H and F
(Initializer.cc:192-215), ALL 2x200 hypotheses are evaluated as one batched
program — model fitting is a batched small SVD, scoring is a (hypotheses x
matches) matrix of symmetric transfer errors. Model selection keeps the
reference's rule RH = SH/(SH+SF) > 0.40 -> homography (Initializer.cc:220-239).

Reconstruction (rare, once per init attempt) decomposes the winning model on
the host — Faugeras' 8 hypotheses for H (ReconstructH, :1534-1743) or the
4 essential-matrix hypotheses for F (ReconstructF, :963-1130) — and ranks
them with a batched cheirality/parallax/reprojection check (CheckRT,
:1755-1870).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.triangulate import triangulate_dlt

N_RANSAC = 200        # reference: Initializer constructor mMaxIterations=200
SIGMA = 1.0
CHI2_H = 5.991        # reference: CheckHomography th
CHI2_F_LINE = 3.841   # reference: CheckFundamental thScore per direction
CHI2_F_SCORE = 5.991
MIN_PARALLAX_DEG = 1.0
MIN_TRIANGULATED = 50


class TwoViewResult(NamedTuple):
    success: bool
    R: np.ndarray            # (3, 3) rotation cam1->cam2
    t: np.ndarray            # (3,) unit-norm translation
    points3d: np.ndarray     # (M, 3) triangulated points in cam1 frame
    is_triangulated: np.ndarray  # (M,) bool
    used_homography: bool


def _normalize(uv, valid):
    """Hartley normalization over the valid matches
    (reference: Initializer::Normalize, :1485-1526)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(uv * w[:, None], axis=0) / n
    d = jnp.abs(uv - mean) * w[:, None]
    mean_dev = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(mean_dev, 1e-9)
    uvn = (uv - mean) * s
    T = jnp.array([[s[0], 0.0, -mean[0] * s[0]],
                   [0.0, s[1], -mean[1] * s[1]],
                   [0.0, 0.0, 1.0]])
    return uvn, T


def _fit_homographies(p1, p2):
    """Batched DLT: p1, p2 (B, 8, 2) -> H21 (B, 3, 3) with p2 ~ H p1."""
    B = p1.shape[0]
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)  # (B, 16, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[..., 8, :]
    return h.reshape(B, 3, 3)


def _fit_fundamentals(p1, p2):
    """Batched 8-point algorithm with rank-2 projection."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], axis=-1)  # (B, 8, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[..., 8, :].reshape(-1, 3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    return u @ (s[..., :, None] * vt2)


def _score_homographies(H21, uv1, uv2, valid):
    """Symmetric transfer error score (reference: CheckHomography,
    :1165-1300): per match, sum of truncated (th - chi2) in both directions,
    zero if either direction exceeds th."""
    H12 = jnp.linalg.inv(H21)
    inv_s2 = 1.0 / (SIGMA * SIGMA)

    def transfer(H, a, b):
        # H: (B, 3, 3); a, b: (M, 2) -> (B, M) chi2
        ah = jnp.concatenate([a, jnp.ones_like(a[..., :1])], axis=-1)
        p = jnp.einsum("bij,mj->bmi", H, ah)
        w = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
        proj = p[..., :2] / w[..., None]
        return jnp.sum((proj - b[None]) ** 2, axis=-1) * inv_s2

    c1 = transfer(H12, uv2, uv1)  # (B, M) err in image 1
    c2 = transfer(H21, uv1, uv2)  # (B, M) err in image 2
    ok = (c1 < CHI2_H) & (c2 < CHI2_H) & valid[None]
    score = jnp.sum(jnp.where(ok, (CHI2_H - c1) + (CHI2_H - c2), 0.0), axis=-1)
    return score, ok


def _score_fundamentals(F21, uv1, uv2, valid):
    """Epipolar line distance score (reference: CheckFundamental, :1305-1454)."""
    inv_s2 = 1.0 / (SIGMA * SIGMA)

    def line_err(F, a, b):
        # F: (B, 3, 3); line in b's image: l = F a
        ah = jnp.concatenate([a, jnp.ones_like(a[..., :1])], axis=-1)
        l = jnp.einsum("bij,mj->bmi", F, ah)  # (B, M, 3)
        num = jnp.sum(l[..., :2] * b[None], axis=-1) + l[..., 2]
        den = jnp.sum(l[..., :2] ** 2, axis=-1)
        return num * num / jnp.maximum(den, 1e-12) * inv_s2

    c2 = line_err(F21, uv1, uv2)
    c1 = line_err(jnp.swapaxes(F21, -1, -2), uv2, uv1)
    ok = (c1 < CHI2_F_LINE) & (c2 < CHI2_F_LINE) & valid[None]
    score = jnp.sum(jnp.where(ok, (CHI2_F_SCORE - c1) + (CHI2_F_SCORE - c2), 0.0), axis=-1)
    return score, ok


def _refit_homography(n1, n2, w):
    """Weighted DLT over ALL matches (w = inlier mask). Zeroed rows do not
    contribute to the nullspace problem."""
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    return vt[8, :].reshape(3, 3)


def _refit_fundamental(n1, n2, w):
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    o = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], axis=-1)
    A = A * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    F = vt[8, :].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[2].set(0.0)
    return u @ (s[:, None] * vt2)


@jax.jit
def _ransac_models(uv1, uv2, valid, sample_idx):
    """Fit + score all H and F hypotheses, then refit the winner on its
    inlier set (a least-squares polish the reference omits; it materially
    improves the decomposed pose at realistic noise). Returns
    ((H21, SH, h_inliers), (F21, SF, f_inliers))."""
    n1, T1 = _normalize(uv1, valid)
    n2, T2 = _normalize(uv2, valid)
    p1 = n1[sample_idx]  # (B, 8, 2)
    p2 = n2[sample_idx]
    T2it = jnp.linalg.inv(T2)

    Hn = _fit_homographies(p1, p2)
    H21 = T2it @ Hn @ T1  # denormalize (reference :259)
    sh, h_ok = _score_homographies(H21, uv1, uv2, valid)
    bh = jnp.argmax(sh)
    best_H, best_h_ok = H21[bh], h_ok[bh]
    # two refit rounds on inliers
    for _ in range(2):
        Hr = T2it @ _refit_homography(n1, n2, best_h_ok.astype(n1.dtype)) @ T1
        sh_r, h_ok_r = _score_homographies(Hr[None], uv1, uv2, valid)
        better = sh_r[0] > sh[bh]
        best_H = jnp.where(better, Hr, best_H)
        best_h_ok = jnp.where(better, h_ok_r[0], best_h_ok)
    sh_best = _score_homographies(best_H[None], uv1, uv2, valid)[0][0]

    Fn = _fit_fundamentals(p1, p2)
    F21 = jnp.swapaxes(T2, -1, -2) @ Fn @ T1
    sf, f_ok = _score_fundamentals(F21, uv1, uv2, valid)
    bf = jnp.argmax(sf)
    best_F, best_f_ok = F21[bf], f_ok[bf]
    for _ in range(2):
        Fr = jnp.swapaxes(T2, -1, -2) @ _refit_fundamental(n1, n2, best_f_ok.astype(n1.dtype)) @ T1
        sf_r, f_ok_r = _score_fundamentals(Fr[None], uv1, uv2, valid)
        better = sf_r[0] > _score_fundamentals(best_F[None], uv1, uv2, valid)[0][0]
        best_F = jnp.where(better, Fr, best_F)
        best_f_ok = jnp.where(better, f_ok_r[0], best_f_ok)
    sf_best = _score_fundamentals(best_F[None], uv1, uv2, valid)[0][0]

    return (best_H, sh_best, best_h_ok), (best_F, sf_best, best_f_ok)


@jax.jit
def _check_rt_batch(Rs, ts, uv1, uv2, valid, K, chi2_th):
    """Batched CheckRT (reference: Initializer.cc:1755-1870): triangulate
    matches under each (R, t), count points with positive depth in both
    views, parallax, and bounded reprojection error.

    Rs: (Q, 3, 3), ts: (Q, 3). Returns (ngood (Q,), parallax_deg (Q,),
    pts3d (Q, M, 3), good (Q, M))."""
    Q = Rs.shape[0]
    M = uv1.shape[0]
    eye34 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P1 = K @ eye34  # (3, 4)
    Rt = jnp.concatenate([Rs, ts[:, :, None]], axis=-1)  # (Q, 3, 4)
    P2 = K[None] @ Rt

    uv1b = jnp.broadcast_to(uv1[None], (Q, M, 2))
    uv2b = jnp.broadcast_to(uv2[None], (Q, M, 2))
    pts = triangulate_dlt(P1[None, None], P2[:, None], uv1b, uv2b)  # (Q, M, 3)

    finite = jnp.all(jnp.isfinite(pts), axis=-1)
    z1 = pts[..., 2]
    pc2 = jnp.einsum("qij,qmj->qmi", Rs, pts) + ts[:, None, :]
    z2 = pc2[..., 2]

    # parallax between the two rays
    O2 = -jnp.einsum("qij,qi->qj", Rs, ts)  # camera-2 center in cam1 frame
    r1 = pts
    r2 = pts - O2[:, None, :]
    cosp = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9)

    def reproj_err(P, pts_h, uv):
        ph = jnp.concatenate([pts_h, jnp.ones_like(pts_h[..., :1])], axis=-1)
        pr = jnp.einsum("q...ij,qmj->qmi", P, ph)
        w = jnp.where(jnp.abs(pr[..., 2]) < 1e-9, 1e-9, pr[..., 2])
        return jnp.sum((pr[..., :2] / w[..., None] - uv) ** 2, axis=-1)

    e1 = reproj_err(jnp.broadcast_to(P1[None], (Q, 3, 4)), pts, uv1b)
    e2 = reproj_err(P2, pts, uv2b)

    good = (
        valid[None]
        & finite
        & (z1 > 0) & (z2 > 0)
        & (cosp < 0.99998)          # parallax > ~0.36 deg (reference :1811)
        & (e1 < chi2_th) & (e2 < chi2_th)
    )
    ngood = jnp.sum(good, axis=-1)
    # parallax statistic: ~50th-best parallax among good (reference takes
    # the 50th smallest angle, :1855-1860); we use the median of good.
    cosp_good = jnp.where(good, cosp, 1.0)
    sorted_cos = jnp.sort(cosp_good, axis=-1)
    idx = jnp.minimum(49, jnp.maximum(ngood - 1, 0))
    cos50 = jnp.take_along_axis(sorted_cos, idx[:, None], axis=-1)[:, 0]
    parallax_deg = jnp.degrees(jnp.arccos(jnp.clip(cos50, -1.0, 1.0)))
    return ngood, parallax_deg, pts, good


def _decompose_homography(H21, K):
    """Faugeras SVD decomposition into 8 motion hypotheses
    (reference: ReconstructH, Initializer.cc:1534-1743)."""
    A = np.linalg.inv(K) @ H21 @ K
    U, w, Vt = np.linalg.svd(A)
    V = Vt.T
    s = np.linalg.det(U) * np.linalg.det(V)
    d1, d2, d3 = w
    if d1 / d2 < 1.00001 or d2 / d3 < 1.00001:
        return []

    aux1 = np.sqrt(max((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3), 0.0))
    aux3 = np.sqrt(max((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3), 0.0))
    x1s = [aux1, aux1, -aux1, -aux1]
    x3s = [aux3, -aux3, aux3, -aux3]

    out = []
    # case d' = d2
    aux_st = np.sqrt(max((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / ((d1 + d3) * d2)
    ct = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2)
    st_ = [aux_st, -aux_st, -aux_st, aux_st]
    for i in range(4):
        Rp = np.array([[ct, 0, -st_[i]], [0, 1, 0], [st_[i], 0, ct]])
        R = s * U @ Rp @ Vt
        tp = np.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        nt = np.linalg.norm(t)
        out.append((R, t / (nt if nt > 0 else 1.0)))
    # case d' = -d2
    aux_sp = np.sqrt(max((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / ((d1 - d3) * d2)
    cp = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2)
    sp_ = [aux_sp, -aux_sp, -aux_sp, aux_sp]
    for i in range(4):
        Rp = np.array([[cp, 0, sp_[i]], [0, -1, 0], [sp_[i], 0, -cp]])
        R = s * U @ Rp @ Vt
        tp = np.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        nt = np.linalg.norm(t)
        out.append((R, t / (nt if nt > 0 else 1.0)))
    return out


def _decompose_essential(F21, K):
    """E = K^T F K -> 4 hypotheses (reference: DecomposeE, :1878-1920 and
    ReconstructF's 4-way check)."""
    E = K.T @ F21 @ K
    U, _, Vt = np.linalg.svd(E)
    if np.linalg.det(U) < 0:
        U = -U
    if np.linalg.det(Vt) < 0:
        Vt = -Vt
    W = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / np.linalg.norm(t)
    return [(R1, t), (R1, -t), (R2, t), (R2, -t)]


def min_parallax_for(fx: float, sigma_px: float = 1.0,
                     max_depth_err: float = 0.06) -> float:
    """Scale-aware init parallax gate (beyond reference).

    The reference accepts any init with 50th-best parallax >= 1.0 deg
    (Initializer.cc:1056-1130) — calibrated for TUM-class geometry. The
    robustness quantity is the triangulated RELATIVE DEPTH ERROR
    sigma_z/z ~ (sigma_px/fx)/tan(parallax): a 1-deg init at fx=350
    bakes in ~16% correlated depth error, whose reconstruction bias
    collapses downstream translation estimates at narrow FOV (round-4
    diagnosis: the GT pose scores WORSE than the collapsed pose on such
    a map). Gate at the parallax where the expected depth error drops
    below max_depth_err, never below the reference's 1.0 deg."""
    return float(max(MIN_PARALLAX_DEG,
                     np.degrees(np.arctan2(sigma_px / max_depth_err, fx))))


def initialize_two_view(uv1, uv2, valid, K, seed: int = 0,
                        min_triangulated: int = MIN_TRIANGULATED,
                        min_parallax: Optional[float] = None) -> Optional[TwoViewResult]:
    """Full two-view bootstrap following Initializer::Initialize
    (reference: Initializer.cc:123-250).

    uv1/uv2: (M, 2) float32 matched undistorted keypoints; valid: (M,) bool.
    K: (3, 3) intrinsics. min_parallax: acceptance threshold in degrees on
    the 50th-best parallax. None = the reference's fixed 1.0-deg gate
    (MIN_PARALLAX_DEG, Initializer.h:85); callers in depth-accuracy-
    critical regimes (narrow FOV, large fx/width) should pass the
    scale-aware min_parallax_for(fx) instead — see that helper's
    docstring for the round-4 narrow-FOV failure analysis.
    Returns None on failure — the caller keeps its reference frame, so the
    next attempt pairs a LONGER baseline (Tracking keeps mInitialFrame
    while matches stay >= 100, Tracking.cc:918-971).
    """
    if min_parallax is None:
        min_parallax = MIN_PARALLAX_DEG  # reference default; callers in
        # depth-accuracy-critical regimes pass min_parallax_for(fx)
    uv1 = jnp.asarray(uv1)
    uv2 = jnp.asarray(uv2)
    valid = jnp.asarray(valid)
    M = uv1.shape[0]
    n_valid = int(jnp.sum(valid))
    if n_valid < 8:
        return None

    rng = np.random.default_rng(seed)
    vidx = np.nonzero(np.asarray(valid))[0]
    samples = np.stack([rng.choice(vidx, 8, replace=False) for _ in range(N_RANSAC)])

    (H21, SH, h_in), (F21, SF, f_in) = _ransac_models(
        uv1, uv2, valid, jnp.asarray(samples, jnp.int32))
    SH, SF = float(SH), float(SF)
    if SH + SF <= 0:
        return None
    RH = SH / (SH + SF)

    K_np = np.asarray(K, np.float64)
    chi2_th = 4.0 * SIGMA * SIGMA  # reference: CheckRT th2 = 4*sigma^2
    if RH > 0.40:
        hyps = _decompose_homography(np.asarray(H21, np.float64), K_np)
        inl = h_in
        used_h = True
        min_good_frac = 0.9
    else:
        hyps = _decompose_essential(np.asarray(F21, np.float64), K_np)
        inl = f_in
        used_h = False
        min_good_frac = 0.9

    if not hyps:
        return None

    Rs = jnp.asarray(np.stack([h[0] for h in hyps]), jnp.float32)
    ts = jnp.asarray(np.stack([h[1] for h in hyps]), jnp.float32)
    ngood, parallax, pts, good = _check_rt_batch(
        Rs, ts, uv1, uv2, inl, jnp.asarray(K_np, jnp.float32), chi2_th)
    ngood = np.asarray(ngood)
    parallax = np.asarray(parallax)

    n_inl = int(jnp.sum(inl))
    best = int(np.argmax(ngood))
    max_good = int(ngood[best])
    n_similar = int(np.sum(ngood > 0.7 * max_good))

    # acceptance (reference: ReconstructF :1085-1128 / ReconstructH
    # :1726-1739): clear winner, enough points, enough parallax. BOTH
    # paths require >= 0.9*N good (the reference's nMinGood =
    # max(0.9*N, minTriangulated) applies to F too — round 4 fixed the F
    # path silently skipping it, which let weak-parallax inits through
    # at narrow FOV and collapsed downstream tracking)
    if max_good < max(min_triangulated, int(min_good_frac * n_inl)):
        return None
    if n_similar > 1 and not used_h:
        return None
    if parallax[best] < min_parallax:
        return None

    return TwoViewResult(
        success=True,
        R=np.asarray(Rs[best], np.float32),
        t=np.asarray(ts[best], np.float32),
        points3d=np.asarray(pts[best], np.float32),
        is_triangulated=np.asarray(good[best]),
        used_homography=used_h,
    )
