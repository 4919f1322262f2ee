"""PnP RANSAC: minimal 3-point P3P path vs the 6-point DLT under heavy
outlier contamination (VERDICT r3 missing #2 / next #3).

The reference relocalizes with EPnP at minSet=4 assuming inlier ratio
eps=0.4 (reference: src/PnPsolver.cc:85-118, Tracking.cc:2308-2318). The
round-1 6-point DLT needs all-inlier 6-samples — P(clean) = eps^6 — and
measurably fails below ~40% inliers; the Grunert P3P path samples 3, so
P(clean) = eps^3, strictly more robust than the reference's 4.
"""
import numpy as np
import pytest

from orb_slam2_detailed_comments_tpu.solvers.pnp import (
    solve_pnp_ransac, _p3p_poses)

FX, FY, CX, CY = 400.0, 400.0, 160.0, 120.0
K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
INV_S2 = np.ones(8, np.float32)


def _make(n, inlier_ratio, seed, noise=0.5):
    """Random pose + 3D points; (1-ratio) of the 2D obs are outliers."""
    rng = np.random.default_rng(seed)
    ang = rng.uniform(-0.4, 0.4, 3)
    cx_, sx = np.cos(ang), np.sin(ang)
    Rx = np.array([[1, 0, 0], [0, cx_[0], -sx[0]], [0, sx[0], cx_[0]]])
    Ry = np.array([[cx_[1], 0, sx[1]], [0, 1, 0], [-sx[1], 0, cx_[1]]])
    Rz = np.array([[cx_[2], -sx[2], 0], [sx[2], cx_[2], 0], [0, 0, 1]])
    R = (Rz @ Ry @ Rx).astype(np.float32)
    t = rng.uniform(-1, 1, 3).astype(np.float32)
    pts_c = rng.uniform([-3, -2, 4], [3, 2, 12], (n, 3)).astype(np.float32)
    pts_w = (pts_c - t) @ R  # R^T (pc - t)
    u = FX * pts_c[:, 0] / pts_c[:, 2] + CX + rng.normal(0, noise, n)
    v = FY * pts_c[:, 1] / pts_c[:, 2] + CY + rng.normal(0, noise, n)
    uv = np.stack([u, v], -1).astype(np.float32)
    n_out = int(round(n * (1.0 - inlier_ratio)))
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] = rng.uniform([0, 0], [2 * CX, 2 * CY], (n_out, 2))
    is_inlier = np.ones(n, bool)
    is_inlier[out_idx] = False
    Tcw = np.eye(4, dtype=np.float32)
    Tcw[:3, :3] = R
    Tcw[:3, 3] = t
    return pts_w, uv, is_inlier, Tcw


class TestP3PMinimal:
    def test_p3p_exact_on_clean_triples(self):
        """Noise-free 3-point samples must contain the true pose among the
        quartic's roots."""
        pts_w, uv, _, Tcw = _make(30, 1.0, seed=1, noise=0.0)
        K_inv = np.linalg.inv(K).astype(np.float64)
        samples = np.stack([np.array([i, i + 7, i + 19]) for i in range(10)])
        R, t, ok = _p3p_poses(pts_w[samples], uv[samples], K_inv)
        R = R.reshape(10, 4, 3, 3)
        t = t.reshape(10, 4, 3)
        ok = ok.reshape(10, 4)
        for b in range(10):
            errs = [np.abs(R[b, r] - Tcw[:3, :3]).max()
                    + np.abs(t[b, r] - Tcw[:3, 3]).max()
                    for r in range(4) if ok[b, r]]
            assert errs, f"sample {b}: no valid P3P root"
            assert min(errs) < 1e-3, f"sample {b}: best err {min(errs)}"

    @pytest.mark.parametrize("ratio", [0.4, 0.3])
    def test_recovers_under_contamination(self, ratio):
        """At the reference's assumed eps=0.4 (and below), the joint pool
        must recover the pose and classify the inliers."""
        pts_w, uv, is_inlier, Tcw = _make(80, ratio, seed=2)
        res = solve_pnp_ransac(pts_w, uv, np.ones(80, bool),
                               np.zeros(80, np.int32), K, INV_S2,
                               min_inliers=10, seed=0)
        assert res is not None
        n_true = int(is_inlier.sum())
        # recovered inlier set ~ true inliers, pose close
        assert res.n_inliers >= 0.8 * n_true
        assert (res.inliers & ~is_inlier).sum() <= 0.1 * n_true
        assert np.abs(res.Tcw[:3, :3] - Tcw[:3, :3]).max() < 0.02
        assert np.abs(res.Tcw[:3, 3] - Tcw[:3, 3]).max() < 0.1

    def test_minimal_path_beats_dlt_alone(self):
        """A contamination level where the 6-point DLT pool alone fails
        over many seeds but the minimal path recovers (the VERDICT r3
        'measurably weaker relocalization' scenario)."""
        dlt_fail = p3p_win = 0
        for seed in range(8):
            pts_w, uv, is_inlier, Tcw = _make(80, 0.25, seed=10 + seed)
            n_true = int(is_inlier.sum())
            good_th = 0.8 * n_true
            r_dlt = solve_pnp_ransac(pts_w, uv, np.ones(80, bool),
                                     np.zeros(80, np.int32), K, INV_S2,
                                     min_inliers=10, seed=0, use_p3p=False)
            r_p3p = solve_pnp_ransac(pts_w, uv, np.ones(80, bool),
                                     np.zeros(80, np.int32), K, INV_S2,
                                     min_inliers=10, seed=0, use_dlt=False)
            dlt_ok = (r_dlt is not None and r_dlt.n_inliers >= good_th
                      and np.abs(r_dlt.Tcw[:3, :3] - Tcw[:3, :3]).max() < 0.05)
            p3p_ok = (r_p3p is not None and r_p3p.n_inliers >= good_th
                      and np.abs(r_p3p.Tcw[:3, :3] - Tcw[:3, :3]).max() < 0.05)
            dlt_fail += not dlt_ok
            p3p_win += p3p_ok
        # at eps=0.25: P(clean 6-sample)=0.024% -> ~7% success over 300
        # draws; P(clean 3-sample)=1.6% -> ~99% success.
        assert p3p_win >= 7, f"P3P recovered only {p3p_win}/8"
        assert dlt_fail >= 4, f"DLT-only unexpectedly robust ({dlt_fail}/8)"

    def test_few_correspondences_use_minimal_set(self):
        """4-5 correspondences (below the DLT's 6) must still solve —
        parity with the reference's minSet=4 capability."""
        pts_w, uv, _, Tcw = _make(5, 1.0, seed=3, noise=0.1)
        res = solve_pnp_ransac(pts_w, uv, np.ones(5, bool),
                               np.zeros(5, np.int32), K, INV_S2,
                               min_inliers=4, seed=0)
        assert res is not None
        assert np.abs(res.Tcw[:3, :3] - Tcw[:3, :3]).max() < 0.02

    def test_duplicate_points_in_sample_do_not_crash(self):
        """Two keypoints can resolve to the SAME map point during
        relocalization matching; a P3P sample drawing both yields b2=0
        ratios (non-finite quartic coefficients) — must be masked, not
        crash eigvals (round-4 regression from the r40 debug run)."""
        pts_w, uv, _, Tcw = _make(40, 1.0, seed=4)
        pts_w[1] = pts_w[0]  # duplicate 3D point
        pts_w[11] = pts_w[10]
        uv[1] = uv[0]
        res = solve_pnp_ransac(pts_w, uv, np.ones(40, bool),
                               np.zeros(40, np.int32), K, INV_S2,
                               min_inliers=10, seed=0)
        assert res is not None
        assert np.abs(res.Tcw[:3, :3] - Tcw[:3, :3]).max() < 0.02
