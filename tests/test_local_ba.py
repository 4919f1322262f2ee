import numpy as np
import jax.numpy as jnp

from orb_slam2_detailed_comments_tpu.geometry import PinholeCamera, make_se3, exp_so3
from orb_slam2_detailed_comments_tpu.optim.local_ba import BAProblem, local_bundle_adjustment

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0, width=640, height=480)
INV_SIGMA2 = jnp.asarray([1.0 / (1.2 ** (2 * i)) for i in range(8)], dtype=jnp.float32)


def build_synthetic_ba(seed=0, n_cams=6, n_pts=120, noise_px=0.3,
                       pose_pert=0.02, point_pert=0.05, stereo=False,
                       n_outliers=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-3, -2, 6], [3, 2, 12], (n_pts, 3)).astype(np.float32)
    cams_true = []
    for i in range(n_cams):
        t = np.array([0.4 * i, 0.0, 0.0], np.float32)
        w = rng.normal(0, 0.01, 3).astype(np.float32)
        T = np.asarray(make_se3(exp_so3(jnp.asarray(w)), jnp.asarray(-t)))
        cams_true.append(T)
    cams_true = np.stack(cams_true)

    edge_cam, edge_pt, obs = [], [], []
    for c in range(n_cams):
        pc = pts @ cams_true[c, :3, :3].T + cams_true[c, :3, 3]
        u = 500 * pc[:, 0] / pc[:, 2] + 320
        v = 500 * pc[:, 1] / pc[:, 2] + 240
        vis = (pc[:, 2] > 0.1) & (u > 0) & (u < 640) & (v > 0) & (v < 480)
        for p in np.nonzero(vis)[0]:
            edge_cam.append(c)
            edge_pt.append(p)
            if stereo:
                nu = rng.normal(0, noise_px)
                ur = u[p] + nu - 50.0 / pc[p, 2] + rng.normal(0, noise_px * 0.5)
                obs.append([u[p] + nu, v[p] + rng.normal(0, noise_px), ur])
            else:
                obs.append([u[p] + rng.normal(0, noise_px), v[p] + rng.normal(0, noise_px), -1.0])
    E = len(edge_cam)
    obs = np.asarray(obs, np.float32)
    if n_outliers:
        out = rng.choice(E, n_outliers, replace=False)
        obs[out, :2] += rng.uniform(30, 90, (n_outliers, 2))

    # perturb free cams (keep cam 0, 1 fixed for gauge) and points
    cams0 = cams_true.copy()
    for c in range(2, n_cams):
        dw = rng.normal(0, pose_pert, 3).astype(np.float32)
        dt = rng.normal(0, pose_pert, 3).astype(np.float32)
        dT = np.asarray(make_se3(exp_so3(jnp.asarray(dw)), jnp.asarray(dt)))
        cams0[c] = dT @ cams0[c]
    pts0 = pts + rng.normal(0, point_pert, pts.shape).astype(np.float32)

    prob = BAProblem(
        cam_Tcw=jnp.asarray(cams0),
        cam_free=jnp.asarray([False, False] + [True] * (n_cams - 2)),
        cam_valid=jnp.ones(n_cams, bool),
        points=jnp.asarray(pts0),
        point_valid=jnp.ones(n_pts, bool),
        edge_cam=jnp.asarray(edge_cam, jnp.int32),
        edge_point=jnp.asarray(edge_pt, jnp.int32),
        edge_obs=jnp.asarray(obs),
        edge_octave=jnp.zeros(E, jnp.int32),
        edge_valid=jnp.ones(E, bool),
    )
    return prob, cams_true, pts


class TestLocalBA:
    def test_exact_recovery_zero_noise(self):
        # with zero observation noise GN must converge to machine precision
        prob, cams_true, pts_true = build_synthetic_ba(seed=4, noise_px=0.0)
        cams, pts, inlier = local_bundle_adjustment(prob, CAM, INV_SIGMA2)
        cams = np.asarray(cams)
        for c in range(2, len(cams)):
            np.testing.assert_allclose(cams[c], cams_true[c], atol=1e-4)
        err = np.linalg.norm(np.asarray(pts) - pts_true, axis=-1)
        assert np.median(err) < 1e-3, np.median(err)

    def test_converges_mono(self):
        prob, cams_true, pts_true = build_synthetic_ba(seed=0)
        cams, pts, inlier = local_bundle_adjustment(prob, CAM, INV_SIGMA2)
        cams = np.asarray(cams)
        pts = np.asarray(pts)
        # free cameras recovered (to within the 0.3px-noise ML floor)
        for c in range(2, len(cams)):
            np.testing.assert_allclose(cams[c], cams_true[c], atol=1e-2)
        err = np.linalg.norm(pts - pts_true, axis=-1)
        # noise floor: ~z^2 * sigma / (f * baseline) ~ 0.024 at z=9m
        assert np.median(err) < 4e-2, np.median(err)
        assert np.asarray(inlier).mean() > 0.95

    def test_converges_stereo(self):
        prob, cams_true, pts_true = build_synthetic_ba(seed=1, stereo=True)
        cams, pts, inlier = local_bundle_adjustment(prob, CAM, INV_SIGMA2)
        cams = np.asarray(cams)
        for c in range(2, len(cams)):
            np.testing.assert_allclose(cams[c], cams_true[c], atol=1e-2)

    def test_outlier_rejection(self):
        prob, cams_true, pts_true = build_synthetic_ba(seed=2, n_outliers=60)
        cams, pts, inlier = local_bundle_adjustment(prob, CAM, INV_SIGMA2)
        cams = np.asarray(cams)
        for c in range(2, len(cams)):
            np.testing.assert_allclose(cams[c], cams_true[c], atol=1e-2)
        # the injected outliers must be classified as outliers
        assert (~np.asarray(inlier)).sum() >= 50

    def test_padded_problem(self):
        # same problem padded with invalid cams/points/edges must give
        # the same solution (static-capacity invariance)
        prob, cams_true, pts_true = build_synthetic_ba(seed=3)
        C, P, E = prob.cam_Tcw.shape[0], prob.points.shape[0], prob.edge_cam.shape[0]
        pad_c, pad_p, pad_e = 2, 40, 100
        eye = jnp.broadcast_to(jnp.eye(4), (pad_c, 4, 4))
        prob_pad = BAProblem(
            cam_Tcw=jnp.concatenate([prob.cam_Tcw, eye]),
            cam_free=jnp.concatenate([prob.cam_free, jnp.zeros(pad_c, bool)]),
            cam_valid=jnp.concatenate([prob.cam_valid, jnp.zeros(pad_c, bool)]),
            points=jnp.concatenate([prob.points, jnp.zeros((pad_p, 3))]),
            point_valid=jnp.concatenate([prob.point_valid, jnp.zeros(pad_p, bool)]),
            edge_cam=jnp.concatenate([prob.edge_cam, jnp.zeros(pad_e, jnp.int32)]),
            edge_point=jnp.concatenate([prob.edge_point, jnp.zeros(pad_e, jnp.int32)]),
            edge_obs=jnp.concatenate([prob.edge_obs, jnp.zeros((pad_e, 3))]),
            edge_octave=jnp.concatenate([prob.edge_octave, jnp.zeros(pad_e, jnp.int32)]),
            edge_valid=jnp.concatenate([prob.edge_valid, jnp.zeros(pad_e, bool)]),
        )
        cams1, pts1, _ = local_bundle_adjustment(prob, CAM, INV_SIGMA2)
        cams2, pts2, _ = local_bundle_adjustment(prob_pad, CAM, INV_SIGMA2)
        # f32 reduction order differs with padding; the LM accept/reject
        # branches can amplify that to ~1e-4 on marginal steps
        np.testing.assert_allclose(np.asarray(cams2)[:C], np.asarray(cams1), atol=5e-4)
        np.testing.assert_allclose(np.asarray(pts2)[:P], np.asarray(pts1), atol=5e-3)


class TestGlobalBA:
    def test_matches_dense_schur(self):
        from orb_slam2_detailed_comments_tpu.optim.global_ba import global_bundle_adjustment
        prob, cams_true, pts_true = build_synthetic_ba(seed=5, noise_px=0.0)
        cams, pts, inlier = global_bundle_adjustment(prob, CAM, INV_SIGMA2, n_iters=15, cg_iters=60)
        cams = np.asarray(cams)
        for c in range(2, len(cams)):
            np.testing.assert_allclose(cams[c], cams_true[c], atol=2e-4)
        err = np.linalg.norm(np.asarray(pts) - pts_true, axis=-1)
        assert np.median(err) < 1e-3, np.median(err)

    def test_outliers(self):
        from orb_slam2_detailed_comments_tpu.optim.global_ba import global_bundle_adjustment
        prob, cams_true, pts_true = build_synthetic_ba(seed=6, n_outliers=60)
        cams, pts, inlier = global_bundle_adjustment(prob, CAM, INV_SIGMA2)
        cams = np.asarray(cams)
        for c in range(2, len(cams)):
            np.testing.assert_allclose(cams[c], cams_true[c], atol=2e-2)
        assert (~np.asarray(inlier)).sum() >= 40

    def test_lm_acceptance_on_harsh_start(self):
        # Far-from-optimum start with heavy outliers: LM step acceptance
        # (g2o-equivalent rollback) must keep the iteration finite and the
        # robust objective non-increasing; fixed-damping GN could diverge
        # on such problems (same failure mode fixed in local BA).
        from orb_slam2_detailed_comments_tpu.optim.global_ba import (
            global_bundle_adjustment, _robust_cost)
        prob, cams_true, pts_true = build_synthetic_ba(
            seed=7, pose_pert=0.3, point_pert=0.6, n_outliers=100)
        cams, pts, inlier = global_bundle_adjustment(prob, CAM, INV_SIGMA2)
        cams = np.asarray(cams)
        pts = np.asarray(pts)
        assert np.isfinite(cams).all() and np.isfinite(pts).all()
        cam_params = (CAM.fx, CAM.fy, CAM.cx, CAM.cy, CAM.bf)
        c0 = float(_robust_cost(prob.cam_Tcw, prob.points, prob,
                                prob.edge_valid, cam_params, INV_SIGMA2, True))
        c1 = float(_robust_cost(jnp.asarray(cams), jnp.asarray(pts), prob,
                                prob.edge_valid, cam_params, INV_SIGMA2, True))
        assert c1 < c0, (c0, c1)
