import numpy as np
import jax.numpy as jnp

from orb_slam2_detailed_comments_tpu.solvers.initializer import initialize_two_view

K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]], np.float32)


def project(pts, R, t):
    pc = pts @ R.T + t
    uv = (pc @ K.T)
    return uv[:, :2] / uv[:, 2:3], pc[:, 2]


def make_two_view(seed=0, n=300, planar=False, noise=0.5, rot=0.03, baseline=0.4):
    rng = np.random.default_rng(seed)
    if planar:
        # points on a plane z = 5 + 0.2x + 0.1y
        xy = rng.uniform(-3, 3, (n, 2))
        z = 5.0 + 0.2 * xy[:, 0] + 0.1 * xy[:, 1]
        pts = np.concatenate([xy, z[:, None]], -1).astype(np.float32)
    else:
        pts = rng.uniform([-3, -2, 4], [3, 2, 10], (n, 3)).astype(np.float32)
    from orb_slam2_detailed_comments_tpu.geometry import exp_so3
    R = np.asarray(exp_so3(jnp.asarray(rng.normal(0, rot, 3), dtype=jnp.float32)))
    t = np.array([baseline, 0.02, 0.01], np.float32)
    uv1, z1 = project(pts, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    uv2, z2 = project(pts, R, t)
    ok = (z1 > 0.1) & (z2 > 0.1) & (np.abs(uv1[:, 0] - 320) < 320) & (np.abs(uv2[:, 0] - 320) < 320) \
         & (np.abs(uv1[:, 1] - 240) < 240) & (np.abs(uv2[:, 1] - 240) < 240)
    uv1 = (uv1 + rng.normal(0, noise, uv1.shape)).astype(np.float32)
    uv2 = (uv2 + rng.normal(0, noise, uv2.shape)).astype(np.float32)
    return uv1, uv2, ok, R, t, pts


class TestTwoViewInit:
    def _check(self, res, R_true, t_true):
        assert res is not None and res.success
        # rotation error
        dR = res.R @ R_true.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0, f"rotation error {ang} deg"
        # translation direction error (scale is unobservable)
        tn = t_true / np.linalg.norm(t_true)
        cos = abs(float(res.t @ tn))
        assert cos > 0.995, f"translation direction cos {cos}"

    def test_general_scene_uses_fundamental(self):
        uv1, uv2, ok, R, t, pts = make_two_view(seed=0)
        res = initialize_two_view(uv1, uv2, ok, K, seed=1)
        self._check(res, R, t)
        assert not res.used_homography
        assert res.is_triangulated.sum() > 100
        # triangulated points match ground truth up to scale
        tri = res.is_triangulated
        scale = np.median(pts[tri, 2] / res.points3d[tri, 2])
        err = np.linalg.norm(res.points3d[tri] * scale - pts[tri], axis=-1)
        # raw RANSAC-hypothesis triangulation (no refit; global BA follows
        # in the pipeline, as in the reference Tracking.cc:1089)
        assert np.median(err) < 0.3, np.median(err)

    def test_planar_scene_uses_homography(self):
        uv1, uv2, ok, R, t, pts = make_two_view(seed=2, planar=True)
        res = initialize_two_view(uv1, uv2, ok, K, seed=3)
        self._check(res, R, t)
        assert res.used_homography

    def test_with_outliers(self):
        uv1, uv2, ok, R, t, pts = make_two_view(seed=4)
        rng = np.random.default_rng(5)
        n_out = 60
        idx = rng.choice(np.nonzero(ok)[0], n_out, replace=False)
        uv2[idx] = rng.uniform([0, 0], [640, 480], (n_out, 2)).astype(np.float32)
        res = initialize_two_view(uv1, uv2, ok, K, seed=6)
        self._check(res, R, t)
        # outliers must not be triangulated
        assert res.is_triangulated[idx].sum() < 5

    def test_pure_rotation_fails(self):
        # no baseline -> no parallax -> must refuse to initialize
        uv1, uv2, ok, R, t, pts = make_two_view(seed=7, baseline=0.0, noise=0.2)
        res = initialize_two_view(uv1, uv2, ok, K, seed=8)
        assert res is None or not res.success

    def test_too_few_matches(self):
        uv1 = np.zeros((10, 2), np.float32)
        uv2 = np.zeros((10, 2), np.float32)
        ok = np.zeros(10, bool)
        assert initialize_two_view(uv1, uv2, ok, K) is None
