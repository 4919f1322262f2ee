import numpy as np
import jax.numpy as jnp

from orb_slam2_detailed_comments_tpu.geometry import PinholeCamera, make_se3, exp_so3, se3_apply
from orb_slam2_detailed_comments_tpu.ops.matching import (
    match_descriptors, masked_best_match, resolve_duplicate_targets,
    rotation_consistency, search_by_projection, project_and_cull,
    compute_fundamental, search_for_triangulation, MatchResult,
)
from orb_slam2_detailed_comments_tpu.optim.pose_gn import pose_optimization

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0, width=640, height=480)


def random_descriptors(n, rng):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def perturb_desc(desc, n_bits, rng):
    """Flip n_bits random bits in each descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        for _ in range(n_bits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            out[i, w] ^= np.uint32(1 << b)
    return out


class TestMatchDescriptors:
    def test_exact_match(self):
        rng = np.random.default_rng(0)
        d = random_descriptors(100, rng)
        perm = rng.permutation(100)
        m = match_descriptors(
            jnp.asarray(d), jnp.ones(100, bool),
            jnp.asarray(d[perm]), jnp.ones(100, bool),
            check_rotation=False,
        )
        ok = np.asarray(m.ok)
        idx = np.asarray(m.idx)
        assert ok.all()
        # matched index should invert the permutation
        inv = np.empty(100, int)
        inv[perm] = np.arange(100)
        np.testing.assert_array_equal(idx, inv)

    def test_noisy_match(self):
        rng = np.random.default_rng(1)
        d = random_descriptors(200, rng)
        d2 = perturb_desc(d, 10, rng)  # ~10 bits flipped << TH_LOW=50
        m = match_descriptors(jnp.asarray(d), jnp.ones(200, bool),
                              jnp.asarray(d2), jnp.ones(200, bool),
                              check_rotation=False)
        ok = np.asarray(m.ok)
        assert ok.sum() > 190
        np.testing.assert_array_equal(np.asarray(m.idx)[ok], np.arange(200)[ok])

    def test_invalid_excluded(self):
        rng = np.random.default_rng(2)
        d = random_descriptors(10, rng)
        valid_b = np.ones(10, bool)
        valid_b[3] = False
        m = match_descriptors(jnp.asarray(d), jnp.ones(10, bool),
                              jnp.asarray(d), jnp.asarray(valid_b),
                              check_rotation=False)
        assert not np.asarray(m.ok)[3]

    def test_duplicate_resolution(self):
        # two sources matching the same target: only the closer survives
        dist = jnp.asarray([[5, 300], [10, 300]], dtype=jnp.int32)
        mask = jnp.ones((2, 2), bool)
        m = masked_best_match(dist, mask, 100)
        m2 = resolve_duplicate_targets(m, 2)
        assert np.asarray(m2.ok)[0] and not np.asarray(m2.ok)[1]


class TestRotationConsistency:
    def test_keeps_dominant_rotation(self):
        rng = np.random.default_rng(3)
        n = 300
        ang_a = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        ang_b = (ang_a - 0.3).astype(np.float32)  # consistent rotation of 0.3 rad
        # corrupt 30 of them
        ang_b[:30] = rng.uniform(0, 2 * np.pi, 30)
        ok = jnp.ones(n, bool)
        keep = np.asarray(rotation_consistency(jnp.asarray(ang_a), jnp.asarray(ang_b), ok))
        assert keep[30:].all()
        assert keep[:30].sum() < 10


class TestProjectionSearch:
    def _scene(self, seed=0, n=256):
        rng = np.random.default_rng(seed)
        pts = rng.uniform([-2, -2, 4], [2, 2, 8], (n, 3)).astype(np.float32)
        return rng, pts

    def test_project_and_cull(self):
        rng, pts = self._scene()
        Tcw = np.eye(4, dtype=np.float32)
        # normals point camera->point (reference: UpdateNormalAndDepth
        # averages pos - camera_center, MapPoint.cc:570-638)
        normals = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        proj = project_and_cull(
            jnp.asarray(pts), jnp.ones(len(pts), bool), jnp.asarray(normals),
            jnp.full(len(pts), 0.5), jnp.full(len(pts), 50.0),
            jnp.asarray(Tcw), CAM, 8, float(np.log(1.2)))
        vis = np.asarray(proj.visible)
        uv = np.asarray(proj.uv)
        inb = (uv[:, 0] >= 0) & (uv[:, 0] < 640) & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
        np.testing.assert_array_equal(vis, inb)

    def test_search_by_projection_recovers_matches(self):
        rng, pts = self._scene(1)
        n = len(pts)
        desc = random_descriptors(n, rng)
        Tcw = np.eye(4, dtype=np.float32)
        pc = pts
        uv = np.stack([500 * pc[:, 0] / pc[:, 2] + 320, 500 * pc[:, 1] / pc[:, 2] + 240], -1)
        inb = (uv[:, 0] >= 0) & (uv[:, 0] < 640) & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
        # keypoints = projections + 1px noise
        kp_xy = (uv + rng.normal(0, 1.0, uv.shape)).astype(np.float32)
        normals = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        dists = np.linalg.norm(pts, axis=-1)
        proj = project_and_cull(
            jnp.asarray(pts), jnp.ones(n, bool), jnp.asarray(normals),
            jnp.asarray(0.2 * dists, dtype=jnp.float32), jnp.asarray(2.0 * dists, dtype=jnp.float32),
            jnp.asarray(Tcw), CAM, 8, float(np.log(1.2)))
        sf = jnp.asarray([1.2 ** i for i in range(8)], dtype=jnp.float32)
        m = search_by_projection(
            proj, jnp.asarray(desc), kp_xy=jnp.asarray(kp_xy),
            kp_ur=jnp.full(n, -1.0), desc_k=jnp.asarray(perturb_desc(desc, 5, rng)),
            valid_k=jnp.ones(n, bool), octave_k=jnp.asarray(proj.pred_level),
            scale_factors=sf, th=1.0)
        ok = np.asarray(m.ok)
        assert ok.sum() >= 0.9 * inb.sum()
        np.testing.assert_array_equal(np.asarray(m.idx)[ok], np.arange(n)[ok])


class TestFundamental:
    def test_epipolar_constraint(self):
        rng = np.random.default_rng(5)
        pts = rng.uniform([-2, -2, 4], [2, 2, 8], (64, 3)).astype(np.float32)
        T1 = np.eye(4, dtype=np.float32)
        R2 = np.asarray(exp_so3(jnp.array([0.02, -0.03, 0.01], dtype=jnp.float32)))
        T2 = np.asarray(make_se3(jnp.asarray(R2), jnp.array([0.3, 0.0, 0.0], dtype=jnp.float32)))
        uv1 = np.asarray(CAM.project(se3_apply(jnp.asarray(T1), jnp.asarray(pts)[None])[0]))
        uv2 = np.asarray(CAM.project(se3_apply(jnp.asarray(T2), jnp.asarray(pts)[None])[0]))
        F12 = np.asarray(compute_fundamental(jnp.asarray(T1), jnp.asarray(T2), CAM.K, CAM.K))
        x1 = np.concatenate([uv1, np.ones((64, 1))], -1)
        x2 = np.concatenate([uv2, np.ones((64, 1))], -1)
        # epipolar constraint: x1^T F12 x2 = 0 (F12 maps kp1 -> line in image 2)
        err = np.abs(np.einsum("ni,ij,nj->n", x1, F12, x2))
        scale = np.abs(F12).max()
        assert (err / scale < 1e-2).all()


class TestPoseOptimization:
    def test_converges_from_perturbed_pose(self):
        rng = np.random.default_rng(6)
        n = 200
        pts = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3)).astype(np.float32)
        T_true = np.asarray(make_se3(
            exp_so3(jnp.array([0.05, -0.1, 0.02], dtype=jnp.float32)),
            jnp.array([0.2, -0.1, 0.3], dtype=jnp.float32)))
        pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
        uv = np.stack([500 * pc[:, 0] / pc[:, 2] + 320, 500 * pc[:, 1] / pc[:, 2] + 240], -1)
        obs = np.concatenate([uv + rng.normal(0, 0.5, uv.shape), np.full((n, 1), -1.0)], -1).astype(np.float32)
        # 20% outliers
        out_idx = rng.choice(n, n // 5, replace=False)
        obs[out_idx, :2] += rng.uniform(20, 80, (len(out_idx), 2))
        T0 = np.eye(4, dtype=np.float32)  # far-ish initial guess
        inv_sigma2 = jnp.asarray([1.0 / (1.2 ** (2 * i)) for i in range(8)], dtype=jnp.float32)
        Tcw, inliers, n_in = pose_optimization(
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(obs),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool), CAM, inv_sigma2)
        Tcw = np.asarray(Tcw)
        assert int(n_in) > 0.7 * n
        np.testing.assert_allclose(Tcw[:3, 3], T_true[:3, 3], atol=5e-3)
        np.testing.assert_allclose(Tcw[:3, :3], T_true[:3, :3], atol=5e-3)
        # outliers should be flagged
        assert np.asarray(inliers)[out_idx].sum() < 5

    def test_stereo_observations(self):
        rng = np.random.default_rng(7)
        n = 150
        pts = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3)).astype(np.float32)
        T_true = np.asarray(make_se3(
            exp_so3(jnp.array([-0.03, 0.06, 0.01], dtype=jnp.float32)),
            jnp.array([-0.1, 0.2, 0.1], dtype=jnp.float32)))
        pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
        u = 500 * pc[:, 0] / pc[:, 2] + 320
        v = 500 * pc[:, 1] / pc[:, 2] + 240
        ur = u - 50.0 / pc[:, 2]
        obs = np.stack([u, v, ur], -1).astype(np.float32)
        obs[:, :2] += rng.normal(0, 0.3, (n, 2))
        T0 = np.eye(4, dtype=np.float32)
        inv_sigma2 = jnp.asarray([1.0 / (1.2 ** (2 * i)) for i in range(8)], dtype=jnp.float32)
        Tcw, inliers, n_in = pose_optimization(
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(obs),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool), CAM, inv_sigma2)
        assert int(n_in) > 0.9 * n
        np.testing.assert_allclose(np.asarray(Tcw), T_true, atol=5e-3)
