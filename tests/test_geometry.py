import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_detailed_comments_tpu.geometry import (
    exp_so3, log_so3, quat_to_rotmat, rotmat_to_quat,
    exp_se3, log_se3, se3_inverse, se3_compose, se3_apply, make_se3, se3_identity,
    exp_sim3, log_sim3, sim3_inverse, sim3_compose, sim3_apply, make_sim3, sim3_to_se3,
    PinholeCamera, triangulate_dlt, triangulate_midpoint,
)
from orb_slam2_detailed_comments_tpu.geometry.sim3 import sim3_scale, sim3_rotation


def random_rotvecs(n, rng, scale=2.0):
    return jnp.asarray(rng.standard_normal((n, 3)) * scale, dtype=jnp.float32)


class TestSO3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        w = random_rotvecs(64, rng, scale=1.0)
        R = exp_so3(w)
        w2 = log_so3(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-5)

    def test_exp_orthonormal(self):
        rng = np.random.default_rng(1)
        w = random_rotvecs(32, rng)
        R = exp_so3(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)

    def test_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]], dtype=jnp.float32)
        R = exp_so3(w)
        np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)
        np.testing.assert_allclose(np.asarray(log_so3(R)), 0.0, atol=1e-6)

    def test_quat_roundtrip(self):
        rng = np.random.default_rng(2)
        w = random_rotvecs(64, rng)
        R = exp_so3(w)
        q = rotmat_to_quat(R)
        R2 = quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_near_pi_rotation(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        w = jnp.asarray((np.pi - 1e-4) * axis, dtype=jnp.float32)[None]
        R = exp_so3(w)
        w2 = log_so3(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-3)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(3)
        xi = rng.standard_normal((32, 6))
        # keep rotation below pi so the log is the principal value
        nrm = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
        xi[:, 3:] *= 0.9 * np.pi / np.maximum(nrm, 0.9 * np.pi)
        xi = jnp.asarray(xi, dtype=jnp.float32)
        T = exp_se3(xi)
        xi2 = log_se3(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4)
        # and exp(log(T)) == T for arbitrary twists
        xi3 = jnp.asarray(rng.standard_normal((32, 6)) * 2.0, dtype=jnp.float32)
        T3 = exp_se3(xi3)
        T3b = exp_se3(log_se3(T3))
        np.testing.assert_allclose(np.asarray(T3b), np.asarray(T3), atol=1e-4)

    def test_inverse_compose(self):
        rng = np.random.default_rng(4)
        xi = jnp.asarray(rng.standard_normal((16, 6)), dtype=jnp.float32)
        T = exp_se3(xi)
        I = se3_compose(T, se3_inverse(T))
        np.testing.assert_allclose(np.asarray(I), np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)

    def test_apply(self):
        T = make_se3(exp_so3(jnp.array([0.0, 0.0, np.pi / 2], dtype=jnp.float32)),
                     jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32))
        p = jnp.array([[1.0, 0.0, 0.0]], dtype=jnp.float32)
        out = se3_apply(T, p)
        np.testing.assert_allclose(np.asarray(out), [[1.0, 1.0, 0.0]], atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(5)
        xi = jnp.asarray(rng.standard_normal((32, 7)) * 0.5, dtype=jnp.float32)
        S = exp_sim3(xi)
        xi2 = log_sim3(S)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)

    def test_scale_recovery(self):
        R = exp_so3(jnp.array([0.1, -0.2, 0.3], dtype=jnp.float32))
        S = make_sim3(R, jnp.array([1.0, 2.0, 3.0], dtype=jnp.float32), jnp.asarray(2.5, dtype=jnp.float32))
        np.testing.assert_allclose(float(sim3_scale(S)), 2.5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sim3_rotation(S)), np.asarray(R), atol=1e-5)

    def test_inverse(self):
        rng = np.random.default_rng(6)
        xi = jnp.asarray(rng.standard_normal((8, 7)) * 0.5, dtype=jnp.float32)
        S = exp_sim3(xi)
        I = sim3_compose(S, sim3_inverse(S))
        np.testing.assert_allclose(np.asarray(I), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-4)

    def test_apply_scales(self):
        S = make_sim3(jnp.eye(3), jnp.zeros(3), jnp.asarray(2.0))
        p = jnp.array([[1.0, 1.0, 1.0]])
        np.testing.assert_allclose(np.asarray(sim3_apply(S, p)), [[2.0, 2.0, 2.0]], atol=1e-6)

    def test_sim3_to_se3(self):
        R = exp_so3(jnp.array([0.1, 0.0, 0.0], dtype=jnp.float32))
        t = jnp.array([2.0, 0.0, 0.0], dtype=jnp.float32)
        S = make_sim3(R, t, jnp.asarray(4.0))
        T = sim3_to_se3(S)
        np.testing.assert_allclose(np.asarray(T[:3, :3]), np.asarray(R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(T[:3, 3]), np.asarray(t) / 4.0, atol=1e-5)


class TestCamera:
    CAM = PinholeCamera(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                        k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026, k3=1.1633,
                        width=640, height=480)

    def test_project_backproject(self):
        rng = np.random.default_rng(7)
        depth = jnp.asarray(rng.uniform(0.5, 5.0, (128,)), dtype=jnp.float32)
        uv = jnp.asarray(rng.uniform(50, 400, (128, 2)), dtype=jnp.float32)
        pts = self.CAM.backproject(uv, depth)
        uv2 = self.CAM.project(pts)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)

    def test_undistort_fixed_point(self):
        # distort normalized points then undistort the pixel coords back
        rng = np.random.default_rng(8)
        xy = jnp.asarray(rng.uniform(-0.3, 0.3, (64, 2)), dtype=jnp.float32)
        xyd = self.CAM.distort_normalized(xy)
        uv_dist = jnp.stack([xyd[..., 0] * self.CAM.fx + self.CAM.cx,
                             xyd[..., 1] * self.CAM.fy + self.CAM.cy], axis=-1)
        uv_und = self.CAM.undistort_pixels(uv_dist)
        uv_true = jnp.stack([xy[..., 0] * self.CAM.fx + self.CAM.cx,
                             xy[..., 1] * self.CAM.fy + self.CAM.cy], axis=-1)
        np.testing.assert_allclose(np.asarray(uv_und), np.asarray(uv_true), atol=0.1)

    def test_stereo_projection(self):
        cam = PinholeCamera(fx=700.0, fy=700.0, cx=320.0, cy=240.0, bf=70.0)
        pts = jnp.array([[0.0, 0.0, 7.0]])
        uvr = cam.project_stereo(pts)
        np.testing.assert_allclose(np.asarray(uvr), [[320.0, 240.0, 310.0]], atol=1e-4)


class TestTriangulation:
    def test_dlt_exact(self):
        rng = np.random.default_rng(9)
        cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
        pts_w = jnp.asarray(rng.uniform(-1, 1, (64, 3)) + np.array([0, 0, 4.0]), dtype=jnp.float32)
        T1 = se3_identity()
        T2 = make_se3(exp_so3(jnp.array([0.0, 0.05, 0.0], dtype=jnp.float32)),
                      jnp.array([-0.5, 0.0, 0.0], dtype=jnp.float32))
        K = cam.K
        P1 = K @ T1[:3, :]
        P2 = K @ T2[:3, :]
        uv1 = cam.project(se3_apply(T1, pts_w[None])[0])
        uv2 = cam.project(se3_apply(T2, pts_w[None])[0])
        rec = triangulate_dlt(P1, P2, uv1, uv2)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(pts_w), atol=5e-2)

    def test_midpoint(self):
        p = jnp.array([[0.0, 0.0, 5.0]])
        c1 = jnp.array([[0.0, 0.0, 0.0]])
        c2 = jnp.array([[1.0, 0.0, 0.0]])
        r1 = p - c1
        r2 = p - c2
        r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
        r2 = r2 / jnp.linalg.norm(r2, axis=-1, keepdims=True)
        rec = triangulate_midpoint(c1, r1, c2, r2)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(p), atol=1e-4)
