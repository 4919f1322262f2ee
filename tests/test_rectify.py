"""Stereo rectification: map construction, remap, YAML calibration parsing.

Reference behavior covered: cv::initUndistortRectifyMap + cv::remap as used
by Examples/Stereo/stereo_euroc.cc:60-82,165-166 and
Examples/ROS/ORB_SLAM2/src/ros_stereo.cc:71-110.
"""
import os
import tempfile

import numpy as np
import pytest

from orb_slam2_detailed_comments_tpu.ops.rectify import (
    StereoRectifier, has_rectification, init_undistort_rectify_map,
    remap_bilinear)
from orb_slam2_detailed_comments_tpu.utils.config import load_settings_raw


K = np.array([[458.654, 0.0, 367.215],
              [0.0, 457.296, 248.375],
              [0.0, 0.0, 1.0]])
D = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
P = np.array([[435.2046959714599, 0, 367.4517211914062],
              [0, 435.2046959714599, 252.2008514404297],
              [0, 0, 1.0]])


def small_rotation():
    # hand-rolled small rotation (avoid scipy dependency)
    a = 0.01
    Rz = np.array([[np.cos(a), -np.sin(a), 0],
                   [np.sin(a), np.cos(a), 0],
                   [0, 0, 1.0]])
    b = 0.008
    Ry = np.array([[np.cos(b), 0, np.sin(b)],
                   [0, 1.0, 0],
                   [-np.sin(b), 0, np.cos(b)]])
    return Rz @ Ry


def test_identity_map_when_no_distortion():
    mx, my = init_undistort_rectify_map(K, np.zeros(5), np.eye(3), K, (64, 48))
    us, vs = np.meshgrid(np.arange(64.0), np.arange(48.0))
    np.testing.assert_allclose(mx, us, atol=1e-4)
    np.testing.assert_allclose(my, vs, atol=1e-4)


def test_map_consistency_with_projection_model():
    """For any rectified pixel, the map must equal the raw-image projection
    of the same ray: map(u,v) = K * distort( R^-1 P^-1 (u,v,1) )."""
    R = small_rotation()
    mx, my = init_undistort_rectify_map(K, D, R, P, (752, 480))

    rng = np.random.default_rng(0)
    us = rng.uniform(0, 751, 200)
    vs = rng.uniform(0, 479, 200)
    ui = us.astype(int)
    vi = vs.astype(int)

    # independent forward computation at integer pixels
    rays = np.linalg.inv(P) @ np.stack([ui, vi, np.ones_like(ui)]).astype(float)
    rays = np.linalg.inv(R) @ rays
    x = rays[0] / rays[2]
    y = rays[1] / rays[2]
    r2 = x * x + y * y
    k1, k2, p1, p2, k3 = D
    radial = 1 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    np.testing.assert_allclose(mx[vi, ui], K[0, 0] * xd + K[0, 2], atol=1e-3)
    np.testing.assert_allclose(my[vi, ui], K[1, 1] * yd + K[1, 2], atol=1e-3)


def test_remap_bilinear_exact_on_linear_image():
    """Bilinear interpolation reproduces a linear ramp exactly (interior)."""
    H, W = 40, 60
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    img = 3.0 * xs + 2.0 * ys + 5.0
    rng = np.random.default_rng(1)
    mx = rng.uniform(0, W - 1.001, (8, 9)).astype(np.float32)
    my = rng.uniform(0, H - 1.001, (8, 9)).astype(np.float32)
    out = remap_bilinear(img, mx, my)
    np.testing.assert_allclose(out, 3.0 * mx + 2.0 * my + 5.0, rtol=1e-5)


def test_remap_border_constant():
    img = np.ones((10, 10), np.float32)
    mx = np.array([[-5.0, 3.0, 25.0]], np.float32)
    my = np.array([[2.0, 3.0, 2.0]], np.float32)
    out = remap_bilinear(img, mx, my, border_value=0.0)
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]])


EUROC_SNIPPET = """%YAML:1.0
Camera.fx: 435.2046959714599
LEFT.height: 480
LEFT.width: 752
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0]
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
LEFT.R:  !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [0.999966347530033, -0.001422739138722922, 0.008079580483432283,
          0.001365741834644127, 0.9999741760894847, 0.007055629199258132,
          -0.008089410156878961, -0.007044357138835809, 0.9999424675829176]
LEFT.P:  !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2046959714599, 0, 367.4517211914062, 0,  0, 435.2046959714599, 252.2008514404297, 0,  0, 0, 1, 0]
RIGHT.height: 480
RIGHT.width: 752
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28368365, 0.07451284, -0.00010473, -3.555907e-05, 0.0]
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0.0, 0.0, 1]
RIGHT.R:  !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [0.9999633526194376, -0.003625811871560086, 0.007755443660172947,
          0.003680398547259526, 0.9999684752771629, -0.007035845251224894,
          -0.007729688520722713, 0.007064130529506649, 0.999945173484644]
RIGHT.P:  !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2046959714599, 0, 367.4517211914062, -47.90639384423901, 0, 435.2046959714599, 252.2008514404297, 0, 0, 0, 1, 0]
"""


@pytest.fixture
def euroc_yaml(tmp_path):
    p = tmp_path / "euroc_stereo.yaml"
    p.write_text(EUROC_SNIPPET)
    return str(p)


def test_yaml_opencv_matrix_parsing(euroc_yaml):
    d = load_settings_raw(euroc_yaml)
    assert d["Camera.fx"] == pytest.approx(435.2046959714599)
    assert d["LEFT.K"].shape == (3, 3)
    assert d["LEFT.K"][0, 0] == pytest.approx(458.654)
    assert d["LEFT.D"].shape == (1, 5)
    assert d["LEFT.P"].shape == (3, 4)
    assert d["RIGHT.R"].shape == (3, 3)
    assert d["RIGHT.P"][0, 3] == pytest.approx(-47.90639384423901)
    assert has_rectification(d)


def test_stereo_rectifier_from_euroc_calibration(euroc_yaml):
    rect = StereoRectifier.from_settings_yaml(euroc_yaml)
    mx, my = rect.maps_l
    assert mx.shape == (480, 752)
    # the map must point inside the raw image over the central region
    c = mx[200:280, 300:450], my[200:280, 300:450]
    assert np.all(c[0] > 0) and np.all(c[0] < 751)
    assert np.all(c[1] > 0) and np.all(c[1] < 479)

    # rectifying a raw image produces a same-size image with real content
    rng = np.random.default_rng(2)
    raw_l = rng.uniform(0, 255, (480, 752)).astype(np.float32)
    raw_r = rng.uniform(0, 255, (480, 752)).astype(np.float32)
    rl, rr = rect(raw_l, raw_r)
    assert rl.shape == (480, 752) and rr.shape == (480, 752)
    assert rl[240, 376] != 0.0


def test_rectification_aligns_epipolar_rows(euroc_yaml):
    """End-to-end property: a world point seen by both *raw* cameras lands on
    the same row after rectification (the whole point of the exercise).

    We synthesize the raw-camera geometry from the calibration itself:
    cam0/cam1 extrinsics are recovered from R_l, R_r and the rectified
    baseline encoded in RIGHT.P[0,3].
    """
    d = load_settings_raw(euroc_yaml)
    K_l, D_l = d["LEFT.K"], d["LEFT.D"].ravel()
    K_r, D_r = d["RIGHT.K"], d["RIGHT.D"].ravel()
    R_l, R_r = d["LEFT.R"], d["RIGHT.R"]
    P_new = d["LEFT.P"][:3, :3]
    baseline = -d["RIGHT.P"][0, 3] / d["RIGHT.P"][0, 0]

    def distort_project(Kc, Dc, pc):
        x, y = pc[0] / pc[2], pc[1] / pc[2]
        r2 = x * x + y * y
        k1, k2, p1, p2, k3 = Dc
        radial = 1 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        return np.array([Kc[0, 0] * xd + Kc[0, 2], Kc[1, 1] * yd + Kc[1, 2]])

    rng = np.random.default_rng(3)
    rows_delta = []
    for _ in range(20):
        # a point in the RECTIFIED left frame, at moderate depth
        Xrect = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.3, 0.3),
                          rng.uniform(2.0, 6.0)])
        # raw-camera coordinates: rectification maps raw->rect by R, so
        # raw = R^T rect; right raw camera additionally offset by baseline
        X_raw_l = R_l.T @ Xrect
        X_raw_r = R_r.T @ (Xrect - np.array([baseline, 0, 0]))
        uv_raw_l = distort_project(K_l, D_l, X_raw_l)
        uv_raw_r = distort_project(K_r, D_r, X_raw_r)
        # rectified pixel of the same ray (ground truth by construction)
        uv_rect_l = (P_new @ (Xrect / Xrect[2]))[:2]
        uv_rect_r = (P_new @ ((Xrect - np.array([baseline, 0, 0])) / Xrect[2]))[:2]
        # the maps must send the rectified pixel back to the raw pixel
        rect = StereoRectifier.from_settings(d)
        mxl, myl = rect.maps_l
        mxr, myr = rect.maps_r
        ul, vl = int(round(uv_rect_l[0])), int(round(uv_rect_l[1]))
        ur, vr = int(round(uv_rect_r[0])), int(round(uv_rect_r[1]))
        if not (0 <= ul < 752 and 0 <= vl < 480 and 0 <= ur < 752 and 0 <= vr < 480):
            continue
        # sub-pixel map error from rounding the query pixel is ~1px of map
        # smoothness; the consistency we need is a few pixels
        assert abs(mxl[vl, ul] - uv_raw_l[0]) < 2.0
        assert abs(myl[vl, ul] - uv_raw_l[1]) < 2.0
        assert abs(mxr[vr, ur] - uv_raw_r[0]) < 2.0
        assert abs(myr[vr, ur] - uv_raw_r[1]) < 2.0
        rows_delta.append(uv_rect_l[1] - uv_rect_r[1])
    assert len(rows_delta) >= 10
    # rectified rows agree (pure-horizontal epipolar lines)
    assert np.max(np.abs(rows_delta)) < 1e-6
