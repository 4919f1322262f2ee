"""Pinhole camera model with radial-tangential distortion.

TPU-native replacement for the reference's cv::undistortPoints +
projection code (reference: src/Frame.cc:770-817 UndistortKeyPoints,
src/Frame.cc:529-620 isInFrustum). All ops are batched and jit-safe.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """Static camera intrinsics. Fields mirror the reference's YAML config
    keys Camera.{fx,fy,cx,cy,k1,k2,p1,p2,k3,bf} (reference: Tracking.cc:87-151)."""

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    bf: float = 0.0        # stereo baseline * fx (reference: Tracking.cc:154)
    width: int = 640
    height: int = 480

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def baseline(self):
        return self.bf / self.fx

    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))

    # -- projection ---------------------------------------------------------

    def project(self, pts_cam):
        """Camera-frame points (..., 3) -> pixel coords (..., 2). No distortion
        (the pipeline works on undistorted keypoints, like the reference)."""
        z = pts_cam[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = self.fx * pts_cam[..., 0] * inv_z + self.cx
        v = self.fy * pts_cam[..., 1] * inv_z + self.cy
        return jnp.stack([u, v], axis=-1)

    def project_stereo(self, pts_cam):
        """(..., 3) -> (..., 3) of (u, v, u_right) like the reference's stereo
        observation (reference: Optimizer.cc stereo edges use (u, v, uR))."""
        uv = self.project(pts_cam)
        z = pts_cam[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        ur = uv[..., 0] - self.bf * inv_z
        return jnp.concatenate([uv, ur[..., None]], axis=-1)

    def backproject(self, uv, depth):
        """Pixel (..., 2) + depth (...,) -> camera-frame points (..., 3).
        (reference: Frame::UnprojectStereo, Frame.cc:1220-1252)."""
        x = (uv[..., 0] - self.cx) / self.fx * depth
        y = (uv[..., 1] - self.cy) / self.fy * depth
        return jnp.stack([x, y, depth], axis=-1)

    # -- distortion ---------------------------------------------------------

    def distort_normalized(self, xy):
        """Apply distortion to normalized coords (..., 2)."""
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
        xd = x * radial + 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        yd = y * radial + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return jnp.stack([xd, yd], axis=-1)

    def undistort_pixels(self, uv, num_iters: int = 8):
        """Undistort pixel coords (..., 2) -> undistorted pixel coords.

        Fixed-point iteration exactly like cv::undistortPoints' default
        (which the reference calls in Frame::UndistortKeyPoints,
        Frame.cc:770-817) but batched and jit-safe.
        """
        if not self.has_distortion():
            return uv
        xd = (uv[..., 0] - self.cx) / self.fx
        yd = (uv[..., 1] - self.cy) / self.fy
        d = jnp.stack([xd, yd], axis=-1)
        xy = d
        for _ in range(num_iters):
            x, y = xy[..., 0], xy[..., 1]
            r2 = x * x + y * y
            radial = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
            dx = 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
            dy = self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
            xy = jnp.stack([(d[..., 0] - dx) / radial, (d[..., 1] - dy) / radial], axis=-1)
        u = xy[..., 0] * self.fx + self.cx
        v = xy[..., 1] * self.fy + self.cy
        return jnp.stack([u, v], axis=-1)

    def undistorted_bounds(self):
        """Undistorted image bounds (minx, maxx, miny, maxy), mirroring
        Frame::ComputeImageBounds (reference: Frame.cc:823-864)."""
        corners = jnp.array(
            [[0.0, 0.0], [self.width, 0.0], [0.0, self.height], [self.width, self.height]],
            dtype=jnp.float32,
        )
        und = self.undistort_pixels(corners)
        minx = jnp.minimum(und[0, 0], und[2, 0])
        maxx = jnp.maximum(und[1, 0], und[3, 0])
        miny = jnp.minimum(und[0, 1], und[1, 1])
        maxy = jnp.maximum(und[2, 1], und[3, 1])
        return minx, maxx, miny, maxy
