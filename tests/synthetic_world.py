"""Synthetic multi-plane world renderer for end-to-end SLAM tests.

Renders a camera moving through a scene of textured fronto-parallel planes
by exact ray-plane intersection + bilinear texture sampling, providing
pixel-accurate ground-truth trajectories without any dataset files
(SURVEY.md section 4: synthetic-scene integration tests with known
trajectory and bounded ATE).
"""
from __future__ import annotations

import numpy as np


def make_texture(size=2048, seed=0, n_blobs=4000, blur=1.0):
    rng = np.random.default_rng(seed)
    img = np.full((size, size), 60.0, np.float32)
    ys = rng.integers(0, size - 12, n_blobs)
    xs = rng.integers(0, size - 12, n_blobs)
    for y, x in zip(ys, xs):
        s = rng.integers(3, 11)
        img[y:y + s, x:x + s] = rng.uniform(20, 240)
    if blur > 0:
        try:
            from scipy.ndimage import gaussian_filter
            img = gaussian_filter(img, blur)
        except ImportError:
            pass
    return img.astype(np.float32)


class PlanesWorld:
    """Two textured TILTED planes at different depths.

    The planes are z = z0 + ax*x + ay*y, giving a wide continuous 1/z
    spread across the field of view — a fronto-parallel pair is nearly
    degenerate for the tx/yaw sliding mode of pose estimation (residuals
    stay sub-pixel while the pose drifts along the compensated direction),
    which is a property of the scene, not the estimator. Set tilt=0 for the
    degenerate variant, or z_near == z_far and tilt=0 for a pure-homography
    scene (monocular H-initialization path).
    """

    def __init__(self, fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                 width=640, height=480, z_near=6.0, z_far=10.0,
                 split_x=0.0, texture_seed=0, tex_scale=100.0,
                 tilt=(0.25, 0.15)):
        # tex_scale must keep every visible world point inside the texture:
        # half-FOV tan = 0.64 -> at z=10 the frustum half-width is 6.4, so
        # with camera |x| <= ~1.5 the world span is ~ +-8 units; at 100
        # px/unit the 2048px texture covers +-10.2 units (wrapping would
        # duplicate texture and cause false feature matches).
        self.K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
        self.width, self.height = width, height
        self.z_near, self.z_far = z_near, z_far
        self.split_x = split_x
        self.tex = make_texture(seed=texture_seed)
        self.tex_scale = tex_scale  # texture pixels per world unit
        self.tilt = tilt            # (ax, ay) plane slopes dz/dx, dz/dy

    def _sample_texture(self, xw, yw, zw):
        # offset per plane so the two planes carry different texture regions
        size = self.tex.shape[0]
        off = np.where(zw > (self.z_near + self.z_far) / 2, size // 2, 0)
        tx = xw * self.tex_scale + size // 2 + off * 0.5
        ty = yw * self.tex_scale + size // 2
        # wrap (tile) so the world is textured everywhere
        x0 = np.floor(tx).astype(np.int64)
        y0 = np.floor(ty).astype(np.int64)
        ax = (tx - x0).astype(np.float32)
        ay = (ty - y0).astype(np.float32)
        x0m = np.mod(x0, size)
        y0m = np.mod(y0, size)
        x1m = np.mod(x0 + 1, size)
        y1m = np.mod(y0 + 1, size)
        t = self.tex
        return ((1 - ax) * (1 - ay) * t[y0m, x0m] + ax * (1 - ay) * t[y0m, x1m]
                + (1 - ax) * ay * t[y1m, x0m] + ax * ay * t[y1m, x1m])

    def render(self, Tcw: np.ndarray) -> np.ndarray:
        """Render a (H, W) float32 grayscale image from world->cam pose."""
        H, W = self.height, self.width
        us, vs = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        # camera ray directions in world frame
        d_c = np.stack([(us - self.cx) / self.fx, (vs - self.cy) / self.fy,
                        np.ones_like(us)], axis=-1)
        R = Tcw[:3, :3]
        t = Tcw[:3, 3]
        C = -R.T @ t
        d_w = d_c @ R  # (H, W, 3) = R^T d_c

        p, lam, _ = self._intersect(C, d_w)
        img = self._sample_texture(p[..., 0], p[..., 1], p[..., 2])
        img = np.where(lam > 0, img, 0.0)
        return img.astype(np.float32)

    def _intersect(self, C, d_w):
        ax, ay = self.tilt

        def hit(z0):
            # plane z = z0 + ax*x + ay*y
            den = d_w[..., 2] - ax * d_w[..., 0] - ay * d_w[..., 1]
            num = z0 + ax * C[0] + ay * C[1] - C[2]
            lam = num / np.where(np.abs(den) < 1e-9, 1e-9, den)
            p = C[None, None, :] + lam[..., None] * d_w
            return p, lam

        p_near, lam_near = hit(self.z_near)
        p_far, lam_far = hit(self.z_far)
        use_near = p_near[..., 0] < self.split_x
        p = np.where(use_near[..., None], p_near, p_far)
        lam = np.where(use_near, lam_near, lam_far)
        return p, lam, use_near

    def render_depth(self, Tcw: np.ndarray) -> np.ndarray:
        """Depth map (z in camera frame) for RGB-D tests."""
        H, W = self.height, self.width
        us, vs = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        d_c = np.stack([(us - self.cx) / self.fx, (vs - self.cy) / self.fy,
                        np.ones_like(us)], axis=-1)
        R = Tcw[:3, :3]
        t = Tcw[:3, 3]
        C = -R.T @ t
        d_w = d_c @ R

        p, lam, _ = self._intersect(C, d_w)
        # camera-frame depth of the hit point
        pc = p @ R.T + t
        return np.maximum(pc[..., 2], 0.0).astype(np.float32)


def smooth_trajectory(n_frames: int, step=0.04, yaw_amp=0.02, y_amp=0.05, seed=0):
    """Ground-truth world->cam poses for a sideways-dominant smooth path."""
    from orb_slam2_detailed_comments_tpu.geometry import exp_so3, make_se3
    import jax.numpy as jnp

    poses = []
    for i in range(n_frames):
        x = step * i
        y = y_amp * np.sin(2 * np.pi * i / max(n_frames, 1) * 2)
        z = 0.0
        yaw = yaw_amp * np.sin(2 * np.pi * i / max(n_frames, 1))
        R = np.asarray(exp_so3(jnp.asarray([0.0, yaw, 0.0], dtype=jnp.float32)))
        C = np.array([x, y, z], np.float32)
        t = -R @ C
        poses.append(np.asarray(make_se3(jnp.asarray(R), jnp.asarray(t)), np.float32))
    return np.stack(poses)


class CylinderWorld:
    """Camera inside a textured cylinder (axis = world y).

    Unlike PlanesWorld, every yaw direction sees texture, which is what a
    rendered LOOP sequence needs: a camera circling with 360 degrees of yaw
    revisits its starting view with full feature overlap (the reference's
    loop-closing path is exercised on exactly such trajectories, e.g.
    KITTI 00).
    """

    def __init__(self, fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                 width=320, height=240, radius=8.0, texture_seed=0):
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
        self.width, self.height = width, height
        self.radius = radius
        self.tex = make_texture(seed=texture_seed, n_blobs=12000)
        # make the texture azimuthally DISTINCTIVE (like a real street):
        # statistically uniform blobs give near-identical BoW histograms at
        # every azimuth, which no vocabulary can discriminate. Superimpose
        # seeded large-scale landmarks + a contrast modulation around the
        # circumference so each viewing direction has a recognizable word
        # distribution.
        size = self.tex.shape[0]
        rng = np.random.default_rng(texture_seed + 7)
        for _ in range(24):
            x0 = rng.integers(0, size)
            y0 = rng.integers(0, size - 160)
            w = int(rng.integers(40, 140))
            h = int(rng.integers(40, 140))
            val = rng.uniform(10, 250)
            xs = (np.arange(x0, x0 + w) % size)
            self.tex[y0:y0 + h, xs] = 0.5 * self.tex[y0:y0 + h, xs] + 0.5 * val
        mod = 0.65 + 0.35 * np.sin(2 * np.pi * np.arange(size) / size * 3)
        self.tex = (self.tex - 128.0) * mod[None, :] + 128.0
        self.tex = np.clip(self.tex, 0, 255).astype(np.float32)
        # texture pixels per world unit: one exact wrap of the texture
        # around the circumference (no duplicated features at the seam)
        self.tex_scale = self.tex.shape[0] / (2 * np.pi * radius)

    def _rays(self, Tcw):
        us, vs = np.meshgrid(np.arange(self.width, dtype=np.float32),
                             np.arange(self.height, dtype=np.float32))
        d_c = np.stack([(us - self.cx) / self.fx, (vs - self.cy) / self.fy,
                        np.ones_like(us)], axis=-1)
        R = Tcw[:3, :3]
        t = Tcw[:3, 3]
        C = -R.T @ t
        return C, d_c @ R

    def _hit(self, C, d_w):
        a = d_w[..., 0] ** 2 + d_w[..., 2] ** 2
        b = 2.0 * (C[0] * d_w[..., 0] + C[2] * d_w[..., 2])
        c = C[0] ** 2 + C[2] ** 2 - self.radius ** 2
        disc = np.maximum(b * b - 4 * a * c, 0.0)
        lam = (-b + np.sqrt(disc)) / np.where(a < 1e-12, 1e-12, 2 * a)
        p = C[None, None, :] + lam[..., None] * d_w
        return p, lam

    def render(self, Tcw):
        C, d_w = self._rays(Tcw)
        p, lam = self._hit(C, d_w)
        size = self.tex.shape[0]
        theta = np.arctan2(p[..., 0], p[..., 2])  # (-pi, pi]
        tx = theta * self.radius * self.tex_scale
        ty = p[..., 1] * self.tex_scale + size // 2
        x0 = np.floor(tx).astype(np.int64)
        y0 = np.floor(ty).astype(np.int64)
        ax = (tx - x0).astype(np.float32)
        ay = (ty - y0).astype(np.float32)
        x0m, x1m = np.mod(x0, size), np.mod(x0 + 1, size)
        y0m, y1m = np.mod(y0, size), np.mod(y0 + 1, size)
        t = self.tex
        img = ((1 - ax) * (1 - ay) * t[y0m, x0m] + ax * (1 - ay) * t[y0m, x1m]
               + (1 - ax) * ay * t[y1m, x0m] + ax * ay * t[y1m, x1m])
        return np.where(lam > 0, img, 0.0).astype(np.float32)

    def render_depth(self, Tcw):
        C, d_w = self._rays(Tcw)
        p, lam = self._hit(C, d_w)
        R = Tcw[:3, :3]
        t = Tcw[:3, 3]
        pc = p @ R.T + t
        return np.maximum(pc[..., 2], 0.0).astype(np.float32)


def loop_trajectory(n_frames: int, path_radius: float = 2.0,
                    laps: float = 1.0, overlap: int = 6):
    """Ground-truth world->cam poses circling with outward (radial) view:
    the final ``overlap`` frames re-observe the first views, closing the
    loop. Yaw sweeps 360 deg per lap."""
    poses = []
    total = n_frames
    for i in range(total):
        phi = 2 * np.pi * laps * i / max(total - overlap, 1)
        c, s = np.cos(phi), np.sin(phi)
        Rwc = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], np.float32)
        C = path_radius * np.array([s, 0.0, c], np.float32)
        Rcw = Rwc.T
        t = -Rcw @ C
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rcw
        T[:3, 3] = t
        poses.append(T)
    return np.stack(poses)


def route_trajectory(n_frames: int, radius: float, r_out: float = 0.5,
                     r_in: float = 0.28, y_amp_frac: float = 0.02,
                     retrace_frac: float = 0.12):
    """KITTI-00-class ROUTE (not a plain circle): four phases inside a
    CylinderWorld of `radius` —

      P1 (20%): lap at r_out*radius           -> first loop closure
      P2 (25%): spiral in to r_in*radius       (exploration: new scales)
      P3 (20%): lap at r_in*radius             -> second loop closure
      P4 (35%): spiral back out; the final `retrace_frac` of the route
                re-traverses P1's azimuths at r_out -> third loop closure

    The changing orbit radius makes revisited azimuths appear at different
    scales, so keyframe culling cannot collapse the route onto one ring —
    live keyframes accumulate into the hundreds (the scale regime of
    OptimizeEssentialGraph on KITTI 00, reference Optimizer.cc:1050-1381).
    Gentle height modulation adds viewpoint diversity. Returns (N,4,4)
    world->cam poses with radial (outward) viewing like loop_trajectory.
    """
    t = np.arange(n_frames, dtype=np.float64) / max(n_frames - 1, 1)
    # azimuth: 4 laps total, with the last retrace_frac matching P1 angles
    phi = 2 * np.pi * 4.0 * t

    def smoothstep(x):
        x = np.clip(x, 0.0, 1.0)
        return x * x * (3 - 2 * x)

    b1, b2, b3 = 0.20, 0.45, 0.65
    r = np.empty_like(t)
    r[:] = r_out
    m = (t >= b1) & (t < b2)          # spiral in
    r[m] = r_out + (r_in - r_out) * smoothstep((t[m] - b1) / (b2 - b1))
    m = (t >= b2) & (t < b3)          # inner lap
    r[m] = r_in
    m = t >= b3                       # spiral out
    r[m] = r_in + (r_out - r_in) * smoothstep((t[m] - b3) / (1.0 - b3 - retrace_frac * 0.5))
    r = np.clip(r, min(r_in, r_out), max(r_in, r_out)) * radius
    y = y_amp_frac * radius * np.sin(2 * np.pi * 3.0 * t)

    poses = []
    for i in range(n_frames):
        s, c = np.sin(phi[i]), np.cos(phi[i])
        Rwc = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]],
                       np.float32)
        C = np.array([r[i] * s, y[i], r[i] * c], np.float32)
        Rcw = Rwc.T
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rcw
        T[:3, 3] = -Rcw @ C
        poses.append(T)
    return np.stack(poses)
