"""The flagship per-frame device program: one fused tracking step.

This is the composite the whole system is built around — the reference's
per-frame hot path (Frame construction -> SearchByProjection ->
PoseOptimization, reference: Tracking.cc:428-790 call stack) expressed as a
single jitted program so XLA can fuse and schedule the entire frame:

  image -> ORB pyramid/FAST/BRIEF -> project local map -> masked MXU
  Hamming match -> IRLS pose GN -> (pose, matches, inliers)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import PinholeCamera
from ..ops import matching as M
from ..ops.orb import extract_orb
from ..optim.pose_gn import pose_optimization
from ..utils.config import OrbConfig

LOCAL_MP_CAP = 4096


@functools.partial(jax.jit, static_argnames=("orb", "cam"))
def mono_tracking_step(img, Tcw_pred, mp_pos, mp_normal, mp_min_dist,
                       mp_max_dist, mp_desc, mp_valid, orb: OrbConfig,
                       cam: PinholeCamera):
    """Extract features, match the local map by projection, optimize the pose.

    Returns (Tcw, match_idx, match_ok, n_inliers, keypoints).
    """
    kp = extract_orb(img, orb)
    xy_und = cam.undistort_pixels(kp.xy)

    n_levels = orb.n_levels
    log_scale = float(np.log(orb.scale_factor))
    scale_factors = jnp.asarray([orb.scale_factor ** i for i in range(n_levels)], jnp.float32)
    inv_sigma2 = 1.0 / (scale_factors ** 2)

    proj = M.project_and_cull(
        mp_pos, mp_valid, mp_normal, mp_min_dist, mp_max_dist,
        Tcw_pred, cam, n_levels, log_scale, view_cos_limit=0.5)
    m = M.search_by_projection(
        proj, mp_desc, xy_und, jnp.full((kp.xy.shape[0],), -1.0), kp.desc,
        kp.valid, kp.octave, scale_factors, th=1.0,
        max_dist=M.TH_HIGH, ratio=0.8)

    # build pose-GN edges: keypoint -> matched map point
    n_kp = kp.xy.shape[0]
    kp_mp = jnp.full((n_kp,), -1, jnp.int32).at[m.idx].set(
        jnp.where(m.ok, jnp.arange(mp_pos.shape[0], dtype=jnp.int32), -1),
        mode="drop")
    has = kp_mp >= 0
    pts = mp_pos[jnp.where(has, kp_mp, 0)]
    obs = jnp.concatenate([xy_und, jnp.full((n_kp, 1), -1.0)], axis=1)
    Tcw, inliers, n_in = pose_optimization(
        Tcw_pred, pts, obs, kp.octave, has, cam, inv_sigma2)
    return Tcw, m.idx, m.ok, n_in, kp


@functools.partial(jax.jit, static_argnames=("orb", "cam"))
def stereo_tracking_step(img_l, img_r, Tcw_pred, mp_pos, mp_normal,
                         mp_min_dist, mp_max_dist, mp_desc, mp_valid,
                         orb: OrbConfig, cam: PinholeCamera):
    """The fused stereo per-frame program (KITTI geometry): ONE dispatch for
    L/R ORB extraction (leading-axis batch — the reference's two extraction
    threads, Frame.cc:158-164), row-bucket stereo SAD matching
    (Frame::ComputeStereoMatches, Frame.cc:880-1176), local-map projection
    matching with the right-coordinate check, and stereo pose GN
    ((u,v,uR) residuals).

    Returns (Tcw, match_idx, match_ok, n_inliers, ur, depth, keypoints)."""
    from ..ops.orb import extract_orb_batch
    from ..ops.stereo import stereo_match
    from ..state.frame import FrameData  # noqa: F401 (doc parity)
    from ..ops.orb import Keypoints

    pair = extract_orb_batch(jnp.stack([img_l, img_r]), orb)
    kp = Keypoints(*[a[0] for a in pair])
    kp_r = Keypoints(*[a[1] for a in pair])
    ur, depth = stereo_match(kp, kp_r, img_l, img_r, cam, orb)
    xy_und = cam.undistort_pixels(kp.xy)

    n_levels = orb.n_levels
    log_scale = float(np.log(orb.scale_factor))
    scale_factors = jnp.asarray([orb.scale_factor ** i for i in range(n_levels)], jnp.float32)
    inv_sigma2 = 1.0 / (scale_factors ** 2)

    proj = M.project_and_cull(
        mp_pos, mp_valid, mp_normal, mp_min_dist, mp_max_dist,
        Tcw_pred, cam, n_levels, log_scale, view_cos_limit=0.5)
    m = M.search_by_projection(
        proj, mp_desc, xy_und, ur, kp.desc,
        kp.valid, kp.octave, scale_factors, th=1.0,
        max_dist=M.TH_HIGH, ratio=0.8, check_stereo=True)

    n_kp = kp.xy.shape[0]
    kp_mp = jnp.full((n_kp,), -1, jnp.int32).at[m.idx].set(
        jnp.where(m.ok, jnp.arange(mp_pos.shape[0], dtype=jnp.int32), -1),
        mode="drop")
    has = kp_mp >= 0
    pts = mp_pos[jnp.where(has, kp_mp, 0)]
    obs = jnp.concatenate([xy_und, ur[:, None]], axis=1)
    Tcw, inliers, n_in = pose_optimization(
        Tcw_pred, pts, obs, kp.octave, has, cam, inv_sigma2)
    return Tcw, m.idx, m.ok, n_in, ur, depth, kp


def example_tracking_args(orb: OrbConfig = None, cam: PinholeCamera = None,
                          height=480, width=640, seed=0):
    """Representative inputs for compile checks and benchmarks."""
    orb = orb or OrbConfig()
    cam = cam or PinholeCamera(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                               width=width, height=height)
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.uniform(0, 255, (height, width)), jnp.float32)
    Tcw = jnp.eye(4, dtype=jnp.float32)
    P = LOCAL_MP_CAP
    pos = jnp.asarray(rng.uniform([-3, -3, 2], [3, 3, 9], (P, 3)), jnp.float32)
    normal = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    dists = jnp.linalg.norm(pos, axis=-1)
    desc = jnp.asarray(rng.integers(0, 2 ** 32, (P, 8), dtype=np.uint32))
    return (img, Tcw, pos, normal, 0.3 * dists, 3.0 * dists, desc,
            jnp.ones((P,), bool), orb, cam)
