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


def pack_host_blob(bundle, tcw_stats, visible):
    """Concatenate the per-frame host outputs into ONE flat f32 array so
    the tracker pays a single device->host round trip (three separate
    pulls cost ~2 extra tunnel latencies per frame)."""
    return jnp.concatenate([bundle.reshape(-1), tcw_stats,
                            visible.astype(jnp.float32)])


def unpack_host_blob(blob, n_kp: int):
    """Host-side split of pack_host_blob: (bundle (N,10), tcw_stats (21,),
    visible (P,) bool)."""
    b = blob[: n_kp * 10].reshape(n_kp, 10)
    ts = blob[n_kp * 10: n_kp * 10 + 21]
    vis = blob[n_kp * 10 + 21:] > 0.5
    return b, ts, vis


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


# ---------------------------------------------------------------------------
# The production fused frame program (round 5): TWO-stage tracking against
# the device-resident local map (frontend/device_map.DeviceLocalMap).
#
# Replaces the staged TrackWithMotionModel -> TrackLocalMap host loop
# (reference: Tracking.cc:1399-1509 then :1514-1595) with ONE dispatch:
#   stage 1: wide projection search at the motion-model predicted pose
#            (the reference's last-frame search radius th=7 stereo / 15
#            mono, ratio 0.9) + pose GN,
#   stage 2: tight th=1 local-map search at the refined pose (reference
#            SearchLocalPoints radii) + pose GN.
# The reference's stage-1 candidate set is the LAST FRAME's points; ours
# is the full local map (a superset in SLAM mode — temporal VO points
# exist only in localization-only mode, Tracking.cc:1297-1302, which keeps
# the staged path). Host receives a small result bundle; full keypoint
# arrays are pulled only on keyframe creation or fallback.
# ---------------------------------------------------------------------------

def _unpack_pad(packed):
    return (packed[:, 0:3], packed[:, 3:6], packed[:, 6], packed[:, 7])


def _two_stage_track(kp, xy_und, ur, depth, Tcw_pred, packed, mp_desc,
                     mp_valid, orb, cam, th_depth, th2, check_stereo):
    mp_pos, mp_normal, mp_min, mp_max = _unpack_pad(packed)
    n_levels = orb.n_levels
    log_scale = float(np.log(orb.scale_factor))
    scale_factors = jnp.asarray(
        [orb.scale_factor ** i for i in range(n_levels)], jnp.float32)
    inv_sigma2 = 1.0 / (scale_factors ** 2)
    n_kp = kp.xy.shape[0]
    P = mp_pos.shape[0]
    obs = jnp.concatenate([xy_und, ur[:, None]], axis=1)

    def match_to_kp(m):
        """MatchResult over points -> per-keypoint pad slot (-1 none)."""
        return jnp.full((n_kp,), -1, jnp.int32).at[m.idx].set(
            jnp.where(m.ok, jnp.arange(P, dtype=jnp.int32), -1), mode="drop")

    def gn(Tcw0, kp_slot):
        has = kp_slot >= 0
        pts = mp_pos[jnp.where(has, kp_slot, 0)]
        return pose_optimization(Tcw0, pts, obs, kp.octave, has, cam,
                                 inv_sigma2)

    # stage 1: wide search at the predicted pose (reference radius th=7
    # stereo / 15 mono maps to search_by_projection th=radius/4 exactly
    # like the staged tracker's call)
    th1 = (7.0 if check_stereo else 15.0) / 4.0
    proj1 = M.project_and_cull(mp_pos, mp_valid, mp_normal, mp_min, mp_max,
                               Tcw_pred, cam, n_levels, log_scale,
                               view_cos_limit=0.5)
    m1 = M.search_by_projection(
        proj1, mp_desc, xy_und, ur, kp.desc, kp.valid, kp.octave,
        scale_factors, th=th1, max_dist=M.TH_HIGH, ratio=0.9,
        check_stereo=check_stereo)
    Tcw1, _, n_in1 = gn(Tcw_pred, match_to_kp(m1))

    # stage 2: tight local-map search at the refined pose
    proj2 = M.project_and_cull(mp_pos, mp_valid, mp_normal, mp_min, mp_max,
                               Tcw1, cam, n_levels, log_scale,
                               view_cos_limit=0.5)
    m2 = M.search_by_projection(
        proj2, mp_desc, xy_und, ur, kp.desc, kp.valid, kp.octave,
        scale_factors, th=th2, max_dist=M.TH_HIGH, ratio=0.8,
        check_stereo=check_stereo)
    kp_slot = match_to_kp(m2)
    Tcw2, inliers, n_in2 = gn(Tcw1, kp_slot)

    matched = (kp_slot >= 0) & inliers
    close = kp.valid & (depth > 0) & (depth < th_depth)
    stats = jnp.stack([
        n_in2.astype(jnp.float32),
        jnp.sum(matched & close).astype(jnp.float32),
        jnp.sum(close & ~matched).astype(jnp.float32),
        jnp.sum(kp.valid).astype(jnp.float32),
        n_in1.astype(jnp.float32),
    ])
    visible = proj1.visible | proj2.visible
    # pack everything the host needs per frame into ONE pullable bundle
    # (tunnel round trips cost more than bytes): per-keypoint columns
    # [x, y, ur, depth, response, angle, octave, valid, slot, inlier]
    # + a 21-float [Tcw(16), stats(5)] vector. Descriptors stay on device
    # (pulled only on keyframe creation / staged fallback).
    bundle = jnp.stack([
        xy_und[:, 0], xy_und[:, 1], ur, depth, kp.response, kp.angle,
        kp.octave.astype(jnp.float32), kp.valid.astype(jnp.float32),
        kp_slot.astype(jnp.float32), inliers.astype(jnp.float32),
    ], axis=-1)
    tcw_stats = jnp.concatenate([Tcw2.reshape(16), stats])
    return bundle, tcw_stats, visible


@functools.partial(jax.jit,
                   static_argnames=("orb", "cam", "th_depth", "th2"))
def fused_stereo_frame(img_pair, Tcw_pred, packed, mp_desc, mp_valid,
                       orb: OrbConfig, cam: PinholeCamera, th_depth: float,
                       th2: float = 1.0):
    """One-dispatch stereo frame: L/R extraction + SAD stereo matching +
    two-stage local-map tracking. img_pair: (2, H, W) stacked L/R (ONE
    host->device transfer; uint8 welcome — the cast to f32 rides the
    first fusion). Returns (host_blob (see pack_host_blob), desc (N,8)
    device ref)."""
    from ..ops.orb import extract_orb_batch
    from ..ops.stereo import stereo_match
    from ..ops.orb import Keypoints

    img_pair = img_pair.astype(jnp.float32)
    img_l, img_r = img_pair[0], img_pair[1]
    pair = extract_orb_batch(img_pair, orb)
    kp = Keypoints(*[a[0] for a in pair])
    kp_r = Keypoints(*[a[1] for a in pair])
    ur, depth = stereo_match(kp, kp_r, img_l, img_r, cam, orb)
    xy_und = cam.undistort_pixels(kp.xy)
    bundle, tcw_stats, visible = _two_stage_track(
        kp, xy_und, ur, depth, Tcw_pred, packed, mp_desc,
        mp_valid, orb, cam, th_depth, th2, check_stereo=True)
    return pack_host_blob(bundle, tcw_stats, visible), kp.desc


@functools.partial(jax.jit, static_argnames=("orb", "cam"))
def fused_mono_frame(img, Tcw_pred, packed, mp_desc, mp_valid,
                     orb: OrbConfig, cam: PinholeCamera):
    """One-dispatch monocular frame (no stereo channel; close-point stats
    are zero). Returns the same (host_blob, desc) as fused_stereo_frame."""
    img = img.astype(jnp.float32)
    kp = extract_orb(img, orb)
    xy_und = cam.undistort_pixels(kp.xy)
    n = kp.xy.shape[0]
    ur = jnp.full((n,), -1.0, jnp.float32)
    depth = jnp.full((n,), -1.0, jnp.float32)
    bundle, tcw_stats, visible = _two_stage_track(
        kp, xy_und, ur, depth, Tcw_pred, packed, mp_desc,
        mp_valid, orb, cam, th_depth=jnp.inf, th2=1.0, check_stereo=False)
    return pack_host_blob(bundle, tcw_stats, visible), kp.desc


@functools.partial(jax.jit,
                   static_argnames=("orb", "cam", "th_depth", "th2"))
def fused_rgbd_frame(img, depth_map, Tcw_pred, packed, mp_desc, mp_valid,
                     orb: OrbConfig, cam: PinholeCamera, th_depth: float,
                     th2: float = 3.0):
    """One-dispatch RGB-D frame: extraction + virtual right coordinate from
    the depth map (reference: Frame::ComputeStereoFromRGBD, Frame.cc:1179)
    + two-stage tracking (th2=3 for RGB-D, reference Tracking.cc:1943-1944).
    """
    from ..ops.stereo import depth_to_stereo

    img = img.astype(jnp.float32)
    kp = extract_orb(img, orb)
    xy_und = cam.undistort_pixels(kp.xy)
    ur, depth = depth_to_stereo(kp, xy_und, depth_map, cam)
    bundle, tcw_stats, visible = _two_stage_track(
        kp, xy_und, ur, depth, Tcw_pred, packed, mp_desc,
        mp_valid, orb, cam, th_depth, th2, check_stereo=True)
    return pack_host_blob(bundle, tcw_stats, visible), kp.desc


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
