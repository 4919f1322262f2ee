"""Stereo left-right keypoint matching + RGB-D depth synthesis.

TPU-native replacement for Frame::ComputeStereoMatches
(reference: src/Frame.cc:880-1176) and ComputeStereoFromRGBD (:1179-1215).
The reference's per-row candidate buckets + per-keypoint SAD loop become:

  1. a dense masked (N_left x N_right) Hamming matrix (MXU) with row-band,
     octave-window and disparity-range masks,
  2. a batched 11x11 SAD refine: for each matched left keypoint we gather
     an 11x21 strip around the coarse right match and slide the left
     template over +-5 px (one einsum), then
  3. parabolic sub-pixel interpolation and the reference's median-SAD
     outlier cut.

Rectified inputs are assumed (the reference requires rectified stereo too).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .hamming import hamming_distance_matrix
from .matching import masked_best_match, INF_DIST
from .orb import Keypoints
from .pyramid import build_pyramid

SAD_HALF = 5   # 11x11 window (reference: Frame.cc w=5)
SLIDE = 5      # +-5 px search (reference: Frame.cc L=5)
TH_STEREO = 100  # ORBmatcher::TH_HIGH used for the coarse match


def _gather_patch(img, cx, cy, half_w, half_h):
    """Batched patch gather around integer centers: (M,) -> (M, 2*half_h+1, 2*half_w+1)."""
    H, W = img.shape
    padded = jnp.pad(img, ((half_h, half_h), (half_w, half_w)), mode="edge")

    def one(args):
        x, y = args
        return jax.lax.dynamic_slice(padded, (y, x), (2 * half_h + 1, 2 * half_w + 1))

    return jax.vmap(one)((cx, cy))


def stereo_match(kp_l: Keypoints, kp_r: Keypoints, img_l, img_r, cam,
                 orb) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match left keypoints to the right image; returns (u_right, depth),
    both (N,) float32 with -1 where unmatched. The SAD gather backend is
    resolved OUTSIDE the jit (an env read inside a jitted body is frozen
    into the first trace and silently ignored afterwards)."""
    import os
    default_pallas = "1" if jax.default_backend() == "tpu" else "0"
    use_pallas = os.environ.get("ORB_PATCH_PALLAS",
                                default_pallas) not in ("0", "false")
    return _stereo_match(kp_l, kp_r, img_l, img_r, cam, orb, use_pallas)


@functools.partial(jax.jit, static_argnames=("cam", "orb", "use_pallas"))
def _stereo_match(kp_l: Keypoints, kp_r: Keypoints, img_l, img_r, cam, orb,
                  use_pallas: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    sf = orb.scale_factor
    scale_r = jnp.asarray([sf ** i for i in range(orb.n_levels)], jnp.float32)[kp_r.octave]

    yl = kp_l.xy[:, 1]
    yr = kp_r.xy[:, 1]
    xl = kp_l.xy[:, 0]
    xr = kp_r.xy[:, 0]

    min_d = 0.0
    max_d = cam.bf / max(cam.baseline, 1e-6)  # = fx (reference: Frame.cc:912-915)

    row_ok = jnp.abs(yl[:, None] - yr[None, :]) <= 2.0 * scale_r[None, :]
    lvl_ok = jnp.abs(kp_l.octave[:, None] - kp_r.octave[None, :]) <= 1
    disp = xl[:, None] - xr[None, :]
    disp_ok = (disp >= min_d) & (disp <= max_d)
    mask = kp_l.valid[:, None] & kp_r.valid[None, :] & row_ok & lvl_ok & disp_ok

    dist = hamming_distance_matrix(kp_l.desc, kp_r.desc)
    m = masked_best_match(dist, mask, TH_STEREO)

    # ---- SAD sub-pixel refine on the full-resolution image ----
    xl_i = jnp.clip(jnp.round(xl).astype(jnp.int32), 0, img_l.shape[1] - 1)
    yl_i = jnp.clip(jnp.round(yl).astype(jnp.int32), 0, img_l.shape[0] - 1)
    xr_best = xr[m.idx]
    xr_i = jnp.clip(jnp.round(xr_best).astype(jnp.int32), 0, img_r.shape[1] - 1)

    if use_pallas:
        # the two vmapped dynamic_slice gathers were the bulk of the SAD
        # stage (XLA serializes them); the DMA patch kernel that already
        # replaced the ORB descriptor gathers (ops/pallas_patch.py) does
        # both in bulk. Valid keypoints carry a >=16 px extraction border,
        # so the un-clamped starts below stay in range and the values are
        # bit-identical to the edge-padded _gather_patch (round 4:
        # stereo step 11.7 -> ~9 ms).
        from .pallas_patch import patch_gather
        tmpl = patch_gather(
            img_l[None], jnp.stack([xl_i - SAD_HALF, yl_i - SAD_HALF], -1),
            psize=2 * SAD_HALF + 1)[:, 0]               # (N, 11, 11)
        G = 2 * (SAD_HALF + SLIDE) + 1
        strip = patch_gather(
            img_r[None],
            jnp.stack([xr_i - SAD_HALF - SLIDE, yl_i - SAD_HALF - SLIDE], -1),
            psize=G)[:, 0, SLIDE:SLIDE + 2 * SAD_HALF + 1, :]
    else:
        tmpl = _gather_patch(img_l, xl_i, yl_i, SAD_HALF, SAD_HALF)          # (N, 11, 11)
        strip = _gather_patch(img_r, xr_i, yl_i, SAD_HALF + SLIDE, SAD_HALF)  # (N, 11, 21)

    # normalize by center intensity like the reference (Frame.cc:1020-1033)
    tmpl = tmpl - tmpl[:, SAD_HALF, SAD_HALF][:, None, None]
    strip = strip - strip[:, SAD_HALF, SAD_HALF + SLIDE][:, None, None]

    def sad_at(offset):
        win = jax.lax.dynamic_slice_in_dim(strip, offset, 2 * SAD_HALF + 1, axis=2)
        return jnp.sum(jnp.abs(tmpl - win), axis=(1, 2))

    sads = jnp.stack([sad_at(o) for o in range(2 * SLIDE + 1)], axis=-1)  # (N, 11)
    best_off = jnp.argmin(sads, axis=-1)
    best_sad = jnp.min(sads, axis=-1)

    # parabola sub-pixel (reference: Frame.cc:1070-1083)
    om = jnp.clip(best_off, 1, 2 * SLIDE - 1)
    s_m1 = jnp.take_along_axis(sads, (om - 1)[:, None], axis=1)[:, 0]
    s_0 = jnp.take_along_axis(sads, om[:, None], axis=1)[:, 0]
    s_p1 = jnp.take_along_axis(sads, (om + 1)[:, None], axis=1)[:, 0]
    denom = s_m1 + s_p1 - 2.0 * s_0
    delta = jnp.where(jnp.abs(denom) > 1e-6, (s_m1 - s_p1) / (2.0 * jnp.maximum(denom, 1e-6)), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    u_r = xr_i.astype(jnp.float32) + (om - SLIDE).astype(jnp.float32) + delta

    disparity = xl - u_r
    ok = m.ok & (disparity > min_d) & (disparity < max_d)

    # median-SAD outlier cut (reference: Frame.cc:1145-1175 threshold
    # 1.5 * 1.4 * median)
    sad_valid = jnp.where(ok, best_sad, jnp.inf)
    med = jnp.median(jnp.where(jnp.isfinite(sad_valid), sad_valid, jnp.nan))
    med = jnp.nan_to_num(med, nan=jnp.inf)
    ok = ok & (best_sad <= 2.1 * med)

    disparity = jnp.where(disparity <= 0.01, 0.01, disparity)
    depth = cam.bf / disparity
    return (jnp.where(ok, u_r, -1.0), jnp.where(ok, depth, -1.0))


@functools.partial(jax.jit, static_argnames=("cam",))
def depth_to_stereo(kp: Keypoints, xy_und, depth_img, cam) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RGB-D: sample the depth map at the RAW keypoint positions and
    synthesize a virtual right coordinate from the UNDISTORTED u
    (reference: Frame::ComputeStereoFromRGBD, Frame.cc:1179-1215)."""
    H, W = depth_img.shape
    xi = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, H - 1)
    d = depth_img[yi, xi]
    ok = kp.valid & (d > 0.0)
    ur = xy_und[:, 0] - cam.bf / jnp.maximum(d, 1e-6)
    return (jnp.where(ok, ur, -1.0), jnp.where(ok, d, -1.0))
