"""Batched ORB feature extraction (pyramid FAST + IC-angle + rotated BRIEF).

TPU-native replacement for ORBextractor::operator()
(reference: src/ORBextractor.cc:1961-2084). Design differences from the
reference, chosen for XLA (static shapes, no host loops):

 * Dense FAST score maps per level instead of per-cell cv::FAST calls
   (reference :1424-1601).
 * The sequential quadtree rebalancing DistributeOctTree (reference
   :1050-1422) is replaced by *stratified round-robin top-k*: keypoints are
   ranked (rank_within_cell, -response) and the per-level budget taken in
   that order — every textured cell contributes its best corner before any
   cell contributes its second, which reproduces the quadtree's uniform
   spatial coverage property with a single sort.
 * Orientation is the same intensity-centroid statistic (reference
   :104-161) computed as a masked dense 31x31 patch reduction.
 * Descriptors use our own deterministic 256-pair pattern (ops/pattern.py)
   rotated per-keypoint and sampled with nearest-neighbor rounding on the
   7x7 sigma=2 blurred level image (reference :177-254, :2023).

All outputs are fixed-capacity arrays with a validity mask.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import OrbConfig
from .fast import fast_score_map, fast_score_dense, nms_3x3
from .pallas_fast import fast_pyramid_pallas, fast_pyramid_pallas_roll
from .pattern import brief_pattern, ic_angle_offsets, HALF_PATCH
from .pyramid import build_pyramid, gaussian_blur, features_per_level, pyramid_shapes

# Patch radius that safely contains the rotated BRIEF pattern
# (pattern offsets are clipped to radius 13; 13*sqrt(2) < 19).
DESC_RADIUS = 19
CELL_TOPK = 16  # max candidates kept per FAST grid cell


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one image (octave coords are level-0).

    Mirrors the per-frame keypoint state of the reference Frame
    (reference: src/Frame.h:340-372): mvKeys -> xy, octave/response/angle,
    mDescriptors -> desc, plus an explicit validity mask (TPU-first).
    """
    xy: jnp.ndarray        # (N, 2) float32, level-0 pixel coords (x, y)
    response: jnp.ndarray  # (N,) float32 FAST score
    octave: jnp.ndarray    # (N,) int32 pyramid level
    angle: jnp.ndarray     # (N,) float32 radians
    desc: jnp.ndarray      # (N, 8) uint32 packed 256-bit descriptors
    valid: jnp.ndarray     # (N,) bool

    @property
    def capacity(self):
        return self.xy.shape[0]


def _select_level_keypoints(score, budget: int, cell: int):
    """Stratified round-robin selection of `budget` keypoints from a dense
    NMS'd score map. Returns (xy int32 (budget, 2), response, valid)."""
    H, W = score.shape
    ch, cw = -(-H // cell), -(-W // cell)
    pad_h, pad_w = ch * cell - H, cw * cell - W
    s = jnp.pad(score, ((0, pad_h), (0, pad_w)))
    cells = s.reshape(ch, cell, cw, cell).transpose(0, 2, 1, 3).reshape(ch * cw, cell * cell)

    k = min(CELL_TOPK, cell * cell)
    vals, idx = jax.lax.top_k(cells, k)  # (C, k)
    cell_ids = jax.lax.broadcasted_iota(jnp.int32, (ch * cw, k), 0)
    ranks = jax.lax.broadcasted_iota(jnp.int32, (ch * cw, k), 1)
    ys = (cell_ids // cw) * cell + idx // cell
    xs = (cell_ids % cw) * cell + idx % cell

    vals = vals.reshape(-1)
    ys = ys.reshape(-1)
    xs = xs.reshape(-1)
    ranks = ranks.reshape(-1)
    cand_valid = vals > 0.0

    # order: (rank asc, score desc); invalid last. scores < 1e6.
    # (measured: full argsort beats lax.top_k here on v5e — 11.26 vs
    # 11.79 ms for the whole tracking step)
    key = ranks.astype(jnp.float32) * 1e6 - vals
    key = jnp.where(cand_valid, key, jnp.float32(jnp.inf))
    order = jnp.argsort(key)[:budget]
    return (
        jnp.stack([xs[order], ys[order]], axis=-1),
        vals[order],
        cand_valid[order],
    )


@functools.lru_cache(maxsize=None)
def _ic_weights_39():
    """IC-angle coordinate weights zero-padded from 31x31 to the 39x39
    descriptor patch so one per-keypoint patch slice serves both the
    orientation statistic and the descriptor sampling."""
    mask, xs, ys = ic_angle_offsets()
    pad = DESC_RADIUS - HALF_PATCH
    wx = np.pad(xs * mask, pad)
    wy = np.pad(ys * mask, pad)
    return wx.astype(np.float32), wy.astype(np.float32)


def _fused_level_angles_descriptors(raw_img, blurred_img, xy, valid,
                                    use_onehot=None, use_pallas_patch=None):
    """Orientation + rotated BRIEF for one level's keypoints in one pass.

    The reference computes IC angles and descriptors in separate per-level
    passes (ORBextractor.cc:2023-2076); on TPU the per-keypoint patch
    slices are the dominant extraction cost, so each keypoint does a single
    dynamic_slice of a (2, 39, 39) [raw, blurred] patch and derives the
    angle from channel 0 (IC statistic, reference :104-161) and the
    descriptor bits from channel 1 (GET_VALUE rounding, reference
    :177-254).

    Sampling of the 512 rotated pattern points is a per-keypoint gather
    from the local patch; XLA's TPU gather lowering is the hotspot. By
    default it is replaced by a one-hot row/column contraction —
    sample(y,x) = onehot(y) @ patch . onehot(x) — which turns the gather
    into an MXU batched matmul over the 39x39 patch. Bit-identical to the
    gather path (tests/test_orb.py TestOnehotDescriptorPath) and measured
    2x faster end-to-end on v5e (bench.py: 10.78 -> 5.65 ms/frame, the
    whole tracking step). ORB_DESC_ONEHOT=0 restores the gather path.

    Precision note (a measured accuracy regression, round-2 bisect): an
    earlier speedup rounded the blurred image to integers (the reference's
    uchar quantization) to make the one-hot contraction a 1-pass bf16
    matmul. The ±0.5-gray quantization flips near-threshold BRIEF bits and
    the noisier descriptors DOUBLED-plus long-run odometric drift (the
    rendered lap went from <2% to ~16% of travel; the reference survives
    uchar blur because its whole pipeline is tuned around 8-bit imagery).
    The sampling now keeps the full float32 blur, exactly: the blur is
    split into two bfloat16 limbs (hi + residual, error ~1e-3 gray) and
    the one-hot rides the MXU as 2 passes instead of 6 under the
    package-wide float32-precision default.
    """
    # Mode flags must be resolved OUTSIDE any jit (an env read inside a
    # jitted body freezes into the first trace); jitted callers pass them
    # explicitly. The env fallback below serves direct un-jitted callers
    # (tests) only.
    if use_onehot is None or use_pallas_patch is None:
        onehot, _, patch = _resolve_orb_modes()
        use_onehot = onehot if use_onehot is None else use_onehot
        use_pallas_patch = patch if use_pallas_patch is None else use_pallas_patch

    wx39, wy39 = map(jnp.asarray, _ic_weights_39())
    x0, y0, x1, y1 = map(jnp.asarray, _pattern_arrays())
    px = jnp.concatenate([x0, x1])  # (512,)
    py = jnp.concatenate([y0, y1])
    r = DESC_RADIUS
    psize = 2 * r + 1
    pair = jnp.stack([raw_img, blurred_img])  # (2, H, W)
    padded = jnp.pad(pair, ((0, 0), (r, r), (r, r)), mode="edge")
    shifts = jnp.arange(32, dtype=jnp.uint32)
    iota_s = jnp.arange(psize, dtype=jnp.int32)

    if use_pallas_patch:
        # overlapped explicit HBM->VMEM DMAs instead of a vmapped
        # dynamic_slice (see ops/pallas_patch.py); same bytes, same math
        from .pallas_patch import patch_gather
        patches = patch_gather(padded, xy.astype(jnp.int32), psize)

    def one_from(patch):
        rawp, blurp = patch[0], patch[1]
        m10 = jnp.sum(rawp * wx39)
        m01 = jnp.sum(rawp * wy39)
        ang = jnp.arctan2(m01, m10)
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        dx = jnp.round(px * ca - py * sa).astype(jnp.int32)  # (512,)
        dy = jnp.round(px * sa + py * ca).astype(jnp.int32)
        if use_onehot:
            row1h = (iota_s[None, :] == (dy + r)[:, None]).astype(jnp.bfloat16)
            col1h = (iota_s[None, :] == (dx + r)[:, None]).astype(jnp.float32)
            # exact f32 sampling on the MXU: 2-limb bf16 split of the blur
            # (selection one-hot is exact; hi+lo reconstructs f32 to ~1e-3)
            hi = blurp.astype(jnp.bfloat16)
            lo = (blurp - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            rows = (jnp.dot(row1h, hi, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                    + jnp.dot(row1h, lo, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT))
            v = jnp.sum(rows * col1h, axis=-1)  # (512,)
        else:
            flat = blurp.reshape(-1)
            v = flat[(dy + r) * psize + (dx + r)]
        bits = (v[:256] < v[256:]).astype(jnp.uint32).reshape(8, 32)
        desc = jnp.sum(bits << shifts, axis=-1).astype(jnp.uint32)
        return ang, desc

    def one(p):
        patch = jax.lax.dynamic_slice(padded, (0, p[1], p[0]),
                                      (2, psize, psize))
        return one_from(patch)

    if use_pallas_patch:
        ang, desc = jax.vmap(one_from)(patches)
    else:
        ang, desc = jax.vmap(one)(xy)
    ang = jnp.where(valid, ang, 0.0)
    desc = jnp.where(valid[:, None], desc, 0)
    return ang, desc


@functools.lru_cache(maxsize=None)
def _pattern_arrays(seed: int = 1234):
    p = brief_pattern(seed)  # (256, 4)
    return (
        np.asarray(p[:, 0], np.float32), np.asarray(p[:, 1], np.float32),
        np.asarray(p[:, 2], np.float32), np.asarray(p[:, 3], np.float32),
    )


def _fast_pallas_default() -> str:
    return "roll" if jax.default_backend() == "tpu" else "0"


def _resolve_orb_modes():
    """Resolve the kernel-selection env flags OUTSIDE any jit boundary.

    An `os.environ` read inside a jitted body is frozen into the first
    trace per (shape, config) and later env changes are silently ignored
    (the stereo_match bug class, see ops/stereo.py:50-57). The un-jitted
    public wrappers call this and pass the result down as static args, so
    every mode combination gets its own trace.

    Returns (use_onehot, fast_mode, use_pallas_patch); fast_mode is ""
    when the pallas FAST maps are disabled.
    """
    import os
    use_onehot = os.environ.get("ORB_DESC_ONEHOT", "1") not in ("0", "false")
    # Patch/onehot defaults: ON on TPU (measured: stereo step 20.2 ->
    # 15.7 ms, mono unchanged-or-better). Off-TPU the pallas kernel would
    # run in interpret mode — keep the XLA dynamic_slice path there.
    default_patch = "1" if jax.default_backend() == "tpu" else "0"
    use_pallas_patch = os.environ.get(
        "ORB_PATCH_PALLAS", default_patch) not in ("0", "false")
    fast_mode = os.environ.get("ORB_FAST_PALLAS", _fast_pallas_default())
    if fast_mode in ("0", "false"):
        fast_mode = ""
    return use_onehot, fast_mode, use_pallas_patch


def extract_orb(img, config: OrbConfig, n_features: int = 0):
    """Extract ORB features from a (H, W) float32 grayscale image in [0,255].

    Returns a Keypoints with capacity config.max_keypoints (padded, masked).
    `n_features` overrides config.n_features when nonzero (the reference
    doubles the budget during monocular init, Tracking.cc:180-182).
    Un-jitted wrapper: kernel modes resolve per call, not per trace.
    """
    return _extract_orb_jit(img, config, n_features, _resolve_orb_modes())


@functools.partial(jax.jit, static_argnames=("config", "n_features", "modes"))
def _extract_orb_jit(img, config: OrbConfig, n_features: int, modes):
    return _extract_orb_impl(img, config, n_features, modes=modes)


def extract_orb_batch(imgs, config: OrbConfig, n_features: int = 0):
    """Batched extraction over a leading image axis: (B, H, W) -> Keypoints
    with (B, ...) leading dims, ONE dispatch. The stereo frontend feeds the
    L/R pair as B=2 — the reference instead launches two extraction threads
    (reference: Frame.cc:158-164, SURVEY.md section 2.3's planned mapping).

    With ORB_FAST_PALLAS enabled, the fused FAST+NMS+raw+blur maps for ALL
    images x levels are computed in ONE pallas dispatch BEFORE the vmapped
    per-image extraction (a vmapped pallas_call over an HBM-space ref is
    rejected by the Mosaic lowering; hoisting the kernel out of the vmap
    is also simply the better program — one metadata-driven grid covers
    the whole batch). Un-jitted wrapper (see _resolve_orb_modes)."""
    return _extract_orb_batch_jit(imgs, config, n_features,
                                  _resolve_orb_modes())


@functools.partial(jax.jit, static_argnames=("config", "n_features", "modes"))
def _extract_orb_batch_jit(imgs, config: OrbConfig, n_features: int, modes):
    mode = modes[1]
    if mode:
        from .pallas_fast import fast_pyramid_pallas, fast_pyramid_pallas_roll
        B = int(imgs.shape[0])
        n_levels, sf = config.n_levels, config.scale_factor
        shapes = pyramid_shapes(imgs.shape[1], imgs.shape[2], n_levels, sf)
        pyrs = [build_pyramid(imgs[b], n_levels, sf) for b in range(B)]
        flat_levels = tuple(pyrs[b][lv]
                            for b in range(B) for lv in range(n_levels))
        flat_shapes = tuple(shapes[lv]
                            for b in range(B) for lv in range(n_levels))
        fn = (fast_pyramid_pallas_roll if mode == "roll"
              else fast_pyramid_pallas)
        nms, raw, blur = fn(flat_levels, flat_shapes,
                            float(config.min_th_fast))
        maps_flat = []
        for lv in range(n_levels):
            for arrs in (nms, raw, blur):
                maps_flat.append(jnp.stack(
                    [arrs[b * n_levels + lv] for b in range(B)]))
        return jax.vmap(
            lambda im, *mf: _extract_orb_impl(im, config, n_features,
                                              maps=mf, modes=modes))(
            imgs, *maps_flat)
    return jax.vmap(
        lambda im: _extract_orb_impl(im, config, n_features,
                                     modes=modes))(imgs)


def _extract_orb_impl(img, config: OrbConfig, n_features: int = 0,
                      maps=None, modes=None):
    if modes is None:
        modes = _resolve_orb_modes()
    use_onehot, fast_mode, use_pallas_patch = modes
    n_feat = int(n_features) if n_features else config.n_features
    n_levels = config.n_levels
    sf = config.scale_factor
    min_border = config.edge_threshold - 3  # reference: ORBextractor.cc:1430

    levels = build_pyramid(img, n_levels, sf)
    budgets = features_per_level(n_feat, n_levels, sf)
    shapes = pyramid_shapes(img.shape[0], img.shape[1], n_levels, sf)

    # FAST+NMS+raw+blur map source. Default on TPU since round 4:
    # ORB_FAST_PALLAS=roll, the roll-based fused whole-pyramid kernel
    # (ops/pallas_fast.fast_pyramid_pallas_roll — aligned writes only,
    # which is what finally compiled at KITTI geometry; the round-3
    # slice-based kernel never finished its Mosaic compile at 1241x376).
    # Measured on v5e, keypoint-equivalent output (float-eps score map
    # differences only): stereo step 15.76 -> 11.75 ms/frame (63.5 ->
    # 85.1 fps at 1241x376/2000 feat, beating the 12 ms round target),
    # mono 2.98 -> 2.77 ms. ORB_FAST_PALLAS=0 restores the XLA
    # formulation (the default off-TPU: interpret-mode pallas is slow and
    # XLA's fusion is fine on CPU); =1 selects the older slice-based
    # kernel. The mode arrives via `modes` (resolved outside jit).
    mode = fast_mode
    use_pallas = maps is None and bool(mode)

    if use_pallas:
        # ORB_FAST_PALLAS=roll selects the round-4 roll-based kernel
        # (aligned writes only; the compile-time candidate for 1241x376 —
        # the slice-based kernel never finished compiling there). Batched
        # callers instead pass precomputed `maps` (flat [lv x (nms, raw,
        # blur)]) from ONE whole-batch dispatch — see extract_orb_batch.
        fn = (fast_pyramid_pallas_roll if mode == "roll"
              else fast_pyramid_pallas)
        nms_all, raw_all, blur_all = fn(
            tuple(levels), shapes, float(config.min_th_fast))

    outs = []
    for lv in range(n_levels):
        limg = levels[lv]
        H, W = shapes[lv]
        if maps is not None:
            score, raw, blurred = maps[3 * lv], maps[3 * lv + 1], maps[3 * lv + 2]
        elif use_pallas:
            score, raw, blurred = nms_all[lv], raw_all[lv], blur_all[lv]
        else:
            score = nms_3x3(fast_score_map(limg, float(config.min_th_fast)))
            raw = fast_score_dense(limg)
            blurred = gaussian_blur(limg)
        # exclude the descriptor-unsafe border (reference extracts inside
        # minBorder and relies on the 19px EDGE_THRESHOLD padding; our
        # padding is edge-replicate so we just mask the border region)
        ys2 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xs2 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        inb = (
            (ys2 >= min_border) & (ys2 < H - min_border)
            & (xs2 >= min_border) & (xs2 < W - min_border)
        )
        score = jnp.where(inb, score, 0.0)

        budget = int(budgets[lv])
        if budget <= 0:
            continue
        xy_i, resp, valid = _select_level_keypoints(score, budget, config.cell_size)

        # sub-pixel refinement: 1D quadratic fits on the raw arc-score map
        # (an accuracy improvement over the reference's integer FAST corners
        # — halves the keypoint noise that drives pose drift)
        raw_pad = jnp.pad(raw, 1)
        xs_c = xy_i[:, 0] + 1
        ys_c = xy_i[:, 1] + 1
        s0 = raw_pad[ys_c, xs_c]
        sl = raw_pad[ys_c, xs_c - 1]
        sr = raw_pad[ys_c, xs_c + 1]
        su = raw_pad[ys_c - 1, xs_c]
        sd = raw_pad[ys_c + 1, xs_c]
        denx = sl - 2.0 * s0 + sr
        deny = su - 2.0 * s0 + sd
        dx = jnp.where(jnp.abs(denx) > 1e-6, 0.5 * (sl - sr) / jnp.where(jnp.abs(denx) > 1e-6, denx, 1.0), 0.0)
        dy = jnp.where(jnp.abs(deny) > 1e-6, 0.5 * (su - sd) / jnp.where(jnp.abs(deny) > 1e-6, deny, 1.0), 0.0)
        subpix = jnp.stack([jnp.clip(dx, -0.5, 0.5), jnp.clip(dy, -0.5, 0.5)], axis=-1)

        ang, desc = _fused_level_angles_descriptors(
            limg, blurred, xy_i, valid,
            use_onehot=use_onehot, use_pallas_patch=use_pallas_patch)

        # half-pixel-correct mapping to level-0 coordinates: bilinear resize
        # aligns pixel CENTERS, so x0 = (xl + 0.5) * (W0/Wl) - 0.5. The
        # reference's plain kp.pt * scale (ORBextractor.cc:2070) carries a
        # systematic per-octave bias of up to ~1.3px that leaks into pose
        # estimates; we use the exact per-axis ratios of the rounded shapes.
        sxy = jnp.asarray([img.shape[1] / W, img.shape[0] / H], jnp.float32)
        outs.append(
            (
                (xy_i.astype(jnp.float32) + subpix + 0.5) * sxy - 0.5,
                resp,
                jnp.full((budget,), lv, dtype=jnp.int32),
                ang,
                desc,
                valid,
            )
        )

    xy = jnp.concatenate([o[0] for o in outs], axis=0)
    resp = jnp.concatenate([o[1] for o in outs], axis=0)
    oct_ = jnp.concatenate([o[2] for o in outs], axis=0)
    ang = jnp.concatenate([o[3] for o in outs], axis=0)
    desc = jnp.concatenate([o[4] for o in outs], axis=0)
    valid = jnp.concatenate([o[5] for o in outs], axis=0)

    cap = config.max_keypoints
    n = xy.shape[0]
    if n < cap:
        pad = cap - n
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        resp = jnp.pad(resp, (0, pad))
        oct_ = jnp.pad(oct_, (0, pad))
        ang = jnp.pad(ang, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    else:
        xy, resp, oct_, ang, desc, valid = (
            xy[:cap], resp[:cap], oct_[:cap], ang[:cap], desc[:cap], valid[:cap]
        )
    return Keypoints(xy=xy, response=resp, octave=oct_, angle=ang, desc=desc, valid=valid)
