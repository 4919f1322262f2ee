"""Pallas TPU kernels: fused FAST-9/16 score + 3x3 NMS + raw score +
Gaussian blur.

Three variants, all bit-(near-)exact against the XLA formulation
(ops/fast.py + ops/pyramid.gaussian_blur) and interpret-testable on CPU:

 * `fast_score_nms_pallas` — historical whole-image single-block kernel.
   Only viable for small images: the unrolled ring intermediates exceed
   VMEM at 640x480 (Mosaic does not re-fuse the 50-odd live slices).
 * `fast_score_nms_raw_pallas` — row-tiled (TILE_H x Wtot blocks, manual
   halo DMA from an ANY-space input), one dispatch per image. Emits the
   NMS'd score, the raw arc score (sub-pixel refinement input) and the
   7x7 sigma=2 blurred image from ONE read of the level.
 * `fast_pyramid_pallas` — ALL pyramid levels in one dispatch: levels are
   stacked vertically (each with a private halo), a scalar-prefetch
   metadata table maps row-tiles to levels.

 * `fast_pyramid_pallas_roll` — round-4 rewrite where every neighborhood
   access is a pltpu.roll and every write a full aligned block: the
   slice-based kernel never finished its Mosaic compile at 1241x376
   (unaligned static slices); this one compiles everywhere and is the
   TPU DEFAULT since round 4 (ORB_FAST_PALLAS=roll, selected by
   ops/orb.py). Measured on v5e with bit-identical keypoints: stereo
   step 15.76 -> 11.73 ms/frame (85 fps at 1241x376/2000 feat), mono
   2.98 -> 2.77 ms. For a batched extract the maps for ALL images x
   levels come from ONE dispatch (extract_orb_batch hoists the kernel
   out of the vmap — Mosaic rejects vmapped HBM-ref pallas calls).

Round-1 context (why the older kernels were non-default): standalone the
tiled kernel is ~11x a standalone-jitted XLA micro-call (0.9 vs 10 ms —
dispatch-dominated), but INSIDE the fused tracking step XLA's op fusion
won (10.71-10.76 vs 10.84-11.03 ms). The roll kernel's single
whole-pyramid dispatch with aligned writes is what finally beat the XLA
fusion at both geometries.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import RING_OFFSETS
from .pyramid import _gauss_kernel_1d

HALO = 4  # 3 ring radius + 1 NMS margin; also covers the 7x7 blur radius 3


def _fast_nms_kernel(img_ref, out_ref, *, threshold: float):
    """img_ref: (H + 2*HALO, W + 2*HALO); out_ref: (H, W)."""
    slab = img_ref[:]
    H, W = out_ref.shape

    # score computed on an (H+2, W+2) region so NMS has a 1px margin
    def region(dy, dx):
        return jax.lax.slice(
            slab, (HALO - 1 + dy, HALO - 1 + dx),
            (HALO - 1 + dy + H + 2, HALO - 1 + dx + W + 2))

    center = region(0, 0)
    d = [region(int(dy), int(dx)) - center for dy, dx in RING_OFFSETS]

    def rolling_min9(x):
        # doubling rolling-min over the circular ring, kept as plain 2D
        # elementwise ops (a 3D stack + axis-0 roll compiles poorly in
        # Mosaic); index arithmetic replaces the roll
        m2 = [jnp.minimum(x[i], x[(i + 1) % 16]) for i in range(16)]
        m4 = [jnp.minimum(m2[i], m2[(i + 2) % 16]) for i in range(16)]
        m8 = [jnp.minimum(m4[i], m4[(i + 4) % 16]) for i in range(16)]
        m9 = [jnp.minimum(m8[i], x[(i + 8) % 16]) for i in range(16)]
        out = m9[0]
        for i in range(1, 16):
            out = jnp.maximum(out, m9[i])
        return out

    score = jnp.maximum(rolling_min9(d), rolling_min9([-v for v in d]))
    score = jnp.where(score > threshold, score, 0.0)

    # 3x3 NMS with the same deterministic tie-break as ops/fast.nms_3x3
    # (>= against scan-order-earlier neighbors, > against later ones)
    def nbr(dy, dx):
        return jax.lax.slice(score, (1 + dy, 1 + dx), (1 + dy + H, 1 + dx + W))

    # ops/fast.nms_3x3 builds neighbors via jnp.roll(score, (dy, dx)) whose
    # [y, x] entry is score[y - dy, x - dx]; mirror that here so tie-breaks
    # on score plateaus match exactly.
    c = nbr(0, 0)
    before = jnp.maximum(jnp.maximum(nbr(1, 1), nbr(1, 0)),
                         jnp.maximum(nbr(1, -1), nbr(0, 1)))
    after = jnp.maximum(jnp.maximum(nbr(0, -1), nbr(-1, 1)),
                        jnp.maximum(nbr(-1, 0), nbr(-1, -1)))
    keep = (c > 0) & (c >= before) & (c > after)
    out_ref[:] = jnp.where(keep, c, 0.0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


TILE_H = 48  # rows per grid step (multiple of the f32 sublane tile 8)


def _fast_nms_tile_kernel(img_hbm, nms_ref, raw_ref, blur_ref, buf, sem, *,
                          threshold: float, img_h: int, img_w: int):
    """One row-tile of the fused FAST-9/16 score + 3x3 NMS.

    img_hbm: (Hp + 2*HALO, Wtot) padded image resident in HBM/ANY; each grid
    step DMAs its (TILE_H + 2*HALO, Wtot) halo slab into VMEM scratch `buf`.
    nms_ref/raw_ref: (TILE_H, Wtot) output blocks. True image col c lives at
    padded col c + HALO.

    The arc minimum is computed per starting index from the 16 ring
    differences directly (a tree of 8 mins each) instead of the doubling
    rolling-min: that keeps ~20 (not ~80) full-tile buffers live, which is
    what blew VMEM in the whole-image kernel. The extra VPU mins are free —
    the kernel is bandwidth-bound.
    """
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * TILE_H, TILE_H + 2 * HALO), :], buf, sem)
    cp.start()
    cp.wait()
    slab = buf[:]
    Wtot = slab.shape[1]
    WS = Wtot - 6         # score-region width, covering padded cols [3, Wtot-3)
    HS = TILE_H + 2       # score-region rows: 1px NMS margin around the tile

    def region(dy, dx):
        return jax.lax.slice(
            slab, (HALO - 1 + dy, 3 + dx), (HALO - 1 + dy + HS, 3 + dx + WS))

    center = region(0, 0)
    d = [region(int(dy), int(dx)) - center for dy, dx in RING_OFFSETS]

    def arc_score(diffs):
        # max over the 16 length-9 arcs of the arc min
        best = None
        for s in range(16):
            m = diffs[s]
            # tree-min over the 9-long arc starting at s
            m = jnp.minimum(m, diffs[(s + 1) % 16])
            m2 = jnp.minimum(diffs[(s + 2) % 16], diffs[(s + 3) % 16])
            m3 = jnp.minimum(diffs[(s + 4) % 16], diffs[(s + 5) % 16])
            m4 = jnp.minimum(diffs[(s + 6) % 16], diffs[(s + 7) % 16])
            m = jnp.minimum(jnp.minimum(m, diffs[(s + 8) % 16]),
                            jnp.minimum(jnp.minimum(m2, m3), m4))
            best = m if best is None else jnp.maximum(best, m)
        return best

    raw = jnp.maximum(arc_score(d), arc_score([-v for v in d]))
    score = jnp.where(raw > threshold, raw, 0.0)

    # zero the 3px image border BEFORE NMS (the XLA path masks
    # fast_score_map's border first, so near-border pixels compete against
    # zeros there; replicate for bit-equal tie-breaks)
    gy = (jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
          + i * TILE_H - 1)                      # global image row
    gx = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1) - 1  # global col
    inb = (gy >= 3) & (gy < img_h - 3) & (gx >= 3) & (gx < img_w - 3)
    score = jnp.where(inb, score, 0.0)

    # 3x3 NMS, same scan-order tie-break as ops/fast.nms_3x3
    def nbr(dy, dx):
        return jax.lax.slice(
            score, (1 + dy, 1 + dx), (1 + dy + TILE_H, 1 + dx + WS - 2))

    c = nbr(0, 0)
    before = jnp.maximum(jnp.maximum(nbr(1, 1), nbr(1, 0)),
                         jnp.maximum(nbr(1, -1), nbr(0, 1)))
    after = jnp.maximum(jnp.maximum(nbr(0, -1), nbr(-1, 1)),
                        jnp.maximum(nbr(-1, 0), nbr(-1, -1)))
    keep = (c > 0) & (c >= before) & (c > after)

    # cols [4, Wtot-4) carry the result; the caller slices [HALO, HALO+W)
    # out of that range, so the 4 pad columns each side are never read
    nms_ref[:, 4:4 + (WS - 2)] = jnp.where(keep, c, 0.0)
    raw_ref[:, 4:4 + (WS - 2)] = jax.lax.slice(
        raw, (1, 1), (1 + TILE_H, 1 + WS - 2))

    # 7x7 sigma=2 separable Gaussian blur of the same slab (the descriptor
    # image, reference ORBextractor.cc:2023); the wrapper's reflect halo
    # makes this bit-equal to ops/pyramid.gaussian_blur
    k = tuple(float(v) for v in _gauss_kernel_1d(7, 2.0))
    BH = TILE_H + 6
    WB = Wtot - 8
    h = k[0] * jax.lax.slice(slab, (1, 1), (1 + BH, 1 + WB))
    for j in range(1, 7):
        h = h + k[j] * jax.lax.slice(slab, (1, 1 + j), (1 + BH, 1 + j + WB))
    v = k[0] * jax.lax.slice(h, (0, 0), (TILE_H, WB))
    for j in range(1, 7):
        v = v + k[j] * jax.lax.slice(h, (j, 0), (j + TILE_H, WB))
    blur_ref[:, 4:4 + WB] = v


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_nms_raw_pallas(img, threshold: float = 7.0, interpret: bool = False):
    """Fused FAST-9/16 score + 3x3 NMS + raw score + Gaussian blur, tiled
    over rows.

    img: (H, W) float32. Returns (nms_score, raw_score, blurred), all
    (H, W); nms_score is zeroed in the 3px border, raw_score is the
    unthresholded arc score (used for sub-pixel refinement) valid inside
    the same border, blurred is the 7x7 sigma=2 descriptor image.

    Replaces ops/fast.fast_score_map + nms_3x3 + fast_score_dense +
    ops/pyramid.gaussian_blur with one HBM read of the level image
    (reference: per-cell cv::FAST in ORBextractor.cc:1424-1601 +
    GaussianBlur at :2023).
    """
    H, W = img.shape
    Hp = _round_up(H, TILE_H)
    Wtot = _round_up(W + 2 * HALO, 128)
    # reflect halo (matches gaussian_blur's BORDER_REFLECT_101; FAST/NMS
    # never read the border so only the blur output observes the mode),
    # then edge-extend to the tile-aligned extents (those rows/cols feed
    # discarded outputs only)
    padded = jnp.pad(img, ((HALO, HALO), (HALO, HALO)), mode="reflect")
    padded = jnp.pad(padded, ((0, Hp - H), (0, Wtot - W - 2 * HALO)),
                     mode="edge")

    kernel = functools.partial(_fast_nms_tile_kernel, threshold=threshold,
                               img_h=H, img_w=W)
    grid = Hp // TILE_H
    blk = pl.BlockSpec((TILE_H, Wtot), lambda i: (i, 0), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((Hp, Wtot), jnp.float32)
    nms, raw, blur = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(blk, blk, blk),
        out_shape=(oshape, oshape, oshape),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2 * HALO, Wtot), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded)

    nms = nms[:H, HALO:HALO + W]
    raw = raw[:H, HALO:HALO + W]
    blur = blur[:H, HALO:HALO + W]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border_ok = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(border_ok, nms, 0.0), raw, blur


def _pyramid_tile_kernel(meta_ref, img_hbm, nms_ref, raw_ref, blur_ref,
                         buf, sem, *, threshold: float):
    """One row-tile of the whole-pyramid fused FAST+NMS+raw+blur kernel.

    meta_ref (scalar-prefetch SMEM, (n_tiles, 4) int32): per-tile
    [input_start_row, tile_local_row_offset, level_h, level_w]. All levels
    are stacked vertically in img_hbm, each embedded with its own
    2*HALO-row halo; tiles are enumerated level-major so output row-blocks
    are consecutive.
    """
    t = pl.program_id(0)
    # every tile start is a multiple of 8 (TILE_H and the per-level halo
    # are); Mosaic needs the hint to tile the dynamic slice
    in_start = pl.multiple_of(meta_ref[t, 0], 8)
    local_off = meta_ref[t, 1]
    img_h = meta_ref[t, 2]
    img_w = meta_ref[t, 3]

    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(in_start, TILE_H + 2 * HALO), :], buf, sem)
    cp.start()
    cp.wait()
    slab = buf[:]
    Wtot = slab.shape[1]
    WS = Wtot - 6
    HS = TILE_H + 2

    def region(dy, dx):
        return jax.lax.slice(
            slab, (HALO - 1 + dy, 3 + dx), (HALO - 1 + dy + HS, 3 + dx + WS))

    center = region(0, 0)
    d = [region(int(dy), int(dx)) - center for dy, dx in RING_OFFSETS]

    def arc_score(diffs):
        best = None
        for s in range(16):
            m = jnp.minimum(diffs[s], diffs[(s + 1) % 16])
            m2 = jnp.minimum(diffs[(s + 2) % 16], diffs[(s + 3) % 16])
            m3 = jnp.minimum(diffs[(s + 4) % 16], diffs[(s + 5) % 16])
            m4 = jnp.minimum(diffs[(s + 6) % 16], diffs[(s + 7) % 16])
            m = jnp.minimum(jnp.minimum(m, diffs[(s + 8) % 16]),
                            jnp.minimum(jnp.minimum(m2, m3), m4))
            best = m if best is None else jnp.maximum(best, m)
        return best

    raw = jnp.maximum(arc_score(d), arc_score([-v for v in d]))
    score = jnp.where(raw > threshold, raw, 0.0)

    gy = (jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
          + local_off - 1)
    gx = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1) - 1
    inb = (gy >= 3) & (gy < img_h - 3) & (gx >= 3) & (gx < img_w - 3)
    score = jnp.where(inb, score, 0.0)

    def nbr(dy, dx):
        return jax.lax.slice(
            score, (1 + dy, 1 + dx), (1 + dy + TILE_H, 1 + dx + WS - 2))

    c = nbr(0, 0)
    before = jnp.maximum(jnp.maximum(nbr(1, 1), nbr(1, 0)),
                         jnp.maximum(nbr(1, -1), nbr(0, 1)))
    after = jnp.maximum(jnp.maximum(nbr(0, -1), nbr(-1, 1)),
                        jnp.maximum(nbr(-1, 0), nbr(-1, -1)))
    keep = (c > 0) & (c >= before) & (c > after)

    nms_ref[:, 4:4 + (WS - 2)] = jnp.where(keep, c, 0.0)
    raw_ref[:, 4:4 + (WS - 2)] = jax.lax.slice(
        raw, (1, 1), (1 + TILE_H, 1 + WS - 2))

    k = tuple(float(v) for v in _gauss_kernel_1d(7, 2.0))
    BH = TILE_H + 6
    WB = Wtot - 8
    h = k[0] * jax.lax.slice(slab, (1, 1), (1 + BH, 1 + WB))
    for j in range(1, 7):
        h = h + k[j] * jax.lax.slice(slab, (1, 1 + j), (1 + BH, 1 + j + WB))
    v = k[0] * jax.lax.slice(h, (0, 0), (TILE_H, WB))
    for j in range(1, 7):
        v = v + k[j] * jax.lax.slice(h, (j, 0), (j + TILE_H, WB))
    blur_ref[:, 4:4 + WB] = v


@functools.partial(jax.jit, static_argnames=("shapes", "threshold", "interpret"))
def fast_pyramid_pallas(levels, shapes, threshold: float = 7.0,
                        interpret: bool = False):
    """Fused FAST-9/16 + NMS + raw score + Gaussian blur for the WHOLE
    pyramid in ONE pallas_call.

    levels: tuple of (H_l, W_l) float32 level images; shapes: static tuple
    of their (H, W). Returns (nms, raw, blur) tuples, one (H_l, W_l) array
    per level. The per-level variant costs one kernel dispatch + fusion
    barrier per level; stacking all levels into one tile-metadata-driven
    grid amortizes that to a single dispatch (reference work:
    ORBextractor.cc:1424-1601 + GaussianBlur :2023, all levels).
    """
    n_levels = len(shapes)
    Wtot = max(_round_up(W + 2 * HALO, 128) for _, W in shapes)

    in_blocks = []
    meta = []
    in_off = 0
    out_offs = []
    out_off = 0
    for lv in range(n_levels):
        H, W = shapes[lv]
        Hp = _round_up(H, TILE_H)
        p = jnp.pad(levels[lv], ((HALO, HALO), (HALO, HALO)), mode="reflect")
        p = jnp.pad(p, ((0, Hp - H), (0, Wtot - W - 2 * HALO)), mode="edge")
        in_blocks.append(p)
        for ktile in range(Hp // TILE_H):
            meta.append((in_off + ktile * TILE_H, ktile * TILE_H, H, W))
        out_offs.append(out_off)
        in_off += Hp + 2 * HALO
        out_off += Hp
    stacked = jnp.concatenate(in_blocks, axis=0)
    meta = jnp.asarray(np.asarray(meta, np.int32))
    n_tiles = meta.shape[0]

    kernel = functools.partial(_pyramid_tile_kernel, threshold=threshold)
    # index_map receives (grid idx, scalar-prefetch ref)
    blk = pl.BlockSpec((TILE_H, Wtot), lambda t, meta: (t, 0),
                       memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((out_off, Wtot), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(blk, blk, blk),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2 * HALO, Wtot), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    nms, raw, blur = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(oshape, oshape, oshape),
        interpret=interpret,
    )(meta, stacked)

    nms_l, raw_l, blur_l = [], [], []
    for lv in range(n_levels):
        H, W = shapes[lv]
        o = out_offs[lv]
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ok = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
        nms_l.append(jnp.where(ok, nms[o:o + H, HALO:HALO + W], 0.0))
        raw_l.append(raw[o:o + H, HALO:HALO + W])
        blur_l.append(blur[o:o + H, HALO:HALO + W])
    return tuple(nms_l), tuple(raw_l), tuple(blur_l)


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_nms_pallas(img, threshold: float = 7.0, interpret: bool = False):
    """Fused FAST score + NMS. img: (H, W) float32. Returns (H, W) NMS'd
    scores, zeroed in the 3px border."""
    H, W = img.shape
    padded = jnp.pad(img, ((HALO, HALO), (HALO, HALO)), mode="edge")

    kernel = functools.partial(_fast_nms_kernel, threshold=threshold)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=interpret,
    )(padded)

    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border_ok = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(border_ok, out, 0.0)


# ---------------------------------------------------------------------------
# Roll-based pyramid kernel (round 4): every neighborhood access is a
# pltpu.roll of the full slab and every output write is a full aligned
# block — no unaligned static slices, which are the prime suspect for the
# Mosaic compile blow-up that kept the tiled kernel from ever finishing
# at 1241x376 (CLAUDE.md round-3 open thread). Wrap-around garbage from
# the rolls lands only in halo rows/columns that the caller discards
# (HALO_V >= 4 ring+NMS reach; Wtot >= W + 7).
# ---------------------------------------------------------------------------

HALO_V = 8        # vertical halo (8-aligned so output rows slice cleanly)
TILE_H2 = 16      # smaller tile: full-slab roll temporaries stay in VMEM


def _pyramid_tile_kernel_roll(meta_ref, img_hbm, nms_ref, raw_ref, blur_ref,
                              buf, sem, *, threshold: float):
    """Row-tile kernel; see fast_pyramid_pallas_roll. meta rows:
    [input_start_row, tile_local_row_offset, level_h, level_w]."""
    t = pl.program_id(0)
    in_start = pl.multiple_of(meta_ref[t, 0], 8)
    local_off = meta_ref[t, 1]
    img_h = meta_ref[t, 2]
    img_w = meta_ref[t, 3]

    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(in_start, TILE_H2 + 2 * HALO_V), :], buf, sem)
    cp.start()
    cp.wait()
    slab = buf[:]
    HS, Wtot = slab.shape

    def sh(dy, dx):
        # rolled view whose [y, x] = slab[y + dy, x + dx] (wrap garbage
        # only within |shift| of the slab edges — all inside the halo)
        out = slab
        if dy:
            out = pltpu.roll(out, (-dy) % HS, 0)
        if dx:
            out = pltpu.roll(out, (-dx) % Wtot, 1)
        return out

    d = [sh(int(dy), int(dx)) - slab for dy, dx in RING_OFFSETS]

    def arc_score(diffs):
        best = None
        for s in range(16):
            m = jnp.minimum(diffs[s], diffs[(s + 1) % 16])
            m2 = jnp.minimum(diffs[(s + 2) % 16], diffs[(s + 3) % 16])
            m3 = jnp.minimum(diffs[(s + 4) % 16], diffs[(s + 5) % 16])
            m4 = jnp.minimum(diffs[(s + 6) % 16], diffs[(s + 7) % 16])
            m = jnp.minimum(jnp.minimum(m, diffs[(s + 8) % 16]),
                            jnp.minimum(jnp.minimum(m2, m3), m4))
            best = m if best is None else jnp.maximum(best, m)
        return best

    raw = jnp.maximum(arc_score(d), arc_score([-v for v in d]))
    score = jnp.where(raw > threshold, raw, 0.0)

    # zero the 3px image border BEFORE NMS (bit-equal tie-breaks with the
    # XLA path, which masks first). Global coords: slab row HALO_V is
    # image row local_off; slab col HALO(=4) is image col 0.
    gy = (jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
          + local_off - HALO_V)
    gx = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1) - HALO
    inb = (gy >= 3) & (gy < img_h - 3) & (gx >= 3) & (gx < img_w - 3)
    score = jnp.where(inb, score, 0.0)

    def nbr(dy, dx):
        out = score
        if dy:
            out = pltpu.roll(out, (-dy) % HS, 0)
        if dx:
            out = pltpu.roll(out, (-dx) % Wtot, 1)
        return out

    before = jnp.maximum(jnp.maximum(nbr(1, 1), nbr(1, 0)),
                         jnp.maximum(nbr(1, -1), nbr(0, 1)))
    after = jnp.maximum(jnp.maximum(nbr(0, -1), nbr(-1, 1)),
                        jnp.maximum(nbr(-1, 0), nbr(-1, -1)))
    keep = (score > 0) & (score >= before) & (score > after)
    nms_full = jnp.where(keep, score, 0.0)

    # aligned output rows [HALO_V, HALO_V + TILE_H2), full width
    nms_ref[:, :] = jax.lax.slice(nms_full, (HALO_V, 0),
                                  (HALO_V + TILE_H2, Wtot))
    raw_ref[:, :] = jax.lax.slice(raw, (HALO_V, 0),
                                  (HALO_V + TILE_H2, Wtot))

    # 7x7 sigma=2 separable blur via rolls
    k = tuple(float(v) for v in _gauss_kernel_1d(7, 2.0))
    h = k[3] * slab
    for j in range(1, 4):
        h = h + k[3 - j] * sh(0, -j) + k[3 + j] * sh(0, j)
    v = k[3] * h
    for j in range(1, 4):
        up = pltpu.roll(h, j % HS, 0)          # [y] = h[y - j]
        dn = pltpu.roll(h, (-j) % HS, 0)       # [y] = h[y + j]
        v = v + k[3 - j] * up + k[3 + j] * dn
    blur_ref[:, :] = jax.lax.slice(v, (HALO_V, 0),
                                   (HALO_V + TILE_H2, Wtot))


def fast_pyramid_pallas_roll(levels, shapes, threshold: float = 7.0,
                             interpret=None):
    """Roll-based variant of fast_pyramid_pallas (same contract): fused
    FAST-9/16 + NMS + raw score + 7x7 blur for the whole pyramid in ONE
    dispatch, with only aligned block writes inside the kernel.
    interpret=None auto-selects interpret mode off-TPU (CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fast_pyramid_pallas_roll(levels, shapes, threshold, interpret)


@functools.partial(jax.jit, static_argnames=("shapes", "threshold",
                                             "interpret"))
def _fast_pyramid_pallas_roll(levels, shapes, threshold: float = 7.0,
                              interpret: bool = False):
    n_levels = len(shapes)
    Wtot = max(_round_up(W + 2 * HALO, 128) for _, W in shapes)

    in_blocks = []
    meta = []
    in_off = 0
    out_offs = []
    out_off = 0
    for lv in range(n_levels):
        H, W = shapes[lv]
        Hp = _round_up(H, TILE_H2)
        p = jnp.pad(levels[lv], ((HALO, HALO), (HALO, HALO)), mode="reflect")
        # vertical halo grown to HALO_V (extra rows feed discarded outputs)
        p = jnp.pad(p, ((HALO_V - HALO, HALO_V - HALO + Hp - H),
                        (0, Wtot - W - 2 * HALO)), mode="edge")
        in_blocks.append(p)
        for ktile in range(Hp // TILE_H2):
            meta.append((in_off + ktile * TILE_H2, ktile * TILE_H2, H, W))
        out_offs.append(out_off)
        in_off += Hp + 2 * HALO_V
        out_off += Hp
    stacked = jnp.concatenate(in_blocks, axis=0)
    meta = jnp.asarray(np.asarray(meta, np.int32))
    n_tiles = meta.shape[0]

    kernel = functools.partial(_pyramid_tile_kernel_roll, threshold=threshold)
    blk = pl.BlockSpec((TILE_H2, Wtot), lambda t, meta: (t, 0),
                       memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((out_off, Wtot), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        # HBM, not ANY: under jax.vmap (the stereo L/R batched extract)
        # pallas adds a leading grid dim, and Mosaic rejects batched
        # block specs for ANY-space refs but handles HBM refs (same
        # lesson as ops/pallas_patch.py)
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(blk, blk, blk),
        scratch_shapes=[
            pltpu.VMEM((TILE_H2 + 2 * HALO_V, Wtot), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    nms, raw, blur = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(oshape, oshape, oshape),
        interpret=interpret,
    )(meta, stacked)

    nms_l, raw_l, blur_l = [], [], []
    for lv in range(n_levels):
        H, W = shapes[lv]
        o = out_offs[lv]
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        okm = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
        nms_l.append(jnp.where(okm, nms[o:o + H, HALO:HALO + W], 0.0))
        raw_l.append(raw[o:o + H, HALO:HALO + W])
        blur_l.append(blur[o:o + H, HALO:HALO + W])
    return tuple(nms_l), tuple(raw_l), tuple(blur_l)
