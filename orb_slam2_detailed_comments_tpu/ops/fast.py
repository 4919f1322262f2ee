"""FAST-16 corner detection, fully vectorized for TPU.

Replaces the per-cell cv::FAST calls in ORBextractor::ComputeKeyPointsOctTree
(reference: src/ORBextractor.cc:1424-1601). Instead of looping over 30x30
cells on the host, we evaluate the FAST segment test densely over the whole
level image with VPU-friendly elementwise ops:

 * the 16-pixel Bresenham ring is materialized as 16 shifted copies,
 * the "9 contiguous brighter/darker" test is an AND-reduction of circularly
   rotated ring masks,
 * the corner score is the exact max-threshold score (max over the 16
   length-9 arcs of the arc's min |I_ring - I_p|), computed with a
   logarithmic rolling-min (doubling) over the ring axis,
 * 3x3 non-max suppression is a max-pool comparison.

The high->low threshold fallback (20 then 7, reference :1462-1470) is
handled by the caller selecting per cell from the low-threshold score map.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# FAST-16 Bresenham circle offsets (dy, dx), starting at top, clockwise.
RING_OFFSETS = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

ARC_LEN = 9  # segment test: N contiguous pixels (FAST-9/16)


def _ring_stack(img):
    """(H, W) -> (16, H, W) of the ring-shifted images. Uses jnp.roll; the
    3-pixel wrap-around garbage at borders is masked by the caller."""
    shifted = [jnp.roll(img, shift=(-int(dy), -int(dx)), axis=(0, 1)) for dy, dx in RING_OFFSETS]
    return jnp.stack(shifted, axis=0)


def _rolling_min_9(d):
    """Min over each circular window of 9 along axis 0 (length 16).
    Doubling trick: windows 1,2,4,8 then combine 8+1."""
    m1 = d
    m2 = jnp.minimum(m1, jnp.roll(m1, -1, axis=0))
    m4 = jnp.minimum(m2, jnp.roll(m2, -2, axis=0))
    m8 = jnp.minimum(m4, jnp.roll(m4, -4, axis=0))
    m9 = jnp.minimum(m8, jnp.roll(m1, -8, axis=0))
    return m9


def fast_score_dense(img):
    """Unthresholded dense FAST arc score (used for sub-pixel refinement)."""
    ring = _ring_stack(img)
    d = ring - img[None]
    bright_min = _rolling_min_9(d)
    dark_min = _rolling_min_9(-d)
    return jnp.maximum(jnp.max(bright_min, axis=0), jnp.max(dark_min, axis=0))


def fast_score_map(img, threshold: float):
    """Dense FAST-9/16 corner score.

    Args:
      img: (H, W) float32 grayscale in [0, 255].
      threshold: segment-test threshold t.

    Returns:
      (H, W) float32 score map; 0 where not a corner. Score equals the
      largest threshold at which the pixel would still pass the segment
      test (same definition as OpenCV's cornerScore used by the reference).
    """
    score = fast_score_dense(img)
    corner = score > threshold
    score = jnp.where(corner, score, 0.0)

    # mask the 3-pixel border where the ring wraps around
    H, W = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border_ok = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(border_ok, score, 0.0)


def nms_3x3(score):
    """3x3 non-maximum suppression: keep pixels that are the strict max of
    their 8-neighborhood (ties broken towards the top-left like OpenCV)."""
    neigh = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh.append(jnp.roll(score, shift=(dy, dx), axis=(0, 1)))
    nmax = jnp.stack(neigh, axis=0)
    # strict greater than later neighbors, >= earlier ones (deterministic ties)
    before = jnp.max(nmax[:4], axis=0)
    after = jnp.max(nmax[4:], axis=0)
    keep = (score > 0) & (score >= before) & (score > after)
    return jnp.where(keep, score, 0.0)
