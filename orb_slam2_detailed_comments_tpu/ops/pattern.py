"""BRIEF sampling pattern for the 256-bit ORB descriptor.

The reference hard-codes a 256-pair learned pattern inside a 31x31 patch
(reference: src/ORBextractor.cc:259-775, bit_pattern_31_). We do NOT copy
that table: our extractor and matcher are a closed system, so any
well-spread 256-pair pattern gives equivalent matching power. We generate
a deterministic pattern (seeded) following the original BRIEF paper's
recipe — pairs drawn i.i.d. from an isotropic Gaussian with sigma = S/5
over the patch, clipped to stay inside the rotation-safe radius — with a
greedy de-correlation pass that rejects pairs too similar to already
accepted ones (the same idea ORB's offline learning optimizes for).
"""
from __future__ import annotations

import functools

import numpy as np

PATCH_SIZE = 31
HALF_PATCH = 15
N_BITS = 256


@functools.lru_cache(maxsize=None)
def brief_pattern(seed: int = 1234) -> np.ndarray:
    """Return (256, 4) int32 array of (x0, y0, x1, y1) sample offsets.

    Offsets lie within radius HALF_PATCH - 2 = 13 of the patch center so a
    rotated pattern stays inside a 31x31 window, matching the reference's
    safety margin for computeOrbDescriptor.
    """
    rng = np.random.default_rng(seed)
    sigma = PATCH_SIZE / 5.0
    rmax = HALF_PATCH - 2  # keep rotated samples inside the patch

    accepted = []
    # Greedy accept: reject near-duplicate pairs (keeps bits de-correlated).
    while len(accepted) < N_BITS:
        cand = rng.normal(0.0, sigma, size=(4,))
        cand = np.clip(np.round(cand), -rmax, rmax).astype(np.int32)
        x0, y0, x1, y1 = cand
        if x0 == x1 and y0 == y1:
            continue
        ok = True
        for a in accepted:
            # reject if both endpoints are within 1px of an accepted pair
            # (either orientation)
            d_fwd = max(abs(x0 - a[0]), abs(y0 - a[1]), abs(x1 - a[2]), abs(y1 - a[3]))
            d_rev = max(abs(x0 - a[2]), abs(y0 - a[3]), abs(x1 - a[0]), abs(y1 - a[1]))
            if min(d_fwd, d_rev) <= 1:
                ok = False
                break
        if ok:
            accepted.append((x0, y0, x1, y1))
    return np.asarray(accepted, dtype=np.int32)


@functools.lru_cache(maxsize=None)
def ic_angle_offsets() -> tuple:
    """Circular-patch offsets for the intensity-centroid orientation.

    The reference walks a radius-15 circular patch with per-row u_max
    limits (reference: src/ORBextractor.cc:104-161 IC_Angle and the
    umax initialization in the constructor :799-824). We precompute the
    full list of (dy, dx) offsets inside the circle once; the kernel does
    a dense masked 31x31 patch sum instead of the row walk.

    Returns (mask, xs, ys): mask is (31, 31) float32 of 0/1 inside the
    radius-15 circle; xs/ys are the signed coordinate grids.
    """
    r = HALF_PATCH
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
    # replicate the reference's u_max rounding: vmax = floor(r*sqrt2/2)+1,
    # umax[v] = round(sqrt(r^2 - v^2)) with symmetry fix-ups; a plain
    # rounded circle test matches it except at the 45-degree seams, which
    # has no measurable effect on the angle statistic.
    mask = (xs * xs + ys * ys) <= (r * r + r)  # round-outward circle
    return mask.astype(np.float32), xs.astype(np.float32), ys.astype(np.float32)
