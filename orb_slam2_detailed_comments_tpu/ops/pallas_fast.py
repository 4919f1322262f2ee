"""Pallas TPU kernel: fused FAST-9/16 score + 3x3 NMS.

The XLA formulation (ops/fast.py) materializes 16 ring-shifted copies plus
rolling-min intermediates between fusion boundaries. This kernel keeps the
whole level image resident in VMEM (a 640x480 f32 image is 1.2 MB against
16 MB of VMEM; every pyramid level is smaller) and computes all 16 ring
shifts, the doubling rolling-min over the ring, the threshold and the 3x3
NMS as static slices of that buffer — one HBM read of the image, one HBM
write of the score map, zero intermediates in HBM.

Width/height are pre-padded by 4 so every shift is a static in-bounds
slice. Interpret mode keeps CPU tests exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import RING_OFFSETS

HALO = 4  # 3 ring radius + 1 NMS margin


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
