"""Pallas DMA patch gather: per-keypoint (2, 39, 39) patches in one kernel.

The per-keypoint patch slice is the dominant cost of ORB extraction at
stereo scale (measured on v5e, 1241x376 x 2 images x 2000 features:
~6.1 ms of the 14.5 ms extraction — BASELINE.md round-3 stage split).
XLA lowers a vmapped `dynamic_slice` to a serialized gather; this kernel
instead issues G explicit HBM->VMEM DMAs per grid step with the keypoint
coordinates scalar-prefetched into SMEM, so the copies overlap and the
cost approaches DMA bandwidth instead of per-patch latency.

Used by ops/orb._fused_level_angles_descriptors when ORB_PATCH_PALLAS=1
(kept opt-in; bit-identical by construction — it moves the same bytes the
dynamic_slice path moves; interpret-tested).

STATUS (round 3, measured on v5e): Mosaic rejects DMA slices whose
START offset is not provably 8-aligned along the sublane dim ("Failed to
prove that a tile index in dimension 1 is divisible by the tiling (8)"),
and keypoint coordinates are arbitrary. Making this land needs
aligned-down windows (y0 = 8*(y//8), x0 = 128*(x//128), fetch 48x176)
plus an in-kernel sub-window extraction — left as the documented next
step; the XLA dynamic_slice path remains the default.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8  # DMAs in flight per grid step


def _patch_kernel(xy_ref, img_ref, out_ref, sems, *, psize: int, group: int):
    pid = pl.program_id(0)
    # Mosaic DMA slices must be 8-aligned along the sublane dim: fetch a
    # rounded-up (psize8 x psize8) window; the consumer slices [:psize]
    psize8 = (psize + 7) // 8 * 8

    def issue(g):
        x = xy_ref[pid * group + g, 0]
        y = xy_ref[pid * group + g, 1]
        return pltpu.make_async_copy(
            img_ref.at[:, pl.ds(y, psize8), pl.ds(x, psize8)],
            out_ref.at[g],
            sems.at[g],
        )

    dmas = [issue(g) for g in range(group)]
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()


def patch_gather(padded, xy, psize: int = 39, interpret=None):
    """padded: (C, Hp, Wp) float32 (edge-padded image stack). xy: (B, 2)
    int32 top-left (x, y) of each patch in padded coordinates. Returns
    (B, C, psize, psize). B is padded up to a multiple of GROUP
    internally; callers slice back. interpret=None auto-selects interpret
    mode off-TPU (CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _patch_gather(padded, xy, psize, interpret)


@functools.partial(jax.jit, static_argnames=("psize", "interpret"))
def _patch_gather(padded, xy, psize: int = 39, interpret: bool = False):
    C = padded.shape[0]
    B = xy.shape[0]
    g = GROUP
    Bp = ((B + g - 1) // g) * g
    if Bp != B:
        xy = jnp.concatenate(
            [xy, jnp.zeros((Bp - B, 2), xy.dtype)], axis=0)

    psize8 = (psize + 7) // 8 * 8
    # over-pad the image so a psize8 window fits at any start
    pad_extra = psize8 - psize
    if pad_extra:
        padded = jnp.pad(padded, ((0, 0), (0, pad_extra), (0, pad_extra)),
                         mode="edge")
    out = pl.pallas_call(
        functools.partial(_patch_kernel, psize=psize, group=g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // g,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (g, C, psize8, psize8), lambda i, xy_ref: (i, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((g,))],
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, C, psize8, psize8), padded.dtype),
        interpret=interpret,
    )(xy, padded)
    return out[:B, :, :psize, :psize]
