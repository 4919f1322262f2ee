"""Pallas DMA patch gather: per-keypoint (2, 39, 39) patches in one kernel.

The per-keypoint patch slice is the dominant cost of ORB extraction at
stereo scale (measured on v5e, 1241x376 x 2 images x 2000 features:
~6.1 ms of the 14.5 ms extraction — BASELINE.md round-3 stage split).
XLA lowers a vmapped `dynamic_slice` to a serialized gather; this kernel
instead issues G explicit HBM->VMEM DMAs per grid step with the keypoint
coordinates scalar-prefetched into SMEM, so the copies overlap and the
cost approaches DMA bandwidth instead of per-patch latency.

Mosaic requires DMA start offsets to respect the f32 (8, 128) tiling
("failed to prove that a tile index ... is divisible by the tiling") and
keypoint coordinates are arbitrary, so the kernel fetches the
ALIGNED-DOWN window around each patch — y0 = 8*(y//8), x0 = 128*(x//128),
window (WIN_H=48) x (WIN_W=256) covers the worst-case residual
(dy<8 + 39 <= 47, dx<128 + 39 <= 167; lanes rounded to a full 128 tile
because tpu.dynamic_rotate needs an aligned lane dim). The residual
offsets (computed on the XLA side and scalar-prefetched with the aligned
starts) cannot be vector-load slice starts either, so the sub-window is
extracted by ROTATING the window so (dy, dx) lands at the origin and
taking a static aligned slice. `pl.multiple_of` hints let Mosaic prove
the DMA starts are tile-aligned; the image ref must live in HBM
(`pltpu.HBM` — under `pl.ANY` the compiler places it in VMEM and
dynamic memref slices of VMEM are rejected).

Default path on TPU since round 3 (ORB_PATCH_PALLAS=0 restores the XLA
vmapped dynamic_slice). Measured on v5e, bit-identical outputs:
stereo step 20.2 -> 15.7 ms/frame (49.4 -> 63.7 fps at 1241x376/2000
feat), mono step 3.85 -> 2.83 ms/frame (259 -> 353 fps at 640x480/1000
feat). Interpret-tested against host slicing on CPU, including under
vmap via extract_orb_batch.

Reference parity: this implements the per-keypoint patch reads of
ORBextractor::computeOrientation/computeDescriptors
(reference: src/ORBextractor.cc:104-161, :177-254) as bulk DMA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8    # DMAs in flight per grid step
WIN_H = 48   # 8-aligned-down y window: 7 (max residual) + 39 -> 48
WIN_W = 256  # 128-aligned-down x window: 127 + 39 = 166 -> 256 (lane-
             # aligned: tpu.dynamic_rotate needs a 128-multiple lane dim)


def _patch_kernel(xy_ref, img_ref, out_ref, win, sems, *, psize: int,
                  psize8: int, group: int):
    pid = pl.program_id(0)

    def issue(g):
        # coords are PACKED two-per-int32 ((v << 16) | u, both < 2^15) to
        # halve the scalar-prefetch SMEM footprint — SMEM is a 1 MB budget
        # shared by every kernel in the compiled program, and the stereo
        # step's four patch calls tipped it over (round 4). The XLA side
        # aligned the starts down to the (8, 128) f32 tiling; the hints
        # let Mosaic prove the DMA slice is tile-aligned.
        packed = xy_ref[0, pid * group + g]
        xa = pl.multiple_of(packed & 0xFFFF, 128)
        ya = pl.multiple_of(packed >> 16, 8)
        return pltpu.make_async_copy(
            img_ref.at[:, pl.ds(ya, WIN_H), pl.ds(xa, WIN_W)],
            win.at[g],
            sems.at[g],
        )

    dmas = [issue(g) for g in range(group)]
    for d in dmas:
        d.start()
    for g, d in enumerate(dmas):
        d.wait()
        packed_r = xy_ref[1, pid * group + g]
        dx = packed_r & 0xFFFF
        dy = packed_r >> 16
        # Mosaic vector loads need 8-aligned sublane starts, so the
        # residual offsets cannot be dynamic slice starts; rotate the
        # window so (dy, dx) lands at the origin and take a static slice.
        # non-negative shifts: hardware dynamic_rotate treats the shift
        # amount as a left-rotate count modulo the (power-of-two) dim size
        sub = win[g]
        sub = pltpu.roll(sub, (WIN_H - dy) % WIN_H, 1)
        sub = pltpu.roll(sub, (WIN_W - dx) % WIN_W, 2)
        out_ref[g] = sub[:, :psize8, :psize8]


def patch_gather(padded, xy, psize: int = 39, interpret=None,
                 group: int = GROUP, prefetch: bool = True):
    """padded: (C, Hp, Wp) float32 (edge-padded image stack). xy: (B, 2)
    int32 top-left (x, y) of each patch in padded coordinates. Returns
    (B, C, psize, psize). B is padded up to a multiple of `group`
    internally; callers slice back. interpret=None auto-selects interpret
    mode off-TPU (CPU tests). `group` = DMAs in flight per grid step;
    lower it for kernels sharing a program with other scalar-prefetch
    pallas calls (the 1 MB scoped SMEM arena leaves ZERO headroom for
    register spills, and the unrolled group loop is the spill source)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _patch_gather(padded, xy, psize, interpret, group, prefetch)


@functools.partial(jax.jit, static_argnames=("psize", "interpret", "group",
                                             "prefetch"))
def _patch_gather(padded, xy, psize: int = 39, interpret: bool = False,
                  group: int = GROUP, prefetch: bool = True):
    if psize > 40:
        raise ValueError("patch_gather windows sized for psize <= 40")
    C, Hp, Wp = padded.shape
    B = xy.shape[0]
    g = group
    Bp = ((B + g - 1) // g) * g
    if Bp != B:
        xy = jnp.concatenate(
            [xy, jnp.zeros((Bp - B, 2), xy.dtype)], axis=0)
    # round the coord row length to a 128 multiple: SMEM windows pad the
    # MINOR dim to 128 lanes, so a (Bp, 2) layout ballooned to
    # Bp x 128 x 4 B = 1 MB (the whole SMEM budget, round 4); as (2, Bp128)
    # it costs its true ~16 KB
    Bp128 = -(-Bp // 128) * 128

    psize8 = (psize + 7) // 8 * 8
    # grow the image so an aligned-down window fits at any legal start:
    # worst y = Hp - psize -> y0 + WIN_H <= Hp + (WIN_H - psize); same in x,
    # then round the lane dim up to a full 128 tile.
    grow_h = WIN_H - psize
    grow_w = WIN_W - psize
    Wp_new = -(-(Wp + grow_w) // 128) * 128
    padded = jnp.pad(padded, ((0, 0), (0, grow_h), (0, Wp_new - Wp)),
                     mode="edge")

    x, y = xy[:, 0], xy[:, 1]
    xa = (x // 128) * 128
    ya = (y // 8) * 8
    # clamp out-of-range starts (invalid keypoint slots from the cell-grid
    # pad region can carry arbitrary xy): the XLA dynamic_slice path this
    # kernel replaces clamps implicitly; an unclamped start would issue an
    # HBM DMA past the grown image. Clip bounds are kept tile-aligned:
    # Wp_new - WIN_W is a 128 multiple; the y bound is aligned DOWN to 8
    # (legal in-range starts are unaffected since they are 8-multiples
    # <= Hp - psize, and the window still fits: bound + WIN_H <= Hp+grow_h).
    xa = jnp.clip(xa, 0, Wp_new - WIN_W)
    ya = jnp.clip(ya, 0, ((Hp + grow_h - WIN_H) // 8) * 8)
    dx = jnp.clip(x - xa, 0, WIN_W - psize)
    dy = jnp.clip(y - ya, 0, WIN_H - psize)
    coords = jnp.stack([(ya << 16) | xa, (dy << 16) | dx], axis=0)
    coords = jnp.pad(coords, ((0, 0), (0, Bp128 - Bp)))

    # Two spec forms, same kernel:
    #  * prefetch=True (PrefetchScalarGridSpec): required for vmapped
    #    callers — its batching rule is what lets extract_orb_batch vmap
    #    over the L/R pair (a plain HBM-ref call is rejected under vmap).
    #    Cost: the prefetch operand reserves the ENTIRE 1 MB scoped SMEM
    #    arena regardless of its 16 KB size.
    #  * prefetch=False (plain SMEM-space input): the coords cost only
    #    their own bytes — required when several patch calls share one
    #    compiled program (the stereo SAD gathers tipped the 1 MB SMEM
    #    budget over by 144 B with the prefetch form, round 4). Not
    #    vmap-compatible.
    kernel = functools.partial(_patch_kernel, psize=psize, psize8=psize8,
                               group=g)
    out_shape = jax.ShapeDtypeStruct((Bp, C, psize8, psize8), padded.dtype)
    scratch = [
        pltpu.VMEM((g, C, WIN_H, WIN_W), padded.dtype),
        pltpu.SemaphoreType.DMA((g,)),
    ]
    if prefetch:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Bp // g,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec(
                    (g, C, psize8, psize8), lambda i, xy_ref: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(coords, padded)
    else:
        out = pl.pallas_call(
            kernel,
            grid=(Bp // g,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (g, C, psize8, psize8), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
            out_shape=out_shape,
            interpret=interpret,
        )(coords, padded)
    return out[:B, :, :psize, :psize]
