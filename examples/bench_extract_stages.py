"""Sub-stage timing of the fused tracking step on the real TPU.

Timing through the axon tunnel is treacherous: block_until_ready can
return early (fake ~0.1 ms numbers), and serialized dependency chains add
~10 ms of tunnel latency per dependent dispatch (docs/ROUND1_NOTES.md).
This harness uses the *dispatch-slope* method: time N1 and N2 same-input
dispatches (one block at the end of each run) and report
(t(N2) - t(N1)) / (N2 - N1), which cancels fixed overheads and is immune
to an early-returning final block as long as the dispatch queue is
bounded (it is — throughput is throttled by real device execution).

Run from the repo root: `python examples/bench_extract_stages.py`.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_consistent_inputs
from orb_slam2_detailed_comments_tpu.models.slam_step import mono_tracking_step
from orb_slam2_detailed_comments_tpu.ops.fast import (
    fast_score_dense, fast_score_map, nms_3x3)
from orb_slam2_detailed_comments_tpu.ops.orb import (
    _select_level_keypoints, extract_orb)
from orb_slam2_detailed_comments_tpu.ops.pyramid import (
    build_pyramid, features_per_level, gaussian_blur, pyramid_shapes)

N1, N2 = 30, 150


def run_n(fn, args, n):
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def slope_ms(fn, args):
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    run_n(fn, args, 5)  # settle
    t1 = run_n(fn, args, N1)
    t2 = run_n(fn, args, N2)
    return 1e3 * (t2 - t1) / (N2 - N1)


def main():
    args, orb, cam = make_consistent_inputs()
    img = args[0]
    n_levels, sf = orb.n_levels, orb.scale_factor
    budgets = features_per_level(orb.n_features, n_levels, sf)
    shapes = pyramid_shapes(img.shape[0], img.shape[1], n_levels, sf)
    min_border = orb.edge_threshold - 3

    # warm up the first (minutes-slow) device->host pull before timing
    np.asarray(jnp.sum(img))

    @jax.jit
    def stage_pyramid(img):
        return build_pyramid(img, n_levels, sf)

    @jax.jit
    def stage_maps(img):
        levels = build_pyramid(img, n_levels, sf)
        outs = []
        for limg in levels:
            outs.append((nms_3x3(fast_score_map(limg, float(orb.min_th_fast))),
                         fast_score_dense(limg), gaussian_blur(limg)))
        return outs

    @jax.jit
    def stage_select(img):
        # NOTE: this hand-mirrors extract_orb's internal border-masking +
        # selection so the sub-stage can be timed in isolation; keep in
        # sync with ops/orb.py extract_orb or the timings misattribute.
        levels = build_pyramid(img, n_levels, sf)
        outs = []
        for lv, limg in enumerate(levels):
            score = nms_3x3(fast_score_map(limg, float(orb.min_th_fast)))
            H, W = shapes[lv]
            ys2 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            xs2 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            inb = ((ys2 >= min_border) & (ys2 < H - min_border)
                   & (xs2 >= min_border) & (xs2 < W - min_border))
            score = jnp.where(inb, score, 0.0)
            outs.append(_select_level_keypoints(score, int(budgets[lv]), orb.cell_size))
        return outs

    def stage_extract(img):
        return extract_orb(img, orb)

    def stage_full(*a):
        return mono_tracking_step(*a, orb=orb, cam=cam)

    t_pyr = slope_ms(stage_pyramid, (img,))
    t_maps = slope_ms(stage_maps, (img,))
    t_sel = slope_ms(stage_select, (img,))
    t_ext = slope_ms(stage_extract, (img,))
    t_full = slope_ms(stage_full, args)

    print(f"pyramid only:            {t_pyr:7.3f} ms")
    print(f"pyr+FAST+NMS+raw+blur:   {t_maps:7.3f} ms  (maps delta {t_maps - t_pyr:+.3f})")
    print(f"pyr+FAST+NMS+selection:  {t_sel:7.3f} ms  (selection, no raw/blur)")
    print(f"extract_orb full:        {t_ext:7.3f} ms  (angles+desc delta {t_ext - t_sel:+.3f})")
    print(f"full tracking step:      {t_full:7.3f} ms  (match+pose delta {t_full - t_ext:+.3f})")


if __name__ == "__main__":
    main()
