#!/usr/bin/env python
"""End-to-end System-loop benchmark ON the TPU (VERDICT r4 task 1).

The per-step benches (bench.py) measure the fused device program alone;
this measures what a user actually gets: the FULL System loop — tracking
+ local mapping + loop closing, all bookkeeping included — sustained over
hundreds of frames with rendered input pre-staged in RAM (render cost is
excluded; everything else, including host orchestration and device
transfers, is included).

Matches the reference's whole-system real-time claim
(/root/reference/README.md:43; per-frame path src/Tracking.cc:428-790):
KITTI stereo budget 10 fps, TUM mono/RGB-D budget 30 fps (BASELINE.md).

Usage:
  python examples/bench_e2e.py [--frames 500] [--sensor stereo|mono]
  BENCH_MODE=e2e python bench.py        # same, via the bench entry point

Output: one JSON dict with sustained fps (median + trimmed mean), stage
split, fused-path fraction, and device-pad delta stats.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np

WARMUP = 60  # frames excluded from the sustained measurement (compiles)


def run_e2e(n_frames=500, sensor="stereo", progress=True, radius=50.0,
            laps=2.0, seed=0, async_mapping=False):
    from synthetic_world import CylinderWorld, loop_trajectory
    from orb_slam2_detailed_comments_tpu.frontend.tracking import (
        Sensor, TrackingState)
    from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
    from orb_slam2_detailed_comments_tpu.system import System
    from orb_slam2_detailed_comments_tpu.utils.config import (
        OrbConfig, SlamConfig)

    stereo = sensor == "stereo"
    if stereo:
        width, height, features, fps_budget = 1241, 376, 2000, 10.0
    else:
        width, height, features, fps_budget = 640, 480, 1000, 30.0

    fx = 180.0 * (width / 320.0)
    baseline = radius / 100.0 * 1.2
    world = CylinderWorld(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                          width=width, height=height, radius=radius,
                          texture_seed=seed)
    overlap = max(int(n_frames * 0.12 / max(laps, 1.0)), 12)
    poses = loop_trajectory(n_frames, path_radius=0.5 * radius, laps=laps,
                            overlap=overlap)
    kp_cap = 1 << int(np.ceil(np.log2(features + 1)))
    cfg = SlamConfig(
        camera=PinholeCamera(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                             width=width, height=height,
                             bf=fx * baseline if stereo else 0.0),
        orb=OrbConfig(n_features=features, max_keypoints=kp_cap),
        # th_depth: close/far boundary in baselines (KITTI yaml: 35 at
        # b=0.537 m -> ~19 m, which covers most of KITTI's urban
        # structure). This world's wall sits ~0.5*radius from the orbit;
        # 60 baselines (= 0.72*radius) covers it the same way. At 40 the
        # whole scene counted as "far" and the reference's
        # close-point keyframe heuristic (Tracking.cc:1599-1616) fired on
        # 86% of frames — a world artifact, not a policy difference.
        fps=10.0, th_depth=60.0,
        max_keyframes=1024, max_map_points=200000)
    sen = Sensor.STEREO if stereo else Sensor.MONOCULAR
    slam = System(cfg, sen, enable_loop_closing=True,
                  enable_global_ba_on_loop=True,
                  async_mapping=async_mapping)

    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -baseline

    # pre-stage rendered frames (uint8 to bound RAM; the loop feeds them
    # as-is — device casts to f32 inside the jitted step)
    if progress:
        print(f"pre-rendering {n_frames} {width}x{height} "
              f"{'stereo pairs' if stereo else 'frames'}...", flush=True)
    frames = []
    for i in range(n_frames):
        L = world.render(poses[i]).astype(np.uint8)
        if stereo:
            R = world.render((Tb @ poses[i]).astype(np.float32)).astype(np.uint8)
            frames.append((L, R))
        else:
            frames.append((L,))

    # double-buffered device staging: frame i+1's images are committed to
    # the device (async put) while frame i computes — the camera-DMA
    # analog. Through the axon tunnel the upload alone is ~38 ms at KITTI
    # geometry (~25 MB/s); on production hardware PCIe makes it ~0.06 ms.
    import jax.numpy as jnp

    def _stage(fr):
        return tuple(jnp.asarray(a) for a in fr)

    lat = []
    n_ok = 0
    t_run0 = time.perf_counter()
    staged = _stage(frames[0])
    for i, fr in enumerate(frames):
        t0 = time.perf_counter()
        cur, staged = staged, (_stage(frames[i + 1])
                               if i + 1 < n_frames else None)
        if stereo:
            Tcw = slam.track_stereo(cur[0], cur[1], i * 0.1)
        else:
            Tcw = slam.track_monocular(cur[0], i * 0.1)
        lat.append(time.perf_counter() - t0)
        if Tcw is not None and slam.tracking_state == TrackingState.OK:
            n_ok += 1
        if progress and i % int(os.environ.get("E2E_PROGRESS_EVERY", "50")) == 0:
            print(f"frame {i}/{n_frames} state={slam.tracking_state.name} "
                  f"kfs={slam.map.n_keyframes()} "
                  f"lat={1e3 * lat[-1]:.1f}ms", flush=True)
    wall = time.perf_counter() - t_run0

    lat = np.asarray(lat[WARMUP:])
    sustained_fps = 1.0 / lat.mean() if lat.size else 0.0
    med_ms = 1e3 * float(np.median(lat))
    trk = slam.tracker
    stages = {k: {"mean_ms": round(v["mean_ms"], 2),
                  "median_ms": round(v["median_ms"], 2), "n": v["count"]}
              for k, v in trk.timer.summary().items()}
    dm = trk._dev_map
    res = {
        "metric": (f"e2e_{sensor}_fps_{width}x{height}_{features}feat"
                   + ("_async" if async_mapping else "")),
        "value": round(sustained_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(sustained_fps / fps_budget, 3),
        "extra": {
            "median_ms": round(med_ms, 2),
            "mean_ms": round(1e3 * float(lat.mean()), 2) if lat.size else -1,
            "p90_ms": round(1e3 * float(np.percentile(lat, 90)), 2) if lat.size else -1,
            "frames": n_frames, "warmup_excluded": WARMUP,
            "tracked_frac": round(n_ok / n_frames, 4),
            "keyframes": int(slam.map.n_keyframes()),
            "map_points": int(slam.map.n_map_points()),
            "loops_closed": int(slam.loop_closer.n_loops_closed)
            if slam.loop_closer else 0,
            "fused_frames": int(trk.fused_frames),
            "staged_frames": int(trk.staged_frames),
            "pad_rows_last": int(dm.last_rows_uploaded) if dm else -1,
            "pad_full_uploads": int(dm.full_uploads) if dm else -1,
            "stage_ms": stages,
            "wall_s": round(wall, 1),
        },
    }
    slam.shutdown()
    return res


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--sensor", choices=("stereo", "mono"), default="stereo")
    ap.add_argument("--radius", type=float, default=50.0)
    ap.add_argument("--async", dest="async_mapping", action="store_true",
                    help="overlap local mapping with tracking "
                         "(backend/async_pipeline; VERDICT r4 task 7 A/B)")
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    res = run_e2e(args.frames, args.sensor, radius=args.radius,
                  async_mapping=args.async_mapping)
    print(json.dumps(res))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
