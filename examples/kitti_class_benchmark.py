#!/usr/bin/env python
"""KITTI-00-class rendered accuracy benchmark (dataset-less fallback).

No real datasets exist in this environment, so the trajectory-accuracy
gate the reference validates with KITTI 00 (stereo, 1241x376, 2000
features, ~4.5 km with loops; ATE RMSE ~1.3 m, BASELINE.md) is exercised
on a rendered street-canyon circuit of the same CLASS: long multi-lap
stereo sequence, 640x480, 2000 ORB features/frame, real revisits that the
loop closer must detect and correct, ATE measured against exact ground
truth and gated as a fraction of travel.

The full run (default 1000 frames) is the committed evidence row in
BASELINE.md; tests/test_kitti_class.py runs a reduced gated version.

A/B protocol for the day real data arrives (BASELINE.md section "Our
targets"): run `examples/run_slam.py kitti-stereo configs/KITTI00-02.yaml
<seq00dir> out` on the same commit, compute ATE with
evaluation.ate.ate_rmse against the KITTI ground-truth poses, and compare
against the paper's 1.3 m — nothing in this benchmark is specific to
rendered input.

Usage:
  ORB_FORCE_CPU=1 python examples/kitti_class_benchmark.py \
      [--frames 1000] [--width 640 --height 480] [--features 2000]
      [--radius 50] [--laps 2] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

if os.environ.get("ORB_FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np


def run(n_frames=1000, width=640, height=480, features=2000, radius=50.0,
        laps=2.0, path_ratio=0.5, seed=0, progress=True, sensor="stereo",
        trajectory="loop", blackout_at=-1.0, blackout_frames=30):
    """Returns a result dict (ate, travel, fractions, loop stats).

    sensor="stereo" (default, the KITTI modality): the right image is
    RENDERED from the baseline-offset pose and the full row-bucket/SAD
    stereo matching kernel (ops/stereo.py) runs at flagship scale —
    the component KITTI parity actually depends on (reference:
    Frame.cc:880-1176). sensor="rgbd" keeps the round-2 perfect-depth
    variant for A/B. sensor="mono" runs the monocular pipeline
    (free-scale Sim3 loops, scale-aligned ATE, per-lap scale-drift
    stats — the long-run regime VERDICT r2 task 9 asked for).

    trajectory="route" (round 5, VERDICT r4 task 2): the 4-phase
    exploration route (synthetic_world.route_trajectory) instead of the
    plain circle — hundreds of live keyframes at loop time, 3 loop
    closures, the essential graph at K in the hundreds INSIDE the
    pipeline. blackout_at (fraction of the run) injects
    `blackout_frames` black frames — a kidnap — and the result records
    whether relocalization recovered (VERDICT r4 task 8)."""
    from synthetic_world import (CylinderWorld, loop_trajectory,
                                 route_trajectory)
    from orb_slam2_detailed_comments_tpu.evaluation.ate import ate_rmse
    from orb_slam2_detailed_comments_tpu.frontend.tracking import (
        Sensor, TrackingState)
    from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
    from orb_slam2_detailed_comments_tpu.system import System
    from orb_slam2_detailed_comments_tpu.utils.config import (
        OrbConfig, SlamConfig)

    # street-canyon geometry: camera circles at path_ratio*radius inside a
    # textured cylinder of `radius` (KITTI-00's revisit structure: the
    # second lap re-observes the first); fx scaled so the angular feature
    # flow matches the 320x240 loop tests that validated this world.
    fx = 180.0 * (width / 320.0)
    baseline = radius / 100.0 * 1.2     # keeps close-point threshold sane
    world = CylinderWorld(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                          width=width, height=height, radius=radius,
                          texture_seed=seed)
    if trajectory == "route":
        poses = route_trajectory(n_frames, radius)
    else:
        overlap = max(int(n_frames * 0.12 / max(laps, 1.0)), 12)
        poses = loop_trajectory(n_frames, path_radius=path_ratio * radius,
                                laps=laps, overlap=overlap)
    kp_cap = 1 << int(np.ceil(np.log2(features + 1)))
    cfg = SlamConfig(
        camera=PinholeCamera(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                             width=width, height=height, bf=fx * baseline),
        orb=OrbConfig(n_features=features, max_keypoints=kp_cap),
        fps=10.0, th_depth=40.0,
        max_keyframes=1024, max_map_points=200000)
    stereo = sensor == "stereo"
    mono = sensor == "mono"
    sen = (Sensor.STEREO if stereo
           else Sensor.MONOCULAR if mono else Sensor.RGBD)
    slam = System(cfg, sen, enable_loop_closing=True,
                  enable_global_ba_on_loop=True)
    # right camera: baseline-offset along the camera x-axis
    # (x_cam_right = x_cam_left - b  ->  Tcw_r = Tb @ Tcw_l)
    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -baseline

    bo_start = int(blackout_at * n_frames) if blackout_at > 0 else -1
    bo_end = bo_start + blackout_frames if bo_start > 0 else -1
    black = np.zeros((height, width), np.float32)

    est, gt, states = [], [], []
    kfs_live = []            # live-KF count sampled at each loop closure
    reloc_frame = -1         # first OK frame after the blackout
    t_start = time.perf_counter()
    n_loops_seen = 0
    for i in range(n_frames):
        kidnapped = bo_start <= i < bo_end
        img = black if kidnapped else world.render(poses[i])
        if stereo:
            img_r = black if kidnapped else world.render(
                (Tb @ poses[i]).astype(np.float32))
            Tcw = slam.track_stereo(img, img_r, i * 0.1)
        elif mono:
            Tcw = slam.track_monocular(img, i * 0.1)
        else:
            depth = (np.zeros_like(black) if kidnapped
                     else world.render_depth(poses[i]))
            Tcw = slam.track_rgbd(img, depth, i * 0.1)
        states.append(slam.tracking_state)
        if slam.loop_closer and slam.loop_closer.n_loops_closed > n_loops_seen:
            n_loops_seen = slam.loop_closer.n_loops_closed
            kfs_live.append((i, int(slam.map.n_keyframes())))
        if (reloc_frame < 0 and bo_end > 0 and i >= bo_end
                and slam.tracking_state == TrackingState.OK):
            reloc_frame = i
        if Tcw is not None and slam.tracking_state == TrackingState.OK:
            est.append(np.linalg.inv(Tcw)[:3, 3])
            gt.append(-poses[i, :3, :3].T @ poses[i, :3, 3])
        if progress and i % 50 == 0:
            el = time.perf_counter() - t_start
            print(f"frame {i}/{n_frames} state={slam.tracking_state.name} "
                  f"kfs={slam.map.n_keyframes()} mps={slam.map.n_map_points()} "
                  f"loops={slam.loop_closer.n_loops_closed} "
                  f"[{el:.0f}s]", flush=True)
    slam.shutdown()

    est = np.asarray(est)
    gt = np.asarray(gt)
    travel = float(np.linalg.norm(np.diff(gt, axis=0), axis=1).sum())
    # ATE on the EXPORTED trajectory — the reference's evaluation model
    # (System::SaveTrajectoryTUM recomputes every frame from its corrected
    # reference keyframe, System.cc:476-581; published KITTI ATE numbers
    # include retroactive loop corrections)
    from orb_slam2_detailed_comments_tpu.io.trajectory import (
        recover_frame_trajectory)
    rec = recover_frame_trajectory(slam.tracker.trajectory, slam.map)
    est_rec = np.asarray([np.linalg.inv(T)[:3, 3] for _, _, T in rec])
    gt_rec = np.asarray([-poses[f, :3, :3].T @ poses[f, :3, 3]
                         for f, _, _ in rec])
    # mono: scale is unobservable -> scale-aligned ATE (reference paper
    # evaluation does the same for the monocular rows)
    ate = float(ate_rmse(est_rec, gt_rec, with_scale=mono))
    ate_live = float(ate_rmse(est, gt, with_scale=mono)) if len(est) else -1.0
    n_ok = sum(1 for s in states if s == TrackingState.OK)
    # state diagnostics: where tracking was not OK
    not_ok = [i for i, s in enumerate(states) if s != TrackingState.OK]
    streaks = []
    for i in not_ok:
        if streaks and i == streaks[-1][1] + 1:
            streaks[-1][1] = i
        else:
            streaks.append([i, i])
    res = {
        "frames": n_frames, "resolution": f"{width}x{height}",
        "sensor": sensor, "trajectory": trajectory,
        "features": features, "travel_m": round(travel, 2),
        "ate_rmse_m": round(ate, 4),
        "ate_live_m": round(ate_live, 4),
        "ate_pct_travel": round(100.0 * ate / max(travel, 1e-9), 4),
        "tracked_frac": round(n_ok / max(len(states), 1), 4),
        "keyframes": int(slam.map.n_keyframes()),
        "map_points": int(slam.map.n_map_points()),
        "loops_closed": int(slam.loop_closer.n_loops_closed),
        "wall_s": round(time.perf_counter() - t_start, 1),
        "lost_streaks": [(a, b) for a, b in streaks[:10]],
        "kfs_live_at_loops": kfs_live,
        "fused_frames": int(getattr(slam.tracker, "fused_frames", 0)),
        "staged_frames": int(getattr(slam.tracker, "staged_frames", 0)),
    }
    if bo_start > 0:
        res["blackout"] = [bo_start, bo_end]
        res["reloc_recovered"] = reloc_frame >= 0
        res["reloc_latency_frames"] = (reloc_frame - bo_end
                                       if reloc_frame >= 0 else -1)
    if mono:
        # per-lap scale drift: align each lap's recovered segment to gt
        # with its own similarity; the lap-to-lap scale ratio is the drift
        from orb_slam2_detailed_comments_tpu.evaluation.ate import (
            align_umeyama)
        fpl = n_frames / max(laps, 1.0)
        lap_scales = []
        rec_f = np.asarray([f for f, _, _ in rec])
        for lap in range(int(round(laps))):
            sel = np.nonzero((rec_f >= lap * fpl) & (rec_f < (lap + 1) * fpl))[0]
            if sel.size > 10:
                s, _, _ = align_umeyama(est_rec[sel], gt_rec[sel], True)
                lap_scales.append(round(float(s), 4))
        res["lap_scales"] = lap_scales
        if len(lap_scales) >= 2:
            res["scale_drift_pct"] = round(
                100.0 * (lap_scales[-1] / lap_scales[0] - 1.0), 3)
    disc = bow_discrimination(slam, poses)
    if disc is not None:
        res.update(disc)
    from orb_slam2_detailed_comments_tpu.utils import counters
    if counters.snapshot():
        res["truncations"] = counters.snapshot()
    return res


def bow_discrimination(slam, poses):
    """Place-recognition quality over the run (round-3 evidence ask): for
    each keyframe with a true revisit (spatially close, temporally far),
    compare its best true-revisit BoW score against its best FALSE score
    (spatially far keyframe). Median margin > 1 means the vocabulary
    separates revisits from perceptual aliasing at this scale."""
    lc = slam.loop_closer
    if lc is None or not lc.kf_bow:
        return None
    mp = slam.map
    kfs = [k for k in lc.kf_bow if mp.kf_valid[k]]
    if len(kfs) < 20:
        return None
    n_frames = len(poses)
    fid = {k: int(mp.kf_frame_id[k]) for k in kfs}
    C = {k: -poses[fid[k], :3, :3].T @ poses[fid[k], :3, 3] for k in kfs}
    ordered = sorted(kfs, key=lambda k: fid[k])
    steps = [np.linalg.norm(C[a] - C[b])
             for a, b in zip(ordered[:-1], ordered[1:])]
    step = float(np.median(steps)) if steps else 1.0
    near_th, far_th = 3.0 * step, 10.0 * step
    n_words = lc.voc.n_words
    margins, trues, falses = [], [], []
    for k in kfs:
        ids_k, vals_k = lc.kf_bow[k]
        dense_k = np.zeros(n_words, np.float32)
        dense_k[ids_k] = vals_k
        t_best, f_best, has_true = 0.0, 0.0, False
        for j in kfs:
            if j == k:
                continue
            d = float(np.linalg.norm(C[j] - C[k]))
            sep = abs(fid[j] - fid[k])
            ids_j, vals_j = lc.kf_bow[j]
            s = float(np.minimum(dense_k[ids_j], vals_j).sum())
            if d < near_th and sep > 0.2 * n_frames:
                t_best, has_true = max(t_best, s), True
            elif d > far_th:
                f_best = max(f_best, s)
        if has_true and f_best > 0:
            margins.append(t_best / f_best)
            trues.append(t_best)
            falses.append(f_best)
    if not margins:
        return None
    return {
        "bow_true_revisit_score_median": round(float(np.median(trues)), 4),
        "bow_best_false_score_median": round(float(np.median(falses)), 4),
        "bow_margin_median": round(float(np.median(margins)), 3),
        "bow_margin_p10": round(float(np.percentile(margins, 10)), 3),
        "bow_pairs": len(margins),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--features", type=int, default=2000)
    ap.add_argument("--radius", type=float, default=50.0)
    ap.add_argument("--laps", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sensor", choices=("stereo", "rgbd", "mono"), default="stereo")
    ap.add_argument("--trajectory", choices=("loop", "route"), default="loop")
    ap.add_argument("--blackout-at", type=float, default=-1.0,
                    help="fraction of the run at which to inject a "
                         "30-frame blackout (kidnap test)")
    ap.add_argument("--blackout-frames", type=int, default=30)
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    res = run(args.frames, args.width, args.height, args.features,
              args.radius, laps=args.laps, seed=args.seed,
              sensor=args.sensor, trajectory=args.trajectory,
              blackout_at=args.blackout_at,
              blackout_frames=args.blackout_frames)
    print(json.dumps(res))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
