#!/usr/bin/env python
"""Unified dataset driver (replaces the reference's per-dataset example
binaries mono_tum / rgbd_tum / stereo_kitti / mono_kitti / mono_euroc /
stereo_euroc, reference: Examples/*/*.cc and CMakeLists.txt:100-129).

Usage:
  python examples/run_slam.py tum-mono   <settings.yaml> <sequence_dir> [out_prefix]
  python examples/run_slam.py tum-rgbd   <settings.yaml> <sequence_dir> [out_prefix]
  python examples/run_slam.py kitti-mono <settings.yaml> <sequence_dir> [out_prefix]
  python examples/run_slam.py kitti-stereo <settings.yaml> <sequence_dir> [out_prefix]
  python examples/run_slam.py euroc-mono <settings.yaml> <mav_dir> [out_prefix]
  python examples/run_slam.py euroc-stereo <settings.yaml> <mav_dir> [out_prefix]

Prints per-frame latency stats at exit like the reference mains
(mono_tum.cc:96-121) and writes TUM + KITTI trajectory files.

Options:
  --viz DIR [--viz-period S]  stream annotated frame + map PNGs and a
      status.json to DIR during the run — the headless equivalent of the
      reference's live Pangolin viewer (Viewer.cc:76-236).
  --localization              run in localization-only mode (frozen map).
"""
from __future__ import annotations

import os
import sys
import time

# runnable as `python examples/run_slam.py` without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
from orb_slam2_detailed_comments_tpu.io.datasets import (
    TumRgbdDataset, KittiOdometryDataset, EurocDataset,
)
from orb_slam2_detailed_comments_tpu.system import System


def main():
    argv = list(sys.argv[1:])
    viz_dir = None
    viz_period = 2.0
    localization = False
    if "--viz" in argv:
        i = argv.index("--viz")
        viz_dir = argv[i + 1]
        del argv[i:i + 2]
    if "--viz-period" in argv:
        i = argv.index("--viz-period")
        viz_period = float(argv[i + 1])
        del argv[i:i + 2]
    if "--localization" in argv:
        argv.remove("--localization")
        localization = True
    if len(argv) < 3:
        print(__doc__)
        return 1
    mode, settings, seq = argv[0], argv[1], argv[2]
    out = argv[3] if len(argv) > 3 else "trajectory"

    if mode.startswith("tum"):
        ds = TumRgbdDataset(seq)
        sensor = Sensor.RGBD if mode == "tum-rgbd" else Sensor.MONOCULAR
    elif mode.startswith("kitti"):
        ds = KittiOdometryDataset(seq, stereo=(mode == "kitti-stereo"))
        sensor = Sensor.STEREO if mode == "kitti-stereo" else Sensor.MONOCULAR
    elif mode.startswith("euroc"):
        ds = EurocDataset(seq, stereo=(mode == "euroc-stereo"))
        sensor = Sensor.STEREO if mode == "euroc-stereo" else Sensor.MONOCULAR
    else:
        raise SystemExit(f"unknown mode {mode}")

    slam = System.from_settings_yaml(settings, sensor)
    if localization:
        slam.activate_localization_mode()
    viewer = None
    if viz_dir:
        from orb_slam2_detailed_comments_tpu.viz.stream import StreamingViewer
        viewer = StreamingViewer(slam, viz_dir, period_s=viz_period)
    times = []
    for i in range(len(ds)):
        item = ds[i]
        t0 = time.perf_counter()
        if sensor == Sensor.RGBD:
            ts, img, depth = item
            slam.track_rgbd(img, depth, ts)
        elif sensor == Sensor.STEREO:
            ts, left, right = item
            slam.track_stereo(left, right, ts)
            img = left
        else:
            ts, img = item[0], item[1]
            slam.track_monocular(img, ts)
        times.append(time.perf_counter() - t0)
        if viewer is not None:
            viewer.update(img, slam.tracker.last_frame)
        if i % 50 == 0:
            print(f"frame {i}/{len(ds)} state={slam.tracking_state.name} "
                  f"kfs={slam.map.n_keyframes()} mps={slam.map.n_map_points()}")

    if viewer is not None and len(ds):
        viewer.update(img, slam.tracker.last_frame, force=True)
    slam.shutdown()
    from orb_slam2_detailed_comments_tpu.utils import counters
    if counters.snapshot():
        print("capacity truncations:", counters.snapshot())
    times.sort()
    print("-------")
    print(f"median tracking time: {times[len(times) // 2]:.4f}s")
    print(f"mean tracking time:   {np.mean(times):.4f}s")
    slam.save_trajectory_tum(out + "_tum.txt")
    slam.save_trajectory_kitti(out + "_kitti.txt")
    slam.save_keyframe_trajectory_tum(out + "_kf_tum.txt")
    print(f"trajectories written to {out}_*.txt")

    # auto-ATE/RPE when the dataset ships ground truth (the reference
    # defers this to the external TUM scripts, README.md:192-196)
    from orb_slam2_detailed_comments_tpu.evaluation.gt_eval import (
        evaluate_against_gt)
    from orb_slam2_detailed_comments_tpu.io.trajectory import (
        recover_frame_trajectory)
    frames = recover_frame_trajectory(slam.tracker.trajectory, slam.map)
    metrics = evaluate_against_gt(mode, seq, frames,
                                  mono=(sensor == Sensor.MONOCULAR))
    if metrics is not None:
        import json
        print("ground-truth evaluation:", json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
