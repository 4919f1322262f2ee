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
    if len(sys.argv) < 4:
        print(__doc__)
        return 1
    mode, settings, seq = sys.argv[1], sys.argv[2], sys.argv[3]
    out = sys.argv[4] if len(sys.argv) > 4 else "trajectory"

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
        else:
            ts, img = item[0], item[1]
            slam.track_monocular(img, ts)
        times.append(time.perf_counter() - t0)
        if i % 50 == 0:
            print(f"frame {i}/{len(ds)} state={slam.tracking_state.name} "
                  f"kfs={slam.map.n_keyframes()} mps={slam.map.n_map_points()}")

    slam.shutdown()
    times.sort()
    print("-------")
    print(f"median tracking time: {times[len(times) // 2]:.4f}s")
    print(f"mean tracking time:   {np.mean(times):.4f}s")
    slam.save_trajectory_tum(out + "_tum.txt")
    slam.save_trajectory_kitti(out + "_kitti.txt")
    slam.save_keyframe_trajectory_tum(out + "_kf_tum.txt")
    print(f"trajectories written to {out}_*.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
