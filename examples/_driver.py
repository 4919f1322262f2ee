"""Shared runner for the per-dataset example drivers.

Mirrors the structure of the reference's example mains (reference:
Examples/Monocular/mono_tum.cc:37-121): construct System from vocabulary +
settings, feed frames at their timestamps, print per-frame latency stats
(median/mean) at exit, save trajectories.

The vocabulary argument accepts a .npz file saved by
``BinaryVocabulary.save`` or ``-`` (self-train online, a capability the
reference lacks — it requires the 140MB ORBvoc.txt up front,
reference: System.cc:78-94).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
from orb_slam2_detailed_comments_tpu.system import System


def make_system(vocab_path: str, settings_path: str, sensor: Sensor) -> System:
    vocabulary = None
    if vocab_path and vocab_path != "-" and os.path.exists(vocab_path):
        if vocab_path.endswith(".txt"):
            # the reference's DBoW2 ORBvoc.txt format
            from orb_slam2_detailed_comments_tpu.place.vocabulary_tree import TreeVocabulary
            vocabulary = TreeVocabulary.load_dbow2_text(vocab_path)
        else:
            import numpy as np
            data = np.load(vocab_path)
            if "tree" in data:
                from orb_slam2_detailed_comments_tpu.place.vocabulary_tree import TreeVocabulary
                vocabulary = TreeVocabulary.load(vocab_path)
            else:
                from orb_slam2_detailed_comments_tpu.place.vocabulary import BinaryVocabulary
                vocabulary = BinaryVocabulary.load(vocab_path)
    return System.from_settings_yaml(settings_path, sensor, vocabulary=vocabulary)


def run_sequence(slam: System, dataset, sensor: Sensor, out_prefix: str = "trajectory",
                 pace_to_timestamps: bool = False) -> int:
    """Track every frame of `dataset`; print latency stats; save trajectories.

    ``pace_to_timestamps`` sleeps to replay at sensor rate like the
    reference mains do (mono_tum.cc:100-108); off by default for batch eval.
    """
    times = []
    n = len(dataset)
    prev_ts = None
    for i in range(n):
        item = dataset[i]
        ts = item[0]
        t0 = time.perf_counter()
        if sensor == Sensor.RGBD:
            slam.track_rgbd(item[1], item[2], ts)
        elif sensor == Sensor.STEREO:
            slam.track_stereo(item[1], item[2], ts)
        else:
            slam.track_monocular(item[1], ts)
        dt = time.perf_counter() - t0
        times.append(dt)
        if pace_to_timestamps and prev_ts is not None:
            gap = ts - prev_ts
            if dt < gap:
                time.sleep(gap - dt)
        prev_ts = ts
        if i % 50 == 0:
            print(f"frame {i}/{n} state={slam.tracking_state.name} "
                  f"kfs={slam.map.n_keyframes()} mps={slam.map.n_map_points()}")

    slam.shutdown()
    times.sort()
    print("-------")
    print(f"median tracking time: {times[len(times) // 2]:.4f}")
    print(f"mean tracking time:   {float(np.mean(times)):.4f}")
    slam.save_trajectory_tum(out_prefix + "_tum.txt")
    slam.save_trajectory_kitti(out_prefix + "_kitti.txt")
    slam.save_keyframe_trajectory_tum(out_prefix + "_kf_tum.txt")
    print(f"trajectories written to {out_prefix}_*.txt")
    return 0
