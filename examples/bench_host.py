#!/usr/bin/env python
"""Host-orchestration budget of the tracking pipeline (VERDICT r3 #5).

At 2.8-15.7 ms of device time per frame, the per-frame HOST work (python
control flow + numpy in tracking.py / map_store.py / local_mapping.py —
all C++ in the reference) must stay small or it becomes the frame budget
on long runs.

Method (record/replay): run a real stereo System loop twice over
identical frames. Pass 1 records the outputs of every device-boundary
function (ORB extraction, stereo matching, projection search, pose GN,
triangulation, local BA, ...). Pass 2 re-runs the COMPLETE host pipeline
with those functions replaced by in-order replay stubs returning the
recorded values as numpy — wall time of pass 2 is pure host
orchestration + data marshalling, with zero device compute or transfer.
The pipeline is deterministic, so pass 2 follows the identical control
path (asserted by call counts).

Usage: ORB_FORCE_CPU=1 python examples/bench_host.py [--frames 20]
Prints one JSON line with value = host ms/frame.
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


def _to_host(x):
    """Recursively convert device arrays to numpy (tuples/NamedTuples)."""
    if hasattr(x, "_fields"):  # NamedTuple
        return type(x)(*[_to_host(v) for v in x])
    if isinstance(x, tuple):
        return tuple(_to_host(v) for v in x)
    if isinstance(x, list):
        return [_to_host(v) for v in x]
    if hasattr(x, "shape") or hasattr(x, "__array__"):
        return np.asarray(x)
    return x


class Memo:
    """Record/replay wrapper for one device-boundary function."""

    def __init__(self, fn):
        self.fn = fn
        self.log = []
        self.mode = "record"
        self.cursor = 0

    def __call__(self, *a, **kw):
        if self.mode == "record":
            out = _to_host(self.fn(*a, **kw))
            self.log.append(out)
            return out
        out = self.log[self.cursor]
        self.cursor += 1
        return out


BOUNDARIES = [
    # (module path, attribute)
    ("orb_slam2_detailed_comments_tpu.frontend.tracking", "extract_orb"),
    ("orb_slam2_detailed_comments_tpu.frontend.tracking", "stereo_match"),
    ("orb_slam2_detailed_comments_tpu.frontend.tracking", "depth_to_stereo"),
    ("orb_slam2_detailed_comments_tpu.frontend.tracking", "pose_optimization"),
    ("orb_slam2_detailed_comments_tpu.frontend.tracking", "initialize_two_view"),
    ("orb_slam2_detailed_comments_tpu.frontend.tracking", "se3_inverse"),
    ("orb_slam2_detailed_comments_tpu.ops.orb", "extract_orb_batch"),
    ("orb_slam2_detailed_comments_tpu.ops.matching", "project_and_cull"),
    ("orb_slam2_detailed_comments_tpu.ops.matching", "search_by_projection"),
    ("orb_slam2_detailed_comments_tpu.ops.matching", "match_descriptors"),
    ("orb_slam2_detailed_comments_tpu.ops.matching", "search_for_initialization"),
    ("orb_slam2_detailed_comments_tpu.ops.matching", "search_for_triangulation"),
    ("orb_slam2_detailed_comments_tpu.ops.matching", "compute_fundamental"),
    ("orb_slam2_detailed_comments_tpu.backend.local_mapping", "triangulate_dlt"),
    ("orb_slam2_detailed_comments_tpu.backend.local_mapping",
     "local_bundle_adjustment"),
    ("orb_slam2_detailed_comments_tpu.backend.local_mapping",
     "global_bundle_adjustment"),
    ("orb_slam2_detailed_comments_tpu.geometry.se3", "se3_renormalize"),
    ("orb_slam2_detailed_comments_tpu.geometry.se3", "se3_inverse"),
    # round-5 fused frame path (ORB_FUSED_TRACK=1): the whole frame is one
    # device call; the pad scatter is the only other device boundary
    ("orb_slam2_detailed_comments_tpu.models.slam_step", "fused_stereo_frame"),
    ("orb_slam2_detailed_comments_tpu.models.slam_step", "fused_mono_frame"),
    ("orb_slam2_detailed_comments_tpu.models.slam_step", "fused_rgbd_frame"),
    ("orb_slam2_detailed_comments_tpu.frontend.device_map", "_scatter_rows"),
]


def run(n_frames=20, width=640, height=480, features=1000):
    import importlib
    from synthetic_world import CylinderWorld, loop_trajectory
    from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
    from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
    from orb_slam2_detailed_comments_tpu.system import System
    from orb_slam2_detailed_comments_tpu.utils.config import (OrbConfig,
                                                              SlamConfig)

    fx = 180.0 * (width / 320.0)
    radius, baseline = 25.0, 0.3
    world = CylinderWorld(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                          width=width, height=height, radius=radius)
    poses = loop_trajectory(300, path_radius=0.5 * radius, laps=2.0,
                            overlap=18)[:n_frames]
    kp_cap = 1 << int(np.ceil(np.log2(features + 1)))

    def make_system():
        cfg = SlamConfig(
            camera=PinholeCamera(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                                 width=width, height=height,
                                 bf=fx * baseline),
            orb=OrbConfig(n_features=features, max_keypoints=kp_cap),
            fps=10.0, th_depth=40.0, max_keyframes=256,
            max_map_points=120000)
        return System(cfg, Sensor.STEREO, enable_loop_closing=False)

    Tb = np.eye(4, dtype=np.float32)
    Tb[0, 3] = -baseline
    frames = [(world.render(p), world.render((Tb @ p).astype(np.float32)))
              for p in poses]

    # undistort is a method; wrap it too
    from orb_slam2_detailed_comments_tpu.geometry import camera as cam_mod
    memos = []
    orig = {}
    for mod_name, attr in BOUNDARIES:
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, attr)
        m = Memo(fn)
        memos.append((mod, attr, m))
        orig[(mod_name, attr)] = fn
        setattr(mod, attr, m)
    und = Memo(cam_mod.PinholeCamera.undistort_pixels)

    def _und_wrap(self_c, uv):  # plain function: binds as a method
        return und(self_c, uv)
    cam_mod.PinholeCamera.undistort_pixels = _und_wrap
    memos.append((cam_mod.PinholeCamera, "undistort_pixels", und))

    try:
        # pass 1: record (device work executes)
        slam = make_system()
        for i, (L, R) in enumerate(frames):
            slam.track_stereo(L, R, i * 0.1)
        n_calls = [len(m.log) for _, _, m in memos]

        # pass 2: replay (host only)
        for _, _, m in memos:
            m.mode = "replay"
            m.cursor = 0
        slam2 = make_system()
        prof = None
        if os.environ.get("BENCH_HOST_PROFILE"):
            import cProfile
            prof = cProfile.Profile()
            prof.enable()
        t0 = time.perf_counter()
        for i, (L, R) in enumerate(frames):
            slam2.track_stereo(L, R, i * 0.1)
        host_s = time.perf_counter() - t0
        if prof is not None:
            prof.disable()
            import pstats
            pstats.Stats(prof).sort_stats("cumulative").print_stats(35)
        for (_, _, m), n in zip(memos, n_calls):
            assert m.cursor == n, (
                f"replay diverged: {m.fn} called {m.cursor} vs {n}")
    finally:
        for mod, attr, _ in memos[:-1]:
            setattr(mod, attr, orig[(mod.__name__, attr)])
        cam_mod.PinholeCamera.undistort_pixels = und.fn

    kfs = slam2.map.n_keyframes()
    return {
        "metric": "tracking_host_orchestration",
        "value": round(1e3 * host_s / n_frames, 3),
        "unit": "ms/frame",
        "extra": {
            "frames": n_frames, "keyframes_processed": int(kfs),
            "resolution": f"{width}x{height}", "features": features,
            "method": "record/replay, device boundaries stubbed",
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--features", type=int, default=1000)
    args = ap.parse_args()
    print(json.dumps(run(args.frames, args.width, args.height,
                         args.features)))


if __name__ == "__main__":
    raise SystemExit(main())
