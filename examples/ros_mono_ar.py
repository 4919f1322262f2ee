#!/usr/bin/env python
"""ROS monocular AR node (reference: Examples/ROS/ORB_SLAM2/src/AR/ros_mono_ar.cc).

Usage: python examples/ros_mono_ar.py path_to_vocabulary path_to_settings [out_dir]
Headless equivalent of ViewerAR: tracks the camera, fits a scene plane to
the tracked map points once tracking is stable, anchors a virtual cube and
writes cube-overlaid frames to ``out_dir`` (default ./ar_frames).
"""
import os
import sys

from _driver import make_system  # noqa: E402
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
from orb_slam2_detailed_comments_tpu.integrations.ros import MonoARNode


def main(argv):
    if len(argv) not in (3, 4):
        print(__doc__)
        return 1
    out_dir = argv[3] if len(argv) == 4 else "ar_frames"
    os.makedirs(out_dir, exist_ok=True)
    slam = make_system(argv[1], argv[2], Sensor.MONOCULAR)

    counter = {"i": 0}

    def on_frame(frame_rgb, ts):
        from PIL import Image
        if node.cube is None and counter["i"] > 30:
            node.insert_cube()
        Image.fromarray(frame_rgb).save(
            os.path.join(out_dir, f"{counter['i']:06d}.png"))
        counter["i"] += 1

    node = MonoARNode(slam, on_frame=on_frame)
    node.run()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
