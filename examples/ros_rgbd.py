#!/usr/bin/env python
"""ROS RGB-D node (reference: Examples/ROS/ORB_SLAM2/src/ros_rgbd.cc).

Usage: python examples/ros_rgbd.py path_to_vocabulary path_to_settings
"""
import sys

from _driver import make_system  # noqa: E402
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
from orb_slam2_detailed_comments_tpu.integrations.ros import RgbdNode


def main(argv):
    if len(argv) != 3:
        print(__doc__)
        return 1
    slam = make_system(argv[1], argv[2], Sensor.RGBD)
    RgbdNode(slam).run()
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
