#!/usr/bin/env python
"""ROS monocular node (reference: Examples/ROS/ORB_SLAM2/src/ros_mono.cc).

Usage: python examples/ros_mono.py path_to_vocabulary path_to_settings
Requires a ROS1 environment (rospy); the node logic itself is testable
without one (tests/test_ros_nodes.py).
"""
import sys

from _driver import make_system  # noqa: E402
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
from orb_slam2_detailed_comments_tpu.integrations.ros import MonoNode


def main(argv):
    if len(argv) != 3:
        print(__doc__)
        return 1
    slam = make_system(argv[1], argv[2], Sensor.MONOCULAR)
    MonoNode(slam).run()
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
