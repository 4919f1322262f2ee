#!/usr/bin/env python
"""ROS stereo node (reference: Examples/ROS/ORB_SLAM2/src/ros_stereo.cc).

Usage: python examples/ros_stereo.py path_to_vocabulary path_to_settings do_rectify
``do_rectify`` in {true,false}: true builds rectification maps from the
LEFT.*/RIGHT.* calibration in the settings file (ros_stereo.cc:71-110).
"""
import sys

from _driver import make_system  # noqa: E402
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
from orb_slam2_detailed_comments_tpu.integrations.ros import StereoNode


def main(argv):
    if len(argv) != 4:
        print(__doc__)
        return 1
    slam = make_system(argv[1], argv[2], Sensor.STEREO)
    node = StereoNode.from_settings_yaml(
        slam, argv[2], do_rectify=argv[3].lower() == "true")
    node.run()
    slam.save_trajectory_tum("CameraTrajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
