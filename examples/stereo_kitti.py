#!/usr/bin/env python
"""KITTI stereo driver (reference: Examples/Stereo/stereo_kitti.cc).

Usage: python examples/stereo_kitti.py path_to_vocabulary path_to_settings path_to_sequence_folder
"""
import sys

from _driver import make_system, run_sequence  # noqa: E402
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
from orb_slam2_detailed_comments_tpu.io.datasets import KittiOdometryDataset


def main(argv):
    if len(argv) != 4:
        print(__doc__)
        return 1
    slam = make_system(argv[1], argv[2], Sensor.STEREO)
    ds = KittiOdometryDataset(argv[3], stereo=True)
    return run_sequence(slam, ds, Sensor.STEREO, out_prefix="CameraTrajectory")


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
