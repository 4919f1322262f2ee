#!/usr/bin/env python
"""EuRoC stereo driver (reference: Examples/Stereo/stereo_euroc.cc).

Usage: python examples/stereo_euroc.py path_to_vocabulary path_to_settings \
           path_to_cam0_folder path_to_cam1_folder path_to_times_file
"""
import sys

from _driver import make_system, run_sequence  # noqa: E402
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
from orb_slam2_detailed_comments_tpu.io.datasets import EurocDataset


def main(argv):
    if len(argv) != 6:
        print(__doc__)
        return 1
    slam = make_system(argv[1], argv[2], Sensor.STEREO)
    ds = EurocDataset(cam0_dir=argv[3], cam1_dir=argv[4],
                      timestamps_file=argv[5], stereo=True)
    return run_sequence(slam, ds, Sensor.STEREO, out_prefix="CameraTrajectory")


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
