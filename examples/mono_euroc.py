#!/usr/bin/env python
"""EuRoC monocular driver (reference: Examples/Monocular/mono_euroc.cc).

Usage: python examples/mono_euroc.py path_to_vocabulary path_to_settings \
           path_to_image_folder path_to_times_file
"""
import sys

from _driver import make_system, run_sequence  # noqa: E402
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
from orb_slam2_detailed_comments_tpu.io.datasets import EurocDataset


def main(argv):
    if len(argv) != 5:
        print(__doc__)
        return 1
    slam = make_system(argv[1], argv[2], Sensor.MONOCULAR)
    ds = EurocDataset(cam0_dir=argv[3], timestamps_file=argv[4], stereo=False)
    return run_sequence(slam, ds, Sensor.MONOCULAR, out_prefix="KeyFrameTrajectory")


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
