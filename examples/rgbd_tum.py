#!/usr/bin/env python
"""TUM RGB-D driver (reference: Examples/RGB-D/rgbd_tum.cc).

Usage: python examples/rgbd_tum.py path_to_vocabulary path_to_settings \
           path_to_sequence_folder path_to_association

The association file holds `ts_rgb rgb_path ts_depth depth_path` lines as
produced by the TUM benchmark's associate.py (the reference ships examples
under Examples/RGB-D/associations/). If `-` is given, rgb<->depth pairs are
associated by nearest timestamp internally.
"""
import sys

from _driver import make_system, run_sequence  # noqa: E402
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
from orb_slam2_detailed_comments_tpu.io.datasets import TumRgbdDataset


def main(argv):
    if len(argv) != 5:
        print(__doc__)
        return 1
    slam = make_system(argv[1], argv[2], Sensor.RGBD)
    assoc = None if argv[4] == "-" else argv[4]
    ds = TumRgbdDataset(argv[3], associations=assoc,
                        depth_factor=slam.config.depth_map_factor)
    return run_sequence(slam, ds, Sensor.RGBD, out_prefix="CameraTrajectory")


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
