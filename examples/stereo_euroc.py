#!/usr/bin/env python
"""EuRoC stereo driver (reference: Examples/Stereo/stereo_euroc.cc).

Usage: python examples/stereo_euroc.py path_to_vocabulary path_to_settings \
           path_to_cam0_folder path_to_cam1_folder path_to_times_file

Raw (unrectified) cam0/cam1 pairs are rectified on the fly when the settings
file carries the LEFT.*/RIGHT.* calibration blocks, mirroring the
reference's map construction + per-frame cv::remap
(stereo_euroc.cc:60-82, :165-166).
"""
import sys

from _driver import make_system, run_sequence  # noqa: E402
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
from orb_slam2_detailed_comments_tpu.io.datasets import (EurocDataset,
                                                         RectifiedStereoDataset)
from orb_slam2_detailed_comments_tpu.ops.rectify import (StereoRectifier,
                                                         has_rectification)
from orb_slam2_detailed_comments_tpu.utils.config import load_settings_raw


def main(argv):
    if len(argv) != 6:
        print(__doc__)
        return 1
    slam = make_system(argv[1], argv[2], Sensor.STEREO)
    ds = EurocDataset(cam0_dir=argv[3], cam1_dir=argv[4],
                      timestamps_file=argv[5], stereo=True)
    raw = load_settings_raw(argv[2])
    if has_rectification(raw):
        ds = RectifiedStereoDataset(ds, StereoRectifier.from_settings(raw))
    return run_sequence(slam, ds, Sensor.STEREO, out_prefix="CameraTrajectory")


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
