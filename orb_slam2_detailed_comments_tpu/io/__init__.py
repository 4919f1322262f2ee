from .trajectory import (
    recover_frame_trajectory, save_trajectory_tum, save_trajectory_kitti,
    save_keyframe_trajectory_tum,
)
from .datasets import TumRgbdDataset, KittiOdometryDataset, EurocDataset, load_image_gray
