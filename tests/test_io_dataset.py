"""IO-layer integration: write a TUM-format RGB-D dataset from the
synthetic world to disk (PNG images + rgb.txt/depth.txt), then run the
full System through the dataset loader — exercises io/datasets.py,
association, PNG decoding and the drivers' code path."""
import os

import numpy as np
import pytest

from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor, TrackingState
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.io.datasets import TumRgbdDataset
from orb_slam2_detailed_comments_tpu.system import System
from orb_slam2_detailed_comments_tpu.utils.config import SlamConfig, OrbConfig
from orb_slam2_detailed_comments_tpu.viz.drawers import FrameDrawer, MapDrawer, TrajectoryPlotter

from synthetic_world import PlanesWorld, smooth_trajectory


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("tum_seq")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                        width=320, height=240, texture_seed=51)
    poses = smooth_trajectory(10, step=0.05)
    rgb_lines, depth_lines = [], []
    for i in range(10):
        ts = 100.0 + i * 0.1
        img = world.render(poses[i]).astype(np.uint8)
        depth = (world.render_depth(poses[i]) * 5000.0).astype(np.uint16)
        Image.fromarray(img, mode="L").save(root / "rgb" / f"{ts:.6f}.png")
        Image.fromarray(depth, mode="I;16").save(root / "depth" / f"{ts:.6f}.png")
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        # offset depth timestamps slightly (association must pair them)
        depth_lines.append(f"{ts + 0.005:.6f} depth/{ts:.6f}.png")
    (root / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines) + "\n")
    return root, poses


class TestTumDataset:
    def test_loads_and_associates(self, tum_dir):
        root, poses = tum_dir
        ds = TumRgbdDataset(str(root))
        assert len(ds) == 10
        ts, img, depth = ds[0]
        assert img.shape == (240, 320) and img.dtype == np.float32
        assert depth is not None and abs(float(depth.max()) - 12.0) < 3.0

    def test_full_system_on_disk_dataset(self, tum_dir, tmp_path):
        root, poses = tum_dir
        ds = TumRgbdDataset(str(root))
        cfg = SlamConfig(
            camera=PinholeCamera(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                                 bf=25.0, width=320, height=240),
            orb=OrbConfig(n_features=500, max_keypoints=1024),
            fps=10.0, th_depth=120.0, max_keyframes=100, max_map_points=30000)
        slam = System(cfg, Sensor.RGBD, enable_loop_closing=False)
        n_ok = 0
        for i in range(len(ds)):
            ts, img, depth = ds[i]
            T = slam.track_rgbd(img, depth, ts)
            if T is not None:
                n_ok += 1
        assert n_ok >= 8, f"tracked {n_ok}/10 from disk"
        # viz smoke: draw the last frame + map + trajectory
        fr = slam.tracker.last_frame
        rgb = FrameDrawer(cfg).draw(img, fr)
        # image rows + the 15-px DrawTextInfo status banner (drawers.py)
        assert rgb.shape == (255, 320, 3)
        MapDrawer(slam.map).render(str(tmp_path / "map.png"))
        assert os.path.exists(tmp_path / "map.png")
        slam.save_trajectory_tum(str(tmp_path / "traj.txt"))
        assert len((tmp_path / "traj.txt").read_text().splitlines()) >= 8
