"""The per-dataset example drivers (reference CLI parity: mono_tum,
rgbd_tum, ... — reference: Examples/*/*.cc, CMakeLists.txt:100-129) run
end-to-end on a disk TUM-format dataset with a settings YAML and an
association file."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))

from synthetic_world import PlanesWorld, smooth_trajectory

SETTINGS = """%YAML:1.0
Camera.fx: 250.0
Camera.fy: 250.0
Camera.cx: 160.0
Camera.cy: 120.0
Camera.width: 320
Camera.height: 240
Camera.fps: 10.0
Camera.bf: 25.0
Camera.RGB: 1
ThDepth: 120.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 500
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


@pytest.fixture(scope="module")
def tum_seq(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("drv_seq")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                        width=320, height=240, texture_seed=7)
    poses = smooth_trajectory(8, step=0.05)
    rgb_lines, depth_lines, assoc_lines = [], [], []
    for i in range(8):
        ts = 10.0 + i * 0.1
        img = world.render(poses[i]).astype(np.uint8)
        depth = (world.render_depth(poses[i]) * 5000.0).astype(np.uint16)
        Image.fromarray(img, mode="L").save(root / "rgb" / f"{ts:.6f}.png")
        Image.fromarray(depth, mode="I;16").save(root / "depth" / f"{ts:.6f}.png")
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        depth_lines.append(f"{ts:.6f} depth/{ts:.6f}.png")
        assoc_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png {ts:.6f} depth/{ts:.6f}.png")
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    (root / "assoc.txt").write_text("\n".join(assoc_lines) + "\n")
    (root / "settings.yaml").write_text(SETTINGS)
    return root


def test_rgbd_tum_driver(tum_seq, tmp_path, monkeypatch):
    import rgbd_tum
    monkeypatch.chdir(tmp_path)
    rc = rgbd_tum.main(["rgbd_tum", "-", str(tum_seq / "settings.yaml"),
                        str(tum_seq), str(tum_seq / "assoc.txt")])
    assert rc == 0
    out = (tmp_path / "CameraTrajectory_tum.txt").read_text().splitlines()
    assert len(out) >= 6


def test_mono_tum_driver(tum_seq, tmp_path, monkeypatch):
    import mono_tum
    monkeypatch.chdir(tmp_path)
    rc = mono_tum.main(["mono_tum", "-", str(tum_seq / "settings.yaml"), str(tum_seq)])
    assert rc == 0
    assert (tmp_path / "KeyFrameTrajectory_tum.txt").exists()


def test_euroc_dataset_explicit_dirs(tum_seq):
    # EurocDataset with explicit cam0/cam1 dirs + times file (stereo_euroc CLI)
    from orb_slam2_detailed_comments_tpu.io.datasets import EurocDataset
    cam0 = tum_seq / "rgb"
    names = sorted(os.path.splitext(n)[0] for n in os.listdir(cam0))
    times = tum_seq / "times_euroc.txt"
    times.write_text("\n".join(names) + "\n")
    ds = EurocDataset(cam0_dir=str(cam0), cam1_dir=str(cam0),
                      timestamps_file=str(times), stereo=True)
    assert len(ds) == 8
    t, left, right = ds[0]
    assert left.shape == (240, 320) and right.shape == (240, 320)


@pytest.fixture(scope="module")
def kitti_seq(tmp_path_factory):
    """KITTI-odometry-format stereo sequence on disk (image_0/image_1 +
    times.txt, %06d.png names — reference: stereo_kitti.cc LoadImages)."""
    from PIL import Image
    root = tmp_path_factory.mktemp("kitti_seq")
    (root / "image_0").mkdir()
    (root / "image_1").mkdir()
    world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                        width=320, height=240, texture_seed=9)
    baseline = 0.12
    poses = smooth_trajectory(8, step=0.05)
    T_rl = np.eye(4, dtype=np.float32)
    T_rl[0, 3] = -baseline
    times = []
    for i in range(8):
        left = world.render(poses[i]).astype(np.uint8)
        right = world.render(T_rl @ poses[i]).astype(np.uint8)
        Image.fromarray(left, mode="L").save(root / "image_0" / f"{i:06d}.png")
        Image.fromarray(right, mode="L").save(root / "image_1" / f"{i:06d}.png")
        times.append(f"{i * 0.1:.6e}")
    (root / "times.txt").write_text("\n".join(times) + "\n")
    settings = SETTINGS.replace("Camera.bf: 25.0", f"Camera.bf: {250.0 * baseline}")
    (root / "settings.yaml").write_text(settings)
    return root


def test_stereo_kitti_driver(kitti_seq, tmp_path, monkeypatch):
    import stereo_kitti
    monkeypatch.chdir(tmp_path)
    rc = stereo_kitti.main(["stereo_kitti", "-", str(kitti_seq / "settings.yaml"),
                            str(kitti_seq)])
    assert rc == 0
    out = (tmp_path / "CameraTrajectory_kitti.txt").read_text().splitlines()
    assert len(out) >= 6
    # KITTI format: 12 floats (3x4 row-major pose) per line
    assert all(len(line.split()) == 12 for line in out)
