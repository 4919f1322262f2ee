"""End-to-end RGB-D pipeline on the synthetic world (SURVEY.md config 2:
depth-initialized map, point culling + CreateNewMapPoints)."""
import numpy as np
import pytest

from orb_slam2_detailed_comments_tpu.evaluation.ate import ate_rmse
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor, TrackingState
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.system import System
from orb_slam2_detailed_comments_tpu.utils.config import SlamConfig, OrbConfig

from synthetic_world import PlanesWorld, smooth_trajectory


def run_rgbd_sequence(n_frames=25, step=0.05, seed=0):
    world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                        width=320, height=240, texture_seed=seed)
    poses = smooth_trajectory(n_frames, step=step)
    cfg = SlamConfig(
        camera=PinholeCamera(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             bf=25.0, width=320, height=240),
        orb=OrbConfig(n_features=600, max_keypoints=1024),
        fps=10.0, th_depth=120.0,
        max_keyframes=100, max_map_points=30000,
    )
    slam = System(cfg, Sensor.RGBD, enable_loop_closing=False)

    est, gt = [], []
    n_tracked = 0
    for i in range(n_frames):
        img = world.render(poses[i])
        depth = world.render_depth(poses[i])
        Tcw = slam.track_rgbd(img, depth, i * 0.1)
        if Tcw is not None and slam.tracking_state == TrackingState.OK:
            est.append(np.linalg.inv(Tcw)[:3, 3])
            gt.append(-poses[i, :3, :3].T @ poses[i, :3, 3])
            n_tracked += 1
    return slam, np.asarray(est), np.asarray(gt), n_tracked


class TestRgbdPipeline:
    @pytest.fixture(scope="class")
    def result(self):
        return run_rgbd_sequence()

    def test_tracks_from_first_frame(self, result):
        slam, est, gt, n_tracked = result
        # RGB-D initializes immediately (reference: StereoInitialization)
        assert n_tracked >= 23, f"tracked {n_tracked}"

    def test_metric_scale(self, result):
        slam, est, gt, n_tracked = result
        # depth gives metric scale: total path length must match GT closely
        d_est = np.linalg.norm(np.diff(est, axis=0), axis=1).sum()
        d_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
        assert abs(d_est / d_gt - 1.0) < 0.05, f"scale ratio {d_est / d_gt}"

    def test_ate_bounded(self, result):
        slam, est, gt, n_tracked = result
        ate = ate_rmse(est, gt, with_scale=False)  # rigid alignment
        assert ate < 0.03, f"RGB-D ATE {ate:.4f} m"

    def test_map_and_trajectory_export(self, result, tmp_path):
        slam, est, gt, n_tracked = result
        slam.save_trajectory_tum(str(tmp_path / "traj.txt"))
        lines = open(tmp_path / "traj.txt").read().strip().splitlines()
        assert len(lines) >= n_tracked - 2
        assert len(lines[0].split()) == 8
        slam.save_map(str(tmp_path / "map.npz"))
        # reload and check the store round-trips
        slam.load_map(str(tmp_path / "map.npz"))
        assert slam.map.n_keyframes() > 0


class TestFusedRgbdPipeline:
    """Fused steady-state frame path (round 5), RGB-D variant (depth map
    consumed on device by fused_rgbd_frame; th2=3 parity)."""

    @pytest.fixture(scope="class")
    def fused_result(self):
        import os
        os.environ["ORB_FUSED_TRACK"] = "1"
        try:
            return run_rgbd_sequence()
        finally:
            del os.environ["ORB_FUSED_TRACK"]

    def test_fused_tracks_with_bounded_ate(self, fused_result):
        slam, est, gt, n_tracked = fused_result
        trk = slam.tracker
        assert trk.fused_frames >= 10, (
            f"fused={trk.fused_frames} staged={trk.staged_frames}")
        assert n_tracked >= 22, f"tracked {n_tracked}"
        from orb_slam2_detailed_comments_tpu.evaluation.ate import ate_rmse
        ate = ate_rmse(est, gt, with_scale=False)
        assert ate < 0.05, f"fused RGB-D ATE {ate:.4f} m"
