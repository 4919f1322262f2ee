"""Relocalization end-to-end: build a map, lose tracking (blank frames),
then return to a mapped view — the tracker must recover via BoW candidates
+ PnP RANSAC + projection refinement (reference: Tracking.cc:2245-2499)."""
import numpy as np
import pytest

from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor, TrackingState
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.system import System
from orb_slam2_detailed_comments_tpu.utils.config import SlamConfig, OrbConfig

from synthetic_world import PlanesWorld, smooth_trajectory


class TestRelocalization:
    @pytest.fixture(scope="class")
    def run(self):
        world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                            width=320, height=240, texture_seed=21)
        poses = smooth_trajectory(18, step=0.06)
        cfg = SlamConfig(
            camera=PinholeCamera(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                                 bf=25.0, width=320, height=240),
            orb=OrbConfig(n_features=600, max_keypoints=1024),
            fps=10.0, th_depth=120.0, max_keyframes=100, max_map_points=30000)
        slam = System(cfg, Sensor.RGBD, enable_loop_closing=False)

        # phase 1: map 18 frames (vocabulary self-trains)
        for i in range(18):
            slam.track_rgbd(world.render(poses[i]), world.render_depth(poses[i]), i * 0.1)
        assert slam.tracking_state == TrackingState.OK
        assert slam.relocalizer is not None, "vocabulary must have self-trained"
        kfs_before = slam.map.n_keyframes()

        # phase 2: blind the camera -> LOST (but map must survive: >5 KFs
        # avoids the auto-reset, reference Tracking.cc:744-753)
        blank = np.zeros((240, 320), np.float32)
        blank_d = np.zeros((240, 320), np.float32)
        for j in range(3):
            slam.track_rgbd(blank, blank_d, 1.0 + j * 0.1)
        lost_state = slam.tracking_state

        # phase 3: return to a previously mapped view
        recovered = None
        for j in range(4):
            i = 8  # revisit the middle of the mapped trajectory
            T = slam.track_rgbd(world.render(poses[i]), world.render_depth(poses[i]),
                                2.0 + j * 0.1)
            if T is not None and slam.tracking_state == TrackingState.OK:
                recovered = T
                break
        return slam, poses, lost_state, recovered, kfs_before

    def test_goes_lost_on_blank_frames(self, run):
        slam, poses, lost_state, recovered, kfs_before = run
        assert lost_state == TrackingState.LOST

    def test_map_survives(self, run):
        slam, poses, lost_state, recovered, kfs_before = run
        assert slam.map.n_keyframes() >= min(kfs_before, 3)

    def test_relocalizes_at_mapped_view(self, run):
        slam, poses, lost_state, recovered, kfs_before = run
        assert recovered is not None, "failed to relocalize"
        C = np.linalg.inv(recovered)[:3, 3]
        G = -poses[8, :3, :3].T @ poses[8, :3, 3]
        assert np.linalg.norm(C - G) < 0.05, f"reloc pose error {np.linalg.norm(C - G)}"
