"""System API tests: vocabulary self-training, relocalization wiring,
localization-only mode, async pipeline, reset, config loading."""
import os

import numpy as np
import pytest

from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor, TrackingState
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.place.vocabulary import BinaryVocabulary
from orb_slam2_detailed_comments_tpu.system import System
from orb_slam2_detailed_comments_tpu.utils.config import SlamConfig, OrbConfig, load_settings_yaml

from synthetic_world import PlanesWorld, smooth_trajectory


def make_cfg():
    return SlamConfig(
        camera=PinholeCamera(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             bf=25.0, width=320, height=240),
        orb=OrbConfig(n_features=500, max_keypoints=1024),
        fps=10.0, th_depth=120.0, max_keyframes=100, max_map_points=30000,
    )


class TestSettingsYaml:
    def test_parses_reference_format(self, tmp_path):
        yaml = tmp_path / "settings.yaml"
        yaml.write_text(
            "%YAML:1.0\n\n"
            "Camera.fx: 517.306408\nCamera.fy: 516.469215\n"
            "Camera.cx: 318.643040\nCamera.cy: 255.313989\n"
            "Camera.k1: 0.262383\nCamera.k2: -0.953104\n"
            "Camera.p1: -0.005358\nCamera.p2: 0.002628\nCamera.k3: 1.163314\n"
            "Camera.fps: 30.0\nCamera.RGB: 1\nCamera.bf: 40.0\n"
            "ThDepth: 40.0\nDepthMapFactor: 5000.0\n"
            "ORBextractor.nFeatures: 1000\nORBextractor.scaleFactor: 1.2\n"
            "ORBextractor.nLevels: 8\nORBextractor.iniThFAST: 20\n"
            "ORBextractor.minThFAST: 7\n")
        cfg = load_settings_yaml(str(yaml))
        assert abs(cfg.camera.fx - 517.306408) < 1e-5
        assert abs(cfg.camera.k3 - 1.163314) < 1e-5
        assert cfg.orb.n_features == 1000
        assert cfg.fps == 30.0
        assert cfg.th_depth == 40.0


class TestVocabularySelfTraining:
    def test_trains_after_enough_keyframes(self):
        world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                            width=320, height=240, texture_seed=11)
        poses = smooth_trajectory(16, step=0.06)
        # vocabulary="online" opts out of the shipped default vocabulary to
        # exercise the self-training fallback path
        slam = System(make_cfg(), Sensor.RGBD, vocabulary="online")
        assert slam.voc is None
        for i in range(16):
            img = world.render(poses[i])
            depth = world.render_depth(poses[i])
            slam.track_rgbd(img, depth, i * 0.1)
        assert slam.voc is not None, "vocabulary should self-train"
        assert slam.relocalizer is not None
        assert slam.kfdb is not None
        # keyframes got indexed
        assert slam.kfdb.active.sum() >= slam.map.n_keyframes() - 1


class TestLocalizationOnlyMode:
    def test_tracks_without_extending_map(self):
        world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                            width=320, height=240, texture_seed=12)
        poses = smooth_trajectory(14, step=0.04)
        slam = System(make_cfg(), Sensor.RGBD, enable_loop_closing=False)
        for i in range(7):
            slam.track_rgbd(world.render(poses[i]), world.render_depth(poses[i]), i * 0.1)
        n_kf = slam.map.n_keyframes()
        n_mp = slam.map.n_map_points()
        slam.activate_localization_mode()
        ok = 0
        for i in range(7, 14):
            T = slam.track_rgbd(world.render(poses[i]), world.render_depth(poses[i]), i * 0.1)
            if T is not None:
                ok += 1
        assert ok >= 5, f"localization-only tracked {ok}/7"
        assert slam.map.n_keyframes() == n_kf, "map must not grow in localization mode"
        assert slam.map.n_map_points() == n_mp


class TestAsyncPipeline:
    def test_async_matches_sync_capability(self):
        world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                            width=320, height=240, texture_seed=13)
        poses = smooth_trajectory(12, step=0.05)
        slam = System(make_cfg(), Sensor.RGBD, enable_loop_closing=False,
                      async_mapping=True)
        n_ok = 0
        for i in range(12):
            T = slam.track_rgbd(world.render(poses[i]), world.render_depth(poses[i]), i * 0.1)
            if T is not None:
                n_ok += 1
        slam.local_mapper.wait_idle(timeout=30.0)
        slam.shutdown()
        assert n_ok >= 10
        assert slam.map.n_keyframes() >= 2
        assert slam.map.n_map_points() > 300


class TestCheckpointResume:
    def test_save_load_and_continue_tracking(self, tmp_path):
        """Map checkpoint/resume (the reference's SaveMap/LoadMap TODO):
        save mid-run, reload into a fresh System, keep tracking."""
        world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                            width=320, height=240, texture_seed=31)
        poses = smooth_trajectory(16, step=0.05)
        slam = System(make_cfg(), Sensor.RGBD, enable_loop_closing=False)
        for i in range(8):
            slam.track_rgbd(world.render(poses[i]), world.render_depth(poses[i]), i * 0.1)
        assert slam.tracking_state == TrackingState.OK
        path = str(tmp_path / "map.npz")
        slam.save_map(path)

        slam2 = System(make_cfg(), Sensor.RGBD, enable_loop_closing=False)
        slam2.load_map(path)
        assert slam2.map.n_keyframes() == slam.map.n_keyframes()
        assert slam2.map.n_map_points() == slam.map.n_map_points()
        # resume tracking against the loaded map in localization mode
        slam2.activate_localization_mode()
        slam2.tracker.state = TrackingState.OK
        slam2.tracker.last_frame = slam.tracker.last_frame
        slam2.tracker.last_kf_id = slam.tracker.last_kf_id
        slam2.tracker.velocity = slam.tracker.velocity
        ok = 0
        for i in range(8, 14):
            T = slam2.track_rgbd(world.render(poses[i]), world.render_depth(poses[i]), i * 0.1)
            if T is not None:
                ok += 1
        assert ok >= 4, f"resumed tracking only {ok}/6 frames"


class TestTrajectoryFormats:
    def test_kitti_format(self, tmp_path):
        world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                            width=320, height=240, texture_seed=32)
        poses = smooth_trajectory(8, step=0.05)
        slam = System(make_cfg(), Sensor.RGBD, enable_loop_closing=False)
        for i in range(8):
            slam.track_rgbd(world.render(poses[i]), world.render_depth(poses[i]), i * 0.1)
        p = tmp_path / "kitti.txt"
        slam.save_trajectory_kitti(str(p))
        lines = p.read_text().strip().splitlines()
        assert len(lines) >= 6
        row = np.asarray([float(x) for x in lines[0].split()])
        assert row.shape == (12,)
        # first pose ~ identity
        T = row.reshape(3, 4)
        np.testing.assert_allclose(T[:, :3], np.eye(3), atol=1e-3)
