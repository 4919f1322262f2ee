"""End-to-end monocular SLAM slice on a synthetic world (SURVEY.md step 5):
two-view init, motion-model tracking, keyframe insertion, local mapping +
BA, with ATE bounded against ground truth."""
import numpy as np
import pytest

from orb_slam2_detailed_comments_tpu.backend.local_mapping import LocalMapper
from orb_slam2_detailed_comments_tpu.evaluation.ate import ate_rmse
from orb_slam2_detailed_comments_tpu.frontend.tracking import Tracker, TrackingState, Sensor
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.state.map_store import MapStore
from orb_slam2_detailed_comments_tpu.utils.config import SlamConfig, OrbConfig

from synthetic_world import PlanesWorld, smooth_trajectory


def run_mono_sequence(n_frames=32, step=0.05, seed=0):
    world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                        width=320, height=240, texture_seed=seed)
    poses = smooth_trajectory(n_frames, step=step)
    cfg = SlamConfig(
        camera=PinholeCamera(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             width=320, height=240),
        orb=OrbConfig(n_features=600, max_keypoints=1024),
        fps=10.0,
        max_keyframes=100,
        max_map_points=30000,
    )
    ms = MapStore(cfg)
    mapper = LocalMapper(cfg, ms, monocular=True)
    tracker = Tracker(cfg, ms, Sensor.MONOCULAR, local_mapper=mapper)

    est, gt = [], []
    n_tracked = 0
    for i in range(n_frames):
        img = world.render(poses[i])
        Tcw = tracker.track_monocular(img, i * 0.1)
        if Tcw is not None and tracker.state == TrackingState.OK:
            est.append(np.linalg.inv(Tcw)[:3, 3])  # camera center
            gt.append(-poses[i, :3, :3].T @ poses[i, :3, 3])
            n_tracked += 1
    return tracker, ms, np.asarray(est), np.asarray(gt), n_tracked


class TestMonoPipeline:
    @pytest.fixture(scope="class")
    def result(self):
        return run_mono_sequence()

    def test_initializes_and_tracks(self, result):
        tracker, ms, est, gt, n_tracked = result
        assert tracker.state == TrackingState.OK
        assert n_tracked > 25, f"only {n_tracked} frames tracked"

    def test_map_grows(self, result):
        tracker, ms, est, gt, n_tracked = result
        assert ms.n_keyframes() >= 3
        assert ms.n_map_points() > 300

    def test_ate_bounded(self, result):
        tracker, ms, est, gt, n_tracked = result
        # scale-aligned ATE (mono): the world spans ~1.6m of travel; demand
        # cm-level tracking like the reference on TUM (BASELINE.md)
        ate = ate_rmse(est, gt, with_scale=True)
        assert ate < 0.05, f"ATE {ate:.4f} m"

    def test_covisibility_graph_connected(self, result):
        tracker, ms, est, gt, n_tracked = result
        kfs = ms.keyframe_ids()
        for k in kfs:
            if k == ms.origin_kf:
                continue
            assert ms.parent[k] >= 0 or ms.covis[k].max() > 0


class TestFusedMonoPipeline:
    """Fused steady-state frame path (round 5), monocular variant: one
    device dispatch per frame against the device-resident local map."""

    @pytest.fixture(scope="class")
    def fused_result(self):
        import os
        os.environ["ORB_FUSED_TRACK"] = "1"
        try:
            return run_mono_sequence()
        finally:
            del os.environ["ORB_FUSED_TRACK"]

    def test_fused_tracks_with_bounded_ate(self, fused_result):
        tracker, ms, est, gt, n_tracked = fused_result
        assert tracker.fused_frames >= 10, (
            f"fused={tracker.fused_frames} staged={tracker.staged_frames}")
        assert n_tracked > 25, f"only {n_tracked} frames tracked"
        ate = ate_rmse(est, gt, with_scale=True)
        assert ate < 0.05, f"fused mono ATE {ate:.4f} m"
