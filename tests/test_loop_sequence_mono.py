"""Monocular rendered long-loop: free-scale Sim3 loop closure end-to-end.

Same cylinder-lap geometry as test_loop_sequence.py, but monocular — this
exercises the parts of the loop-closing stack that RGB-D cannot: two-view
initialization bootstraps the map at an arbitrary scale, odometry scale
drifts freely around the lap, and the revisit must be absorbed by a
FREE-SCALE Sim3 (reference: Sim3Solver with mbFixScale=false for mono,
LoopClosing.cc:489; VertexSim3Expmap _fix_scale=false in OptimizeSim3 and
OptimizeEssentialGraph, Optimizer.cc:1120/1442). ATE is therefore checked
with scale (Umeyama) alignment.

Slow (~10-15 min CPU): the lap inserts ~45 keyframes, each running the
full mapping + loop-closing backend. Kept out of test_loop_sequence.py so
the standard e2e batch stays under background-task timeouts.
"""
import numpy as np
import pytest

from orb_slam2_detailed_comments_tpu.evaluation.ate import ate_rmse
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor, TrackingState
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.system import System
from orb_slam2_detailed_comments_tpu.utils.config import OrbConfig, SlamConfig

from synthetic_world import CylinderWorld, loop_trajectory
from test_loop_sequence import N_FRAMES, OVERLAP


def run_mono_loop_lap():
    world = CylinderWorld(fx=180.0, fy=180.0, cx=160.0, cy=120.0,
                          width=320, height=240, radius=8.0)
    poses = loop_trajectory(N_FRAMES, path_radius=4.0, overlap=OVERLAP)
    cfg = SlamConfig(
        camera=PinholeCamera(fx=180.0, fy=180.0, cx=160.0, cy=120.0,
                             width=320, height=240, bf=180.0 * 0.5),
        orb=OrbConfig(n_features=600, max_keypoints=1024),
        fps=10.0, max_keyframes=150, max_map_points=40000)
    slam = System(cfg, Sensor.MONOCULAR, enable_loop_closing=True,
                  enable_global_ba_on_loop=False,
                  )  # shipped default vocabulary (System loads it)

    est, gt, states = [], [], []
    for i in range(N_FRAMES):
        img = world.render(poses[i])
        Tcw = slam.track_monocular(img, i * 0.1)
        states.append(slam.tracking_state)
        if Tcw is not None and slam.tracking_state == TrackingState.OK:
            est.append(np.linalg.inv(Tcw)[:3, 3])
            gt.append(-poses[i, :3, :3].T @ poses[i, :3, 3])
    # exported-trajectory poses (the reference's evaluation model; see
    # test_loop_sequence.run_loop_lap)
    from orb_slam2_detailed_comments_tpu.io.trajectory import (
        recover_frame_trajectory)
    rec = recover_frame_trajectory(slam.tracker.trajectory, slam.map)
    est_rec = np.asarray([np.linalg.inv(T)[:3, 3] for _, _, T in rec])
    gt_rec = np.asarray([-poses[f, :3, :3].T @ poses[f, :3, 3]
                         for f, _, _ in rec])
    return slam, np.asarray(est), np.asarray(gt), states, est_rec, gt_rec


class TestMonoLoopLap:
    @pytest.fixture(scope="class")
    def result(self):
        return run_mono_loop_lap()

    def test_tracks_the_whole_lap(self, result):
        slam, est, gt, states, est_rec, gt_rec = result
        n_ok = sum(s == TrackingState.OK for s in states)
        # mono spends the first frames initializing (reference:
        # MonocularInitialization needs two frames with >=100 matches)
        assert n_ok >= N_FRAMES - 10, f"only {n_ok}/{N_FRAMES} tracked"
        assert states[-1] == TrackingState.OK

    def test_loop_closes_with_free_scale_sim3(self, result):
        slam, est, gt, states, est_rec, gt_rec = result
        ms = slam.map
        kfs = sorted(int(k) for k in ms.keyframe_ids())
        early = set(kfs[: max(2, len(kfs) // 8)])
        late = kfs[-max(2, len(kfs) // 8):]
        explicit = slam.loop_closer.n_loops_closed >= 1
        implicit = any(
            int(c) in early
            for k in late for c in ms.get_covisible(int(k), 30))
        assert explicit or implicit, (
            f"lap end not reconnected (loops={slam.loop_closer.n_loops_closed})")

    def test_ate_bounded_after_lap_scale_aligned(self, result):
        slam, est, gt, states, est_rec, gt_rec = result
        travel = 2 * np.pi * 4.0
        ate = ate_rmse(est_rec, gt_rec, with_scale=True)
        assert ate < 0.02 * travel, f"ATE {ate:.4f} m over {travel:.2f} m travel"
        ate_live = ate_rmse(est, gt, with_scale=True)
        assert ate_live < 0.10 * travel, f"live ATE {ate_live:.4f} m"
