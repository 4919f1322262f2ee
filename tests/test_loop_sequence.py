"""Rendered long-loop sequence: full-System e2e around a 360-degree lap.

The camera circles inside a textured cylinder looking outward (wide-yaw
content in every direction — the geometry of KITTI-00-style loops) and
returns to its start. This drives the complete stack the way the
reference's loop datasets do (reference: LoopClosing.cc Run/DetectLoop/
CorrectLoop): BoW candidates accumulate while the map wraps around, and the
revisit must leave the map globally consistent.

Two correct outcomes exist on a revisit, exactly as in the reference:
 * explicit loop closure (DetectLoop -> Sim3 -> CorrectLoop), or
 * implicit reconnection: with low odometry drift the old map points
   re-enter the local map via projection and the new keyframes connect to
   the lap-start keyframes in the covisibility graph (the reference's map
   reuse; no loop event is generated because candidates covisible with the
   current keyframe are excluded, KeyFrameDatabase.cc:129-143).
The test asserts consistency + (explicit or implicit) reconnection, and
bounds the end-to-end ATE.
"""
import numpy as np
import pytest

from orb_slam2_detailed_comments_tpu.evaluation.ate import ate_rmse
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor, TrackingState
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.system import System
from orb_slam2_detailed_comments_tpu.utils.config import OrbConfig, SlamConfig

from synthetic_world import CylinderWorld, loop_trajectory

N_FRAMES = 120
OVERLAP = 32


def make_vocabulary(world, poses):
    """Offline-trained vocabulary from views spread around the lap — the
    reference always runs with a large pre-trained ORBvoc.txt
    (System.cc:78-94); a vocabulary self-trained on the first keyframes only
    covers the lap-start appearance and quantizes the rest of the lap
    poorly, making BoW scores non-discriminative."""
    import jax.numpy as jnp
    from orb_slam2_detailed_comments_tpu.ops.orb import extract_orb
    from orb_slam2_detailed_comments_tpu.place.vocabulary import BinaryVocabulary
    from orb_slam2_detailed_comments_tpu.utils.config import OrbConfig

    orb = OrbConfig(n_features=600, max_keypoints=1024)
    descs = []
    for i in range(0, len(poses), len(poses) // 8):
        kp = extract_orb(jnp.asarray(world.render(poses[i])), orb)
        descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])
    train = np.concatenate(descs, axis=0)
    return BinaryVocabulary.train(train, n_words=1024, n_iters=3)


def run_loop_lap():
    # fx=180 -> 83 deg FOV: adjacent keyframes keep real view overlap under
    # the lap's yaw rate; path_radius=4 vs wall radius 8 gives a wide 1/z
    # spread (the yaw/translation sliding mode of outward-looking circular
    # motion is conditioned by depth variation across the FOV)
    world = CylinderWorld(fx=180.0, fy=180.0, cx=160.0, cy=120.0,
                          width=320, height=240, radius=8.0)
    # baseline 0.5 keeps the wall (depth 6-10) inside the close-point
    # threshold ThDepth*baseline = 20 so RGB-D keyframes spawn map points
    # (reference: Tracking.cc close/far split); overlap 16 frames ~= 3
    # keyframes so loop candidates can build the 3-consecutive-KF
    # consistency chain (reference: LoopClosing.cc mnCovisibilityConsistencyTh)
    poses = loop_trajectory(N_FRAMES, path_radius=4.0, overlap=OVERLAP)
    cfg = SlamConfig(
        camera=PinholeCamera(fx=180.0, fy=180.0, cx=160.0, cy=120.0,
                             width=320, height=240, bf=180.0 * 0.5),
        orb=OrbConfig(n_features=600, max_keypoints=1024),
        fps=10.0, max_keyframes=150, max_map_points=40000)
    slam = System(cfg, Sensor.RGBD, enable_loop_closing=True,
                  enable_global_ba_on_loop=False,
                  vocabulary=make_vocabulary(world, poses))

    est, gt, states = [], [], []
    for i in range(N_FRAMES):
        img = world.render(poses[i])
        depth = world.render_depth(poses[i])
        Tcw = slam.track_rgbd(img, depth, i * 0.1)
        states.append(slam.tracking_state)
        if Tcw is not None and slam.tracking_state == TrackingState.OK:
            est.append(np.linalg.inv(Tcw)[:3, 3])
            gt.append(-poses[i, :3, :3].T @ poses[i, :3, 3])
    return slam, np.asarray(est), np.asarray(gt), states


class TestLoopLap:
    @pytest.fixture(scope="class")
    def result(self):
        return run_loop_lap()

    def test_tracks_the_whole_lap(self, result):
        slam, est, gt, states = result
        n_ok = sum(s == TrackingState.OK for s in states)
        assert n_ok >= N_FRAMES - 5, f"only {n_ok}/{N_FRAMES} tracked"
        assert states[-1] == TrackingState.OK

    def test_loop_reconnects_the_map(self, result):
        slam, est, gt, states = result
        ms = slam.map
        kfs = sorted(int(k) for k in ms.keyframe_ids())
        assert len(kfs) >= 8
        early = set(kfs[: max(2, len(kfs) // 8)])
        late = kfs[-max(2, len(kfs) // 8):]
        explicit = (slam.loop_closer is not None
                    and slam.loop_closer.n_loops_closed >= 1)
        implicit = any(
            int(c) in early
            for k in late for c in ms.get_covisible(int(k), 30))
        assert explicit or implicit, (
            f"lap end not reconnected to lap start "
            f"(loops={getattr(slam.loop_closer, 'n_loops_closed', 0)}, "
            f"early={sorted(early)}, late covis="
            f"{ {k: list(map(int, ms.get_covisible(int(k), 30))) for k in late} })")

    def test_ate_bounded_after_lap(self, result):
        slam, est, gt, states = result
        travel = 2 * np.pi * 4.0  # one lap of radius 4
        ate = ate_rmse(est, gt, with_scale=False)
        assert ate < 0.02 * travel, f"ATE {ate:.4f} m over {travel:.2f} m travel"

    def test_map_stays_bounded(self, result):
        slam, est, gt, states = result
        # culling must keep the keyframe count well under one per frame
        assert slam.map.n_keyframes() < N_FRAMES
        assert slam.map.n_map_points() < 40000
