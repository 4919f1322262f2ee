"""Localization-only mode with the degraded VO state machine (reference:
Tracking.cc:520-624): with mapping frozen, the tracker must survive leaving
the mapped region on temporal visual-odometry points (mbVO), run
relocalization in parallel every degraded frame, and re-attach to the map
when a mapped view returns — all without growing the map."""
import numpy as np
import pytest

from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor, TrackingState
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.system import System
from orb_slam2_detailed_comments_tpu.utils.config import SlamConfig, OrbConfig

from synthetic_world import PlanesWorld


def make_poses(xs):
    poses = []
    for x in xs:
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [-x, 0.0, 0.0]  # Tcw translation = -C for identity R
        poses.append(T)
    return poses


class TestLocalizationVO:
    @pytest.fixture(scope="class")
    def run(self):
        # fx=500 narrows the FOV (half-width tan = 0.32): the mapped
        # region [0, 1] leaves the frustum ~2 units past its end, so the
        # drive-away really does lose all real map matches while the plane
        # keeps feeding temporal VO points.
        world = PlanesWorld(fx=500.0, fy=500.0, cx=160.0, cy=120.0,
                            width=320, height=240, texture_seed=33,
                            tex_scale=60.0)
        cfg = SlamConfig(
            camera=PinholeCamera(fx=500.0, fy=500.0, cx=160.0, cy=120.0,
                                 bf=50.0, width=320, height=240),
            orb=OrbConfig(n_features=600, max_keypoints=1024),
            fps=10.0, th_depth=120.0, max_keyframes=100, max_map_points=30000)
        slam = System(cfg, Sensor.RGBD, enable_loop_closing=False)

        # phase 1: map x in [0, 1.0]
        xs_map = np.arange(0.0, 1.02, 0.06)
        for i, T in enumerate(make_poses(xs_map)):
            slam.track_rgbd(world.render(T), world.render_depth(T), i * 0.1)
        assert slam.tracking_state == TrackingState.OK
        t0 = 10.0

        slam.activate_localization_mode()
        n_kf_frozen = slam.map.n_kf
        n_mp_frozen = slam.map.n_map_points()

        # phase 2: drive far past the mapped region (x up to 3.0) — real
        # map matches vanish; temporal VO points must carry the track
        log = []
        xs_away = np.arange(1.1, 9.5, 0.1)
        for j, T in enumerate(make_poses(xs_away)):
            slam.track_rgbd(world.render(T), world.render_depth(T), t0 + j * 0.1)
            log.append((float(xs_away[j]), slam.tracking_state,
                        slam.tracker.vo_mode))
        away_states = [s for _, s, _ in log]
        vo_engaged = [x for x, _, vo in log if vo]

        # phase 3: walk back into the mapped region
        t1 = 40.0
        back_log = []
        xs_back = np.arange(9.4, 0.3, -0.1)
        for j, T in enumerate(make_poses(xs_back)):
            slam.track_rgbd(world.render(T), world.render_depth(T), t1 + j * 0.1)
            back_log.append((float(xs_back[j]), slam.tracking_state,
                             slam.tracker.vo_mode,
                             None if slam.tracker.last_frame.Tcw is None
                             else slam.tracker.last_frame.Tcw.copy()))
        return (slam, n_kf_frozen, n_mp_frozen, away_states, vo_engaged,
                back_log)

    def test_vo_mode_engages_off_the_map(self, run):
        slam, n_kf, n_mp, away_states, vo_engaged, back_log = run
        assert vo_engaged, "VO degraded mode never engaged off the map"
        # the track must survive the entire unmapped stretch on VO points
        n_ok = sum(1 for s in away_states if s == TrackingState.OK)
        assert n_ok >= 0.8 * len(away_states), away_states

    def test_map_does_not_grow(self, run):
        slam, n_kf, n_mp, away_states, vo_engaged, back_log = run
        assert slam.map.n_kf == n_kf
        assert slam.map.n_map_points() <= n_mp  # culling may shrink, never grow

    def test_track_local_map_tightens_localization_pose(self, run):
        """Round-3 parity (reference: Tracking.cc:640-649): in localization
        mode, whenever not in degraded VO, the pose must be refined against
        the LOCAL MAP, not just the motion-model matches. A/B on the same
        mapped stretch: bypassing _track_local_map must not beat the real
        path, and the real path must be tight."""
        slam, n_kf, n_mp, away_states, vo_engaged, back_log = run
        tracker = slam.tracker
        assert tracker.localization_only
        world = PlanesWorld(fx=500.0, fy=500.0, cx=160.0, cy=120.0,
                            width=320, height=240, texture_seed=33,
                            tex_scale=60.0)
        xs = np.arange(0.4, 0.9, 0.05)

        def run_pass(bypass, t0):
            errs = []
            orig = tracker._track_local_map
            if bypass:
                tracker._track_local_map = lambda frame: True
            try:
                for j, (x, T) in enumerate(zip(xs, make_poses(xs))):
                    slam.track_rgbd(world.render(T), world.render_depth(T),
                                    t0 + j * 0.1)
                    Tcw = tracker.last_frame.Tcw
                    if (slam.tracking_state == TrackingState.OK
                            and not tracker.vo_mode and Tcw is not None):
                        C = np.linalg.inv(Tcw)[:3, 3]
                        errs.append(np.linalg.norm(C - [x, 0.0, 0.0]))
            finally:
                tracker._track_local_map = orig
            return errs

        err_bypass = run_pass(True, 80.0)
        err_real = run_pass(False, 90.0)
        assert err_real and err_bypass
        assert np.median(err_real) <= np.median(err_bypass) + 1e-6, \
            (np.median(err_real), np.median(err_bypass))
        assert np.median(err_real) < 0.02, np.median(err_real)

    def test_reattaches_on_return(self, run):
        slam, n_kf, n_mp, away_states, vo_engaged, back_log = run
        # somewhere on the way back the parallel relocalization must clear
        # VO mode and the pose must match ground truth again
        reattached = [(x, T) for x, s, vo, T in back_log
                      if s == TrackingState.OK and not vo and T is not None]
        assert reattached, "never re-attached to the map on return"
        x, T = reattached[-1]
        C = np.linalg.inv(T)[:3, 3]
        assert np.linalg.norm(C - np.array([x, 0.0, 0.0])) < 0.08, \
            (x, C, np.linalg.norm(C - np.array([x, 0.0, 0.0])))
