"""End-to-end stereo pipeline on the synthetic world (SURVEY.md config 3
minus loop closure; the right view is rendered at a true baseline offset,
exercising the stereo SAD matching kernel end-to-end)."""
import numpy as np
import pytest

from orb_slam2_detailed_comments_tpu.evaluation.ate import ate_rmse
from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor, TrackingState
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.system import System
from orb_slam2_detailed_comments_tpu.utils.config import SlamConfig, OrbConfig

from synthetic_world import PlanesWorld, smooth_trajectory

BASELINE = 0.12


def right_pose(Tcw_left):
    """World->right-camera pose: right camera is `BASELINE` to the +x of
    the left camera in the left camera frame."""
    T_rl = np.eye(4, dtype=np.float32)
    T_rl[0, 3] = -BASELINE
    return T_rl @ Tcw_left


def run_stereo_sequence(n_frames=22, step=0.05, seed=3):
    world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                        width=320, height=240, texture_seed=seed)
    poses = smooth_trajectory(n_frames, step=step)
    cfg = SlamConfig(
        camera=PinholeCamera(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             bf=250.0 * BASELINE, width=320, height=240),
        orb=OrbConfig(n_features=600, max_keypoints=1024),
        fps=10.0, th_depth=100.0,
        max_keyframes=100, max_map_points=30000,
    )
    slam = System(cfg, Sensor.STEREO, enable_loop_closing=False)

    est, gt = [], []
    n_tracked = 0
    for i in range(n_frames):
        left = world.render(poses[i])
        right = world.render(right_pose(poses[i]))
        Tcw = slam.track_stereo(left, right, i * 0.1)
        if Tcw is not None and slam.tracking_state == TrackingState.OK:
            est.append(np.linalg.inv(Tcw)[:3, 3])
            gt.append(-poses[i, :3, :3].T @ poses[i, :3, 3])
            n_tracked += 1
    return slam, np.asarray(est), np.asarray(gt), n_tracked


class TestStereoPipeline:
    @pytest.fixture(scope="class")
    def result(self):
        return run_stereo_sequence()

    def test_tracks(self, result):
        slam, est, gt, n_tracked = result
        assert n_tracked >= 19, f"tracked {n_tracked}"

    def test_metric_scale(self, result):
        slam, est, gt, n_tracked = result
        d_est = np.linalg.norm(np.diff(est, axis=0), axis=1).sum()
        d_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
        assert abs(d_est / d_gt - 1.0) < 0.1, f"scale ratio {d_est / d_gt}"

    def test_ate_bounded(self, result):
        slam, est, gt, n_tracked = result
        ate = ate_rmse(est, gt, with_scale=False)
        assert ate < 0.05, f"stereo ATE {ate:.4f} m"

    def test_stereo_depths_used(self, result):
        slam, est, gt, n_tracked = result
        fr = slam.tracker.last_frame
        assert (fr.ur >= 0).sum() > 100, "no stereo matches in last frame"


class TestSadPallasPath:
    def test_sad_patch_kernel_bit_identical(self, monkeypatch):
        """ORB_PATCH_PALLAS=1 (the TPU default) routes the SAD template/
        strip gathers through the DMA patch kernel; valid keypoints carry
        a >=16 px extraction border so results must be bit-identical to
        the XLA edge-padded gathers (round 4)."""
        import numpy as np
        import jax.numpy as jnp
        from orb_slam2_detailed_comments_tpu.ops.orb import extract_orb
        from orb_slam2_detailed_comments_tpu.ops.stereo import stereo_match
        from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
        from orb_slam2_detailed_comments_tpu.utils.config import OrbConfig

        rng = np.random.default_rng(0)
        h, w = 240, 320
        img = np.full((h, w), 40.0, np.float32)
        ys = rng.integers(10, h - 12, 900)
        xs = rng.integers(10, w - 12, 900)
        for y, x in zip(ys, xs):
            s = rng.integers(3, 9)
            img[y:y + s, x:x + s] = rng.uniform(60, 250)
        sh = 8
        img_r = np.full_like(img, 40.0)
        img_r[:, :w - sh] = img[:, sh:]
        cam = PinholeCamera(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                            bf=250.0 * 0.1, width=w, height=h)
        orb = OrbConfig(n_features=300, max_keypoints=512)
        kl = extract_orb(jnp.asarray(img), orb)
        kr = extract_orb(jnp.asarray(img_r), orb)

        monkeypatch.setenv("ORB_PATCH_PALLAS", "0")
        ur0, d0 = stereo_match(kl, kr, jnp.asarray(img), jnp.asarray(img_r),
                               cam, orb)
        monkeypatch.setenv("ORB_PATCH_PALLAS", "1")
        ur1, d1 = stereo_match(kl, kr, jnp.asarray(img), jnp.asarray(img_r),
                               cam, orb)
        np.testing.assert_array_equal(np.asarray(ur0), np.asarray(ur1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


class TestFusedStereoPipeline:
    """The fused steady-state frame path (round 5: ONE device dispatch per
    frame against the device-resident local map, frontend/tracking
    _track_fused + frontend/device_map) must track the same sequence the
    staged path tracks, with comparable accuracy."""

    @pytest.fixture(scope="class")
    def fused_result(self):
        import os
        os.environ["ORB_FUSED_TRACK"] = "1"
        try:
            return run_stereo_sequence()
        finally:
            del os.environ["ORB_FUSED_TRACK"]

    def test_fused_path_taken(self, fused_result):
        slam, est, gt, n_tracked = fused_result
        trk = slam.tracker
        assert trk.fused_frames >= 10, (
            f"fused={trk.fused_frames} staged={trk.staged_frames}")

    def test_tracks_and_ate(self, fused_result):
        slam, est, gt, n_tracked = fused_result
        assert n_tracked >= 19, f"tracked {n_tracked}"
        ate = ate_rmse(est, gt, with_scale=False)
        assert ate < 0.05, f"fused stereo ATE {ate:.4f} m"

    def test_delta_updates_small_between_keyframes(self, fused_result):
        """Steady-state frames must not re-upload the whole pad."""
        slam, est, gt, n_tracked = fused_result
        dm = slam.tracker._dev_map
        assert dm is not None
        assert dm.full_uploads == 0, f"{dm.full_uploads} full re-uploads"
