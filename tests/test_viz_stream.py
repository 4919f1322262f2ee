"""Headless observability: status banner rasterization (reference:
FrameDrawer::DrawTextInfo, FrameDrawer.cc:168-226) and the streaming
viewer (reference: Viewer::Run periodic render loop, Viewer.cc:76-236)."""
import json
import os

import numpy as np

from orb_slam2_detailed_comments_tpu.viz.bitmap_font import draw_text, text_width
from orb_slam2_detailed_comments_tpu.viz.drawers import FrameDrawer


class TestBitmapFont:
    def test_renders_pixels(self):
        img = np.zeros((20, 120, 3), np.uint8)
        draw_text(img, 2, 2, "OK: 42", color=(255, 255, 255))
        assert (img == 255).any()
        # unknown glyphs fall back, never crash
        draw_text(img, 2, 10, "~é@[", color=(255, 0, 0))

    def test_clips_at_borders(self):
        img = np.zeros((10, 20, 3), np.uint8)
        draw_text(img, 15, 6, "WWWW")  # runs off right + bottom
        assert img.shape == (10, 20, 3)

    def test_width(self):
        assert text_width("ABC") == 18


class TestFrameDrawerBanner:
    def test_banner_appended_with_text(self):
        img = np.full((48, 64), 100.0, np.float32)
        drawer = FrameDrawer(config=None)
        out = drawer.draw(img, None, state_text="SLAM KFS: 3")
        assert out.shape == (48 + 15, 64, 3)
        banner = out[48:]
        assert (banner == 255).any(), "status text not rasterized"

    def test_status_text_contents(self):
        class FakeTracker:
            localization_only = True
            vo_mode = True
        class FakeMap:
            def n_keyframes(self):
                return 7
            def n_map_points(self):
                return 123
        class FakeSystem:
            class tracking_state:
                name = "OK"
            tracker = FakeTracker()
            map = FakeMap()
            def n_tracked_points(self):
                return 55
        text = FrameDrawer.status_text(FakeSystem())
        assert "OK" in text and "LOC" in text and "VO" in text
        assert "KFS: 7" in text and "MPS: 123" in text and "55" in text


class TestStreamingViewer:
    def test_emits_rate_limited(self, tmp_path):
        from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
        from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
        from orb_slam2_detailed_comments_tpu.system import System
        from orb_slam2_detailed_comments_tpu.utils.config import SlamConfig, OrbConfig
        from orb_slam2_detailed_comments_tpu.viz.stream import StreamingViewer

        cfg = SlamConfig(
            camera=PinholeCamera(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                                 width=320, height=240),
            orb=OrbConfig(n_features=100, max_keypoints=256),
            max_keyframes=8, max_map_points=512)
        slam = System(cfg, Sensor.MONOCULAR, enable_loop_closing=False)
        viewer = StreamingViewer(slam, str(tmp_path), period_s=1000.0)
        img = np.zeros((240, 320), np.float32)

        assert viewer.update(img, None, force=True)
        assert not viewer.update(img, None)  # rate-limited
        files = os.listdir(tmp_path)
        assert any(f.startswith("frame.") for f in files), files
        assert "status.json" in files
        status = json.load(open(tmp_path / "status.json"))
        assert status["state"] == "NO_IMAGES_YET"
        assert status["keyframes"] == 0


class TestViewerControlChannel:
    """Inbound control file (reference: the Pangolin menu toggles
    localization mode / reset live, Viewer.cc:76-236; VERDICT r3 next #8:
    headless hosts get <out_dir>/control instead)."""

    def _system(self, tmp_path):
        from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor
        from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
        from orb_slam2_detailed_comments_tpu.system import System
        from orb_slam2_detailed_comments_tpu.utils.config import SlamConfig, OrbConfig
        from orb_slam2_detailed_comments_tpu.viz.stream import StreamingViewer

        cfg = SlamConfig(
            camera=PinholeCamera(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                                 width=320, height=240),
            orb=OrbConfig(n_features=100, max_keypoints=256),
            max_keyframes=8, max_map_points=512)
        slam = System(cfg, Sensor.MONOCULAR, enable_loop_closing=False)
        return slam, StreamingViewer(slam, str(tmp_path), period_s=1000.0)

    def test_mid_run_localization_toggle_and_reset(self, tmp_path):
        slam, viewer = self._system(tmp_path)
        img = np.zeros((240, 320), np.float32)
        (tmp_path / "control").write_text("localization_on\n")
        viewer.update(img, None, force=True)   # consumes the command
        assert slam.tracker.localization_only
        status = json.load(open(tmp_path / "status.json"))
        assert status["localization_only"]

        (tmp_path / "control").write_text("localization_off\nreset\n")
        done = viewer.poll_control()
        assert done == ["localization_off", "reset"]
        assert not slam.tracker.localization_only
        # file consumed: a second poll is a no-op
        assert viewer.poll_control() == []
        # audit trail
        log = (tmp_path / "control.log").read_text().splitlines()
        assert "localization_on" in log and "reset" in log

    def test_save_commands_and_bad_lines(self, tmp_path):
        slam, viewer = self._system(tmp_path)
        out = tmp_path / "map_ckpt.npz"
        (tmp_path / "control").write_text(
            f"save_map {out}\nbogus_cmd\nsave_trajectory_tum {tmp_path/'t.txt'}\n")
        done = viewer.poll_control()
        assert f"save_map {out}" in done
        assert not any("bogus" in d for d in done)
        assert out.exists()
        assert (tmp_path / "t.txt").exists()
