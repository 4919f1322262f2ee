"""ROS integration layer: message conversion, approximate-time sync, nodes.

Reference surface covered: Examples/ROS/ORB_SLAM2/src/ros_mono.cc,
ros_stereo.cc, ros_rgbd.cc and AR/ViewerAR.cc (plane detection + virtual
cube), exercised here without a ROS install via fake message objects and a
fake rospy module.
"""
import dataclasses

import numpy as np
import pytest

from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor, TrackingState
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.integrations.ros import (
    ApproximateTimeSynchronizer, MonoARNode, MonoNode, RgbdNode, StereoNode,
    cube_vertices, depth_msg_to_meters, detect_plane, image_msg_to_gray)
from orb_slam2_detailed_comments_tpu.system import System
from orb_slam2_detailed_comments_tpu.utils.config import OrbConfig, SlamConfig

from synthetic_world import PlanesWorld, smooth_trajectory


# ---------------------------------------------------------------------------
# fake sensor_msgs/Image + rospy
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Stamp:
    t: float

    def to_sec(self):
        return self.t


@dataclasses.dataclass
class Header:
    stamp: Stamp


class ImageMsg:
    def __init__(self, arr, encoding, t=0.0, pad_step=0):
        arr = np.ascontiguousarray(arr)
        self.height, self.width = arr.shape[:2]
        self.encoding = encoding
        itemsize = arr.dtype.itemsize
        ch = 1 if arr.ndim == 2 else arr.shape[2]
        row = self.width * ch * itemsize
        self.step = row + pad_step
        if pad_step:
            rows = arr.reshape(self.height, row).view(np.uint8) if arr.dtype == np.uint8 \
                else arr.view(np.uint8).reshape(self.height, row)
            padded = np.zeros((self.height, self.step), np.uint8)
            padded[:, :row] = rows
            self.data = padded.tobytes()
        else:
            self.data = arr.tobytes()
        self.header = Header(Stamp(t))


class FakeRos:
    """Minimal rospy stand-in: delivers a recorded message sequence on
    spin()."""

    def __init__(self, messages):
        # messages: list of (topic, msg)
        self.messages = messages
        self.subs = {}

    def init_node(self, name):
        self.node_name = name

    def Subscriber(self, topic, msg_type, callback, queue_size=1):
        self.subs[topic] = callback

    def spin(self):
        for topic, msg in self.messages:
            if topic in self.subs:
                self.subs[topic](msg)


# ---------------------------------------------------------------------------
# message conversion
# ---------------------------------------------------------------------------

class TestMessageConversion:
    def test_mono8(self):
        a = np.arange(12, dtype=np.uint8).reshape(3, 4)
        g = image_msg_to_gray(ImageMsg(a, "mono8"))
        np.testing.assert_allclose(g, a.astype(np.float32))

    def test_mono8_with_row_padding(self):
        a = np.arange(12, dtype=np.uint8).reshape(3, 4)
        g = image_msg_to_gray(ImageMsg(a, "mono8", pad_step=5))
        np.testing.assert_allclose(g, a.astype(np.float32))

    def test_rgb8_weights(self):
        a = np.zeros((2, 2, 3), np.uint8)
        a[..., 0] = 100  # red
        g = image_msg_to_gray(ImageMsg(a, "rgb8"), rgb=True)
        np.testing.assert_allclose(g, 29.9, atol=0.01)

    def test_bgr8_weights(self):
        a = np.zeros((2, 2, 3), np.uint8)
        a[..., 2] = 100  # red in BGR
        g = image_msg_to_gray(ImageMsg(a, "bgr8"), rgb=True)
        np.testing.assert_allclose(g, 29.9, atol=0.01)

    def test_depth_16uc1_scaling(self):
        d = np.full((2, 2), 5000, np.uint16)
        m = depth_msg_to_meters(ImageMsg(d, "16UC1"), depth_map_factor=5000.0)
        np.testing.assert_allclose(m, 1.0)

    def test_depth_32fc1_passthrough(self):
        d = np.full((2, 2), 1.25, np.float32)
        m = depth_msg_to_meters(ImageMsg(d, "32FC1"), depth_map_factor=1.0)
        np.testing.assert_allclose(m, 1.25)

    def test_unknown_encoding_raises(self):
        with pytest.raises(ValueError):
            image_msg_to_gray(ImageMsg(np.zeros((2, 2), np.uint8), "yuv422"))


# ---------------------------------------------------------------------------
# approximate-time sync
# ---------------------------------------------------------------------------

class TestApproxTimeSync:
    def _msg(self, t):
        return ImageMsg(np.zeros((1, 1), np.uint8), "mono8", t=t)

    def test_pairs_with_jitter(self):
        got = []
        sync = ApproximateTimeSynchronizer(lambda a, b: got.append(
            (a.header.stamp.t, b.header.stamp.t)), slop=0.02)
        for i in range(5):
            sync.add0(self._msg(i * 0.1))
            sync.add1(self._msg(i * 0.1 + 0.005))
        assert len(got) == 5
        for a, b in got:
            assert abs(a - b) < 0.02

    def test_drops_unmatched(self):
        got = []
        sync = ApproximateTimeSynchronizer(lambda a, b: got.append(1), slop=0.02)
        sync.add0(self._msg(0.0))
        sync.add1(self._msg(0.5))   # far in the future -> 0.0 dropped
        sync.add0(self._msg(0.5))   # matches 0.5
        assert len(got) == 1

    def test_interleaved_order(self):
        got = []
        sync = ApproximateTimeSynchronizer(
            lambda a, b: got.append((a.header.stamp.t, b.header.stamp.t)),
            slop=0.02)
        sync.add1(self._msg(0.1))
        sync.add1(self._msg(0.2))
        sync.add0(self._msg(0.2))
        assert got == [(0.2, 0.2)]


# ---------------------------------------------------------------------------
# nodes end-to-end on a synthetic stream
# ---------------------------------------------------------------------------

def _world_and_cfg(n_features=600):
    world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                        width=320, height=240)
    cfg = SlamConfig(
        camera=PinholeCamera(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             width=320, height=240, bf=250.0 * 0.1),
        orb=OrbConfig(n_features=n_features, max_keypoints=1024),
        fps=10.0, max_keyframes=100, max_map_points=30000, th_depth=40.0)
    return world, cfg


class TestMonoNode:
    def test_tracks_stream(self):
        world, cfg = _world_and_cfg()
        poses = smooth_trajectory(16, step=0.05)
        msgs = []
        for i in range(16):
            img = world.render(poses[i]).astype(np.uint8)
            msgs.append(("/camera/image_raw", ImageMsg(img, "mono8", t=i * 0.1)))
        slam = System(cfg, Sensor.MONOCULAR, enable_loop_closing=False)
        poses_out = []
        node = MonoNode(slam, on_pose=lambda T, t: poses_out.append((t, T)))
        node.run(ros=FakeRos(msgs))
        assert node.n_frames == 16
        assert slam.tracking_state == TrackingState.OK
        assert len(poses_out) >= 10
        # timestamps preserved through the message path
        ts = [t for t, _ in poses_out]
        assert ts == sorted(ts)


class TestRgbdNode:
    def test_tracks_paired_stream(self):
        world, cfg = _world_and_cfg()
        poses = smooth_trajectory(10, step=0.05)
        msgs = []
        for i in range(10):
            img = world.render(poses[i]).astype(np.uint8)
            depth = world.render_depth(poses[i])
            t = i * 0.1
            msgs.append(("/camera/rgb/image_raw", ImageMsg(img, "mono8", t=t)))
            msgs.append(("/camera/depth_registered/image_raw",
                         ImageMsg(depth, "32FC1", t=t + 0.004)))
        slam = System(cfg, Sensor.RGBD, enable_loop_closing=False)
        # DepthMapFactor 1.0 for float depth (config default is 5000 for PNG)
        slam.config = dataclasses.replace(cfg, depth_map_factor=1.0)
        node = RgbdNode(slam)
        node.run(ros=FakeRos(msgs))
        assert node.n_frames == 10
        assert slam.tracking_state == TrackingState.OK
        assert slam.map.n_map_points() > 100


class TestStereoNode:
    def test_tracks_paired_stream(self):
        world, cfg = _world_and_cfg()
        baseline = 0.1
        poses = smooth_trajectory(10, step=0.05)
        shift = np.eye(4, dtype=np.float32)
        shift[0, 3] = -baseline  # right camera: world->cam of cam at +x
        msgs = []
        for i in range(10):
            left = world.render(poses[i]).astype(np.uint8)
            right = world.render(shift @ poses[i]).astype(np.uint8)
            t = i * 0.1
            msgs.append(("/camera/left/image_raw", ImageMsg(left, "mono8", t=t)))
            msgs.append(("/camera/right/image_raw", ImageMsg(right, "mono8", t=t)))
        slam = System(cfg, Sensor.STEREO, enable_loop_closing=False)
        node = StereoNode(slam)
        node.run(ros=FakeRos(msgs))
        assert node.n_frames == 10
        assert slam.tracking_state == TrackingState.OK


# ---------------------------------------------------------------------------
# AR (ViewerAR equivalents)
# ---------------------------------------------------------------------------

class TestAR:
    def test_detect_plane_recovers_normal(self):
        rng = np.random.default_rng(0)
        n_true = np.array([0.0, 1.0, 0.2])
        n_true /= np.linalg.norm(n_true)
        # points on the plane through (0,0,5) + mild noise + outliers
        u = np.array([1.0, 0.0, 0.0])
        v = np.cross(n_true, u)
        pts = (np.array([0, 0, 5.0]) + rng.uniform(-2, 2, (200, 1)) * u
               + rng.uniform(-2, 2, (200, 1)) * v
               + rng.normal(0, 0.002, (200, 1)) * n_true)
        pts = np.concatenate([pts, rng.uniform(-3, 8, (20, 3))])
        out = detect_plane(pts)
        assert out is not None
        n, c = out
        assert abs(abs(np.dot(n, n_true)) - 1.0) < 5e-3

    def test_cube_vertices_geometry(self):
        c = cube_vertices(np.zeros(3), np.array([0.0, 0.0, 1.0]), 0.2)
        assert c.shape == (8, 3)
        # bottom face on the plane, top face lifted by size along the normal
        np.testing.assert_allclose(c[:4, 2], 0.0, atol=1e-12)
        np.testing.assert_allclose(c[4:, 2], 0.2, atol=1e-12)
        # edges have length == size
        np.testing.assert_allclose(np.linalg.norm(c[1] - c[0]), 0.2, atol=1e-9)

    def test_mono_ar_node_overlays_cube(self):
        world, cfg = _world_and_cfg()
        poses = smooth_trajectory(14, step=0.05)
        msgs = [("/camera/image_raw",
                 ImageMsg(world.render(poses[i]).astype(np.uint8), "mono8", t=i * 0.1))
                for i in range(14)]
        slam = System(cfg, Sensor.MONOCULAR, enable_loop_closing=False)
        frames = []
        node = MonoARNode(slam, cube_size=0.3,
                          on_frame=lambda f, t: frames.append(f))
        ros = FakeRos(msgs[:8])
        node.run(ros=ros)
        assert slam.tracking_state == TrackingState.OK
        assert node.insert_cube(), "plane detection failed on tracked points"
        ros2 = FakeRos(msgs[8:])
        ros2.subs = {}
        node.run(ros=ros2)
        # the cube wireframe must actually appear: some green pixels
        last = node.last_ar_frame
        assert last is not None
        green = (last[..., 1] == 255) & (last[..., 0] == 0)
        assert green.sum() > 50
