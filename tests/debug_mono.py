"""Interactive debug driver for the mono pipeline (not a test)."""
import sys
import numpy as np

sys.path.insert(0, "tests")
import conftest  # noqa: F401  (forces CPU platform)

from orb_slam2_detailed_comments_tpu.backend.local_mapping import LocalMapper
from orb_slam2_detailed_comments_tpu.evaluation.ate import ate_rmse
from orb_slam2_detailed_comments_tpu.frontend.tracking import Tracker, TrackingState, Sensor
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.state.map_store import MapStore
from orb_slam2_detailed_comments_tpu.utils.config import SlamConfig, OrbConfig

from synthetic_world import PlanesWorld, smooth_trajectory


def main(n_frames=20, step=0.04):
    world = PlanesWorld(texture_seed=0)
    poses = smooth_trajectory(n_frames, step=step)
    cfg = SlamConfig(
        camera=PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480),
        orb=OrbConfig(n_features=1000, max_keypoints=2048),
        fps=10.0, max_keyframes=100, max_map_points=30000,
    )
    ms = MapStore(cfg)
    mapper = LocalMapper(cfg, ms, monocular=True)
    tracker = Tracker(cfg, ms, Sensor.MONOCULAR, local_mapper=mapper)

    est, gt = [], []
    for i in range(n_frames):
        img = world.render(poses[i])
        Tcw = tracker.track_monocular(img, i * 0.1)
        fr = tracker.last_frame
        n_mp = int((fr.mp >= 0).sum()) if fr is not None and fr.mp is not None else 0
        print(f"frame {i:3d} state={tracker.state.name:16s} kps={fr.n_valid if fr else 0:5d} "
              f"matched={n_mp:4d} kfs={ms.n_keyframes():3d} mps={ms.n_map_points():6d} "
              f"tracked={'Y' if Tcw is not None else 'n'}")
        if Tcw is not None and tracker.state == TrackingState.OK:
            est.append(np.linalg.inv(Tcw)[:3, 3])
            gt.append(-poses[i, :3, :3].T @ poses[i, :3, 3])
    if len(est) >= 3:
        print("ATE:", ate_rmse(np.asarray(est), np.asarray(gt), with_scale=True))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
