"""Weighted observation counting (MapPoint::nObs) + culling semantics.

The reference counts a stereo/RGB-D observation as nObs += 2 and a mono
observation as += 1 (reference: src/MapPoint.cc:193-213), and every
survival threshold — MapPointCulling's obs<=cnThObs (LocalMapping.cc:
287-316), the nObs<=2 death on EraseObservation (MapPoint.cc:221-233),
TrackedMapPoints' minObs compare — runs against that weighted count.
Round 2 found that counting raw keyframes instead starved stereo/RGB-D
maps to ~2 keyframe-observations per point (90% of points culled at age
2), leaving global BA problems an order of magnitude under-constrained.
"""
import numpy as np

from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.state.frame import FrameData
from orb_slam2_detailed_comments_tpu.state.map_store import MapStore
from orb_slam2_detailed_comments_tpu.utils.config import OrbConfig, SlamConfig

CAM = PinholeCamera(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320,
                    height=240, bf=120.0)


def make_store():
    cfg = SlamConfig(camera=CAM, orb=OrbConfig(n_features=64, max_keypoints=64),
                     max_keyframes=16, max_map_points=512, fps=10.0)
    return MapStore(cfg)


def add_kf(ms, k, stereo_idx=()):
    cap = 64
    f = FrameData(
        frame_id=k, timestamp=0.1 * k,
        xy=np.zeros((cap, 2), np.float32),
        response=np.zeros(cap, np.float32),
        octave=np.zeros(cap, np.int32),
        angle=np.zeros(cap, np.float32),
        desc=np.zeros((cap, 8), np.uint32),
        valid=np.ones(cap, bool),
        ur=np.full(cap, -1.0, np.float32),
        depth=np.full(cap, -1.0, np.float32),
        Tcw=np.eye(4, dtype=np.float32),
    )
    for i in stereo_idx:
        f.ur[i] = 100.0
        f.depth[i] = 5.0
    return ms.add_keyframe(f)


class TestWeightedCount:
    def test_stereo_counts_double(self):
        ms = make_store()
        k0 = add_kf(ms, 0, stereo_idx=[0])
        k1 = add_kf(ms, 1, stereo_idx=[])
        m = ms.add_map_point(np.array([0, 0, 5], np.float32), k0)
        ms.add_observation(m, k0, 0)      # stereo -> +2
        assert ms.mp_wobs[m] == 2
        ms.add_observation(m, k1, 0)      # mono -> +1
        assert ms.mp_wobs[m] == 3
        assert ms.mp_n_obs[m] == 2        # slot count unchanged semantics

    def test_erase_observation_subtracts_weight(self):
        ms = make_store()
        k0 = add_kf(ms, 0, stereo_idx=[0])
        k1 = add_kf(ms, 1, stereo_idx=[1])
        k2 = add_kf(ms, 2, stereo_idx=[2])
        m = ms.add_map_point(np.array([0, 0, 5], np.float32), k0)
        ms.add_observation(m, k0, 0)
        ms.add_observation(m, k1, 1)
        ms.add_observation(m, k2, 2)
        assert ms.mp_wobs[m] == 6
        ms.erase_observation(m, k1)
        assert ms.mp_valid[m] and ms.mp_wobs[m] == 4

    def test_point_dies_at_wobs_leq_2(self):
        # one stereo + one mono observation: erasing the mono obs leaves
        # wobs=2 -> death (reference MapPoint.cc:221-233 nObs<=2)
        ms = make_store()
        k0 = add_kf(ms, 0, stereo_idx=[0])
        k1 = add_kf(ms, 1, stereo_idx=[])
        m = ms.add_map_point(np.array([0, 0, 5], np.float32), k0)
        ms.add_observation(m, k0, 0)
        ms.add_observation(m, k1, 0)
        ms.erase_observation(m, k1)
        assert not ms.mp_valid[m]

    def test_two_stereo_obs_survive_erase_cascade(self):
        # two stereo observations = wobs 4; erasing one leaves 2 -> dies,
        # but three stereo obs -> erase leaves 4 -> survives
        ms = make_store()
        kfs = [add_kf(ms, k, stereo_idx=[0]) for k in range(3)]
        m = ms.add_map_point(np.array([0, 0, 5], np.float32), kfs[0])
        for k in kfs:
            ms.add_observation(m, k, 0)
        ms.erase_observation(m, kfs[1])
        assert ms.mp_valid[m] and ms.mp_wobs[m] == 4

    def test_re_register_same_kf_updates_weight(self):
        ms = make_store()
        k0 = add_kf(ms, 0, stereo_idx=[0])   # idx 0 stereo, idx 1 mono
        m = ms.add_map_point(np.array([0, 0, 5], np.float32), k0)
        ms.add_observation(m, k0, 0)
        assert ms.mp_wobs[m] == 2
        ms.add_observation(m, k0, 1)         # moved to a mono keypoint
        assert ms.mp_wobs[m] == 1
        assert ms.mp_n_obs[m] == 1

    def test_replace_transfers_weights(self):
        ms = make_store()
        k0 = add_kf(ms, 0, stereo_idx=[0, 1])
        k1 = add_kf(ms, 1, stereo_idx=[0, 1])
        k2 = add_kf(ms, 2, stereo_idx=[0, 1])
        a = ms.add_map_point(np.array([0, 0, 5], np.float32), k0)
        b = ms.add_map_point(np.array([0, 0, 5.01], np.float32), k1)
        ms.add_observation(a, k0, 0)
        ms.add_observation(a, k1, 0)
        ms.add_observation(b, k1, 1)
        ms.add_observation(b, k2, 1)
        ms.replace_map_point(a, b)
        assert not ms.mp_valid[a] and ms.mp_wobs[a] == 0
        # b keeps its k1/k2 obs and gains a's k0 obs (k1 already present)
        assert ms.mp_wobs[b] == 6 and ms.mp_n_obs[b] == 3

    def test_checkpoint_roundtrip_preserves_wobs(self):
        ms = make_store()
        k0 = add_kf(ms, 0, stereo_idx=[0])
        k1 = add_kf(ms, 1, stereo_idx=[0])
        m = ms.add_map_point(np.array([0, 0, 5], np.float32), k0)
        ms.add_observation(m, k0, 0)
        ms.add_observation(m, k1, 0)
        data = ms.checkpoint()
        ms2 = MapStore.restore(ms.config, data)
        assert ms2.mp_wobs[m] == 4

    def test_restore_backfills_legacy_checkpoint(self):
        ms = make_store()
        k0 = add_kf(ms, 0, stereo_idx=[0])
        k1 = add_kf(ms, 1, stereo_idx=[])
        m = ms.add_map_point(np.array([0, 0, 5], np.float32), k0)
        ms.add_observation(m, k0, 0)
        ms.add_observation(m, k1, 0)
        data = {k: v for k, v in ms.checkpoint().items() if k != "mp_wobs"}
        ms2 = MapStore.restore(ms.config, data)
        assert ms2.mp_wobs[m] == 3


class TestCullingUsesWeightedCount:
    def test_stereo_point_with_one_reobs_survives(self):
        """Birth stereo obs (2) + one stereo re-obs (2) = 4 > 3: survives
        the age-2 check that killed it under raw keyframe counting."""
        from orb_slam2_detailed_comments_tpu.backend.local_mapping import LocalMapper
        ms = make_store()
        lm = LocalMapper(ms.config, ms, monocular=False)
        kfs = [add_kf(ms, k, stereo_idx=[0, 1]) for k in range(3)]
        m = ms.add_map_point(np.array([0, 0, 5], np.float32), kfs[0])
        ms.add_observation(m, kfs[0], 0)
        ms.add_observation(m, kfs[1], 0)
        ms.mp_found[m] = ms.mp_visible[m] = 4
        lm.recent_points = [m]
        lm._map_point_culling(kfs[2])
        assert ms.mp_valid[m]

    def test_mono_only_point_still_culled(self):
        from orb_slam2_detailed_comments_tpu.backend.local_mapping import LocalMapper
        ms = make_store()
        lm = LocalMapper(ms.config, ms, monocular=False)
        kfs = [add_kf(ms, k, stereo_idx=[]) for k in range(3)]
        m = ms.add_map_point(np.array([0, 0, 5], np.float32), kfs[0])
        ms.add_observation(m, kfs[0], 0)
        ms.add_observation(m, kfs[1], 0)
        ms.mp_found[m] = ms.mp_visible[m] = 4
        lm.recent_points = [m]
        lm._map_point_culling(kfs[2])   # wobs=2 <= 3 at age 2 -> culled
        assert not ms.mp_valid[m]
