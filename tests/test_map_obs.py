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


class TestCapacityGrowth:
    """Long routes must never die on slot capacity (VERDICT r4 task 3).
    The reference's KeyFrame ids are unbounded (KeyFrame.cc mnId);
    MapStore keeps slot ids persistent (culled slots hold the mTcp/parent
    chain trajectory recovery walks, System.cc:534-556) and GROWS all
    KF/MP-dim arrays instead of raising."""

    def test_3000_keyframes_with_culling(self):
        ms = make_store()
        assert ms.KF_CAP == 16
        culled = []
        for k in range(3000):
            kid = add_kf(ms, k, stereo_idx=[0])
            if kid >= 2:
                ms.covis[kid, kid - 1] = ms.covis[kid - 1, kid] = 30
                if ms.parent[kid] < 0:
                    ms.parent[kid] = kid - 1
            # cull every other keyframe, like KeyFrameCulling on a
            # redundant-dense route
            if kid >= 2 and kid % 2 == 0:
                ms.erase_keyframe(kid)
                culled.append(kid)
        assert ms.n_kf == 3000
        assert ms.KF_CAP >= 3000
        assert ms.n_keyframes() == 3000 - len(culled)
        # grown graph arrays stay consistent
        assert ms.covis.shape == (ms.KF_CAP, ms.KF_CAP)
        assert ms.parent.shape[0] == ms.KF_CAP
        # culled slots keep the frozen Tcp + parent chain for trajectory
        # recovery; fresh slots past the original cap have identity poses
        for kid in culled[:5]:
            assert not ms.kf_valid[kid]
            assert ms.parent[kid] >= 0

    def test_map_point_growth_batch_and_scalar(self):
        ms = make_store()
        assert ms.MP_CAP == 512
        k0 = add_kf(ms, 0, stereo_idx=[0])
        # batch growth path
        for i in range(20):
            pos = np.random.default_rng(i).normal(size=(60, 3)).astype(np.float32)
            ms.add_map_points_batch(pos, k0, np.arange(60) % 64)
        assert ms.n_mp == 1200
        assert ms.MP_CAP >= 1200
        assert ms.mp_valid.sum() > 0
        # scalar growth path on a fresh store
        ms2 = make_store()
        k0 = add_kf(ms2, 0)
        for i in range(600):
            ms2.add_map_point(np.zeros(3, np.float32), k0)
        assert ms2.n_mp == 600 and ms2.MP_CAP >= 600

    def test_restore_after_growth(self):
        ms = make_store()
        for k in range(40):   # grows past the 16-slot initial cap
            add_kf(ms, k)
        m = ms.add_map_point(np.array([0, 0, 5], np.float32), 20)
        ms.add_observation(m, 20, 3)
        data = ms.checkpoint()
        ms2 = MapStore.restore(ms.config, data)
        assert ms2.n_kf == 40
        assert ms2.kf_valid[:40].all()
        assert ms2.mp_valid[m]
        assert ms2.mp_obs_kf[m, 0] == 20

    def test_kf_database_growth(self):
        from orb_slam2_detailed_comments_tpu.place.kf_database import (
            KeyFrameDatabase)
        from orb_slam2_detailed_comments_tpu.place.vocabulary import (
            BinaryVocabulary)
        rng = np.random.default_rng(0)
        voc = BinaryVocabulary.train(
            rng.integers(0, 2**32, (256, 8), dtype=np.uint32), n_words=32,
            seed=0)
        db = KeyFrameDatabase(voc, max_keyframes=8)
        bow = np.zeros(32, np.float32)
        bow[:5] = 0.2
        for kf in range(50):
            db.add(kf, bow)
        assert db.KF_CAP >= 50
        assert db.active[:50].all()
