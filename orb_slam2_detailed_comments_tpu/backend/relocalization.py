"""Relocalization: BoW candidates -> RANSAC PnP -> guided refinement.

TPU-native replacement for Tracking::Relocalization
(reference: src/Tracking.cc:2245-2499): per candidate keyframe a full MXU
descriptor match replaces SearchByBoW, the batched DLT-PnP RANSAC replaces
EPnP iterate(5), and the widening projection-search + re-optimize cascade
(50-inlier acceptance) is kept.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import matching as M
from ..optim.pose_gn import pose_optimization
from ..place.kf_database import KeyFrameDatabase
from ..place.vocabulary import BinaryVocabulary
from ..solvers.pnp import solve_pnp_ransac
from ..state.frame import FrameData
from ..state.map_store import MapStore
from ..utils.config import SlamConfig
from ..utils import counters


class Relocalizer:
    def __init__(self, config: SlamConfig, map_store: MapStore,
                 voc: BinaryVocabulary, kfdb: KeyFrameDatabase):
        self.config = config
        self.map = map_store
        self.voc = voc
        self.kfdb = kfdb
        sf = config.orb.scale_factor
        self.scale_factors = np.array([sf ** i for i in range(config.orb.n_levels)], np.float32)
        self.inv_sigma2 = (1.0 / self.scale_factors ** 2).astype(np.float32)
        self.log_scale = float(np.log(sf))

    def __call__(self, frame: FrameData) -> bool:
        _, bow = self.voc.transform(frame.desc, frame.valid)
        candidates = self.kfdb.detect_relocalization_candidates(bow, self.map)
        if not candidates:
            return False

        mp = self.map
        for kf in candidates:
            if not mp.kf_valid[kf]:
                continue
            kf_has_mp = mp.kf_mp[kf] >= 0
            m = M.match_descriptors(
                jnp.asarray(frame.desc), jnp.asarray(frame.valid),
                jnp.asarray(mp.kf_desc[kf]),
                jnp.asarray(mp.kf_kp_valid[kf] & kf_has_mp),
                angle_a=jnp.asarray(frame.angle), angle_b=jnp.asarray(mp.kf_angle[kf]),
                max_dist=M.TH_LOW, ratio=0.75)
            ok = np.asarray(m.ok)
            idx = np.asarray(m.idx)
            if ok.sum() < 15:  # reference: Tracking.cc:2295
                continue

            cand_mp = np.where(ok, mp.kf_mp[kf][idx], -1)
            cand_mp = np.where((cand_mp >= 0) & mp.mp_valid[np.maximum(cand_mp, 0)], cand_mp, -1)
            has = cand_mp >= 0
            pts3d = mp.mp_pos[np.maximum(cand_mp, 0)]
            res = solve_pnp_ransac(
                pts3d, frame.xy, has, frame.octave,
                np.asarray(self.config.camera.K), self.inv_sigma2,
                min_inliers=10, seed=frame.frame_id)
            if res is None:
                continue

            frame.Tcw = res.Tcw
            frame.mp[:] = -1
            frame.mp[res.inliers] = cand_mp[res.inliers]
            n_in = self._pose_opt(frame)
            if n_in < 10:
                continue
            if n_in < 50:
                n_in = self._search_more(frame, window_th=10.0, max_dist=100)
                if 30 < n_in < 50:
                    # narrow second pass from the now-refined pose
                    # (reference: Tracking.cc:2448-2482 — window 3,
                    # ORBdist 64, outlier associations dropped first)
                    frame.mp[frame.is_outlier] = -1
                    frame.is_outlier[:] = False
                    n_in = self._search_more(frame, window_th=3.0,
                                             max_dist=64)
            if n_in >= 50:
                frame.mp[frame.is_outlier] = -1
                frame.is_outlier[:] = False
                return True
        return False

    # ------------------------------------------------------------------

    def _pose_opt(self, frame: FrameData) -> int:
        mp = self.map
        has = (frame.mp >= 0) & frame.valid
        mp_safe = np.where(has, frame.mp, 0)
        pts = mp.mp_pos[mp_safe]
        obs = np.concatenate([frame.xy, frame.ur[:, None]], axis=1).astype(np.float32)
        Tcw, inliers, n = pose_optimization(
            jnp.asarray(frame.Tcw), jnp.asarray(pts), jnp.asarray(obs),
            jnp.asarray(frame.octave), jnp.asarray(has), self.config.camera,
            jnp.asarray(self.inv_sigma2))
        frame.Tcw = np.asarray(Tcw)
        inl = np.asarray(inliers)
        frame.is_outlier = has & ~inl
        return int(inl.sum())

    def _search_more(self, frame: FrameData, window_th: float, max_dist: int) -> int:
        """Widen with projection search against all local points of the
        matched area (reference: Tracking.cc:2416-2482)."""
        mp = self.map
        kf_ids, _ = mp.local_keyframes(frame.mp)
        if kf_ids.size == 0:
            return int(((frame.mp >= 0) & ~frame.is_outlier).sum())
        mp_ids = mp.points_of_keyframes(kf_ids)
        cap = 8192
        mp_ids = counters.keep_best_observed(mp_ids, mp.mp_n_obs, cap,
                                             "relocalization.search_more")
        pad = cap - mp_ids.size
        ids = np.pad(mp_ids, (0, pad))
        pvalid = np.pad(np.ones(mp_ids.size, bool), (0, pad))
        proj = M.project_and_cull(
            jnp.asarray(mp.mp_pos[ids]), jnp.asarray(pvalid),
            jnp.asarray(mp.mp_normal[ids]), jnp.asarray(mp.mp_min_dist[ids]),
            jnp.asarray(mp.mp_max_dist[ids]), jnp.asarray(frame.Tcw),
            self.config.camera, self.config.orb.n_levels, self.log_scale,
            view_cos_limit=-1.0)
        kp_free = frame.valid & (frame.mp < 0)
        m = M.search_by_projection(
            proj, jnp.asarray(mp.mp_desc[ids]),
            jnp.asarray(frame.xy), jnp.asarray(frame.ur),
            jnp.asarray(frame.desc), jnp.asarray(kp_free),
            jnp.asarray(frame.octave), jnp.asarray(self.scale_factors),
            th=window_th / 4.0, max_dist=max_dist, ratio=0.0)
        ok = np.asarray(m.ok)
        idx = np.asarray(m.idx)
        frame.mp[idx[ok]] = ids[ok]
        return self._pose_opt(frame)
