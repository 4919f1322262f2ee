"""Loop closing stage.

TPU-native replacement for the LoopClosing thread
(reference: src/LoopClosing.cc). Invoked synchronously per keyframe:

  on_new_keyframe
  ├─ DetectLoop      (reference :156-388): BoW candidates from the dense
  │    keyframe database + covisibility-consistency chains (>= 3)
  ├─ ComputeSim3     (reference :406-665): MXU descriptor match -> batched
  │    Horn Sim3 RANSAC -> autodiff Sim3 GN refine -> projection check
  └─ CorrectLoop     (reference :676-973): Sim3 propagation to the covisible
       group, map-point correction, loop fusion, essential-graph pose
       optimization, loop edge insertion, optional global BA
"""
from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np
import jax.numpy as jnp

from ..geometry.sim3 import sim3_inverse, make_sim3, sim3_to_se3
from ..ops import matching as M
from ..optim.pose_graph import PoseGraphProblem, optimize_pose_graph
from ..optim.sim3_opt import optimize_sim3
from ..place.kf_database import KeyFrameDatabase
from ..place.vocabulary import BinaryVocabulary
from ..solvers.sim3_solver import solve_sim3_ransac
from ..state.map_store import MapStore
from ..utils.config import SlamConfig

CONSISTENCY_TH = 3  # reference: mnCovisibilityConsistencyTh (LoopClosing.cc:80)


class LoopCloser:
    def __init__(self, config: SlamConfig, map_store: MapStore,
                 voc: BinaryVocabulary, kfdb: KeyFrameDatabase,
                 fix_scale: bool, local_mapper=None, run_global_ba: bool = True,
                 gba_runner=None):
        self.config = config
        self.map = map_store
        self.voc = voc
        self.kfdb = kfdb
        self.fix_scale = fix_scale
        self.local_mapper = local_mapper
        self.run_global_ba = run_global_ba
        # transient interruptible GBA (reference: LoopClosing.cc:962-965);
        # None falls back to a synchronous in-place global BA
        self.gba_runner = gba_runner
        sf = config.orb.scale_factor
        self.scale_factors = np.array([sf ** i for i in range(config.orb.n_levels)], np.float32)
        self.sigma2 = (self.scale_factors ** 2).astype(np.float32)
        self.inv_sigma2 = (1.0 / self.sigma2).astype(np.float32)
        self.log_scale = float(np.log(sf))
        # consistency chains: list of (group_set, count)
        self.consistent_groups: List[Tuple[Set[int], int]] = []
        self.last_loop_kf = -1
        self.n_loops_closed = 0
        # per-KF bag-of-words stored SPARSE (ids, weights): dense bows at
        # ORBvoc-scale vocabularies would cost n_words*4 bytes per KF
        # (400 MB at 10^5 words x 1024 KFs)
        self.kf_bow: Dict[int, tuple] = {}

    def reset(self):
        self.consistent_groups.clear()
        self.kfdb.clear()
        self.kf_bow.clear()
        self.last_loop_kf = -1

    # ------------------------------------------------------------------

    def on_new_keyframe(self, kf: int) -> bool:
        """Returns True if a loop was detected and corrected."""
        _, bow = self.voc.transform(self.map.kf_desc[kf], self.map.kf_kp_valid[kf])
        ids = np.nonzero(bow > 0)[0]
        self.kf_bow[kf] = (ids, bow[ids])

        closed = False
        candidates = self._detect_loop(kf, bow)
        if candidates:
            result = self._compute_sim3(kf, candidates)
            if result is not None:
                loop_kf, S_cl, loop_points = result
                self._correct_loop(kf, loop_kf, S_cl, loop_points)
                closed = True

        self.kfdb.add(kf, bow)
        return closed

    # ------------------------------------------------------------------

    def _detect_loop(self, kf: int, bow: np.ndarray) -> List[int]:
        """reference: LoopClosing::DetectLoop (LoopClosing.cc:156-388)."""
        # too close to last loop or map too small (reference :165-175)
        if kf < 10 or (self.last_loop_kf >= 0 and kf < self.last_loop_kf + 10):
            self.consistent_groups.clear()
            return []

        covis = self.map.get_covisible(kf)
        min_score = 1.0
        for nb in covis:
            nb_bow = self.kf_bow.get(int(nb))
            if nb_bow is None:
                continue
            nb_ids, nb_vals = nb_bow
            s = float(np.minimum(bow[nb_ids], nb_vals).sum())
            min_score = min(min_score, s)

        cands = self.kfdb.detect_loop_candidates(kf, bow, min_score, covis, self.map)
        if not cands:
            self.consistent_groups.clear()
            return []

        # covisibility-consistency chains (reference :225-367)
        new_groups: List[Tuple[Set[int], int]] = []
        enough: List[int] = []
        for c in cands:
            group = {c} | {int(x) for x in self.map.get_covisible(c)}
            best_count = 0
            matched_any = False
            for prev_group, count in self.consistent_groups:
                if group & prev_group:
                    matched_any = True
                    best_count = max(best_count, count + 1)
            new_groups.append((group, best_count))
            if best_count >= CONSISTENCY_TH:
                enough.append(c)
            if not matched_any:
                pass  # group enters with count 0
        self.consistent_groups = new_groups
        return enough

    # ------------------------------------------------------------------

    def _compute_sim3(self, kf: int, candidates: List[int]):
        """reference: LoopClosing::ComputeSim3 (LoopClosing.cc:406-665).
        Returns (loop_kf, S_cl mapping loop->current camera, loop point ids)."""
        mp = self.map
        for cand in candidates:
            if not mp.kf_valid[cand]:
                continue
            kf_has = mp.kf_mp[kf] >= 0
            cd_has = mp.kf_mp[cand] >= 0
            m = M.match_descriptors(
                jnp.asarray(mp.kf_desc[kf]), jnp.asarray(mp.kf_kp_valid[kf] & kf_has),
                jnp.asarray(mp.kf_desc[cand]), jnp.asarray(mp.kf_kp_valid[cand] & cd_has),
                angle_a=jnp.asarray(mp.kf_angle[kf]), angle_b=jnp.asarray(mp.kf_angle[cand]),
                max_dist=M.TH_LOW, ratio=0.75)
            ok = np.asarray(m.ok)
            idx = np.asarray(m.idx)
            if ok.sum() < 20:  # reference :476
                continue

            i_cur = np.nonzero(ok)[0]
            i_lp = idx[i_cur]
            mp_cur = mp.kf_mp[kf, i_cur]
            mp_lp = mp.kf_mp[cand, i_lp]
            good = (mp_cur >= 0) & (mp_lp >= 0) & mp.mp_valid[np.maximum(mp_cur, 0)] & mp.mp_valid[np.maximum(mp_lp, 0)]
            i_cur, i_lp, mp_cur, mp_lp = i_cur[good], i_lp[good], mp_cur[good], mp_lp[good]
            if len(i_cur) < 20:
                continue

            T1 = mp.kf_Tcw[kf]
            T2 = mp.kf_Tcw[cand]
            p1 = mp.mp_pos[mp_cur] @ T1[:3, :3].T + T1[:3, 3]   # cam frame of kf
            p2 = mp.mp_pos[mp_lp] @ T2[:3, :3].T + T2[:3, 3]    # cam frame of cand
            uv1 = mp.kf_xy[kf, i_cur]
            uv2 = mp.kf_xy[cand, i_lp]
            o1 = mp.kf_octave[kf, i_cur]
            o2 = mp.kf_octave[cand, i_lp]

            # RANSAC Sim3: maps cand-cam -> kf-cam (solve p2 -> p1)
            res = solve_sim3_ransac(
                p2, p1, uv2, uv1, np.ones(len(p1), bool), o2, o1,
                self.sigma2, np.asarray(self.config.camera.K),
                self.fix_scale, min_inliers=20, seed=kf)
            if res is None:
                continue

            S0 = np.asarray(make_sim3(jnp.asarray(res.R), jnp.asarray(res.t),
                                      jnp.asarray(res.s)), np.float32)
            opt = optimize_sim3(
                jnp.asarray(S0), jnp.asarray(p1), jnp.asarray(p2),
                jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(res.inliers),
                jnp.asarray(self.inv_sigma2[o1]), jnp.asarray(self.inv_sigma2[o2]),
                jnp.asarray(self.config.camera.K), fix_scale=self.fix_scale)
            if int(opt.n_inliers) < 20:  # reference :555
                continue
            S_cl = np.asarray(opt.S12)  # cand cam -> kf cam

            # final projection check: project the loop neighborhood's points
            # into the current KF with the corrected pose (reference :594-655)
            loop_group = [cand] + [int(x) for x in mp.get_covisible(cand)]
            loop_points = mp.points_of_keyframes(np.asarray(loop_group, np.int64))
            if loop_points.size == 0:
                continue
            Scw = S_cl @ T2  # world -> current cam (Sim3-corrected)
            # current-KF keypoints whose Sim3 match survived OptimizeSim3's
            # chi2 pruning — the reference nulls pruned matches inside
            # OptimizeSim3 (Optimizer.cc:1556-1571) and keeps the survivors
            # in mvpCurrentMatchedPoints, which SearchByProjection then
            # skips and the >=40 acceptance counts alongside new matches
            # (LoopClosing.cc:636-655).
            prematched = i_cur[np.asarray(opt.inliers)]
            n_total = self._count_projection_matches(kf, loop_points, Scw,
                                                     prematched)
            if n_total >= 40:
                return cand, S_cl, loop_points
        return None

    def _count_projection_matches(self, kf: int, loop_points: np.ndarray,
                                  Scw: np.ndarray,
                                  prematched_kp: Optional[np.ndarray] = None) -> int:
        """Total loop-match count for the >=40 acceptance gate
        (reference: LoopClosing.cc:594-655): keypoints already matched by
        the Sim3 stage are excluded from the projection search (the
        reference's SearchByProjection skips filled mvpCurrentMatchedPoints
        slots, ORBmatcher.cc:422-568) and counted once alongside the new
        projection matches."""
        mp = self.map
        cap = 8192
        ids = loop_points[:cap]
        pad = cap - ids.size
        ids_p = np.pad(ids, (0, pad))
        pvalid = np.pad(np.ones(ids.size, bool), (0, pad))
        # normalize Sim3 to SE3-like for projection: [sR|t] projects the
        # same as [R|t/s] (reference Sim3Solver projection uses Scw directly)
        Tcw = np.asarray(sim3_to_se3(jnp.asarray(Scw)), np.float32)
        kp_free = mp.kf_kp_valid[kf].copy()
        n_prematched = 0
        if prematched_kp is not None and prematched_kp.size:
            kp_free[prematched_kp] = False
            n_prematched = int(prematched_kp.size)
        proj = M.project_and_cull(
            jnp.asarray(mp.mp_pos[ids_p]), jnp.asarray(pvalid),
            jnp.asarray(mp.mp_normal[ids_p]), jnp.asarray(mp.mp_min_dist[ids_p]),
            jnp.asarray(mp.mp_max_dist[ids_p]), jnp.asarray(Tcw),
            self.config.camera, self.config.orb.n_levels, self.log_scale,
            view_cos_limit=0.5)
        m = M.search_by_projection(
            proj, jnp.asarray(mp.mp_desc[ids_p]),
            jnp.asarray(mp.kf_xy[kf]), jnp.asarray(mp.kf_ur[kf]),
            jnp.asarray(mp.kf_desc[kf]), jnp.asarray(kp_free),
            jnp.asarray(mp.kf_octave[kf]), jnp.asarray(self.scale_factors),
            th=10.0 / 4.0, max_dist=M.TH_HIGH, ratio=0.0)
        ok = np.asarray(m.ok)
        return int(ok.sum()) + n_prematched

    # ------------------------------------------------------------------

    def _correct_loop(self, kf: int, loop_kf: int, S_cl: np.ndarray,
                      loop_points: np.ndarray):
        """reference: LoopClosing::CorrectLoop (LoopClosing.cc:676-973)."""
        mp = self.map

        # a running global BA from a previous loop is stale now: kill it
        # before correcting (reference: LoopClosing.cc:699-712 sets
        # mbStopGBA and joins the transient thread). join=False: in async
        # mode this runs under the map lock a finishing GBA thread may be
        # blocked on (join would always burn its timeout); the per-launch
        # stop event + generation guard already make a stale merge
        # impossible (gba_runner.__init__ note)
        if self.gba_runner is not None:
            self.gba_runner.request_stop(join=False)

        # corrected Sim3 of the current KF: Scw = S_cl * T_loop_w... NO:
        # S_cl maps loop-cam -> current-cam; corrected current pose is
        # Scw_corrected = S_cl^-1? — reference: mScw = gScm * Smw where
        # gScm maps current->loop... Here S_cl: cand->kf. The corrected
        # world->current transform chains the loop KF's (trusted) pose:
        # x_cur = S_cl x_cand = S_cl * T_cand_w x_w.
        Scw_corr = (S_cl @ mp.kf_Tcw[loop_kf]).astype(np.float32)

        # current neighborhood (current + covisible)
        group = [kf] + [int(x) for x in mp.get_covisible(kf)]
        T_cur_w = mp.kf_Tcw[kf]
        T_w_cur = np.linalg.inv(T_cur_w).astype(np.float32)

        corrected: Dict[int, np.ndarray] = {}
        uncorrected: Dict[int, np.ndarray] = {}
        for g in group:
            T_g_w = mp.kf_Tcw[g]
            uncorrected[g] = T_g_w.copy()
            # S_g_corrected = T_g_cur * Scw_corr  (relative pose to current
            # kept rigid, reference :755-792)
            T_g_cur = T_g_w @ T_w_cur
            corrected[g] = (T_g_cur @ Scw_corr).astype(np.float32)

        # correct the map points seen by the group (reference :799-840)
        moved: Set[int] = set()
        for g in group:
            S_new_inv = np.asarray(sim3_inverse(jnp.asarray(corrected[g])), np.float32)
            S_old = uncorrected[g]
            pts = mp.kf_mp[g]
            pts = np.unique(pts[pts >= 0])
            pts = pts[mp.mp_valid[pts]]
            pts = np.asarray([p for p in pts if p not in moved], np.int64)
            if pts.size == 0:
                continue
            pw = mp.mp_pos[pts]
            pc = pw @ S_old[:3, :3].T + S_old[:3, 3]
            pw_new = pc @ S_new_inv[:3, :3].T + S_new_inv[:3, 3]
            mp.mp_pos[pts] = pw_new
            moved.update(int(p) for p in pts)
            # write back SE3 pose (scale folded into translation)
            mp.kf_Tcw[g] = np.asarray(sim3_to_se3(jnp.asarray(corrected[g])), np.float32)

        mp.update_normal_and_depth(np.asarray(sorted(moved), np.int64))

        # covisible neighbors BEFORE fusion: the diff after SearchAndFuse
        # identifies the NEW cross-loop connections (reference :900-911
        # vpPreviousNeighbors)
        prev_neighbors = {g: {int(x) for x in mp.get_covisible(g)}
                          for g in group}

        # fuse loop points into the corrected neighborhood (reference :861-887
        # + SearchAndFuse :983-1023)
        if self.local_mapper is not None:
            for g in group:
                self.local_mapper._fuse(g, loop_points, th=4.0)
            touched = mp.points_of_keyframes(np.asarray(group, np.int64))
            mp.update_point_descriptors(touched)
            mp.update_normal_and_depth(touched)
        for g in group:
            mp.update_connections(g)

        # LoopConnections: connections each group member acquired THROUGH
        # the fusion — new links to the loop side. These carry loop-class
        # (corrected-pose) measurements in the essential graph; everything
        # pre-existing keeps its odometry-class measurement
        # (reference :913-927 builds exactly this diff)
        group_set = set(group)
        loop_connections: Dict[int, Set[int]] = {}
        for g in group:
            new_links = ({int(x) for x in mp.get_covisible(g)}
                         - prev_neighbors[g] - group_set)
            if new_links:
                loop_connections[g] = new_links

        # essential graph optimization (reference :939-947)
        self._optimize_essential_graph(kf, loop_kf, corrected, uncorrected,
                                       loop_connections)

        mp.add_loop_edge(kf, loop_kf)
        mp.pose_epoch += 1  # invalidate any off-lock local-BA in flight
        self.last_loop_kf = kf
        self.n_loops_closed += 1

        if self.run_global_ba:
            if self.gba_runner is not None:
                # transient GBA: solves on a snapshot without the map lock,
                # stages results, propagates to keyframes created meanwhile
                # (reference: LoopClosing.cc:962-965 + :1064-1234)
                self.gba_runner.launch(n_iters=10)
            elif self.local_mapper is not None:
                self.local_mapper.global_ba(n_iters=10)

    # ------------------------------------------------------------------

    def _optimize_essential_graph(self, kf: int, loop_kf: int,
                                  corrected: Dict[int, np.ndarray],
                                  uncorrected: Dict[int, np.ndarray],
                                  loop_connections:
                                  Optional[Dict[int, Set[int]]] = None):
        """Build + solve the essential graph (reference:
        Optimizer::OptimizeEssentialGraph, Optimizer.cc:1050-1381).

        loop_connections: {group_kf -> set of cross-loop kfs newly linked
        by SearchAndFuse} — these pairs get loop-class edges measured from
        the CORRECTED poses (reference: Optimizer.cc:1137-1160); all other
        edges are odometry-class (pre-correction measurements)."""
        mp = self.map
        kfs = mp.keyframe_ids()
        slot = {int(k): i for i, k in enumerate(kfs)}
        K = len(kfs)

        # vertex seeds: corrected-group members start from their FULL Sim3
        # (including the measured scale — the prior a monocular loop needs,
        # reference: Optimizer.cc:1099-1114 vCorrectedSwc); everything else
        # from its stored SE3 pose (scale 1).
        S_init = np.stack([corrected.get(int(k), mp.kf_Tcw[int(k)])
                           for k in kfs]).astype(np.float32)
        fixed = np.zeros(K, bool)
        fixed[slot[loop_kf]] = True  # reference fixes the loop KF (:1090)
        if mp.origin_kf in slot:
            fixed[slot[mp.origin_kf]] = True

        e_i, e_j, e_S, e_w = [], [], [], []
        added = set()

        def add_edge(a: int, b: int, Sji: np.ndarray, w: float):
            key = (min(a, b), max(a, b))
            if key in added or a == b:
                return
            added.add(key)
            e_i.append(slot[a])
            e_j.append(slot[b])
            e_S.append(Sji)
            e_w.append(w)

        def rel(i: int, j: int) -> np.ndarray:
            """Odometry-class measurement Sji (error log(Sji Si Sj^-1)):
            relative pose from the PRE-correction estimates — spanning-tree /
            covisibility / old-loop edges encode what odometry measured
            (reference: Optimizer.cc:1155-1296 uses the poses as stored)."""
            Si = uncorrected.get(i, mp.kf_Tcw[i])
            Sj = uncorrected.get(j, mp.kf_Tcw[j])
            return (Sj @ np.linalg.inv(Si)).astype(np.float32)

        def rel_corrected(i: int, j: int) -> np.ndarray:
            """Loop-class measurement: relative pose from the Sim3-CORRECTED
            poses — this is the new information the loop contributes
            (reference: the LoopConnections edges use CorrectedSim3,
            Optimizer.cc:1103-1152)."""
            Si = corrected.get(i, mp.kf_Tcw[i])
            Sj = corrected.get(j, mp.kf_Tcw[j])
            return (Sj @ np.linalg.inv(Si)).astype(np.float32)

        # loop-class edges FIRST (added first wins the dedup): the new
        # kf<->loop_kf edge plus every cross-loop connection SearchAndFuse
        # created, all measured from CORRECTED poses — a cross-loop pair
        # must not enter as an odometry-class edge whose measurement
        # encodes the pre-loop drift (reference: Optimizer.cc:1137-1160,
        # minFeat=100 gate except for the primary pair)
        add_edge(kf, loop_kf, rel_corrected(kf, loop_kf), 1.0)
        for a, conns in (loop_connections or {}).items():
            for b in conns:
                if b not in slot:
                    continue
                if not ((a == kf and b == loop_kf)
                        or mp.covis[a, b] >= 100):
                    continue
                add_edge(a, b, rel_corrected(a, b), 1.0)

        for k in kfs:
            k = int(k)
            parent = int(mp.parent[k])
            if parent >= 0 and parent in slot:
                add_edge(k, parent, rel(k, parent), 1.0)
            for (a, b) in mp.loop_edges:
                if a == k and b in slot:
                    add_edge(a, b, rel(a, b), 1.0)
            for nb in mp.get_covisible(k):
                nb = int(nb)
                if mp.covis[k, nb] >= 100 and nb in slot:
                    add_edge(k, nb, rel(k, nb), 1.0)

        if not e_i:
            return
        prob = PoseGraphProblem(
            S_init=jnp.asarray(S_init),
            vertex_fixed=jnp.asarray(fixed),
            vertex_valid=jnp.ones(K, bool),
            edge_i=jnp.asarray(e_i, jnp.int32),
            edge_j=jnp.asarray(e_j, jnp.int32),
            edge_Sji=jnp.asarray(np.stack(e_S)),
            edge_valid=jnp.ones(len(e_i), bool),
            edge_weight=jnp.asarray(e_w, jnp.float32),
        )
        S_opt = np.asarray(optimize_pose_graph(prob, n_iters=20))

        # recover SE3 + transform map points via their reference KF
        # (reference: Optimizer.cc:1297-1345)
        old_poses = {int(k): mp.kf_Tcw[int(k)].copy() for k in kfs}
        new_se3 = {}
        for i, k in enumerate(kfs):
            new_se3[int(k)] = np.asarray(sim3_to_se3(jnp.asarray(S_opt[i])), np.float32)

        all_pts = mp.points_of_keyframes(kfs)
        ref = mp.mp_ref_kf[all_pts]
        for k in np.unique(ref):
            k = int(k)
            if k not in new_se3:
                continue
            sel = all_pts[ref == k]
            S_old = old_poses[k]
            # x_new = T_new^-1 * S_old * x_old  (re-anchor via the ref KF)
            S_new_inv = np.linalg.inv(new_se3[k]).astype(np.float32)
            pw = mp.mp_pos[sel]
            pc = pw @ S_old[:3, :3].T + S_old[:3, 3]
            mp.mp_pos[sel] = pc @ S_new_inv[:3, :3].T + S_new_inv[:3, 3]
        for k in kfs:
            mp.kf_Tcw[int(k)] = new_se3[int(k)]
        mp.update_normal_and_depth(all_pts)
