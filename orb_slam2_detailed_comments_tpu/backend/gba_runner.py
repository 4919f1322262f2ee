"""Transient, interruptible, concurrent global bundle adjustment.

TPU-native replacement for the reference's transient GBA thread
(reference: src/LoopClosing.cc:962-965 spawns std::thread(
RunGlobalBundleAdjustment); :699-712 kills a running GBA when a new loop
arrives; :1064-1234 merges the staged results back into the live map).

Design: the solve never holds the map lock. A snapshot of the whole-map
BA problem is taken under the lock (host numpy assembly), the solver runs
on the snapshot in chunks with a stop flag polled between chunks (the
mbStopGBA equivalent), and on success the staged poses/points are merged
under the lock:

  * keyframes in the snapshot        -> staged GBA pose
  * keyframes created meanwhile      -> propagated through the spanning
    tree: Tcw_GBA(child) = Tcw_cur(child) * Tcw_cur(parent)^-1 *
    Tcw_GBA(parent)  (reference: LoopClosing.cc:1128-1185, mTcwBefGBA)
  * map points in the snapshot       -> staged GBA position (guarded by a
    first-KF identity check: point slots are recycled, so a snapshot id
    may name a different point by merge time)
  * map points created meanwhile     -> re-anchored via their reference
    keyframe: x_new = Twc_GBA(ref) * Tcw_befGBA(ref) * x_old
    (reference: LoopClosing.cc:1189-1223)

In the default synchronous pipeline `launch()` runs all three stages
inline (deterministic; bitwise the same math). With async_mode=True the
solve runs in a transient daemon thread, exactly the reference topology.
"""
from __future__ import annotations

import threading
from typing import Dict, Optional

import numpy as np

from .local_mapping import build_global_ba_problem, solve_global_ba
from ..state.map_store import MapStore
from ..utils.config import SlamConfig


class GlobalBARunner:
    def __init__(self, config: SlamConfig, map_store: MapStore, map_lock,
                 async_mode: bool = False, inv_sigma2=None):
        self.config = config
        self.map = map_store
        self.lock = map_lock
        self.async_mode = async_mode
        if inv_sigma2 is None:
            sf = config.orb.scale_factor
            inv_sigma2 = np.array(
                [1.0 / sf ** (2 * i) for i in range(config.orb.n_levels)],
                np.float32)
        self.inv_sigma2 = inv_sigma2
        self._thread: Optional[threading.Thread] = None
        # Per-launch stop event + generation counter. The generation guard
        # (checked under the map lock at merge time) makes a stale merge
        # impossible even when request_stop's join times out: a GBA thread
        # that was blocked at the merge lock while a new loop correction
        # ran (holding that lock) sees gen != its own and discards. The
        # stop event is REPLACED per launch (never .clear()ed), so a new
        # launch can't accidentally unflag an old thread.
        self._stop = threading.Event()
        self._gen = 0
        self._meta_lock = threading.Lock()
        self.n_completed = 0
        self.n_aborted = 0
        # test/observability hook: called between solver chunks (after the
        # stop check) — lets tests slow a running GBA down deterministically
        self._chunk_hook = None

    # ------------------------------------------------------------------

    def running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def request_stop(self, join: bool = True, timeout: float = 30.0):
        """Kill a running GBA (reference: LoopClosing.cc:699-712 sets
        mbStopGBA and busy-waits for the thread). Bumping the generation
        invalidates any pending merge even if the join times out (e.g. the
        caller holds the map lock the merging thread is blocked on)."""
        with self._meta_lock:
            self._gen += 1
            self._stop.set()
            th = self._thread
        if join and th is not None and th is not threading.current_thread():
            th.join(timeout)

    def wait(self, timeout: Optional[float] = None):
        if self._thread is not None:
            self._thread.join(timeout)

    def launch(self, n_iters: int = 10):
        """Start a full BA. A running GBA is stopped first (the reference
        does the same from CorrectLoop before re-launching). No join: the
        old thread self-aborts at its next chunk boundary (stop event) or
        at merge time (generation guard), so launch never stalls behind a
        solver chunk even when called under the map lock."""
        with self._meta_lock:
            self._gen += 1
            self._stop.set()          # signal any in-flight thread
            stop = threading.Event()  # fresh event for this launch
            self._stop = stop
            gen = self._gen
        with self.lock:
            snap = self._snapshot()
        if snap is None:
            return
        if self.async_mode:
            self._thread = threading.Thread(
                target=self._solve_and_merge, args=(snap, n_iters, stop, gen),
                daemon=True)
            self._thread.start()
        else:
            self._solve_and_merge(snap, n_iters, stop, gen)

    # ------------------------------------------------------------------

    def _snapshot(self):
        built = build_global_ba_problem(self.map)
        if built is None:
            return None
        prob, kfs, pts = built
        return {
            "prob": prob,
            "kfs": np.asarray(kfs).copy(),
            "pts": np.asarray(pts).copy(),
            # identity guard: map-point slots are recycled by the free-list
            "pt_first_kf": self.map.mp_first_kf[pts].copy(),
            "n_kf": int(self.map.n_kf),
        }

    def _solve_and_merge(self, snap, n_iters: int, stop: threading.Event,
                         gen: int):
        def stop_check():
            if self._chunk_hook is not None:
                self._chunk_hook()
            return stop.is_set()

        # sync mode keeps the single fused solve (deterministic pipeline,
        # nothing can interrupt it); async mode chunks the schedule so the
        # stop flag is polled every 2 GN iterations.
        result = solve_global_ba(
            snap["prob"], self.config.camera, self.inv_sigma2,
            n_iters=n_iters,
            stop_check=stop_check if self.async_mode else None, chunk=2)
        if result is None:
            # interrupted: discard, like the reference's stopped GBA
            self.n_aborted += 1
            return
        cam_new, pts_new = result
        with self.lock:
            # generation guard: a newer launch/stop invalidated this solve
            # while we were waiting for the map lock (see __init__ note)
            if stop.is_set() or gen != self._gen:
                self.n_aborted += 1
                return
            self._merge(snap, cam_new, pts_new)
            self.n_completed += 1

    # ------------------------------------------------------------------

    def _merge(self, snap, cam_new: np.ndarray, pts_new: np.ndarray):
        """Apply staged results + spanning-tree propagation (reference:
        LoopClosing.cc:1124-1234, under mMutexMapUpdate)."""
        mp = self.map
        kfs = snap["kfs"]
        cam_free = np.asarray(snap["prob"].cam_free)

        # corrected pose per keyframe; poses BEFORE correction (mTcwBefGBA)
        corrected: Dict[int, np.ndarray] = {}
        before: Dict[int, np.ndarray] = {}
        for i, k in enumerate(kfs):
            k = int(k)
            if not mp.kf_valid[k]:
                continue
            before[k] = mp.kf_Tcw[k].copy()
            corrected[k] = cam_new[i] if cam_free[i] else mp.kf_Tcw[k].copy()

        # spanning-tree propagation to keyframes created during the solve
        # (or re-parented ones): child pose rides its parent's correction.
        pending = [int(k) for k in np.nonzero(mp.kf_valid)[0]
                   if int(k) not in corrected]
        progress = True
        while pending and progress:
            progress = False
            still = []
            for k in pending:
                p = int(mp.parent[k])
                if p >= 0 and p in corrected:
                    before[k] = mp.kf_Tcw[k].copy()
                    T_child_parent = mp.kf_Tcw[k] @ np.linalg.inv(before[p])
                    corrected[k] = (T_child_parent @ corrected[p]).astype(np.float32)
                    progress = True
                else:
                    still.append(k)
            pending = still
        # orphans whose chain never reaches the snapshot (shouldn't happen
        # with a rooted spanning tree) keep their poses.

        for k, T in corrected.items():
            mp.kf_Tcw[k] = T

        # --- map points ---
        applied = np.zeros(mp.MP_CAP, bool)
        pts = snap["pts"]
        same = (mp.mp_valid[pts]
                & (mp.mp_first_kf[pts] == snap["pt_first_kf"]))
        mp.mp_pos[pts[same]] = pts_new[same]
        applied[pts[same]] = True

        # points created meanwhile: re-anchor via their reference keyframe
        rest = np.nonzero(mp.mp_valid & ~applied)[0]
        if rest.size:
            refs = mp.mp_ref_kf[rest]
            for r in np.unique(refs):
                r = int(r)
                if r not in corrected or r not in before:
                    continue
                sel = rest[refs == r]
                x = mp.mp_pos[sel]
                Tb = before[r]
                xc = x @ Tb[:3, :3].T + Tb[:3, 3]
                Twc = np.linalg.inv(corrected[r]).astype(np.float32)
                mp.mp_pos[sel] = xc @ Twc[:3, :3].T + Twc[:3, 3]

        all_pts = np.nonzero(mp.mp_valid)[0]
        mp.update_normal_and_depth(all_pts)
        mp.pose_epoch += 1  # invalidate any off-lock local-BA in flight
