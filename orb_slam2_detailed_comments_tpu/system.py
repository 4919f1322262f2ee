"""Top-level System API.

TPU-native replacement for ORB_SLAM2::System (reference: src/System.h:70-160,
src/System.cc): constructs the map, vocabulary, keyframe database and the
three pipeline stages, dispatches frames per sensor, supports
localization-only mode, reset, shutdown and trajectory export.

Scheduling difference vs the reference: the reference runs LocalMapping and
LoopClosing in their own threads with queue back-pressure
(System.cc:133-152). Here the stages run synchronously per keyframe — a
deterministic pipeline (every run is reproducible, SURVEY.md section 2.3) —
with the same stage boundaries, so an async dispatcher can be layered on
without touching the math.
"""
from __future__ import annotations

import contextlib
import os
import threading
from typing import Optional

import numpy as np

from .backend.local_mapping import LocalMapper
from .backend.loop_closing import LoopCloser
from .backend.relocalization import Relocalizer
from .frontend.tracking import Tracker, TrackingState, Sensor
from .io.trajectory import (save_trajectory_tum, save_trajectory_kitti,
                            save_keyframe_trajectory_tum)
from .place.kf_database import KeyFrameDatabase
from .place.vocabulary import BinaryVocabulary
from .state.map_store import MapStore
from .utils.config import SlamConfig, load_settings_yaml

# Shipped default vocabulary (reference: src/System.cc:78-94 always loads a
# pre-trained ORBvoc.txt). Trained offline on diverse rendered imagery by
# examples/train_default_vocabulary.py; loaded once per process.
DEFAULT_VOCAB_PATH = os.path.join(os.path.dirname(__file__), "data",
                                  "default_vocab.npz")
_default_vocab_cache = None


def load_default_vocabulary():
    """The shipped k-ary tree vocabulary, or None if the package data file
    is absent (then System falls back to online self-training)."""
    global _default_vocab_cache
    if _default_vocab_cache is None and os.path.exists(DEFAULT_VOCAB_PATH):
        from .place.vocabulary_tree import TreeVocabulary
        _default_vocab_cache = TreeVocabulary.load(DEFAULT_VOCAB_PATH)
    return _default_vocab_cache


class _KeyFrameIndexer:
    """Indexes every new keyframe into the KeyFrameDatabase when loop
    closing is disabled. In the reference the LoopClosing thread performs
    this add unconditionally (LoopClosing.cc:378-380 mpKeyFrameDB->add in
    DetectLoop); relocalization depends on the inverted index regardless
    of whether loops are being closed, so the index must be maintained
    either way."""

    def __init__(self, map_store, voc, kfdb):
        self.map = map_store
        self.voc = voc
        self.kfdb = kfdb

    def on_new_keyframe(self, kf: int):
        _, bow = self.voc.transform(self.map.kf_desc[kf],
                                    self.map.kf_kp_valid[kf])
        self.kfdb.add(int(kf), bow)

    def reset(self):
        self.kfdb.clear()


class System:
    def __init__(self, config: SlamConfig, sensor: Sensor,
                 vocabulary: Optional[BinaryVocabulary] = None,
                 enable_loop_closing: bool = True,
                 enable_global_ba_on_loop: bool = True,
                 async_mapping: bool = False):
        self.config = config
        self.sensor = sensor
        self.map = MapStore(config)
        self.async_mapping = async_mapping
        self._map_lock = threading.RLock() if async_mapping else contextlib.nullcontext()

        # Vocabulary resolution order (reference loads a pre-trained
        # ORBvoc.txt unconditionally, System.cc:78-94):
        #   1. an explicit instance passed by the caller
        #   2. the SHIPPED default tree vocabulary (package data, trained
        #      offline by examples/train_default_vocabulary.py)
        #   3. vocabulary="online": self-train from the first keyframes'
        #      descriptors (also the fallback when the data file is absent)
        if vocabulary is None:
            vocabulary = load_default_vocabulary()
        elif vocabulary == "online":
            vocabulary = None
        self.voc = vocabulary
        self.kfdb: Optional[KeyFrameDatabase] = None
        self.loop_closer: Optional[LoopCloser] = None
        self.relocalizer = None
        self._enable_loop = enable_loop_closing
        self._enable_gba = enable_global_ba_on_loop
        self._pending_voc_train = vocabulary is None
        self._voc_min_kfs = 3

        self.local_mapper = LocalMapper(config, self.map,
                                        monocular=(sensor == Sensor.MONOCULAR))
        if async_mapping:
            from .backend.async_pipeline import AsyncLocalMapper
            self.local_mapper = AsyncLocalMapper(self.local_mapper, self._map_lock)
        # transient interruptible global BA (reference spawns a GBA thread
        # from LoopClosing, LoopClosing.cc:962-965; here the runner solves
        # on a lock-free snapshot and merges staged results — in async mode
        # on its own transient thread, the reference topology)
        from .backend.gba_runner import GlobalBARunner
        self.gba_runner = GlobalBARunner(config, self.map, self._map_lock,
                                         async_mode=async_mapping)
        if self.voc is not None:
            self._wire_place_recognition()
        # NOTE: _wire_place_recognition may run before the tracker exists
        # (pre-trained vocabulary) or after (online self-training) — wire
        # the relocalizer on both paths.
        self.tracker = Tracker(config, self.map, sensor,
                               local_mapper=self.local_mapper,
                               relocalizer=self.relocalizer)
        self.tracker.map_lock = self._map_lock

    # ------------------------------------------------------------------

    @classmethod
    def from_settings_yaml(cls, path: str, sensor: Sensor, **kwargs) -> "System":
        return cls(load_settings_yaml(path), sensor, **kwargs)

    def _wire_place_recognition(self):
        self.kfdb = KeyFrameDatabase(self.voc, self.config.max_keyframes)
        self.relocalizer = Relocalizer(self.config, self.map, self.voc, self.kfdb)
        if self._enable_loop:
            self.loop_closer = LoopCloser(
                self.config, self.map, self.voc, self.kfdb,
                fix_scale=(self.sensor != Sensor.MONOCULAR),
                local_mapper=self.local_mapper,
                run_global_ba=self._enable_gba,
                gba_runner=self.gba_runner)
            self.local_mapper.loop_closer = self.loop_closer
        else:
            # keep the relocalization inverted index fed even without a
            # loop closer (the reference's LoopClosing thread does the
            # KeyFrameDatabase::add for every keyframe unconditionally)
            self.local_mapper.loop_closer = _KeyFrameIndexer(
                self.map, self.voc, self.kfdb)
            # index keyframes that already exist at wire time
            for k in self.map.keyframe_ids():
                self.local_mapper.loop_closer.on_new_keyframe(int(k))
        if hasattr(self, "tracker"):
            self.tracker.relocalizer = self.relocalizer

    def _maybe_train_vocabulary(self):
        """Self-train the BoW vocabulary once enough map data exists."""
        # count allocated (not surviving) keyframes: culling may keep the
        # live set small while plenty of descriptors exist for training
        if not self._pending_voc_train or self.map.n_kf < self._voc_min_kfs:
            return
        kfs = self.map.keyframe_ids()
        descs = []
        for k in kfs:
            d = self.map.kf_desc[k][self.map.kf_kp_valid[k]]
            descs.append(d)
        train = np.concatenate(descs, axis=0)
        n_words = int(min(2048, max(256, len(train) // 8)))
        self.voc = BinaryVocabulary.train(train, n_words=n_words, n_iters=3)
        self._pending_voc_train = False
        self._wire_place_recognition()
        # index the existing keyframes
        for k in kfs:
            _, bow = self.voc.transform(self.map.kf_desc[k], self.map.kf_kp_valid[k])
            self.kfdb.add(int(k), bow)
            if self.loop_closer is not None:
                self.loop_closer.kf_bow[int(k)] = bow

    # ------------------------------------------------------------------
    # frame dispatch (reference: System::TrackMonocular/Stereo/RGBD)
    # ------------------------------------------------------------------

    def track_monocular(self, img: np.ndarray, timestamp: float):
        out = self.tracker.track_monocular(img, timestamp)
        self._maybe_train_vocabulary()
        return out

    def track_stereo(self, left: np.ndarray, right: np.ndarray, timestamp: float):
        out = self.tracker.track_stereo(left, right, timestamp)
        self._maybe_train_vocabulary()
        return out

    def track_rgbd(self, img: np.ndarray, depth: np.ndarray, timestamp: float):
        out = self.tracker.track_rgbd(img, depth, timestamp)
        self._maybe_train_vocabulary()
        return out

    # ------------------------------------------------------------------
    # mode switches (reference: System.cc:287-334)
    # ------------------------------------------------------------------

    def activate_localization_mode(self):
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        self.tracker.localization_only = False
        self.tracker.vo_mode = False

    def reset(self):
        self.tracker.reset()
        if self.loop_closer is not None:
            self.loop_closer.reset()
        elif self.kfdb is not None:
            self.kfdb.clear()

    def shutdown(self):
        """Join the mapping worker + any running transient GBA if async
        (reference: System::Shutdown waits on all threads incl. a running
        global BA, System.cc:444-473)."""
        if self.async_mapping and hasattr(self.local_mapper, "shutdown"):
            self.local_mapper.shutdown()
        self.gba_runner.wait(timeout=120.0)

    # ------------------------------------------------------------------
    # introspection (reference: GetTrackingState/GetTrackedMapPoints)
    # ------------------------------------------------------------------

    @property
    def tracking_state(self) -> TrackingState:
        return self.tracker.state

    def n_tracked_points(self) -> int:
        fr = self.tracker.last_frame
        if fr is None or fr.mp is None:
            return 0
        return int(((fr.mp >= 0) & ~fr.is_outlier).sum())

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    def save_trajectory_tum(self, path: str):
        save_trajectory_tum(path, self.tracker.trajectory, self.map)

    def save_trajectory_kitti(self, path: str):
        save_trajectory_kitti(path, self.tracker.trajectory, self.map)

    def save_keyframe_trajectory_tum(self, path: str):
        save_keyframe_trajectory_tum(path, self.map)

    def save_map(self, path: str):
        """Full-map checkpoint (the reference left SaveMap as a TODO,
        System.h:149-152)."""
        data = self.map.checkpoint()
        np.savez_compressed(path, **data)

    def load_map(self, path: str):
        data = dict(np.load(path, allow_pickle=False))
        self.map = MapStore.restore(self.config, data)
        self.local_mapper.map = self.map
        self.gba_runner.map = self.map
        self.tracker.map = self.map
        if self.relocalizer is not None:
            self.relocalizer.map = self.map
        if self.loop_closer is not None:
            self.loop_closer.map = self.map
