"""Asynchronous mapping pipeline (optional).

Mirrors the reference's thread topology — Tracking in the caller's thread,
LocalMapping (+LoopClosing) in a worker consuming a keyframe queue with
back-pressure (reference: System.cc:133-152, LocalMapping.cc:176-190,
mlNewKeyFrames + SetAcceptKeyFrames). The default pipeline is synchronous
and deterministic; enable this to overlap per-frame device work (feature
extraction, matching) with mapping.

Synchronization is a single reentrant map lock — coarser than the
reference's ten mutexes but race-free by construction; the overlap win
comes from extraction and matching running outside the lock on the
tracking side, and the local-BA SOLVE running outside the lock on the
mapping side (snapshot under lock -> solve off-lock -> merge under lock
with pose-epoch + point-identity staleness guards, the same pattern as
backend/gba_runner.py).
"""
from __future__ import annotations

import queue
import threading
from typing import Optional


class AsyncLocalMapper:
    """Wraps a LocalMapper, running on_new_keyframe in a worker thread."""

    def __init__(self, mapper, map_lock: threading.RLock, max_queue: int = 3):
        self.mapper = mapper
        self.lock = map_lock
        self.queue: "queue.Queue" = queue.Queue()
        self.max_queue = max_queue
        self._stop = threading.Event()
        self._idle = threading.Event()
        self._idle.set()
        # local-BA interruption under queue pressure (reference: Tracking's
        # InsertKeyFrame sets mbAbortBA, LocalMapping.cc:954-957): a running
        # local BA skips its second phase when another KF is waiting.
        self.mapper.abort_ba_check = lambda: not self.queue.empty()
        self.n_processed = 0  # keyframes fully processed by the worker
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    # LocalMapper-compatible surface -----------------------------------

    @property
    def loop_closer(self):
        return self.mapper.loop_closer

    @loop_closer.setter
    def loop_closer(self, lc):
        self.mapper.loop_closer = lc

    @property
    def map(self):
        return self.mapper.map

    @map.setter
    def map(self, m):
        self.mapper.map = m

    def __getattr__(self, name):
        # full LocalMapper surface: the loop closer calls back into mapper
        # internals (e.g. _fuse during CorrectLoop's SearchAndFuse) — in
        # async mode it holds THIS wrapper, which must behave like the
        # mapper for everything it does not override (round 4: a missing
        # _fuse crashed loop correction on the worker thread, caught by
        # the async loop-lap gate)
        return getattr(object.__getattribute__(self, "mapper"), name)

    def on_new_keyframe(self, kf: int, run_ba: bool = True):
        self._idle.clear()
        self.queue.put((kf, run_ba))

    def global_ba(self, n_iters: int = 10):
        with self.lock:
            self.mapper.global_ba(n_iters)

    def reset(self):
        # drain pending work, then reset state
        self.wait_idle()
        with self.lock:
            self.mapper.reset()

    # queue management --------------------------------------------------

    def queue_len(self) -> int:
        """Backlog size (reference KeyframesInQueue, LocalMapping.cc)."""
        return self.queue.qsize()

    def accept_keyframes(self) -> bool:
        """Back-pressure signal (reference: LocalMapping::AcceptKeyFrames /
        KeyframesInQueue < 3, Tracking.cc:1703-1737)."""
        return self.queue.qsize() < self.max_queue

    def wait_idle(self, timeout: Optional[float] = None):
        self.queue.join()
        self._idle.wait(timeout)

    def shutdown(self):
        self.queue.join()
        self._stop.set()
        self.queue.put(None)
        self.thread.join(timeout=10.0)

    def _run(self):
        while not self._stop.is_set():
            item = self.queue.get()
            if item is None:
                self.queue.task_done()
                break
            kf, run_ba = item
            try:
                # local-BA solve runs OUTSIDE the map lock (gba_runner's
                # snapshot/solve/merge pattern): tracking's in-lock portion
                # never waits behind the 9.8-48.4 ms BA buckets, only
                # behind the host-side build/merge (round-3; the reference
                # achieves the same via fine-grained mutexes,
                # LocalMapping.cc:80-173)
                with self.lock:
                    built = self.mapper.prepare_keyframe(kf, run_ba=run_ba)
                result = (self.mapper._solve_local_ba(built)
                          if built is not None else None)
                with self.lock:
                    if result is not None:
                        self.mapper._merge_local_ba(built, result)
                    self.mapper.finish_keyframe(kf)
                self.n_processed += 1
            finally:
                self.queue.task_done()
                if self.queue.empty():
                    self._idle.set()
