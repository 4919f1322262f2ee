"""Device-resident tracking local map (VERDICT r4 task 1).

The staged tracker re-marshalled the full 8192-slot local-map pads
(pos/normal/dist-band/descriptor arrays, ~0.5 MB in ~6 device_puts) to the
device EVERY frame — the dominant share of the measured 23.6 ms/frame host
budget (examples/bench_host.py, docs/ROUND4_NOTES.md). This module keeps
the pad ON the device with a persistent slot layout and ships only a
per-frame DELTA:

  * slots are sticky: a map point keeps its pad slot while it remains in
    the tracking local map (the covisibility local-map set of consecutive
    frames overlaps almost completely), so set churn is small;
  * changed rows are detected by diffing against a host shadow of exactly
    what the device holds — correctness never depends on catching every
    MapStore mutation site (BA merges, loop corrections and fuses write
    point arrays from many places);
  * rows are uploaded as ONE packed (rows, 8) float32 block
    [pos(3), normal(3), min_dist, max_dist] + a (rows, 8) uint32
    descriptor block + slot indices, bucketed to a few static shapes so
    the scatter kernel compiles once per bucket.

The reference has no equivalent structure — its threads share the map
pointer graph directly (SURVEY.md section 2.3); this is the TPU-native
replacement for "tracking reads the map through shared memory".
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

UPDATE_BUCKETS = (64, 512, 4096)  # static delta shapes; bigger -> full upload


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_rows(packed, desc, valid, rows, new_packed, new_desc, new_valid):
    """Scatter `rows` of the pad with new values. Dead update slots carry
    row index = pad capacity and are dropped (mode='drop')."""
    return (packed.at[rows].set(new_packed, mode="drop"),
            desc.at[rows].set(new_desc, mode="drop"),
            valid.at[rows].set(new_valid, mode="drop"))


class DeviceLocalMap:
    """Persistent device pad of the tracking local map with delta updates.

    Device state (all capacity P):
      packed (P, 8) f32: pos xyz, normal xyz, min_dist, max_dist
      desc   (P, 8) u32
      valid  (P,) bool
    Host state: slot_mp (P,) int64 map-point id per slot (-1 free), plus a
    host shadow of packed/desc for diffing.
    """

    def __init__(self, capacity: int):
        self.P = capacity
        self.slot_mp = np.full(capacity, -1, np.int64)
        self._shadow_packed = np.zeros((capacity, 8), np.float32)
        self._shadow_desc = np.zeros((capacity, 8), np.uint32)
        self._shadow_valid = np.zeros(capacity, bool)
        self.d_packed = jnp.zeros((capacity, 8), jnp.float32)
        self.d_desc = jnp.zeros((capacity, 8), jnp.uint32)
        self.d_valid = jnp.zeros(capacity, bool)
        # telemetry for the e2e bench
        self.last_rows_uploaded = 0
        self.full_uploads = 0

    # -- host-side views the tracker uses to translate match results ----

    @property
    def pos(self) -> np.ndarray:
        return self._shadow_packed[:, 0:3]

    def mp_of_slots(self, slots: np.ndarray) -> np.ndarray:
        return self.slot_mp[slots]

    # ------------------------------------------------------------------

    def refresh(self, ms, mp_ids: np.ndarray) -> None:
        """Make the device pad hold exactly `mp_ids` (<= P ids, assumed
        valid in `ms`), reusing slots of ids already present."""
        assert mp_ids.size <= self.P
        # sticky slot assignment (vectorized set ops)
        keep = (self.slot_mp >= 0) & np.isin(self.slot_mp, mp_ids)
        new_ids = np.setdiff1d(mp_ids, self.slot_mp[keep])
        free = np.nonzero(~keep)[0]
        n_new = new_ids.size
        self.slot_mp[free[:n_new]] = new_ids
        self.slot_mp[free[n_new:]] = -1
        keep[free[:n_new]] = True

        # desired pad contents (host gather — cheap numpy)
        live = np.nonzero(keep)[0]
        ids = self.slot_mp[live]
        new_packed = self._shadow_packed
        want_packed = np.zeros((self.P, 8), np.float32)
        want_desc = np.zeros((self.P, 8), np.uint32)
        want_valid = np.zeros(self.P, bool)
        if live.size:
            want_packed[live, 0:3] = ms.mp_pos[ids]
            want_packed[live, 3:6] = ms.mp_normal[ids]
            want_packed[live, 6] = ms.mp_min_dist[ids]
            want_packed[live, 7] = ms.mp_max_dist[ids]
            want_desc[live] = ms.mp_desc[ids]
            want_valid[live] = ms.mp_valid[ids]

        changed = (
            (want_valid != self._shadow_valid)
            | (want_valid & (
                (want_packed != new_packed).any(axis=1)
                | (want_desc != self._shadow_desc).any(axis=1)))
        )
        rows = np.nonzero(changed)[0]
        self.last_rows_uploaded = int(rows.size)
        if rows.size == 0:
            return
        if rows.size > UPDATE_BUCKETS[-1]:
            # rare (loop correction / GBA rewrote the map): full re-upload
            self.full_uploads += 1
            self.d_packed = jnp.asarray(want_packed)
            self.d_desc = jnp.asarray(want_desc)
            self.d_valid = jnp.asarray(want_valid)
        else:
            bucket = next(b for b in UPDATE_BUCKETS if rows.size <= b)
            rpad = np.full(bucket, self.P, np.int32)  # P = dropped
            rpad[: rows.size] = rows
            up_packed = np.zeros((bucket, 8), np.float32)
            up_desc = np.zeros((bucket, 8), np.uint32)
            up_valid = np.zeros(bucket, bool)
            up_packed[: rows.size] = want_packed[rows]
            up_desc[: rows.size] = want_desc[rows]
            up_valid[: rows.size] = want_valid[rows]
            self.d_packed, self.d_desc, self.d_valid = _scatter_rows(
                self.d_packed, self.d_desc, self.d_valid,
                jnp.asarray(rpad), jnp.asarray(up_packed),
                jnp.asarray(up_desc), jnp.asarray(up_valid))
        self._shadow_packed = want_packed
        self._shadow_desc = want_desc
        self._shadow_valid = want_valid

    def invalidate(self) -> None:
        """Force a full re-upload on the next refresh (map reset)."""
        self.slot_mp[:] = -1
        self._shadow_valid[:] = False
        self._shadow_packed[:] = 0
        self._shadow_desc[:] = 0
        self.d_packed = jnp.zeros((self.P, 8), jnp.float32)
        self.d_desc = jnp.zeros((self.P, 8), jnp.uint32)
        self.d_valid = jnp.zeros(self.P, bool)
