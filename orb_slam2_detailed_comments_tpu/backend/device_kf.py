"""Device-resident keyframe store + one-dispatch mapping kernels (round 5).

The round-5 e2e TPU measurement showed local mapping dominating the frame
budget: every fuse / triangulation call executed the matching composites
EAGERLY — ~30-50 single-op dispatches each through the axon device tunnel
(~10 ms per hop), times ~10 triangulation neighbors plus ~20 fuse targets
per keyframe, with the per-keyframe keypoint pads re-uploaded on every
call. This module is the mapping-side counterpart of
frontend/device_map.DeviceLocalMap (VERDICT r4 task 1):

  * per-keyframe keypoint arrays (xy, ur, desc, valid, octave, angle) are
    write-once at creation (state/map_store.py:172-178) and live in ONE
    device-resident (C, N, ...) buffer, scattered in at first use;
  * fuse across all targets of a keyframe is ONE jitted dispatch:
    `lax.map` over the target lanes (project + scale-window search per
    target; the (P, N) distance matrix exists one lane at a time, so
    memory stays at the single-call level);
  * triangulation search across all neighbors is likewise ONE dispatch.

Mutable per-call state (Tcw, per-keypoint has-map-point flags) is small
and uploaded fresh each call; the heavy immutable pads never leave the
device. Reference parity: same policies as ORBmatcher::Fuse
(ORBmatcher.cc:1100-1279) and SearchForTriangulation (:879-1096) — this
changes WHERE the math runs, not what it computes.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import matching as M

TARGET_BUCKETS = (4, 8, 16, 32)


def _bucket(n: int) -> int:
    for b in TARGET_BUCKETS:
        if n <= b:
            return b
    return TARGET_BUCKETS[-1]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
def _scatter_kf(xy, ur, desc, valid, octave, angle, row, n_xy, n_ur, n_desc,
                n_valid, n_octave, n_angle):
    return (xy.at[row].set(n_xy), ur.at[row].set(n_ur),
            desc.at[row].set(n_desc), valid.at[row].set(n_valid),
            octave.at[row].set(n_octave), angle.at[row].set(n_angle))


class DeviceKeyframeStore:
    """Write-once device mirror of per-keyframe keypoint arrays.

    Rows are assigned on first use (`row_of`); capacity doubles by
    allocating fresh buffers and re-scattering live rows from the host
    MapStore (rare; growth is amortized)."""

    def __init__(self, kp_cap: int, capacity: int = 128):
        self.N = kp_cap
        self.C = capacity
        self.kf_row: dict[int, int] = {}
        self._alloc(capacity)

    def _alloc(self, capacity):
        N = self.N
        self.d_xy = jnp.zeros((capacity, N, 2), jnp.float32)
        self.d_ur = jnp.zeros((capacity, N), jnp.float32)
        self.d_desc = jnp.zeros((capacity, N, 8), jnp.uint32)
        self.d_valid = jnp.zeros((capacity, N), bool)
        self.d_octave = jnp.zeros((capacity, N), jnp.int32)
        self.d_angle = jnp.zeros((capacity, N), jnp.float32)
        self.C = capacity

    def row_of(self, ms, kf: int) -> int:
        """Row index for keyframe `kf`, uploading its arrays on first use."""
        r = self.kf_row.get(kf)
        if r is not None:
            return r
        if len(self.kf_row) >= self.C:
            self._grow(ms)
        r = len(self.kf_row)
        self.kf_row[kf] = r
        self._upload(ms, kf, r)
        return r

    def _upload(self, ms, kf: int, row: int):
        (self.d_xy, self.d_ur, self.d_desc, self.d_valid, self.d_octave,
         self.d_angle) = _scatter_kf(
            self.d_xy, self.d_ur, self.d_desc, self.d_valid, self.d_octave,
            self.d_angle, row,
            jnp.asarray(ms.kf_xy[kf], jnp.float32),
            jnp.asarray(ms.kf_ur[kf], jnp.float32),
            jnp.asarray(ms.kf_desc[kf], jnp.uint32),
            jnp.asarray(ms.kf_kp_valid[kf]),
            jnp.asarray(ms.kf_octave[kf], jnp.int32),
            jnp.asarray(ms.kf_angle[kf], jnp.float32))

    def _grow(self, ms):
        old = dict(self.kf_row)
        self.kf_row.clear()
        self._alloc(2 * self.C)
        for kf in old:  # re-upload live rows (preserves row ids densely)
            if ms.kf_valid[kf]:
                self.kf_row[kf] = len(self.kf_row)
                self._upload(ms, kf, self.kf_row[kf])

    def clear(self):
        self.kf_row.clear()
        self._alloc(self.C)


# ---------------------------------------------------------------------------
# One-dispatch batched kernels. Static structure (cam, n_levels, thresholds)
# is hashable via the existing PinholeCamera/OrbConfig statics pattern.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("cam", "n_levels", "log_scale", "th",
                              "max_dist", "check_stereo"))
def fuse_targets_kernel(rows, Tcws, lane_valid,
                        store_xy, store_ur, store_desc, store_valid,
                        store_octave,
                        mp_pos, mp_valid, mp_normal, mp_min, mp_max, mp_desc,
                        scale_factors, cam, n_levels: int, log_scale: float,
                        th: float, max_dist: int, check_stereo: bool):
    """Fuse one shared point pad into T target keyframes: ONE dispatch.

    rows (T,) int32 store rows; Tcws (T,4,4); lane_valid (T,) bool.
    Returns (ok (T,P) bool, idx (T,P) int32) per-lane match results
    (reference: the per-target ORBmatcher::Fuse loop of
    LocalMapping::SearchInNeighbors, LocalMapping.cc:688-832)."""

    def one(args):
        row, Tcw, lv = args
        proj = M.project_and_cull(mp_pos, mp_valid & lv, mp_normal, mp_min,
                                  mp_max, Tcw, cam, n_levels, log_scale,
                                  view_cos_limit=0.5)
        m = M.search_by_projection(
            proj, mp_desc, store_xy[row], store_ur[row], store_desc[row],
            store_valid[row], store_octave[row], scale_factors, th=th,
            max_dist=max_dist, ratio=0.0, check_stereo=check_stereo)
        return m.ok, m.idx

    return jax.lax.map(one, (rows, Tcws, lane_valid))


@functools.partial(jax.jit, static_argnames=("check_rotation",))
def triangulation_search_kernel(row1, has_mp1, rows2, has_mp2, F12s,
                                epipoles, lane_valid,
                                store_xy, store_desc, store_valid,
                                store_octave, store_angle, sigma2,
                                check_rotation: bool = True):
    """Epipolar search of KF1 against T neighbor keyframes: ONE dispatch.

    row1: scalar store row of the new keyframe; has_mp1 (N,) bool current
    associations; rows2 (T,) neighbor rows; has_mp2 (T, N); F12s (T,3,3);
    epipoles (T,2); lane_valid (T,). Returns (ok (T,N), idx (T,N))."""
    xy1 = store_xy[row1]
    desc1 = store_desc[row1]
    valid1 = store_valid[row1]
    oct1 = store_octave[row1]
    ang1 = store_angle[row1]

    def one(args):
        row2, hm2, F12, epi, lv = args
        m = M.search_for_triangulation(
            xy1, desc1, valid1 & lv, oct1, ang1, has_mp1,
            store_xy[row2], store_desc[row2], store_valid[row2],
            store_octave[row2], store_angle[row2], hm2,
            F12, epi, sigma2, check_rotation=check_rotation)
        return m.ok, m.idx

    return jax.lax.map(one, (rows2, has_mp2, F12s, epipoles, lane_valid))


def compute_fundamental_np(Tcw1, Tcw2, K1, K2):
    """Host twin of ops.matching.compute_fundamental (3x3 math; eager jnp
    here cost ~15 device round trips per neighbor)."""
    R1, t1 = Tcw1[:3, :3], Tcw1[:3, 3]
    R2, t2 = Tcw2[:3, :3], Tcw2[:3, 3]
    R12 = R1 @ R2.T
    t12 = -R12 @ t2 + t1
    tx = np.array([
        [0.0, -t12[2], t12[1]],
        [t12[2], 0.0, -t12[0]],
        [-t12[1], t12[0], 0.0],
    ], np.float32)
    K1i = np.linalg.inv(K1)
    K2i = np.linalg.inv(K2)
    return (K1i.T @ tx @ R12 @ K2i).astype(np.float32)


def pad_lanes(n: int):
    """Bucketed lane count + a mask helper: returns (bucket, valid (b,))."""
    b = _bucket(n)
    lv = np.zeros(b, bool)
    lv[:n] = True
    return b, lv
