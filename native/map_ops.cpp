// Native host-side map bookkeeping kernels.
//
// The reference implements its entire runtime in C++ (src/MapPoint.cc,
// src/KeyFrame.cc). In this framework the device math is JAX/XLA, but the
// host-side per-point bookkeeping loops (representative-descriptor
// selection, normal/depth updates, keyframe-culling redundancy counting)
// are O(points x observations) scalar code — exactly what belongs in
// native code. Exposed as a C ABI consumed via ctypes with zero-copy
// numpy buffers; Python keeps a pure-numpy fallback.
//
// Build: make -C native  (produces libmap_ops.so)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// Hamming distance between two 256-bit descriptors stored as 8x u32.
static inline int hamming256(const uint32_t* a, const uint32_t* b) {
    int d = 0;
    for (int i = 0; i < 8; ++i) d += __builtin_popcount(a[i] ^ b[i]);
    return d;
}

// For each map point: pick the descriptor with minimum median Hamming
// distance to the other observations (MapPoint::ComputeDistinctiveDescriptors,
// reference: src/MapPoint.cc:424-519).
//
// mp_ids:       [n_ids] point indices to update
// mp_obs_kf:    [MP, O] observation keyframe ids (-1 empty)
// mp_obs_idx:   [MP, O] observation feature indices
// mp_n_obs:     [MP]
// kf_desc:      [KF, N, 8] packed descriptors
// mp_desc out:  [MP, 8]
void update_point_descriptors(
    const int64_t* mp_ids, int64_t n_ids,
    const int32_t* mp_obs_kf, const int32_t* mp_obs_idx,
    const int32_t* mp_n_obs, int64_t obs_cap,
    const uint32_t* kf_desc, int64_t kf_stride_kf, int64_t kf_stride_kp,
    uint32_t* mp_desc)
{
    constexpr int MAX_OBS = 64;
    int dists[MAX_OBS][MAX_OBS];
    int med[MAX_OBS];
    const uint32_t* descs[MAX_OBS];

    for (int64_t ii = 0; ii < n_ids; ++ii) {
        const int64_t m = mp_ids[ii];
        int n = mp_n_obs[m];
        if (n <= 0) continue;
        if (n > MAX_OBS) n = MAX_OBS;
        for (int i = 0; i < n; ++i) {
            const int32_t kf = mp_obs_kf[m * obs_cap + i];
            const int32_t idx = mp_obs_idx[m * obs_cap + i];
            descs[i] = kf_desc + kf * kf_stride_kf + idx * kf_stride_kp;
        }
        if (n == 1) {
            std::memcpy(mp_desc + m * 8, descs[0], 8 * sizeof(uint32_t));
            continue;
        }
        for (int i = 0; i < n; ++i) {
            dists[i][i] = 0;
            for (int j = i + 1; j < n; ++j) {
                const int d = hamming256(descs[i], descs[j]);
                dists[i][j] = d;
                dists[j][i] = d;
            }
        }
        int best = 0, best_med = 1 << 30;
        int row[MAX_OBS];
        for (int i = 0; i < n; ++i) {
            std::memcpy(row, dists[i], n * sizeof(int));
            std::nth_element(row, row + n / 2, row + n);
            med[i] = row[n / 2];
            if (med[i] < best_med) { best_med = med[i]; best = i; }
        }
        std::memcpy(mp_desc + m * 8, descs[best], 8 * sizeof(uint32_t));
    }
}

// Mean viewing normal + scale-invariance distance band
// (MapPoint::UpdateNormalAndDepth, reference: src/MapPoint.cc:570-638).
//
// kf_Twc_centers: [KF, 3] camera centers (precomputed on the host)
// kf_octave:      [KF, N]
void update_normal_and_depth(
    const int64_t* mp_ids, int64_t n_ids,
    const int32_t* mp_obs_kf, const int32_t* mp_obs_idx,
    const int32_t* mp_n_obs, int64_t obs_cap,
    const float* mp_pos, const float* kf_centers,
    const int32_t* kf_octave, int64_t kf_oct_stride,
    const int32_t* mp_ref_kf,
    float scale_factor, int n_levels,
    float* mp_normal, float* mp_min_dist, float* mp_max_dist)
{
    for (int64_t ii = 0; ii < n_ids; ++ii) {
        const int64_t m = mp_ids[ii];
        const int n = mp_n_obs[m];
        if (n <= 0) continue;
        const float* pos = mp_pos + m * 3;
        float nx = 0, ny = 0, nz = 0;
        for (int i = 0; i < n; ++i) {
            const int32_t kf = mp_obs_kf[m * obs_cap + i];
            const float* c = kf_centers + kf * 3;
            float vx = pos[0] - c[0], vy = pos[1] - c[1], vz = pos[2] - c[2];
            const float nrm = std::sqrt(vx * vx + vy * vy + vz * vz) + 1e-9f;
            nx += vx / nrm; ny += vy / nrm; nz += vz / nrm;
        }
        const float nn = std::sqrt(nx * nx + ny * ny + nz * nz) + 1e-9f;
        mp_normal[m * 3 + 0] = nx / nn;
        mp_normal[m * 3 + 1] = ny / nn;
        mp_normal[m * 3 + 2] = nz / nn;

        int32_t ref = mp_ref_kf[m];
        int ref_slot = 0;
        for (int i = 0; i < n; ++i)
            if (mp_obs_kf[m * obs_cap + i] == ref) { ref_slot = i; break; }
        const int32_t ref_kf = mp_obs_kf[m * obs_cap + ref_slot];
        const int32_t ref_idx = mp_obs_idx[m * obs_cap + ref_slot];
        const float* c = kf_centers + ref_kf * 3;
        const float dx = pos[0] - c[0], dy = pos[1] - c[1], dz = pos[2] - c[2];
        const float dist = std::sqrt(dx * dx + dy * dy + dz * dz);
        const int level = kf_octave[ref_kf * kf_oct_stride + ref_idx];
        const float max_d = dist * std::pow(scale_factor, (float)level);
        mp_max_dist[m] = max_d;
        mp_min_dist[m] = max_d / std::pow(scale_factor, (float)(n_levels - 1));
    }
}

// Redundancy counting for keyframe culling
// (LocalMapping::KeyFrameCulling, reference: src/LocalMapping.cc:966-1082).
// For keyframe k: count points whose observation in k is matched by >= 3
// observations in OTHER keyframes at scale level <= level_k + 1.
// Returns (n_points_considered << 32) | n_redundant.
int64_t count_redundant(
    int64_t k,
    const int32_t* kf_mp, int64_t kp_cap,
    const uint8_t* mp_valid,
    const int32_t* mp_obs_kf, const int32_t* mp_obs_idx,
    const int32_t* mp_n_obs, int64_t obs_cap,
    const int32_t* kf_octave, int64_t kf_oct_stride,
    const float* kf_depth, float close_th, int use_depth)
{
    int64_t considered = 0, redundant = 0;
    for (int64_t f = 0; f < kp_cap; ++f) {
        const int32_t m = kf_mp[k * kp_cap + f];
        if (m < 0 || !mp_valid[m]) continue;
        if (use_depth) {
            const float d = kf_depth[k * kp_cap + f];
            if (!(d > 0.f && d < close_th)) continue;
        }
        ++considered;
        const int level = kf_octave[k * kf_oct_stride + f];
        int n_better = 0;
        const int n = mp_n_obs[m];
        for (int i = 0; i < n && n_better < 3; ++i) {
            const int32_t okf = mp_obs_kf[m * obs_cap + i];
            if (okf == (int32_t)k || okf < 0) continue;
            const int32_t oidx = mp_obs_idx[m * obs_cap + i];
            if (kf_octave[okf * kf_oct_stride + oidx] <= level + 1) ++n_better;
        }
        if (n_better >= 3) ++redundant;
    }
    return (considered << 32) | redundant;
}

}  // extern "C"
