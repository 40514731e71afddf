// diffreg_native — host-side data-pipeline kernels (C ABI, loaded via ctypes).
//
// TPU-native replacement for the reference's cpp_wrappers
// (Diff-Reg-3dmatch/cpp_wrappers: voxel-barycenter grid subsampling and
// nanoflann radius neighbors). Same contracts, new implementation:
//
//   * grid_subsample: single-pass open-addressing hash over voxel keys,
//     barycenter accumulation; output ordered by first appearance.
//   * radius_search_knn: uniform-grid spatial hash with cell = radius; each
//     query scans its 27-cell neighborhood, keeps the K nearest within the
//     radius (sorted ascending), pads with the sentinel index n_support —
//     exactly the shadow-point convention the device gathers expect.
//
// Built with: g++ -O3 -march=native -shared -fPIC (see native/build.sh).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

struct HashMap {
  // open addressing, linear probing; key = 64-bit voxel id, val = slot index
  std::vector<uint64_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;

  explicit HashMap(size_t expected) {
    size_t cap = 16;
    while (cap < expected * 2) cap <<= 1;
    keys.assign(cap, UINT64_MAX);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  // returns slot for key; inserts with `next_val` if absent (and reports it)
  int32_t get_or_insert(uint64_t key, int32_t next_val, bool* inserted) {
    uint64_t h = key * 0x9E3779B97F4A7C15ull;
    size_t i = h & mask;
    for (;;) {
      if (keys[i] == key) { *inserted = false; return vals[i]; }
      if (keys[i] == UINT64_MAX) {
        keys[i] = key; vals[i] = next_val; *inserted = true; return next_val;
      }
      i = (i + 1) & mask;
    }
  }
  int32_t find(uint64_t key) const {
    uint64_t h = key * 0x9E3779B97F4A7C15ull;
    size_t i = h & mask;
    for (;;) {
      if (keys[i] == key) return vals[i];
      if (keys[i] == UINT64_MAX) return -1;
      i = (i + 1) & mask;
    }
  }
};

inline uint64_t voxel_key(int64_t x, int64_t y, int64_t z) {
  // pack 3x21-bit signed coords (after offset) into 64 bits
  const uint64_t B = 1ull << 20;
  return (((uint64_t)(x + B)) << 42) | (((uint64_t)(y + B)) << 21) | ((uint64_t)(z + B));
}

}  // namespace

extern "C" {

// Voxel-barycenter subsampling.
// points: [n, 3] float32; out_points: capacity >= n rows; returns count.
int32_t grid_subsample(const float* points, int32_t n, float voxel,
                       float* out_points) {
  if (n <= 0) return 0;
  float ox = points[0], oy = points[1], oz = points[2];
  for (int32_t i = 1; i < n; ++i) {
    ox = std::min(ox, points[3 * i + 0]);
    oy = std::min(oy, points[3 * i + 1]);
    oz = std::min(oz, points[3 * i + 2]);
  }
  HashMap map((size_t)n);
  std::vector<double> acc;   // x, y, z, count per voxel
  acc.reserve(4 * (size_t)n);
  int32_t count = 0;
  const float inv = 1.0f / voxel;
  for (int32_t i = 0; i < n; ++i) {
    float px = points[3 * i], py = points[3 * i + 1], pz = points[3 * i + 2];
    int64_t vx = (int64_t)std::floor((px - ox) * inv);
    int64_t vy = (int64_t)std::floor((py - oy) * inv);
    int64_t vz = (int64_t)std::floor((pz - oz) * inv);
    bool inserted;
    int32_t slot = map.get_or_insert(voxel_key(vx, vy, vz), count, &inserted);
    if (inserted) {
      acc.insert(acc.end(), {0.0, 0.0, 0.0, 0.0});
      ++count;
    }
    acc[4 * slot + 0] += px;
    acc[4 * slot + 1] += py;
    acc[4 * slot + 2] += pz;
    acc[4 * slot + 3] += 1.0;
  }
  for (int32_t s = 0; s < count; ++s) {
    double c = acc[4 * s + 3];
    out_points[3 * s + 0] = (float)(acc[4 * s + 0] / c);
    out_points[3 * s + 1] = (float)(acc[4 * s + 1] / c);
    out_points[3 * s + 2] = (float)(acc[4 * s + 2] / c);
  }
  return count;
}

// Fixed-K radius search, distance-sorted, sentinel-padded with n_support.
// queries [nq,3], supports [ns,3] float32; out_idx [nq,k] int32.
void radius_search_knn(const float* queries, int32_t nq,
                       const float* supports, int32_t ns,
                       float radius, int32_t k, int32_t* out_idx) {
  if (nq <= 0) return;
  if (ns <= 0) {
    for (int64_t i = 0; i < (int64_t)nq * k; ++i) out_idx[i] = 0;
    for (int32_t q = 0; q < nq; ++q)
      for (int32_t j = 0; j < k; ++j) out_idx[(int64_t)q * k + j] = ns;
    return;
  }
  float ox = supports[0], oy = supports[1], oz = supports[2];
  for (int32_t i = 1; i < ns; ++i) {
    ox = std::min(ox, supports[3 * i + 0]);
    oy = std::min(oy, supports[3 * i + 1]);
    oz = std::min(oz, supports[3 * i + 2]);
  }
  const float inv = 1.0f / radius;
  const float r2 = radius * radius;

  // bucket supports by cell (counting sort into CSR layout)
  HashMap map((size_t)ns);
  std::vector<int32_t> cell_of(ns);
  int32_t n_cells = 0;
  for (int32_t i = 0; i < ns; ++i) {
    int64_t vx = (int64_t)std::floor((supports[3 * i] - ox) * inv);
    int64_t vy = (int64_t)std::floor((supports[3 * i + 1] - oy) * inv);
    int64_t vz = (int64_t)std::floor((supports[3 * i + 2] - oz) * inv);
    bool ins;
    cell_of[i] = map.get_or_insert(voxel_key(vx, vy, vz), n_cells, &ins);
    if (ins) ++n_cells;
  }
  std::vector<int32_t> starts(n_cells + 1, 0);
  for (int32_t i = 0; i < ns; ++i) starts[cell_of[i] + 1]++;
  for (int32_t c = 0; c < n_cells; ++c) starts[c + 1] += starts[c];
  std::vector<int32_t> order(ns);
  {
    std::vector<int32_t> cursor(starts.begin(), starts.end() - 1);
    for (int32_t i = 0; i < ns; ++i) order[cursor[cell_of[i]]++] = i;
  }

  std::vector<std::pair<float, int32_t>> cand;
  for (int32_t q = 0; q < nq; ++q) {
    float qx = queries[3 * q], qy = queries[3 * q + 1], qz = queries[3 * q + 2];
    int64_t cx = (int64_t)std::floor((qx - ox) * inv);
    int64_t cy = (int64_t)std::floor((qy - oy) * inv);
    int64_t cz = (int64_t)std::floor((qz - oz) * inv);
    cand.clear();
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dz = -1; dz <= 1; ++dz) {
          int32_t cell = map.find(voxel_key(cx + dx, cy + dy, cz + dz));
          if (cell < 0) continue;
          for (int32_t s = starts[cell]; s < starts[cell + 1]; ++s) {
            int32_t i = order[s];
            float ddx = supports[3 * i] - qx;
            float ddy = supports[3 * i + 1] - qy;
            float ddz = supports[3 * i + 2] - qz;
            float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 <= r2) cand.emplace_back(d2, i);
          }
        }
    int32_t keep = std::min<int32_t>((int32_t)cand.size(), k);
    std::partial_sort(cand.begin(), cand.begin() + keep, cand.end());
    int64_t base = (int64_t)q * k;
    for (int32_t j = 0; j < keep; ++j) out_idx[base + j] = cand[j].second;
    for (int32_t j = keep; j < k; ++j) out_idx[base + j] = ns;
  }
}

}  // extern "C"
