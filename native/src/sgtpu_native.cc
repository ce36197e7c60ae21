// sgtpu_native: host-side data-path runtime for the TPU framework.
//
// The reference's native code is CUDA compute (rasterizer, simple-knn) —
// on TPU that role is filled by Pallas/XLA. What remains native here is the
// HOST runtime around the accelerator: checkpoint parsing and voxel
// bookkeeping that would otherwise bottleneck the input pipeline at
// million-Gaussian scale. C ABI, loaded via ctypes (no pybind11 in image).
//
// Exports:
//   ply_read_f32     — binary-little-endian PLY vertex block -> dense f32
//                      matrix of selected properties (multithreaded rows)
//   voxelize_points  — floor-quantize + hash dedupe; returns voxel count,
//                      first-index representative map and point->voxel
//                      inverse map (reference fusion_utils.sparse_quantize
//                      semantics, dataset/fusion_utils.py:248-341)
//   knn3_mean_sq     — exact mean squared distance to 3 nearest neighbors
//                      via uniform-grid hashing (simple-knn equivalent for
//                      host-side inits; submodules/simple-knn/simple_knn.cu)
#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// Parse rows*stride bytes of interleaved little-endian float32 vertex data,
// gathering `n_sel` properties at byte offsets `sel_off` into out[rows][n_sel].
// Offsets/stride are computed by the Python header parser. Multithreaded.
void ply_read_f32(const uint8_t* data, int64_t rows, int64_t stride,
                  const int64_t* sel_off, int64_t n_sel, float* out,
                  int n_threads) {
  if (n_threads < 1) n_threads = 1;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      const uint8_t* row = data + r * stride;
      float* dst = out + r * n_sel;
      for (int64_t c = 0; c < n_sel; ++c) {
        std::memcpy(dst + c, row + sel_off[c], sizeof(float));
      }
    }
  };
  if (n_threads == 1 || rows < 4096) {
    worker(0, rows);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(rows, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(worker, lo, hi);
  }
  for (auto& t : ts) t.join();
}

// Pack interleaved rows for writing (inverse of ply_read_f32).
void ply_write_f32(const float* src, int64_t rows, int64_t n_sel,
                   const int64_t* sel_off, int64_t stride, uint8_t* out) {
  for (int64_t r = 0; r < rows; ++r) {
    const float* s = src + r * n_sel;
    uint8_t* row = out + r * stride;
    for (int64_t c = 0; c < n_sel; ++c) {
      std::memcpy(row + sel_off[c], s + c, sizeof(float));
    }
  }
}

static inline uint64_t hash_coord(int64_t x, int64_t y, int64_t z) {
  // FNV-ish mix of the three coordinates (the reference uses FNV-64 on the
  // raw bytes; any injective-enough mix works for the dedupe map).
  uint64_t h = 14695981039346656037ull;
  const uint64_t p = 1099511628211ull;
  h = (h ^ (uint64_t)(x + (1 << 20))) * p;
  h = (h ^ (uint64_t)(y + (1 << 20))) * p;
  h = (h ^ (uint64_t)(z + (1 << 20))) * p;
  return h;
}

// Floor-quantize points by voxel_size, dedupe, shift coords to min 0.
// out_coords: [n] int32 x3 (only first n_voxels rows valid)
// first_idx:  [n] int64   (representative point per voxel)
// inverse:    [n] int64   (point -> voxel row)
// Returns n_voxels.
int64_t voxelize_points(const double* pts, int64_t n, double voxel_size,
                        int32_t* out_coords, int64_t* first_idx,
                        int64_t* inverse) {
  std::vector<int64_t> vx(n * 3);
  int64_t mn[3] = {INT64_MAX, INT64_MAX, INT64_MAX};
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      int64_t v = (int64_t)std::floor(pts[i * 3 + d] / voxel_size);
      vx[i * 3 + d] = v;
      mn[d] = std::min(mn[d], v);
    }
  }
  std::unordered_map<uint64_t, int64_t> map;
  map.reserve((size_t)n * 2);
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t x = vx[i * 3] - mn[0], y = vx[i * 3 + 1] - mn[1],
            z = vx[i * 3 + 2] - mn[2];
    uint64_t h = hash_coord(x, y, z);
    auto it = map.find(h);
    if (it == map.end()) {
      map.emplace(h, count);
      out_coords[count * 3] = (int32_t)x;
      out_coords[count * 3 + 1] = (int32_t)y;
      out_coords[count * 3 + 2] = (int32_t)z;
      first_idx[count] = i;
      inverse[i] = count;
      ++count;
    } else {
      inverse[i] = it->second;
    }
  }
  return count;
}

// Exact mean squared distance to the 3 nearest neighbors, uniform-grid hash.
void knn3_mean_sq(const float* pts, int64_t n, float* out, int n_threads) {
  if (n == 0) return;
  // cell size: heuristic from bounding box so ~2 points/cell
  float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      mn[d] = std::min(mn[d], pts[i * 3 + d]);
      mx[d] = std::max(mx[d], pts[i * 3 + d]);
    }
  double vol = 1.0;
  for (int d = 0; d < 3; ++d) vol *= std::max(1e-6f, mx[d] - mn[d]);
  double cell = std::cbrt(vol / std::max<int64_t>(n, 1) * 2.0);
  if (!(cell > 0)) cell = 1.0;

  auto cell_of = [&](const float* p, int64_t* c) {
    for (int d = 0; d < 3; ++d)
      c[d] = (int64_t)std::floor((p[d] - mn[d]) / cell);
  };
  std::unordered_map<uint64_t, std::vector<int32_t>> grid;
  grid.reserve((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    int64_t c[3];
    cell_of(pts + i * 3, c);
    grid[hash_coord(c[0], c[1], c[2])].push_back((int32_t)i);
  }

  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const float* p = pts + i * 3;
      int64_t c[3];
      cell_of(p, c);
      float best[3] = {1e30f, 1e30f, 1e30f};
      // expand rings until the 3rd-best is closer than the unsearched ring
      for (int ring = 0;; ++ring) {
        bool any = false;
        for (int64_t dx = -ring; dx <= ring; ++dx)
          for (int64_t dy = -ring; dy <= ring; ++dy)
            for (int64_t dz = -ring; dz <= ring; ++dz) {
              if (std::max({std::abs(dx), std::abs(dy), std::abs(dz)}) != ring)
                continue;  // shell only
              auto it = grid.find(
                  hash_coord(c[0] + dx, c[1] + dy, c[2] + dz));
              if (it == grid.end()) continue;
              any = true;
              for (int32_t j : it->second) {
                if ((int64_t)j == i) continue;
                const float* q = pts + (int64_t)j * 3;
                float d2 = 0;
                for (int d = 0; d < 3; ++d) {
                  float t = p[d] - q[d];
                  d2 += t * t;
                }
                if (d2 < best[2]) {
                  best[2] = d2;
                  if (best[2] < best[1]) std::swap(best[1], best[2]);
                  if (best[1] < best[0]) std::swap(best[0], best[1]);
                }
              }
            }
        float ring_dist = (float)(ring * cell);
        if (best[2] < ring_dist * ring_dist || (ring > 2 && !any && best[2] < 1e29f))
          break;
        if (ring > 1024) break;  // degenerate safety
      }
      out[i] = (best[0] + best[1] + best[2]) / 3.0f;
    }
  };
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> ts;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(worker, lo, hi);
  }
  for (auto& t : ts) t.join();
}

}  // extern "C"
