// Native SPC topology builder.
//
// TPU-native counterpart of the host-side role of kaolin's SPC CUDA constructors
// (unbatched_points_to_octree / scan_octrees / generate_points — SURVEY.md §2.2): octree
// *construction* runs on the host at pruning cadence, so the hot host path is morton
// encoding + sort + unique over up to 10^8 surface samples (OctreeAS.from_mesh samples 100M
// points in the reference, conversions.py:91-109). This C++ implementation replaces the
// numpy path (~6x faster on large clouds); exposed through a plain C ABI consumed via
// ctypes (no pybind11 in this environment) with a pure-numpy fallback kept for portability.
//
// Build: wisp_tpu/csrc/build.sh  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint64_t part1by2(uint64_t v) {
  v &= 0x1FFFFF;
  v = (v | (v << 32)) & 0x1F00000000FFFFull;
  v = (v | (v << 16)) & 0x1F0000FF0000FFull;
  v = (v | (v << 8)) & 0x100F00F00F00F00Full;
  v = (v | (v << 4)) & 0x10C30C30C30C30C3ull;
  v = (v | (v << 2)) & 0x1249249249249249ull;
  return v;
}

inline uint64_t compact1by2(uint64_t v) {
  v &= 0x1249249249249249ull;
  v = (v ^ (v >> 2)) & 0x10C30C30C30C30C3ull;
  v = (v ^ (v >> 4)) & 0x100F00F00F00F00Full;
  v = (v ^ (v >> 8)) & 0x1F0000FF0000FFull;
  v = (v ^ (v >> 16)) & 0x1F00000000FFFFull;
  v = (v ^ (v >> 32)) & 0x1FFFFF;
  return v;
}

}  // namespace

extern "C" {

// points [n*3] int32 -> codes [n] uint64
void morton_encode(const int32_t* points, int64_t n, uint64_t* codes) {
  for (int64_t i = 0; i < n; ++i) {
    codes[i] = part1by2((uint64_t)points[3 * i]) |
               (part1by2((uint64_t)points[3 * i + 1]) << 1) |
               (part1by2((uint64_t)points[3 * i + 2]) << 2);
  }
}

// codes [n] uint64 -> points [n*3] int32
void morton_decode(const uint64_t* codes, int64_t n, int32_t* points) {
  for (int64_t i = 0; i < n; ++i) {
    points[3 * i] = (int32_t)compact1by2(codes[i]);
    points[3 * i + 1] = (int32_t)compact1by2(codes[i] >> 1);
    points[3 * i + 2] = (int32_t)compact1by2(codes[i] >> 2);
  }
}

// In-place sort + unique. Returns the unique count.
int64_t sort_unique(uint64_t* codes, int64_t n) {
  std::sort(codes, codes + n);
  uint64_t* end = std::unique(codes, codes + n);
  return (int64_t)(end - codes);
}

// Quantize float [-1,1] points to integer grid at level, then return unique sorted morton
// codes. coords [n*3] float32; out_codes must hold n entries. Returns unique count.
int64_t quantize_and_unique(const float* coords, int64_t n, int32_t level,
                            uint64_t* out_codes) {
  const int32_t res = 1 << level;
  for (int64_t i = 0; i < n; ++i) {
    auto q = [&](float x) {
      int32_t v = (int32_t)std::max(
          0.0f, std::min((float)(res - 1), (x + 1.0f) * 0.5f * (float)res));
      return (uint64_t)v;
    };
    out_codes[i] = part1by2(q(coords[3 * i])) |
                   (part1by2(q(coords[3 * i + 1])) << 1) |
                   (part1by2(q(coords[3 * i + 2])) << 2);
  }
  return sort_unique(out_codes, n);
}

// Parent level table from child codes: unique(codes >> 3). Returns parent count.
int64_t parent_level(const uint64_t* child, int64_t n, uint64_t* parent) {
  for (int64_t i = 0; i < n; ++i) parent[i] = child[i] >> 3;
  return sort_unique(parent, n);
}

// Fill a row-major occupancy bitfield at `level` from sorted leaf morton codes.
// occ must be zeroed, size 8^level bytes (bool).
void fill_occupancy(const uint64_t* codes, int64_t n, int32_t level, uint8_t* occ) {
  const int64_t res = 1ll << level;
  for (int64_t i = 0; i < n; ++i) {
    int64_t x = (int64_t)compact1by2(codes[i]);
    int64_t y = (int64_t)compact1by2(codes[i] >> 1);
    int64_t z = (int64_t)compact1by2(codes[i] >> 2);
    occ[(x * res + y) * res + z] = 1;
  }
}

// 26-neighborhood dilation of occupied cells (reference ops/spc/processing.py:13-46).
// in_codes sorted unique; out_codes must hold 27*n entries. Returns unique count.
int64_t dilate(const uint64_t* in_codes, int64_t n, int32_t level, uint64_t* out_codes) {
  const int64_t res = 1ll << level;
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t x = (int64_t)compact1by2(in_codes[i]);
    int64_t y = (int64_t)compact1by2(in_codes[i] >> 1);
    int64_t z = (int64_t)compact1by2(in_codes[i] >> 2);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          int64_t nx = std::max((int64_t)0, std::min(res - 1, x + dx));
          int64_t ny = std::max((int64_t)0, std::min(res - 1, y + dy));
          int64_t nz = std::max((int64_t)0, std::min(res - 1, z + dz));
          out_codes[m++] = part1by2((uint64_t)nx) |
                           (part1by2((uint64_t)ny) << 1) |
                           (part1by2((uint64_t)nz) << 2);
        }
  }
  return sort_unique(out_codes, m);
}

}  // extern "C"
