// Host-side native kernels for the data-loading path.
//
// The reference vendors MinkowskiEngine's C++ coordinate engine for host
// voxelization (src/quantization.cpp, robin_hood hashing) and calls it from
// 16 dataloader worker processes (testset.py:186-193). This library is the
// TPU build's equivalent: an open-addressing voxel hash used by the host
// data pipeline to quantize clouds, find per-voxel representative points,
// and pre-bucket clouds before device transfer. Called through ctypes; all
// functions release the GIL by construction (pure C ABI, no Python).
//
// Build: see roreg_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

// 64-bit mix (splitmix64 finalizer) — good avalanche for packed coords.
inline uint64_t mix(uint64_t x) {
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

inline uint64_t pack(int32_t x, int32_t y, int32_t z) {
  // 21 bits per axis, offset to non-negative
  const uint64_t off = 1u << 20;
  return ((uint64_t)(x + off) << 42) | ((uint64_t)(y + off) << 21) |
         (uint64_t)(z + off);
}

struct HashMap {
  std::vector<uint64_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;
  static constexpr uint64_t EMPTY = ~0ull;

  explicit HashMap(int64_t expected) {
    uint64_t cap = 16;
    while (cap < (uint64_t)(expected * 2)) cap <<= 1;
    keys.assign(cap, EMPTY);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  // insert key if absent; returns (slot value, inserted?)
  int32_t get_or_insert(uint64_t key, int32_t next_id, bool* inserted) {
    uint64_t h = mix(key) & mask;
    for (;;) {
      if (keys[h] == EMPTY) {
        keys[h] = key;
        vals[h] = next_id;
        *inserted = true;
        return next_id;
      }
      if (keys[h] == key) {
        *inserted = false;
        return vals[h];
      }
      h = (h + 1) & mask;
    }
  }

  int32_t find(uint64_t key) const {
    uint64_t h = mix(key) & mask;
    for (;;) {
      if (keys[h] == EMPTY) return -1;
      if (keys[h] == key) return vals[h];
      h = (h + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

// Voxelize n points at voxel_size. Outputs (caller-allocated):
//   to_voxel   (n)        voxel id per point (order of first appearance)
//   rep_index  (n)        first point index per voxel (valid for [0, n_vox))
//   vox_coords (n * 3)    int voxel coords per voxel   (valid for [0, n_vox))
// Returns the number of unique voxels (n_vox).
int64_t voxelize_hash(const float* pts, int64_t n, float voxel_size,
                      int32_t* to_voxel, int32_t* rep_index,
                      int32_t* vox_coords) {
  HashMap map(n);
  int32_t next = 0;
  const float inv = 1.0f / voxel_size;
  for (int64_t i = 0; i < n; ++i) {
    int32_t cx = (int32_t)std::floor(pts[i * 3 + 0] * inv);
    int32_t cy = (int32_t)std::floor(pts[i * 3 + 1] * inv);
    int32_t cz = (int32_t)std::floor(pts[i * 3 + 2] * inv);
    bool inserted = false;
    int32_t id = map.get_or_insert(pack(cx, cy, cz), next, &inserted);
    if (inserted) {
      rep_index[id] = (int32_t)i;
      vox_coords[id * 3 + 0] = cx;
      vox_coords[id * 3 + 1] = cy;
      vox_coords[id * 3 + 2] = cz;
      ++next;
    }
    to_voxel[i] = id;
  }
  return next;
}

// Radius-limited nearest neighbor from each query to the voxelized cloud:
// for each query point, search the 27 neighboring voxels of its cell and
// return the index (into rep/original points) of the nearest point found
// within radius, else -1. Used for keypoint->voxel association on host.
void voxel_nn(const float* pts, const int32_t* to_voxel, int64_t n,
              const int32_t* vox_coords, int64_t n_vox, float voxel_size,
              const float* queries, int64_t nq, float radius,
              int32_t* out_index) {
  // rebuild the map voxel->first point list head (chained via next array)
  HashMap map(n_vox);
  std::vector<int32_t> head(n_vox, -1);
  std::vector<int32_t> nxt(n, -1);
  int32_t next_id = 0;
  for (int64_t v = 0; v < n_vox; ++v) {
    bool ins;
    map.get_or_insert(
        pack(vox_coords[v * 3], vox_coords[v * 3 + 1], vox_coords[v * 3 + 2]),
        next_id, &ins);
    if (ins) ++next_id;
  }
  for (int64_t i = n - 1; i >= 0; --i) {  // reverse so heads get low indices
    int32_t v = to_voxel[i];
    nxt[i] = head[v];
    head[v] = (int32_t)i;
  }
  const float inv = 1.0f / voxel_size;
  const float r2 = radius * radius;
  for (int64_t q = 0; q < nq; ++q) {
    float qx = queries[q * 3], qy = queries[q * 3 + 1], qz = queries[q * 3 + 2];
    int32_t cx = (int32_t)std::floor(qx * inv);
    int32_t cy = (int32_t)std::floor(qy * inv);
    int32_t cz = (int32_t)std::floor(qz * inv);
    float best = r2;
    int32_t best_i = -1;
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          int32_t v = map.find(pack(cx + dx, cy + dy, cz + dz));
          if (v < 0) continue;
          for (int32_t i = head[v]; i >= 0; i = nxt[i]) {
            float ddx = pts[i * 3] - qx;
            float ddy = pts[i * 3 + 1] - qy;
            float ddz = pts[i * 3 + 2] - qz;
            float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 < best) {
              best = d2;
              best_i = i;
            }
          }
        }
    out_index[q] = best_i;
  }
}

// Mutual-nearest gt pairing on host (the RM trainset's pairmatch kernel,
// reference train/trainset/RM.py:131-152) — O(n0*n1) with blocking.
int64_t mutual_pairs(const float* k0t, int64_t n0, const float* k1, int64_t n1,
                     float thre, int32_t* out_pairs /* capacity n0*2 */) {
  std::vector<int32_t> a01(n0), a10(n1);
  std::vector<float> d01(n0);
  for (int64_t i = 0; i < n0; ++i) {
    float best = 1e30f;
    int32_t bj = 0;
    for (int64_t j = 0; j < n1; ++j) {
      float dx = k0t[i * 3] - k1[j * 3];
      float dy = k0t[i * 3 + 1] - k1[j * 3 + 1];
      float dz = k0t[i * 3 + 2] - k1[j * 3 + 2];
      float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < best) {
        best = d2;
        bj = (int32_t)j;
      }
    }
    a01[i] = bj;
    d01[i] = best;
  }
  for (int64_t j = 0; j < n1; ++j) {
    float best = 1e30f;
    int32_t bi = 0;
    for (int64_t i = 0; i < n0; ++i) {
      float dx = k0t[i * 3] - k1[j * 3];
      float dy = k0t[i * 3 + 1] - k1[j * 3 + 1];
      float dz = k0t[i * 3 + 2] - k1[j * 3 + 2];
      float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < best) {
        best = d2;
        bi = (int32_t)i;
      }
    }
    a10[j] = bi;
  }
  int64_t np = 0;
  const float t2 = thre * thre;
  for (int64_t i = 0; i < n0; ++i) {
    if (a10[a01[i]] == (int32_t)i && d01[i] < t2) {
      out_pairs[np * 2] = (int32_t)i;
      out_pairs[np * 2 + 1] = a01[i];
      ++np;
    }
  }
  return np;
}

// Snap coords to multiples of `stride` and dedupe (first appearance).
// out_coords must hold n*3. Returns unique count.
int64_t unique_snapped(const int32_t* coords, int64_t n, int32_t stride,
                       int32_t* out_coords) {
  HashMap map(n);
  int32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    int32_t cx = (coords[i * 3] / stride) * stride;
    int32_t cy = (coords[i * 3 + 1] / stride) * stride;
    int32_t cz = (coords[i * 3 + 2] / stride) * stride;
    // careful with negative coords: C++ division truncates toward zero
    if (coords[i * 3] < 0 && coords[i * 3] % stride) cx -= stride;
    if (coords[i * 3 + 1] < 0 && coords[i * 3 + 1] % stride) cy -= stride;
    if (coords[i * 3 + 2] < 0 && coords[i * 3 + 2] % stride) cz -= stride;
    bool ins;
    int32_t id = map.get_or_insert(pack(cx, cy, cz), next, &ins);
    if (ins) {
      out_coords[id * 3] = cx;
      out_coords[id * 3 + 1] = cy;
      out_coords[id * 3 + 2] = cz;
      ++next;
    }
    (void)id;
  }
  return next;
}

// Kernel map: for each dst coord and each of k offsets (scaled by step),
// the src row index or -1. The ME kernel-map equivalent
// (src/coordinate_map_manager.cpp kernel_map), host-side.
//
// Column-hash strategy: hash (x, y) -> dense z-array of rows; a K^3 region
// costs K^2 cache-resident probes + K sequential z loads per dst voxel.
// OutT is int16 when capacities fit (halves the host->device transfer of
// the tables, which rides a tunnel in this deployment) else int32.
}  // extern "C" (templates cannot carry C linkage)

template <typename OutT>
static void neighbor_table_impl(const int32_t* src_coords, int64_t n_src,
                                const int32_t* dst_coords, int64_t n_dst,
                                const int32_t* offsets, int64_t k,
                                int32_t step, OutT* out) {
  if (n_src == 0 || n_dst == 0) {
    for (int64_t i = 0; i < n_dst * k; ++i) out[i] = (OutT)-1;
    return;
  }
  // Column structure: hash (x, y) -> column with a dense z-array of rows.
  // A K^3 hypercube region then needs only K^2 hash probes per dst voxel
  // plus K direct z loads each — the hash stays cache-resident and the
  // z loads are sequential.
  const uint64_t OFF = 1u << 20;
  auto packxy = [OFF](int32_t x, int32_t y) {
    return ((uint64_t)(x + OFF) << 21) | (uint64_t)(y + OFF);
  };

  HashMap cols(n_src);
  int32_t ncols = 0;
  std::vector<int32_t> col_of(n_src);
  for (int64_t i = 0; i < n_src; ++i) {
    bool ins;
    col_of[i] =
        cols.get_or_insert(packxy(src_coords[i * 3], src_coords[i * 3 + 1]),
                           ncols, &ins);
    if (ins) ++ncols;
  }
  std::vector<int32_t> zmin(ncols, INT32_MAX), zmax(ncols, INT32_MIN);
  for (int64_t i = 0; i < n_src; ++i) {
    int32_t z = src_coords[i * 3 + 2];
    int32_t c = col_of[i];
    if (z < zmin[c]) zmin[c] = z;
    if (z > zmax[c]) zmax[c] = z;
  }
  std::vector<int64_t> col_off(ncols + 1, 0);
  for (int32_t c = 0; c < ncols; ++c)
    col_off[c + 1] = col_off[c] + (zmax[c] - zmin[c] + 1);
  std::vector<int32_t> zrows((size_t)col_off[ncols], -1);
  for (int64_t i = 0; i < n_src; ++i) {
    int32_t c = col_of[i];
    zrows[col_off[c] + (src_coords[i * 3 + 2] - zmin[c])] = (int32_t)i;
  }

  // group offsets by (ox, oy): find each column once, then walk its oz list
  std::vector<int64_t> order(k);
  for (int64_t j = 0; j < k; ++j) order[j] = j;
  // offsets from hypercube_offsets are already (x, y)-major; rely on that
  for (int64_t d = 0; d < n_dst; ++d) {
    const int32_t cx = dst_coords[d * 3], cy = dst_coords[d * 3 + 1],
                  cz = dst_coords[d * 3 + 2];
    int64_t j = 0;
    while (j < k) {
      const int32_t ox = offsets[j * 3], oy = offsets[j * 3 + 1];
      const int32_t qv =
          cols.find(packxy(cx + ox * step, cy + oy * step));
      // consume the run of offsets sharing (ox, oy)
      do {
        int32_t r = -1;
        if (qv >= 0) {
          const int32_t zq = cz + offsets[j * 3 + 2] * step;
          if (zq >= zmin[qv] && zq <= zmax[qv])
            r = zrows[col_off[qv] + (zq - zmin[qv])];
        }
        out[d * k + j] = (OutT)r;
        ++j;
      } while (j < k && offsets[j * 3] == ox && offsets[j * 3 + 1] == oy);
    }
  }
}

// Occupancy-only kernel map: one bit per (dst voxel, offset), packed into
// uint32 words (bit j of word w = offset 32*w + j). Used for the backbone's
// first conv, whose input features are constitutively all-ones (FCGF),
// making neighbor indices redundant — 16x less wire traffic than an int16
// table for a 7^3 kernel. Rows [0, n_dst) are fully rewritten; pad rows are
// left untouched (callers mask conv output rows anyway).
static void neighbor_occupancy_impl(const int32_t* src_coords, int64_t n_src,
                                    const int32_t* dst_coords, int64_t n_dst,
                                    const int32_t* offsets, int64_t k,
                                    int32_t step, uint32_t* out) {
  const int64_t words = (k + 31) / 32;
  if (n_src == 0) {
    for (int64_t i = 0; i < n_dst * words; ++i) out[i] = 0;
    return;
  }
  const uint64_t OFF = 1u << 20;
  auto packxy = [OFF](int32_t x, int32_t y) {
    return ((uint64_t)(x + OFF) << 21) | (uint64_t)(y + OFF);
  };
  HashMap cols(n_src);
  int32_t ncols = 0;
  std::vector<int32_t> col_of(n_src);
  for (int64_t i = 0; i < n_src; ++i) {
    bool ins;
    col_of[i] = cols.get_or_insert(
        packxy(src_coords[i * 3], src_coords[i * 3 + 1]), ncols, &ins);
    if (ins) ++ncols;
  }
  std::vector<int32_t> zmin(ncols, INT32_MAX), zmax(ncols, INT32_MIN);
  for (int64_t i = 0; i < n_src; ++i) {
    int32_t z = src_coords[i * 3 + 2];
    int32_t c = col_of[i];
    if (z < zmin[c]) zmin[c] = z;
    if (z > zmax[c]) zmax[c] = z;
  }
  std::vector<int64_t> col_off(ncols + 1, 0);
  for (int32_t c = 0; c < ncols; ++c)
    col_off[c + 1] = col_off[c] + (zmax[c] - zmin[c] + 1);
  std::vector<uint8_t> zocc((size_t)col_off[ncols], 0);
  for (int64_t i = 0; i < n_src; ++i) {
    int32_t c = col_of[i];
    zocc[col_off[c] + (src_coords[i * 3 + 2] - zmin[c])] = 1;
  }

  for (int64_t d = 0; d < n_dst; ++d) {
    const int32_t cx = dst_coords[d * 3], cy = dst_coords[d * 3 + 1],
                  cz = dst_coords[d * 3 + 2];
    uint32_t* row = out + d * words;
    for (int64_t w = 0; w < words; ++w) row[w] = 0;
    int64_t j = 0;
    while (j < k) {
      const int32_t ox = offsets[j * 3], oy = offsets[j * 3 + 1];
      const int32_t qv = cols.find(packxy(cx + ox * step, cy + oy * step));
      do {
        if (qv >= 0) {
          const int32_t zq = cz + offsets[j * 3 + 2] * step;
          if (zq >= zmin[qv] && zq <= zmax[qv] &&
              zocc[col_off[qv] + (zq - zmin[qv])])
            row[j >> 5] |= (uint32_t)1 << (j & 31);
        }
        ++j;
      } while (j < k && offsets[j * 3] == ox && offsets[j * 3 + 1] == oy);
    }
  }
}

extern "C" {

void neighbor_occupancy(const int32_t* src_coords, int64_t n_src,
                        const int32_t* dst_coords, int64_t n_dst,
                        const int32_t* offsets, int64_t k, int32_t step,
                        uint32_t* out) {
  neighbor_occupancy_impl(src_coords, n_src, dst_coords, n_dst, offsets, k,
                          step, out);
}

void neighbor_table(const int32_t* src_coords, int64_t n_src,
                    const int32_t* dst_coords, int64_t n_dst,
                    const int32_t* offsets, int64_t k, int32_t step,
                    int32_t* out) {
  neighbor_table_impl<int32_t>(src_coords, n_src, dst_coords, n_dst, offsets,
                               k, step, out);
}

void neighbor_table16(const int32_t* src_coords, int64_t n_src,
                      const int32_t* dst_coords, int64_t n_dst,
                      const int32_t* offsets, int64_t k, int32_t step,
                      int16_t* out) {
  neighbor_table_impl<int16_t>(src_coords, n_src, dst_coords, n_dst, offsets,
                               k, step, out);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Block-pyramid builder: the block-dense engine's entire host-side map
// construction for one rotation, in one GIL-free call (the numpy version in
// native/blockpyr.py costs ~43 ms/rotation and thread-scales poorly; this
// runs in a few ms and scales across the extractor's thread pool).
//
// Replaces (TPU-natively): reference MinkowskiEngine coordinate manager
// kernel-map construction (src/coordinate_map_manager.cpp:1446) at block
// granularity. Offset enumeration is row-major with dx slowest, matching
// roreg_tpu.sparse.kernel_map.hypercube_offsets(3).
// ---------------------------------------------------------------------------

#include <algorithm>

namespace {

inline uint64_t pack_block(int32_t bx, int32_t by, int32_t bz) {
  // matches blockpyr._pack_blocks: (bx<<16)|(by<<8)|bz with coords in [0,256)
  return ((uint64_t)bx << 16) | ((uint64_t)by << 8) | (uint64_t)bz;
}

struct BlockLevel {
  std::vector<uint64_t> keys;   // sorted block keys (kept, <= cap)
  std::vector<int32_t> coords;  // n*3 block coords
  HashMap map;                  // key -> row
  BlockLevel() : map(16) {}
};

// find row of block (bx,by,bz); -1 when absent or out of [0,256)
inline int32_t block_row(const BlockLevel& L, int32_t bx, int32_t by,
                         int32_t bz) {
  if ((uint32_t)bx >= 256u || (uint32_t)by >= 256u || (uint32_t)bz >= 256u)
    return -1;
  return L.map.find(pack_block(bx, by, bz));
}

}  // namespace

extern "C" {

// Build the 4-level block pyramid for one rotated cloud, plus the
// keypoint -> level-0 flat cell row association (the testset.py keypoint
// kNN done host-side: nearest per-voxel representative point, searched in
// widening voxel rings with a brute-force fallback, so it matches the
// device global argmin; -1 only when the cloud is empty).
// pts (n*3) f32; caps[num_levels]; outputs are the packed-payload views:
//   occ_l    caps[l]*2  u32 (zeroed here)
//   same_l   caps[l]*27 i16 (-1 padded)
//   down_l   caps[l+1]*27 i16   up_l caps[l]*27 i32
//   l0_coords caps[0]*3 i16, origin 3 i32
//   keys (nk*3) f32 in the SAME rotated frame -> key_rows (nk) i32
// Returns dropped block count (capacity overflow, largest keys dropped).
int64_t build_block_pyramid(
    const float* pts, int64_t n, float voxel_size, const int64_t* caps,
    int64_t num_levels,
    uint32_t* occ0, uint32_t* occ1, uint32_t* occ2, uint32_t* occ3,
    int16_t* same0, int16_t* same1, int16_t* same2, int16_t* same3,
    int16_t* down0, int16_t* down1, int16_t* down2,
    int32_t* up0, int32_t* up1, int32_t* up2,
    int16_t* l0_coords, int32_t* origin,
    const float* keys, int64_t nk, int32_t* key_rows) {
  uint32_t* occ[4] = {occ0, occ1, occ2, occ3};
  int16_t* same[4] = {same0, same1, same2, same3};
  int16_t* down[3] = {down0, down1, down2};
  int32_t* up[3] = {up0, up1, up2};

  // pad state
  for (int l = 0; l < num_levels; ++l) {
    std::memset(occ[l], 0, (size_t)caps[l] * 2 * sizeof(uint32_t));
    std::fill(same[l], same[l] + caps[l] * 27, (int16_t)-1);
  }
  for (int l = 0; l + 1 < num_levels; ++l) {
    std::fill(down[l], down[l] + caps[l + 1] * 27, (int16_t)-1);
    std::fill(up[l], up[l] + caps[l] * 27, -1);
  }
  std::memset(l0_coords, 0, (size_t)caps[0] * 3 * sizeof(int16_t));
  origin[0] = origin[1] = origin[2] = 0;
  if (nk > 0) std::fill(key_rows, key_rows + nk, -1);
  if (n == 0) return 0;

  // 1) voxelize
  std::vector<int32_t> vox_coords(n * 3), rep_index(n);
  int64_t n_vox;
  {
    std::vector<int32_t> to_voxel(n);
    n_vox = voxelize_hash(pts, n, voxel_size, to_voxel.data(),
                          rep_index.data(), vox_coords.data());
  }

  // 2) origin shift -> level-0 unit coords
  int32_t ox = vox_coords[0], oy = vox_coords[1], oz = vox_coords[2];
  for (int64_t v = 1; v < n_vox; ++v) {
    ox = std::min(ox, vox_coords[v * 3]);
    oy = std::min(oy, vox_coords[v * 3 + 1]);
    oz = std::min(oz, vox_coords[v * 3 + 2]);
  }
  origin[0] = ox; origin[1] = oy; origin[2] = oz;

  // per-level unit coords (dedup by hash)
  std::vector<std::vector<int32_t>> units(num_levels);
  units[0].resize(n_vox * 3);
  for (int64_t v = 0; v < n_vox; ++v) {
    units[0][v * 3] = vox_coords[v * 3] - ox;
    units[0][v * 3 + 1] = vox_coords[v * 3 + 1] - oy;
    units[0][v * 3 + 2] = vox_coords[v * 3 + 2] - oz;
  }
  for (int64_t l = 1; l < num_levels; ++l) {
    const auto& prev = units[l - 1];
    int64_t m = (int64_t)prev.size() / 3;
    HashMap hm(m);
    int32_t next = 0;
    auto& cur = units[l];
    cur.reserve(m * 3 / 4);
    for (int64_t i = 0; i < m; ++i) {
      int32_t x = prev[i * 3] >> 1, y = prev[i * 3 + 1] >> 1,
              z = prev[i * 3 + 2] >> 1;
      bool ins = false;
      hm.get_or_insert(pack(x, y, z), next, &ins);
      if (ins) {
        ++next;
        cur.push_back(x); cur.push_back(y); cur.push_back(z);
      }
    }
  }

  // 3) per-level blocks: unique, sorted ascending, capacity-capped
  int64_t dropped = 0;
  std::vector<BlockLevel> levels(num_levels);
  for (int64_t l = 0; l < num_levels; ++l) {
    const auto& u = units[l];
    int64_t m = (int64_t)u.size() / 3;
    // size by the unit count, NOT an occupancy guess: coarse levels can
    // have ~1 unit per block, and an over-full open-addressing table
    // never terminates lookup
    HashMap seen(m + 16);
    int32_t next = 0;
    auto& keys = levels[l].keys;
    int64_t out_of_extent = 0;
    for (int64_t i = 0; i < m; ++i) {
      int32_t bx = u[i * 3] >> 2, by = u[i * 3 + 1] >> 2, bz = u[i * 3 + 2] >> 2;
      // pack_block is 8 bits/axis: a cloud spanning >1024 level-0 voxels
      // per axis (>25.6 m at 2.5 cm) would silently alias keys — drop
      // out-of-extent units loudly instead (mirrors the capacity path)
      if ((uint32_t)bx >= 256u || (uint32_t)by >= 256u || (uint32_t)bz >= 256u) {
        ++out_of_extent;
        continue;
      }
      bool ins = false;
      seen.get_or_insert(pack_block(bx, by, bz), next, &ins);
      if (ins) { ++next; keys.push_back(pack_block(bx, by, bz)); }
    }
    if (out_of_extent > 0) {
      std::fprintf(stderr,
                   "[voxelhash] level %lld: %lld voxel units outside the "
                   "1024^3 extent dropped (cloud too large for the block "
                   "coordinate range)\n",
                   (long long)l, (long long)out_of_extent);
      dropped += out_of_extent;
    }
    std::sort(keys.begin(), keys.end());
    if ((int64_t)keys.size() > caps[l]) {
      dropped += (int64_t)keys.size() - caps[l];
      keys.resize(caps[l]);
    }
    int64_t nb = (int64_t)keys.size();
    levels[l].coords.resize(nb * 3);
    levels[l].map = HashMap(nb);
    for (int64_t b = 0; b < nb; ++b) {
      uint64_t k = keys[b];
      int32_t bx = (int32_t)((k >> 16) & 255), by = (int32_t)((k >> 8) & 255),
              bz = (int32_t)(k & 255);
      levels[l].coords[b * 3] = bx;
      levels[l].coords[b * 3 + 1] = by;
      levels[l].coords[b * 3 + 2] = bz;
      bool ins = false;
      levels[l].map.get_or_insert(k, (int32_t)b, &ins);
    }

    // occupancy bits
    for (int64_t i = 0; i < m; ++i) {
      int32_t x = u[i * 3], y = u[i * 3 + 1], z = u[i * 3 + 2];
      int32_t row = block_row(levels[l], x >> 2, y >> 2, z >> 2);
      if (row < 0) continue;
      int32_t cell = (x & 3) * 16 + (y & 3) * 4 + (z & 3);
      occ[l][row * 2 + (cell >> 5)] |= (uint32_t)1u << (cell & 31);
    }

    // same-level 27-neighbor table
    for (int64_t b = 0; b < nb; ++b) {
      int32_t bx = levels[l].coords[b * 3], by = levels[l].coords[b * 3 + 1],
              bz = levels[l].coords[b * 3 + 2];
      int16_t* row = same[l] + b * 27;
      int k27 = 0;
      for (int dx = -1; dx <= 1; ++dx)
        for (int dy = -1; dy <= 1; ++dy)
          for (int dz = -1; dz <= 1; ++dz)
            row[k27++] = (int16_t)block_row(levels[l], bx + dx, by + dy, bz + dz);
    }
  }

  // 4) down/up tables
  for (int64_t l = 0; l + 1 < num_levels; ++l) {
    int64_t nd = (int64_t)levels[l + 1].keys.size();
    for (int64_t b = 0; b < nd; ++b) {
      int32_t bx = levels[l + 1].coords[b * 3] * 2,
              by = levels[l + 1].coords[b * 3 + 1] * 2,
              bz = levels[l + 1].coords[b * 3 + 2] * 2;
      int16_t* row = down[l] + b * 27;
      int k27 = 0;
      for (int dx = -1; dx <= 1; ++dx)
        for (int dy = -1; dy <= 1; ++dy)
          for (int dz = -1; dz <= 1; ++dz)
            row[k27++] = (int16_t)block_row(levels[l], bx + dx, by + dy, bz + dz);
    }
    int64_t nf = (int64_t)levels[l].keys.size();
    for (int64_t b = 0; b < nf; ++b) {
      int32_t bx = levels[l].coords[b * 3] * 2,
              by = levels[l].coords[b * 3 + 1] * 2,
              bz = levels[l].coords[b * 3 + 2] * 2;
      int32_t* row = up[l] + b * 27;
      int k27 = 0;
      for (int di = 0; di <= 2; ++di)
        for (int dj = 0; dj <= 2; ++dj)
          for (int dk = 0; dk <= 2; ++dk) {
            int32_t wx = bx + di, wy = by + dj, wz = bz + dk;
            int32_t cr = block_row(levels[l + 1], wx >> 2, wy >> 2, wz >> 2);
            row[k27++] = cr < 0 ? -1
                : cr * 64 + (wx & 3) * 16 + (wy & 3) * 4 + (wz & 3);
          }
    }
  }

  // 5) level-0 block coords
  int64_t nb0 = (int64_t)levels[0].keys.size();
  for (int64_t b = 0; b < nb0; ++b) {
    l0_coords[b * 3] = (int16_t)levels[0].coords[b * 3];
    l0_coords[b * 3 + 1] = (int16_t)levels[0].coords[b * 3 + 1];
    l0_coords[b * 3 + 2] = (int16_t)levels[0].coords[b * 3 + 2];
  }

  // 6) keypoint -> flat level-0 cell row: nearest surviving voxel's rep
  // point (testset.py:168-171 keypoint kNN, moved host-side)
  if (nk > 0) {
    // voxel-coord hash -> voxel id (pre-origin-shift coords)
    HashMap vmap(n_vox);
    for (int64_t v = 0; v < n_vox; ++v) {
      bool ins = false;
      vmap.get_or_insert(
          pack(vox_coords[v * 3], vox_coords[v * 3 + 1], vox_coords[v * 3 + 2]),
          (int32_t)v, &ins);
    }
    auto flat_row = [&](int64_t v) -> int32_t {
      int32_t x = units[0][v * 3], y = units[0][v * 3 + 1],
              z = units[0][v * 3 + 2];
      int32_t row = block_row(levels[0], x >> 2, y >> 2, z >> 2);
      if (row < 0) return -1;
      return row * 64 + (x & 3) * 16 + (y & 3) * 4 + (z & 3);
    };
    const float inv = 1.0f / voxel_size;
    for (int64_t q = 0; q < nk; ++q) {
      float qx = keys[q * 3], qy = keys[q * 3 + 1], qz = keys[q * 3 + 2];
      int32_t cx = (int32_t)std::floor(qx * inv),
              cy = (int32_t)std::floor(qy * inv),
              cz = (int32_t)std::floor(qz * inv);
      float best = 1e30f;
      int32_t best_row = -1;
      // full 5^3 neighborhood in one pass. The ring result is only
      // accepted when best <= 2*voxel_size: any voxel OUTSIDE the ring is
      // at Chebyshev offset >= 3, so its rep point is > 2 voxels from the
      // query cell — within that bound the in-ring argmin IS the global
      // argmin; beyond it we brute-force (matches the device global kNN)
      for (int dx = -2; dx <= 2; ++dx)
        for (int dy = -2; dy <= 2; ++dy)
          for (int dz = -2; dz <= 2; ++dz) {
            int32_t v = vmap.find(pack(cx + dx, cy + dy, cz + dz));
            if (v < 0) continue;
            int32_t row = flat_row(v);
            if (row < 0) continue;
            const float* p = pts + (int64_t)rep_index[v] * 3;
            float ddx = p[0] - qx, ddy = p[1] - qy, ddz = p[2] - qz;
            float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 < best) { best = d2; best_row = row; }
          }
      const float ring_bound = 2.0f * voxel_size;
      if (best_row < 0 || best > ring_bound * ring_bound) {
        // rare (off-surface keypoint): brute-force over all voxels
        for (int64_t v = 0; v < n_vox; ++v) {
          int32_t row = flat_row(v);
          if (row < 0) continue;
          const float* p = pts + (int64_t)rep_index[v] * 3;
          float ddx = p[0] - qx, ddy = p[1] - qy, ddz = p[2] - qz;
          float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
          if (d2 < best) { best = d2; best_row = row; }
        }
      }
      key_rows[q] = best_row;
    }
  }
  return dropped;
}

}  // extern "C"
