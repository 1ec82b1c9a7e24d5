// Native binned-SAH BVH builder with threaded (skip-link) flattening.
//
// Drop-in accelerator for scene/bvh.py::build_bvh (same output arrays, same
// layout contract — see that module's docstring): nodes in DFS preorder,
// inner node i has left child i+1 and `first[i]` = right child index,
// `skip[i]` = node after the subtree (-1 terminates); leaves hold
// (first = triangle offset, count <= max_leaf) into the reordered triangle
// permutation. The reference builds its acceleration structures with OptiX
// (GAS builds, not in the snapshot); on TPU the builder is host-side code,
// so it belongs in native C++ exactly like the reference's native runtime.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kBins = 16;

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct AABB {
  Vec3 lo{std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity()};
  Vec3 hi{-std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity()};
  void grow(const AABB& o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void grow(const Vec3& p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }
};

struct Builder {
  const float* v0;
  const float* v1;
  const float* v2;
  int max_leaf;
  std::vector<AABB> tri_box;
  std::vector<Vec3> centroid;
  std::vector<int32_t> order;

  // output (preorder)
  std::vector<float> bounds_min;
  std::vector<float> bounds_max;
  std::vector<int32_t> first;
  std::vector<int32_t> count;
  std::vector<int32_t> skip;

  AABB range_box(int lo, int hi) {
    AABB b;
    for (int i = lo; i < hi; ++i) b.grow(tri_box[order[i]]);
    return b;
  }

  // returns node index; `skip_to` = node to visit when subtree is skipped
  int emit(int lo, int hi, const AABB& box, int32_t /*unused*/) {
    int node = static_cast<int>(first.size());
    bounds_min.insert(bounds_min.end(), {box.lo.x, box.lo.y, box.lo.z});
    bounds_max.insert(bounds_max.end(), {box.hi.x, box.hi.y, box.hi.z});
    first.push_back(0);
    count.push_back(0);
    skip.push_back(-2);  // patched by caller

    int n = hi - lo;
    if (n <= max_leaf) {
      first[node] = lo;
      count[node] = n;
      return node;
    }

    // centroid bounds
    AABB cb;
    for (int i = lo; i < hi; ++i) cb.grow(centroid[order[i]]);
    float ext[3] = {cb.hi.x - cb.lo.x, cb.hi.y - cb.lo.y, cb.hi.z - cb.lo.z};
    int axis = 0;
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;

    int mid = lo + n / 2;
    if (ext[axis] > 1e-12f) {
      // binned SAH
      float scale = kBins / ext[axis];
      float cmin = axis == 0 ? cb.lo.x : (axis == 1 ? cb.lo.y : cb.lo.z);
      AABB bin_box[kBins];
      int bin_cnt[kBins] = {0};
      auto bin_of = [&](int tri) {
        float c = axis == 0 ? centroid[tri].x
                            : (axis == 1 ? centroid[tri].y : centroid[tri].z);
        int b = static_cast<int>((c - cmin) * scale);
        return std::min(std::max(b, 0), kBins - 1);
      };
      for (int i = lo; i < hi; ++i) {
        int b = bin_of(order[i]);
        bin_box[b].grow(tri_box[order[i]]);
        bin_cnt[b]++;
      }
      float l_area[kBins], r_area[kBins];
      int l_cnt[kBins], r_cnt[kBins];
      AABB acc;
      int cnt = 0;
      for (int b = 0; b < kBins; ++b) {
        if (bin_cnt[b]) acc.grow(bin_box[b]);
        cnt += bin_cnt[b];
        l_area[b] = cnt ? acc.area() : 0.f;
        l_cnt[b] = cnt;
      }
      acc = AABB();
      cnt = 0;
      for (int b = kBins - 1; b >= 0; --b) {
        if (bin_cnt[b]) acc.grow(bin_box[b]);
        cnt += bin_cnt[b];
        r_area[b] = cnt ? acc.area() : 0.f;
        r_cnt[b] = cnt;
      }
      float best_cost = std::numeric_limits<float>::infinity();
      int best_bin = -1;
      for (int b = 0; b < kBins - 1; ++b) {
        if (l_cnt[b] == 0 || r_cnt[b + 1] == 0) continue;
        float cost = l_area[b] * l_cnt[b] + r_area[b + 1] * r_cnt[b + 1];
        if (cost < best_cost) {
          best_cost = cost;
          best_bin = b;
        }
      }
      if (best_bin >= 0) {
        auto it = std::partition(order.begin() + lo, order.begin() + hi,
                                 [&](int tri) { return bin_of(tri) <= best_bin; });
        mid = static_cast<int>(it - order.begin());
      }
    }
    if (mid == lo || mid == hi) {
      mid = lo + n / 2;
      std::nth_element(order.begin() + lo, order.begin() + mid,
                       order.begin() + hi, [&](int a, int b) {
                         float ca = axis == 0 ? centroid[a].x
                                              : (axis == 1 ? centroid[a].y : centroid[a].z);
                         float cb2 = axis == 0 ? centroid[b].x
                                               : (axis == 1 ? centroid[b].y : centroid[b].z);
                         return ca < cb2;
                       });
    }

    AABB lbox = range_box(lo, mid);
    AABB rbox = range_box(mid, hi);
    int left = emit(lo, mid, lbox, -2);
    (void)left;
    int right_idx = static_cast<int>(first.size());
    first[node] = right_idx;
    // left subtree exit spine -> right child
    for (int j = node + 1; j < right_idx; ++j)
      if (skip[j] == -2) skip[j] = right_idx;
    emit(mid, hi, rbox, -2);
    return node;
  }
};

}  // namespace

extern "C" {

// Returns number of nodes. Caller provides output buffers sized via
// bvh_build_query (worst case 2*ceil(T/1)? we use 2*T which is an upper
// bound for max_leaf >= 1).
int32_t bvh_build(const float* v0, const float* v1, const float* v2,
                  int32_t num_tris, int32_t max_leaf,
                  float* out_bounds_min, float* out_bounds_max,
                  int32_t* out_first, int32_t* out_count, int32_t* out_skip,
                  int32_t* out_tri_order) {
  if (num_tris <= 0) return 0;
  Builder b;
  b.v0 = v0;
  b.v1 = v1;
  b.v2 = v2;
  b.max_leaf = std::max<int>(max_leaf, 1);
  b.tri_box.resize(num_tris);
  b.centroid.resize(num_tris);
  b.order.resize(num_tris);
  for (int i = 0; i < num_tris; ++i) {
    Vec3 a{v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]};
    Vec3 c{v1[3 * i], v1[3 * i + 1], v1[3 * i + 2]};
    Vec3 d{v2[3 * i], v2[3 * i + 1], v2[3 * i + 2]};
    AABB box;
    box.grow(a);
    box.grow(c);
    box.grow(d);
    b.tri_box[i] = box;
    b.centroid[i] = {(box.lo.x + box.hi.x) * .5f, (box.lo.y + box.hi.y) * .5f,
                     (box.lo.z + box.hi.z) * .5f};
    b.order[i] = i;
  }
  AABB root = b.range_box(0, num_tris);
  b.emit(0, num_tris, root, -2);
  // root spine exits to -1
  for (auto& s : b.skip)
    if (s == -2) s = -1;

  int32_t m = static_cast<int32_t>(b.first.size());
  std::memcpy(out_bounds_min, b.bounds_min.data(), sizeof(float) * 3 * m);
  std::memcpy(out_bounds_max, b.bounds_max.data(), sizeof(float) * 3 * m);
  std::memcpy(out_first, b.first.data(), sizeof(int32_t) * m);
  std::memcpy(out_count, b.count.data(), sizeof(int32_t) * m);
  std::memcpy(out_skip, b.skip.data(), sizeof(int32_t) * m);
  std::memcpy(out_tri_order, b.order.data(), sizeof(int32_t) * num_tris);
  return m;
}
}
