// Native SAH BVH builder for radiance_tpu.
//
// Production-speed implementation of the same build contract as
// radiance_tpu/bvh/builder.py (which documents the semantics, themselves
// capability-matching the reference's recursive SAH builder,
// /root/reference/radiance/src/bvh.cpp:46-285):
//
//   * leaf when a work set has < MAX_LEAF_PRIM_SIZE primitives
//   * binned SAH, bin count 1024/(depth+1), planes at start + i*step (f32)
//   * splits leaving <= 1 primitive on a side rejected
//   * no strict cost improvement over the unsplit node => leaf
//   * partition by centroid < plane, stable in work order
//   * nodes emitted in DFS preorder (left first), faces in leaf order
//
// Every floating-point decision (plane positions, surface areas, costs) is
// computed in float so the NumPy builder and this one emit identical trees;
// tests assert bit-equality of the flattened arrays.
//
// Exposed as a C ABI for ctypes; no Python headers needed.

#include <algorithm>
#include <memory>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kMaxLeafPrimSize = 8;           // bvh.h:9
constexpr uint32_t kLeafFlag = 0x80000000u;   // bvh.cpp:486

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
static inline float surface_area(const Vec3& lo, const Vec3& hi) {
  const float s1 = hi.x - lo.x, s2 = hi.y - lo.y, s3 = hi.z - lo.z;
  return s1 * s2 + s2 * s3 + s3 * s1;
}

// matches types.DEVICE_BVH_NODE_DTYPE (48 bytes)
struct NodeOut {
  float bottom[3];
  float pad0;
  float top[3];
  float pad1;
  uint32_t a;  // inner: left child | leaf: count|LEAF_FLAG
  uint32_t b;  // inner: right child | leaf: startIndexList
  uint32_t c;  // leaf: type
  uint32_t d;
};

// Max planes per axis: bins = 1024/(depth+1) <= 1024, max_i = ceil(bins)+1.
constexpr int kMaxBins = 1028;

// One record per primitive: AABB + centroid packed for locality (the
// binning pass reads all three per prim through a gathered index).
struct PrimF {
  Vec3 lo, hi, c;
};

struct Builder {
  std::vector<PrimF> prims;
  uint32_t leaf_type;
  std::vector<NodeOut> nodes;
  std::vector<int64_t> order;
  int max_depth = 0;

  // Per-axis binning scratch reused across nodes.  bin i in [1, max_i]
  // holds prims whose centroid c satisfies plane(i-1) <= c < plane(i);
  // bin max_i+1 holds c >= plane(max_i).
  int64_t cnt[3][kMaxBins + 2];
  Vec3 bin_lo[3][kMaxBins + 2], bin_hi[3][kMaxBins + 2];
  Vec3 suf_lo[kMaxBins + 2], suf_hi[kMaxBins + 2];

  const Vec3& prim_lo(int64_t i) const { return prims[i].lo; }
  const Vec3& prim_hi(int64_t i) const { return prims[i].hi; }

  int64_t emit_leaf(int64_t* idx, int64_t n) {
    NodeOut node{};
    Vec3 lo{std::numeric_limits<float>::max(), std::numeric_limits<float>::max(),
            std::numeric_limits<float>::max()};
    Vec3 hi{-std::numeric_limits<float>::max(), -std::numeric_limits<float>::max(),
            -std::numeric_limits<float>::max()};
    for (int64_t i = 0; i < n; ++i) {
      lo = vmin(lo, prim_lo(idx[i]));
      hi = vmax(hi, prim_hi(idx[i]));
    }
    node.bottom[0] = lo.x; node.bottom[1] = lo.y; node.bottom[2] = lo.z;
    node.top[0] = hi.x; node.top[1] = hi.y; node.top[2] = hi.z;
    node.a = kLeafFlag | static_cast<uint32_t>(n);
    node.b = static_cast<uint32_t>(order.size());
    node.c = leaf_type;
    for (int64_t i = 0; i < n; ++i) order.push_back(idx[i]);
    nodes.push_back(node);
    return static_cast<int64_t>(nodes.size()) - 1;
  }

  // Smallest i in [1, max_i+1] with c < start + i*step (f32 math identical
  // to the plane loop's), i.e. the bin whose plane first clears c.  Guess
  // from the real-valued position then fix up exactly; planes are
  // nondecreasing in i under f32 rounding (step > 0), so both fixup loops
  // terminate with the exact lower-bound semantics of the sorted-sweep
  // formulation this replaces (np.searchsorted side='left').
  static inline int bin_of(float c, float start, float step, float inv_step,
                           int max_i) {
    int i = static_cast<int>((c - start) * inv_step);  // guess only; fixed up
    if (i < 1) i = 1;
    if (i > max_i + 1) i = max_i + 1;
    while (i > 1 && c < start + static_cast<float>(i - 1) * step) --i;
    while (i <= max_i && !(c < start + static_cast<float>(i) * step)) ++i;
    return i;
  }

  // returns true + (axis, plane) when a strictly better split exists.
  //
  // Binned reformulation of the reference's plane sweep (bvh.cpp:104-210):
  // per plane the SAH cost needs only the count of centroids < plane and
  // the AABB *unions* of each side -- both order-independent -- so exact
  // f32 binning against the same plane set reproduces the sorted sweep
  // bit-for-bit (tests/test_native.py asserts byte-equality vs the NumPy
  // sort-based builder) at O(n + planes) per node instead of O(n log n).
  bool find_split(int64_t* idx, int64_t n, const Vec3& lo, const Vec3& hi,
                  int depth, int* best_axis, float* best_plane) {
    const float min_cost = static_cast<float>(n) * surface_area(lo, hi);
    float best_cost = min_cost;
    bool found = false;

    const float bins = 1024.0f / static_cast<float>(depth + 1);
    const int max_i = static_cast<int>(std::ceil(bins)) + 1;
    float start[3], step[3], inv_step[3];
    bool valid[3];
    for (int axis = 0; axis < 3; ++axis) {
      start[axis] = (&lo.x)[axis];
      const float stop = (&hi.x)[axis];
      step[axis] = (stop - start[axis]) / bins;
      inv_step[axis] = 1.0f / step[axis];
      valid[axis] = !(std::fabs(stop - start[axis]) < 1e-4f) &&  // bvh.cpp:116
                    (step[axis] > 0.0f);
      if (!valid[axis]) continue;
      const Vec3 ident_lo{std::numeric_limits<float>::max(),
                          std::numeric_limits<float>::max(),
                          std::numeric_limits<float>::max()};
      const Vec3 ident_hi{-std::numeric_limits<float>::max(),
                          -std::numeric_limits<float>::max(),
                          -std::numeric_limits<float>::max()};
      for (int i = 1; i <= max_i + 1; ++i) {
        cnt[axis][i] = 0;
        bin_lo[axis][i] = ident_lo;
        bin_hi[axis][i] = ident_hi;
      }
    }
    if (!valid[0] && !valid[1] && !valid[2]) return false;

    // one pass over the work set: bin each prim on every valid axis
    for (int64_t j = 0; j < n; ++j) {
      const PrimF& p = prims[idx[j]];
      for (int axis = 0; axis < 3; ++axis) {
        if (!valid[axis]) continue;
        const int i = bin_of((&p.c.x)[axis], start[axis], step[axis],
                             inv_step[axis], max_i);
        ++cnt[axis][i];
        bin_lo[axis][i] = vmin(bin_lo[axis][i], p.lo);
        bin_hi[axis][i] = vmax(bin_hi[axis][i], p.hi);
      }
    }

    for (int axis = 0; axis < 3; ++axis) {
      if (!valid[axis]) continue;
      const float limit = (&hi.x)[axis] - step[axis];

      // suffix unions over bins: suf[i] = union of bins >= i
      suf_lo[max_i + 2] = {std::numeric_limits<float>::max(),
                           std::numeric_limits<float>::max(),
                           std::numeric_limits<float>::max()};
      suf_hi[max_i + 2] = {-std::numeric_limits<float>::max(),
                           -std::numeric_limits<float>::max(),
                           -std::numeric_limits<float>::max()};
      for (int i = max_i + 1; i >= 1; --i) {
        suf_lo[i] = vmin(suf_lo[i + 1], bin_lo[axis][i]);
        suf_hi[i] = vmax(suf_hi[i + 1], bin_hi[axis][i]);
      }

      float axis_best = std::numeric_limits<float>::infinity();
      float axis_best_plane = 0.0f;
      int64_t k = 0;  // running count of centroids < plane(i)
      Vec3 pre_l{std::numeric_limits<float>::max(),
                 std::numeric_limits<float>::max(),
                 std::numeric_limits<float>::max()};
      Vec3 pre_h{-std::numeric_limits<float>::max(),
                 -std::numeric_limits<float>::max(),
                 -std::numeric_limits<float>::max()};
      for (int i = 1; i <= max_i; ++i) {
        k += cnt[axis][i];
        pre_l = vmin(pre_l, bin_lo[axis][i]);
        pre_h = vmax(pre_h, bin_hi[axis][i]);
        const float plane = start[axis] + static_cast<float>(i) * step[axis];
        if (!(plane < limit)) continue;
        if (k <= 1 || n - k <= 1) continue;  // bvh.cpp:180
        const float sa_l = surface_area(pre_l, pre_h);
        const float sa_r = surface_area(suf_lo[i + 1], suf_hi[i + 1]);
        const float cost = sa_l * static_cast<float>(k) +
                           sa_r * static_cast<float>(n - k);
        if (cost < axis_best) {  // first-minimum-wins in plane order
          axis_best = cost;
          axis_best_plane = plane;
        }
      }
      if (axis_best < best_cost) {  // strict, axis-major tie-break
        best_cost = axis_best;
        *best_axis = axis;
        *best_plane = axis_best_plane;
        found = true;
      }
    }
    return found;
  }

  int64_t build(int64_t* idx, int64_t n, int depth) {
    if (depth > max_depth) max_depth = depth;
    if (n < kMaxLeafPrimSize) return emit_leaf(idx, n);  // bvh.cpp:55

    Vec3 lo{std::numeric_limits<float>::max(), std::numeric_limits<float>::max(),
            std::numeric_limits<float>::max()};
    Vec3 hi{-std::numeric_limits<float>::max(), -std::numeric_limits<float>::max(),
            -std::numeric_limits<float>::max()};
    for (int64_t i = 0; i < n; ++i) {
      lo = vmin(lo, prim_lo(idx[i]));
      hi = vmax(hi, prim_hi(idx[i]));
    }

    int axis = -1;
    float plane = 0.0f;
    if (!find_split(idx, n, lo, hi, depth, &axis, &plane)) {
      return emit_leaf(idx, n);  // bvh.cpp:212
    }

    // stable partition: centroid < plane goes left, work order preserved
    int64_t* mid = std::stable_partition(
        idx, idx + n,
        [&](int64_t i) { return (&prims[i].c.x)[axis] < plane; });
    const int64_t n_left = mid - idx;

    NodeOut node{};
    node.bottom[0] = lo.x; node.bottom[1] = lo.y; node.bottom[2] = lo.z;
    node.top[0] = hi.x; node.top[1] = hi.y; node.top[2] = hi.z;
    const int64_t me = static_cast<int64_t>(nodes.size());
    nodes.push_back(node);
    const int64_t left = build(idx, n_left, depth + 1);
    const int64_t right = build(mid, n - n_left, depth + 1);
    nodes[me].a = static_cast<uint32_t>(left);
    nodes[me].b = static_cast<uint32_t>(right);
    return me;
  }
};

}  // namespace

extern "C" {

// Builds the BVH over n primitive AABBs.
// bmin/bmax: [n*3] floats.  leaf_type: TYPE_TRIG=2 or TYPE_INST=1.
// nodes_out: caller buffer of at least (2n+1) NodeOut (48B each).
// order_out: caller buffer of n int64.
// Returns node count (>0) or -1 on error; *max_depth_out gets tree depth.
int64_t rt_build_bvh(const float* bmin, const float* bmax, int64_t n,
                     uint32_t leaf_type, void* nodes_out, int64_t nodes_cap,
                     int64_t* order_out, int32_t* max_depth_out) {
  if (n < 0) return -1;
  auto b = std::make_unique<Builder>();  // ~125 KB of bin scratch: off-stack
  b->leaf_type = leaf_type;
  b->prims.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    PrimF& p = b->prims[i];
    p.lo = {bmin[3 * i], bmin[3 * i + 1], bmin[3 * i + 2]};
    p.hi = {bmax[3 * i], bmax[3 * i + 1], bmax[3 * i + 2]};
    p.c = {(p.lo.x + p.hi.x) * 0.5f, (p.lo.y + p.hi.y) * 0.5f,
           (p.lo.z + p.hi.z) * 0.5f};
  }
  b->nodes.reserve(n > 0 ? 2 * n : 1);
  b->order.reserve(n);
  std::vector<int64_t> idx(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = i;
  b->build(idx.data(), n, 0);

  const int64_t count = static_cast<int64_t>(b->nodes.size());
  if (count > nodes_cap) return -1;
  std::memcpy(nodes_out, b->nodes.data(), count * sizeof(NodeOut));
  std::memcpy(order_out, b->order.data(), b->order.size() * sizeof(int64_t));
  if (max_depth_out) *max_depth_out = b->max_depth;
  return count;
}

// Threaded-escape computation for a flattened tree (device.py contract):
// rows described by a[i], b[i], kind[i] (0 = inner); writes esc[i].
void rt_compute_escape(const int32_t* a, const int32_t* bnode,
                       const int32_t* kind, int32_t* esc, int64_t n,
                       int64_t root) {
  std::vector<std::pair<int64_t, int32_t>> stack;
  stack.emplace_back(root, -1);
  while (!stack.empty()) {
    auto [i, e] = stack.back();
    stack.pop_back();
    esc[i] = e;
    if (kind[i] == 0) {
      stack.emplace_back(bnode[i], e);
      stack.emplace_back(a[i], bnode[i]);
    }
  }
}

}  // extern "C"
