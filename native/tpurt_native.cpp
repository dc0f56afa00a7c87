// tpurt native host core: the C++ data-plane for scene preparation and
// host-side LBVH builds.
//
// The reference implements its entire host layer in C++ (ModelLoader.cpp,
// AccelerationStructureBuilder.cpp); this library is the TPU framework's
// native equivalent for the performance-sensitive host paths:
//   - accessor decode with arbitrary byteStride
//   - index widening u8/u16 -> u32 (ModelLoader.cpp:753-781 semantics)
//   - world-space triangle pre-gather (transform applied per vertex)
//   - 30-bit Morton codes
//   - a full Karras-2012 LBVH build (radix sort + topology + AABB refit),
//     the host-side alternative to the on-device jax build in
//     tpurt/bvh/lbvh.py (same node layout, drop-in arrays)
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---- accessor decode -------------------------------------------------------

// Decode `count` elements of `ncomp` float32 components from a strided
// buffer into a packed float32 array.
void tpurt_decode_f32(const uint8_t* src, int64_t count, int ncomp,
                      int64_t stride, float* dst) {
  for (int64_t i = 0; i < count; ++i) {
    std::memcpy(dst + i * ncomp, src + i * stride, ncomp * sizeof(float));
  }
}

// Widen u8/u16/u32 indices to u32. comp_size in {1, 2, 4}.
void tpurt_widen_indices(const uint8_t* src, int64_t count, int comp_size,
                         int64_t stride, uint32_t* dst) {
  for (int64_t i = 0; i < count; ++i) {
    const uint8_t* p = src + i * stride;
    switch (comp_size) {
      case 1: dst[i] = *p; break;
      case 2: { uint16_t v; std::memcpy(&v, p, 2); dst[i] = v; break; }
      default: { uint32_t v; std::memcpy(&v, p, 4); dst[i] = v; break; }
    }
  }
}

// ---- triangle pre-gather ---------------------------------------------------

// positions: (nv, 3) f32; indices: (tri_count * 3) u32;
// transform: 4x4 row-major; out: (tri_count, 3, 3) world-space vertices.
void tpurt_gather_triangles(const float* positions, const uint32_t* indices,
                            int64_t tri_count, const float* transform,
                            float* out) {
  const float* m = transform;
  for (int64_t t = 0; t < tri_count; ++t) {
    for (int k = 0; k < 3; ++k) {
      const float* v = positions + 3 * indices[t * 3 + k];
      float* o = out + (t * 3 + k) * 3;
      for (int r = 0; r < 3; ++r) {
        o[r] = m[r * 4 + 0] * v[0] + m[r * 4 + 1] * v[1] +
               m[r * 4 + 2] * v[2] + m[r * 4 + 3];
      }
    }
  }
}

// ---- morton ----------------------------------------------------------------

static inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

// points01: (n, 3) normalized to [0,1]; out: 30-bit codes (x<<2 | y<<1 | z,
// matching tpurt/bvh/lbvh.py::morton3).
void tpurt_morton30(const float* points01, int64_t n, uint32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    float x = points01[i * 3 + 0] * 1024.0f;
    float y = points01[i * 3 + 1] * 1024.0f;
    float z = points01[i * 3 + 2] * 1024.0f;
    uint32_t xi = (uint32_t)std::min(std::max(x, 0.0f), 1023.0f);
    uint32_t yi = (uint32_t)std::min(std::max(y, 0.0f), 1023.0f);
    uint32_t zi = (uint32_t)std::min(std::max(z, 0.0f), 1023.0f);
    out[i] = (expand_bits(xi) << 2) | (expand_bits(yi) << 1) | expand_bits(zi);
  }
}

// ---- LBVH build ------------------------------------------------------------

namespace {

struct BuildCtx {
  const uint32_t* codes;  // sorted
  int64_t n;

  // common-prefix length of tie-broken keys (code || sorted index)
  inline int delta(int64_t i, int64_t j) const {
    if (j < 0 || j >= n) return -1;
    uint32_t ci = codes[i], cj = codes[j];
    if (ci != cj) return __builtin_clz(ci ^ cj);
    return 32 + __builtin_clz((uint32_t)i ^ (uint32_t)j);
  }
};

}  // namespace

void tpurt_refit_and_ropes(const int32_t* left, const int32_t* right,
                           float* node_min, float* node_max, int64_t n,
                           int32_t* first, int32_t* skip);

// Karras-2012 binary radix tree + bottom-up AABB refit + per-octant
// stackless skip links (sequential). Node layout identical to
// tpurt/bvh/lbvh.py::LBVH:
//   left/right: (n-1) child pointers (>= n-1 means leaf id + (n-1))
//   node_min/node_max: (2n-1, 3)
//   leaf_prim: (n) original primitive ids in sorted order
//   first: (8, n-1) octant-ordered first child
//   skip: (8, 2n-1) octant-ordered DFS escape links, END sentinel = 2n-1
// Requires n >= 2. Returns 0 on success.
int tpurt_lbvh_build(const float* prim_min, const float* prim_max, int64_t n,
                     int32_t* left, int32_t* right, float* node_min,
                     float* node_max, int32_t* leaf_prim, int32_t* first,
                     int32_t* skip) {
  if (n < 2) return -1;

  // centroids -> normalized -> morton
  std::vector<float> lo(3, 3e38f), hi(3, -3e38f);
  for (int64_t i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      lo[c] = std::min(lo[c], prim_min[i * 3 + c]);
      hi[c] = std::max(hi[c], prim_max[i * 3 + c]);
    }
  }
  float inv[3];
  for (int c = 0; c < 3; ++c) {
    float e = hi[c] - lo[c];
    inv[c] = e > 1e-20f ? 1.0f / e : 0.0f;
  }

  std::vector<std::pair<uint32_t, int32_t>> keyed(n);
  for (int64_t i = 0; i < n; ++i) {
    float p01[3];
    for (int c = 0; c < 3; ++c) {
      float centroid = 0.5f * (prim_min[i * 3 + c] + prim_max[i * 3 + c]);
      p01[c] = (centroid - lo[c]) * inv[c];
    }
    uint32_t code;
    tpurt_morton30(p01, 1, &code);
    keyed[i] = {code, (int32_t)i};
  }
  std::stable_sort(keyed.begin(), keyed.end(),
                   [](const auto& a, const auto& b) { return a.first < b.first; });

  std::vector<uint32_t> codes(n);
  for (int64_t i = 0; i < n; ++i) {
    codes[i] = keyed[i].first;
    leaf_prim[i] = keyed[i].second;
  }

  BuildCtx ctx{codes.data(), n};
  const int64_t n_internal = n - 1;

  for (int64_t i = 0; i < n_internal; ++i) {
    int d = ctx.delta(i, i + 1) - ctx.delta(i, i - 1) >= 0 ? 1 : -1;
    int delta_min = ctx.delta(i, i - d);

    int64_t lmax = 2;
    while (ctx.delta(i, i + lmax * d) > delta_min) lmax *= 2;

    int64_t l = 0;
    for (int64_t t = lmax / 2; t >= 1; t /= 2) {
      if (ctx.delta(i, i + (l + t) * d) > delta_min) l += t;
    }
    int64_t j = i + l * d;

    int delta_node = ctx.delta(i, j);
    int64_t s = 0;
    for (int64_t div = 2;; div *= 2) {
      int64_t t = (l + div - 1) / div;
      if (ctx.delta(i, i + (s + t) * d) > delta_node) s += t;
      if (t <= 1) break;
    }
    int64_t gamma = i + s * d + std::min(d, 0);

    int64_t lo_r = std::min(i, j), hi_r = std::max(i, j);
    left[i] = (lo_r == gamma) ? (int32_t)(gamma + n_internal) : (int32_t)gamma;
    right[i] = (hi_r == gamma + 1) ? (int32_t)(gamma + 1 + n_internal)
                                   : (int32_t)(gamma + 1);
  }

  // leaves
  for (int64_t i = 0; i < n; ++i) {
    int32_t p = leaf_prim[i];
    for (int c = 0; c < 3; ++c) {
      node_min[(n_internal + i) * 3 + c] = prim_min[p * 3 + c];
      node_max[(n_internal + i) * 3 + c] = prim_max[p * 3 + c];
    }
  }

  tpurt_refit_and_ropes(left, right, node_min, node_max, n, first, skip);
  return 0;
}

// Bottom-up AABB refit (leaf boxes pre-filled at node ids n-1..2n-2) +
// per-octant DFS order: first child = the one nearer along the octant's
// direction signs (projected child-center separation), then skip links
// skip[first[i]] = second[i]; skip[second[i]] = skip[i]; top-down.
// Shared by the LBVH and SAH builds (identical output layout).
void tpurt_refit_and_ropes(const int32_t* left, const int32_t* right,
                           float* node_min, float* node_max, int64_t n,
                           int32_t* first, int32_t* skip) {
  const int64_t n_internal = n - 1;
  std::vector<int32_t> stack;
  std::vector<uint8_t> visited(n_internal, 0);
  stack.reserve(128);
  stack.push_back(0);
  while (!stack.empty()) {
    int32_t node = stack.back();
    if (!visited[node]) {
      visited[node] = 1;
      if (left[node] < n_internal) stack.push_back(left[node]);
      if (right[node] < n_internal) stack.push_back(right[node]);
    } else {
      stack.pop_back();
      for (int c = 0; c < 3; ++c) {
        node_min[node * 3 + c] = std::min(node_min[left[node] * 3 + c],
                                          node_min[right[node] * 3 + c]);
        node_max[node * 3 + c] = std::max(node_max[left[node] * 3 + c],
                                          node_max[right[node] * 3 + c]);
      }
    }
  }

  const int32_t end_sentinel = (int32_t)(2 * n - 1);
  const int64_t n_nodes = 2 * n - 1;
  for (int oct = 0; oct < 8; ++oct) {
    const float sx = (oct & 4) ? -1.0f : 1.0f;
    const float sy = (oct & 2) ? -1.0f : 1.0f;
    const float sz = (oct & 1) ? -1.0f : 1.0f;
    int32_t* f = first + (int64_t)oct * n_internal;
    int32_t* s = skip + (int64_t)oct * n_nodes;
    for (int64_t i = 0; i < n_nodes; ++i) s[i] = end_sentinel;
    std::vector<int32_t> sec(n_internal);
    for (int64_t i = 0; i < n_internal; ++i) {
      float score = 0.0f;
      for (int c = 0; c < 3; ++c) {
        float cl = 0.5f * (node_min[left[i] * 3 + c] + node_max[left[i] * 3 + c]);
        float cr = 0.5f * (node_min[right[i] * 3 + c] + node_max[right[i] * 3 + c]);
        float sgn = (c == 0) ? sx : (c == 1) ? sy : sz;
        score += sgn * (cr - cl);
      }
      f[i] = score >= 0.0f ? left[i] : right[i];
      sec[i] = score >= 0.0f ? right[i] : left[i];
    }
    stack.clear();
    stack.push_back(0);
    while (!stack.empty()) {
      int32_t node = stack.back();
      stack.pop_back();
      s[f[node]] = sec[node];
      s[sec[node]] = s[node];
      if (left[node] < n_internal) stack.push_back(left[node]);
      if (right[node] < n_internal) stack.push_back(right[node]);
    }
  }
}

// ---- binned-SAH build ------------------------------------------------------

namespace {

struct SahPrim {
  float bmin[3], bmax[3], c[3];
  int32_t id;
};

inline float half_area(const float* bmin, const float* bmax) {
  float dx = std::max(bmax[0] - bmin[0], 0.0f);
  float dy = std::max(bmax[1] - bmin[1], 0.0f);
  float dz = std::max(bmax[2] - bmin[2], 0.0f);
  return dx * dy + dy * dz + dz * dx;
}

struct Box6 {
  float bmin[3] = {3e38f, 3e38f, 3e38f};
  float bmax[3] = {-3e38f, -3e38f, -3e38f};
  void grow(const SahPrim& p) {
    for (int c = 0; c < 3; ++c) {
      bmin[c] = std::min(bmin[c], p.bmin[c]);
      bmax[c] = std::max(bmax[c], p.bmax[c]);
    }
  }
  void grow(const Box6& b) {
    for (int c = 0; c < 3; ++c) {
      bmin[c] = std::min(bmin[c], b.bmin[c]);
      bmax[c] = std::max(bmax[c], b.bmax[c]);
    }
  }
};

struct SahNode {
  int32_t left = -1, right = -1;  // SahNode indices; leaf when left < 0
  int32_t leaf_id = -1;
  Box6 box;
};

}  // namespace

// Top-down binned SAH (16 bins, split while count > group), leaves of up
// to `group` primitives padded by repetition into `tri_order`. Emits the
// same array layout as tpurt_lbvh_build over the SAH leaves, with
// leaf_prim = identity (leaf l's primitives sit at tri_order[l*group..]).
// The SAH topology typically traverses architectural scenes in ~1.5-2.5x
// fewer node visits than the morton-grouped LBVH. Returns the leaf count,
// or -1 when max_leaves would be exceeded (caller falls back to LBVH).
int tpurt_sah_build(const float* prim_min, const float* prim_max, int64_t n,
                    int32_t group, int32_t max_leaves, int32_t* tri_order,
                    int32_t* left, int32_t* right, float* node_min,
                    float* node_max, int32_t* leaf_prim, int32_t* first,
                    int32_t* skip) {
  if (n < 1 || group < 1) return -1;
  std::vector<SahPrim> prims(n);
  for (int64_t i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      prims[i].bmin[c] = prim_min[i * 3 + c];
      prims[i].bmax[c] = prim_max[i * 3 + c];
      prims[i].c[c] = 0.5f * (prim_min[i * 3 + c] + prim_max[i * 3 + c]);
    }
    prims[i].id = (int32_t)i;
  }

  constexpr int kBins = 16;
  std::vector<SahNode> nodes;
  nodes.reserve(2 * (size_t)std::max<int64_t>(n / std::max(group, 1), 2));
  int32_t n_leaves = 0;

  struct Frame { int64_t lo, hi; int32_t node; };
  std::vector<Frame> work;
  nodes.push_back(SahNode{});
  work.push_back({0, n, 0});

  while (!work.empty()) {
    Frame fr = work.back();
    work.pop_back();
    SahNode& nd = nodes[fr.node];
    Box6 box, cbox;
    for (int64_t i = fr.lo; i < fr.hi; ++i) {
      box.grow(prims[i]);
      for (int c = 0; c < 3; ++c) {
        cbox.bmin[c] = std::min(cbox.bmin[c], prims[i].c[c]);
        cbox.bmax[c] = std::max(cbox.bmax[c], prims[i].c[c]);
      }
    }
    nd.box = box;
    const int64_t count = fr.hi - fr.lo;
    if (count <= group) {
      if (n_leaves >= max_leaves) return -1;
      nd.leaf_id = n_leaves;
      for (int64_t k = 0; k < group; ++k) {
        int64_t src = fr.lo + std::min(k, count - 1);  // pad by repetition
        tri_order[(int64_t)n_leaves * group + k] = prims[src].id;
      }
      ++n_leaves;
      continue;
    }

    // binned SAH over the centroid-extent axes; fall back to a median
    // split when every centroid lands in one bin
    int best_axis = -1, best_bin = -1;
    float best_cost = 3e38f;
    for (int axis = 0; axis < 3; ++axis) {
      float ext = cbox.bmax[axis] - cbox.bmin[axis];
      if (ext <= 1e-20f) continue;
      float inv = kBins / ext;
      Box6 bins[kBins];
      int64_t cnt[kBins] = {0};
      for (int64_t i = fr.lo; i < fr.hi; ++i) {
        int b = std::min((int)((prims[i].c[axis] - cbox.bmin[axis]) * inv),
                         kBins - 1);
        bins[b].grow(prims[i]);
        ++cnt[b];
      }
      Box6 suffix[kBins];
      int64_t scount[kBins];
      Box6 acc;
      int64_t ac = 0;
      for (int b = kBins - 1; b >= 0; --b) {
        if (cnt[b]) acc.grow(bins[b]);
        ac += cnt[b];
        suffix[b] = acc;
        scount[b] = ac;
      }
      Box6 pre;
      int64_t pc = 0;
      for (int b = 0; b < kBins - 1; ++b) {
        if (cnt[b]) pre.grow(bins[b]);
        pc += cnt[b];
        if (pc == 0 || scount[b + 1] == 0) continue;
        float cost = half_area(pre.bmin, pre.bmax) * pc +
                     half_area(suffix[b + 1].bmin, suffix[b + 1].bmax) *
                         scount[b + 1];
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_bin = b;
        }
      }
    }

    int64_t mid;
    if (best_axis < 0) {
      mid = fr.lo + count / 2;  // degenerate: median in current order
    } else {
      float inv = kBins / (cbox.bmax[best_axis] - cbox.bmin[best_axis]);
      float lo_c = cbox.bmin[best_axis];
      auto it = std::partition(
          prims.begin() + fr.lo, prims.begin() + fr.hi,
          [&](const SahPrim& p) {
            int b = std::min((int)((p.c[best_axis] - lo_c) * inv), kBins - 1);
            return b <= best_bin;
          });
      mid = it - prims.begin();
      if (mid == fr.lo || mid == fr.hi) mid = fr.lo + count / 2;
    }

    int32_t li = (int32_t)nodes.size();
    nodes.push_back(SahNode{});
    int32_t ri = (int32_t)nodes.size();
    nodes.push_back(SahNode{});
    nodes[fr.node].left = li;
    nodes[fr.node].right = ri;
    work.push_back({mid, fr.hi, ri});
    work.push_back({fr.lo, mid, li});
  }

  if (n_leaves < 2) return -1;  // the array format needs >= 1 internal

  // linearize into the LBVH array layout: internals in DFS preorder from
  // the SahNode root, leaves keep their emit ids
  const int64_t n_internal = n_leaves - 1;
  std::vector<int32_t> internal_id(nodes.size(), -1);
  {
    int32_t next = 0;
    std::vector<int32_t> st{0};
    while (!st.empty()) {
      int32_t v = st.back();
      st.pop_back();
      if (nodes[v].left < 0) continue;
      internal_id[v] = next++;
      st.push_back(nodes[v].right);
      st.push_back(nodes[v].left);
    }
  }
  for (size_t v = 0; v < nodes.size(); ++v) {
    const SahNode& nd = nodes[v];
    if (nd.left < 0) {
      int64_t node_id = n_internal + nd.leaf_id;
      for (int c = 0; c < 3; ++c) {
        node_min[node_id * 3 + c] = nd.box.bmin[c];
        node_max[node_id * 3 + c] = nd.box.bmax[c];
      }
      continue;
    }
    int32_t id = internal_id[v];
    const SahNode& l = nodes[nd.left];
    const SahNode& r = nodes[nd.right];
    left[id] = l.left < 0 ? (int32_t)(n_internal + l.leaf_id)
                          : internal_id[nd.left];
    right[id] = r.left < 0 ? (int32_t)(n_internal + r.leaf_id)
                           : internal_id[nd.right];
  }
  for (int32_t i = 0; i < n_leaves; ++i) leaf_prim[i] = i;

  tpurt_refit_and_ropes(left, right, node_min, node_max, n_leaves, first,
                        skip);
  return n_leaves;
}

}  // extern "C"
