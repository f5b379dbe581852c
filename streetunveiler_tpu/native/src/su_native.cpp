// su_native: C++ host-side runtime kernels for streetunveiler_tpu.
//
// The reference accelerates its host/data-layer hot paths with native
// extensions (simple-knn CUDA submodule, superpose3d C backend, ZITS++
// C++ NMS; SURVEY.md §2.3). The TPU build keeps device math in
// Pallas/XLA; this library is the native equivalent for the *host-side*
// paths that feed it:
//
//   - k-nearest-neighbor statistics (reference simple-knn: dist3knn at
//     scene/gaussian_model.py:151, meanDistFromReferencePcd at
//     2_generate_inpainted_mask.py:71-73)
//   - radius-graph connected components for instance clustering
//     (reference scene/gaussian_model.py:617-651, an O(N^2) GPU loop)
//   - voxel downsample with semantic majority vote (reference
//     utils/pcd_utils.py:73-132, a per-voxel Python loop)
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the
// image). All functions are thread-parallel with OpenMP where it pays.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// ------------------------------------------------------------- KD-tree
// Static balanced 3-d tree over an index permutation: build by recursive
// median split on the widest axis; query with an explicit stack and an
// insertion-sorted k-best list (k is small: 3..16).

struct KDTree {
  const float* pts;   // [n,3]
  int64_t n;
  std::vector<int32_t> perm;   // pre-order flattened tree
  std::vector<int32_t> axis_;  // split axis per node slot (-1 = leaf run)
  static constexpr int kLeaf = 16;

  struct Node {
    int32_t lo, hi;   // range in perm
    int32_t axis;     // -1 for leaf
    float split;
    int32_t left, right;
  };
  std::vector<Node> nodes;

  KDTree(const float* p, int64_t count) : pts(p), n(count) {
    perm.resize(n);
    std::iota(perm.begin(), perm.end(), 0);
    nodes.reserve(2 * (n / kLeaf + 1));
    if (n) build(0, (int32_t)n);
  }

  int32_t build(int32_t lo, int32_t hi) {
    int32_t id = (int32_t)nodes.size();
    nodes.push_back({lo, hi, -1, 0.f, -1, -1});
    if (hi - lo <= kLeaf) return id;
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    for (int32_t i = lo; i < hi; ++i) {
      const float* q = pts + 3ll * perm[i];
      for (int a = 0; a < 3; ++a) {
        mn[a] = std::min(mn[a], q[a]);
        mx[a] = std::max(mx[a], q[a]);
      }
    }
    int axis = 0;
    float w = mx[0] - mn[0];
    for (int a = 1; a < 3; ++a)
      if (mx[a] - mn[a] > w) { w = mx[a] - mn[a]; axis = a; }
    int32_t mid = (lo + hi) / 2;
    std::nth_element(perm.begin() + lo, perm.begin() + mid,
                     perm.begin() + hi, [&](int32_t a, int32_t b) {
                       return pts[3ll * a + axis] < pts[3ll * b + axis];
                     });
    float split = pts[3ll * perm[mid] + axis];
    nodes[id].axis = axis;
    nodes[id].split = split;
    int32_t l = build(lo, mid);
    int32_t r = build(mid, hi);
    nodes[id].left = l;
    nodes[id].right = r;
    return id;
  }

  // k nearest squared distances (optionally skipping one index).
  // dist2_out must hold k entries; returns count found.
  int query(const float* q, int k, int32_t skip, float* dist2_out) const {
    int found = 0;
    float worst = 1e30f;
    int32_t stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      int32_t id = stack[--sp];
      const Node& nd = nodes[id];
      if (nd.axis < 0) {
        for (int32_t i = nd.lo; i < nd.hi; ++i) {
          int32_t j = perm[i];
          if (j == skip) continue;
          const float* p = pts + 3ll * j;
          float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
          float d2 = dx * dx + dy * dy + dz * dz;
          if (found < k) {
            int ins = found++;
            while (ins > 0 && dist2_out[ins - 1] > d2) {
              dist2_out[ins] = dist2_out[ins - 1];
              --ins;
            }
            dist2_out[ins] = d2;
            worst = dist2_out[found - 1];
          } else if (d2 < worst) {
            int ins = k - 1;
            while (ins > 0 && dist2_out[ins - 1] > d2) {
              dist2_out[ins] = dist2_out[ins - 1];
              --ins;
            }
            dist2_out[ins] = d2;
            worst = dist2_out[k - 1];
          }
        }
        continue;
      }
      float delta = q[nd.axis] - nd.split;
      int32_t near = delta <= 0 ? nd.left : nd.right;
      int32_t far = delta <= 0 ? nd.right : nd.left;
      if (found < k || delta * delta < worst) stack[sp++] = far;
      stack[sp++] = near;
    }
    return found;
  }
};

// --------------------------------------------------- spatial hash grid
struct CellKey {
  int64_t v;
  bool operator==(const CellKey& o) const { return v == o.v; }
};
struct CellHash {
  size_t operator()(const CellKey& k) const {
    uint64_t x = (uint64_t)k.v;
    x ^= x >> 33; x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33; x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33;
    return (size_t)x;
  }
};

inline int64_t pack_cell(int64_t cx, int64_t cy, int64_t cz) {
  // 21 bits per axis, masked so out-of-range neighbor probes (e.g. -1 at
  // the grid boundary) can't sign-extend into another axis' field; real
  // scenes span far fewer than 2^21 cells per axis so masked keys are
  // unique for occupied cells.
  const int64_t M = (1ll << 21) - 1;
  return ((cx & M) << 42) | ((cy & M) << 21) | (cz & M);
}

inline int64_t cell_of(const float* p, float inv, int64_t ox, int64_t oy,
                       int64_t oz) {
  return pack_cell((int64_t)std::floor(p[0] * inv) - ox,
                   (int64_t)std::floor(p[1] * inv) - oy,
                   (int64_t)std::floor(p[2] * inv) - oz);
}

// ------------------------------------------------------- union-find
struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(int64_t n) : parent(n) {
    std::iota(parent.begin(), parent.end(), 0);
  }
  int32_t find(int32_t a) {
    int32_t root = a;
    while (parent[root] != root) root = parent[root];
    while (parent[a] != root) {
      int32_t nxt = parent[a];
      parent[a] = root;
      a = nxt;
    }
    return root;
  }
  void unite(int32_t a, int32_t b) {
    int32_t ra = find(a), rb = find(b);
    if (ra == rb) return;
    if (ra < rb) parent[rb] = ra; else parent[ra] = rb;
  }
};

}  // namespace

extern "C" {

// Per-point mean SQUARED distance to the 3 nearest neighbors
// (reference simple-knn dist3knn).
void su_knn_mean_sq_dist3(const float* pts, int64_t n, float* out) {
  if (n == 0) return;
  KDTree tree(pts, n);
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n; ++i) {
    float d2[3];
    int got = tree.query(pts + 3 * i, 3, (int32_t)i, d2);
    float acc = 0.f;
    for (int j = 0; j < got; ++j) acc += d2[j];
    out[i] = got ? acc / got : 0.f;
  }
}

// Per-query mean distance to the k nearest reference points
// (reference simple-knn meanDistFromReferencePcd).
void su_knn_mean_dist_ref(const float* query, int64_t nq, const float* ref,
                          int64_t nr, int32_t k, float* out) {
  if (nq == 0) return;
  if (nr == 0) { std::memset(out, 0, sizeof(float) * nq); return; }
  KDTree tree(ref, nr);
  if (k > 16) k = 16;
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < nq; ++i) {
    float d2[16];
    int got = tree.query(query + 3 * i, k, -1, d2);
    float acc = 0.f;
    for (int j = 0; j < got; ++j) acc += std::sqrt(d2[j]);
    out[i] = got ? acc / got : 0.f;
  }
}

// Connected components of the radius graph: labels[i] = component root
// index (arbitrary but consistent). Grid-hash neighborhood; exact radius
// test. Returns the number of components.
int64_t su_cluster_radius(const float* pts, int64_t n, float radius,
                          int32_t* labels) {
  if (n == 0) return 0;
  float inv = 1.0f / radius;
  int64_t ox = INT64_MAX, oy = INT64_MAX, oz = INT64_MAX;
  for (int64_t i = 0; i < n; ++i) {
    ox = std::min(ox, (int64_t)std::floor(pts[3 * i + 0] * inv));
    oy = std::min(oy, (int64_t)std::floor(pts[3 * i + 1] * inv));
    oz = std::min(oz, (int64_t)std::floor(pts[3 * i + 2] * inv));
  }
  std::unordered_map<CellKey, std::vector<int32_t>, CellHash> grid;
  grid.reserve((size_t)n * 2);
  for (int64_t i = 0; i < n; ++i)
    grid[{cell_of(pts + 3 * i, inv, ox, oy, oz)}].push_back((int32_t)i);

  UnionFind uf(n);
  float r2 = radius * radius;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + 3 * i;
    int64_t cx = (int64_t)std::floor(p[0] * inv) - ox;
    int64_t cy = (int64_t)std::floor(p[1] * inv) - oy;
    int64_t cz = (int64_t)std::floor(p[2] * inv) - oz;
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dz = -1; dz <= 1; ++dz) {
          auto it = grid.find({pack_cell(cx + dx, cy + dy, cz + dz)});
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            if (j <= i) continue;
            const float* q = pts + 3ll * j;
            float ddx = p[0] - q[0], ddy = p[1] - q[1], ddz = p[2] - q[2];
            if (ddx * ddx + ddy * ddy + ddz * ddz <= r2)
              uf.unite((int32_t)i, j);
          }
        }
  }
  int64_t n_comp = 0;
  for (int64_t i = 0; i < n; ++i) {
    int32_t r = uf.find((int32_t)i);
    labels[i] = r;
    if (r == i) ++n_comp;
  }
  return n_comp;
}

// Voxel-mean downsample with semantic majority vote (reference
// utils/pcd_utils.py:73-132): per-voxel mean xyz/rgb; the voxel's label
// is the majority class, and voxels where the majority holds less than
// `agreement` of the points are dropped.
//
// Two-call protocol: pass out_* = nullptr to get the kept-voxel count,
// then call again with buffers of that size. Deterministic order (first
// point occurrence).
int64_t su_voxel_downsample(const float* pts, const float* rgb,
                            const int32_t* sem, int64_t n,
                            float voxel, float agreement,
                            float* out_pts, float* out_rgb,
                            int32_t* out_sem) {
  if (n == 0) return 0;
  float inv = 1.0f / voxel;
  int64_t ox = INT64_MAX, oy = INT64_MAX, oz = INT64_MAX;
  int32_t n_classes = 1;
  for (int64_t i = 0; i < n; ++i) {
    ox = std::min(ox, (int64_t)std::floor(pts[3 * i + 0] * inv));
    oy = std::min(oy, (int64_t)std::floor(pts[3 * i + 1] * inv));
    oz = std::min(oz, (int64_t)std::floor(pts[3 * i + 2] * inv));
    n_classes = std::max(n_classes, sem[i] + 1);
  }
  std::unordered_map<CellKey, int32_t, CellHash> slot_of;
  slot_of.reserve((size_t)n * 2);
  std::vector<int32_t> slot(n);
  int32_t n_vox = 0;
  for (int64_t i = 0; i < n; ++i) {
    auto ins = slot_of.emplace(
        CellKey{cell_of(pts + 3 * i, inv, ox, oy, oz)}, n_vox);
    if (ins.second) ++n_vox;
    slot[i] = ins.first->second;
  }
  std::vector<double> sum_xyz(3ll * n_vox, 0.0), sum_rgb(3ll * n_vox, 0.0);
  std::vector<int32_t> count(n_vox, 0);
  std::vector<int32_t> votes((int64_t)n_vox * n_classes, 0);
  for (int64_t i = 0; i < n; ++i) {
    int32_t s = slot[i];
    for (int a = 0; a < 3; ++a) {
      sum_xyz[3ll * s + a] += pts[3 * i + a];
      sum_rgb[3ll * s + a] += rgb[3 * i + a];
    }
    ++count[s];
    ++votes[(int64_t)s * n_classes + sem[i]];
  }
  int64_t kept = 0;
  for (int32_t s = 0; s < n_vox; ++s) {
    int32_t best = 0, best_c = votes[(int64_t)s * n_classes];
    for (int32_t c = 1; c < n_classes; ++c) {
      int32_t v = votes[(int64_t)s * n_classes + c];
      if (v > best_c) { best_c = v; best = c; }
    }
    if ((double)best_c < agreement * count[s]) continue;
    if (out_pts) {
      for (int a = 0; a < 3; ++a) {
        out_pts[3 * kept + a] = (float)(sum_xyz[3ll * s + a] / count[s]);
        out_rgb[3 * kept + a] = (float)(sum_rgb[3ll * s + a] / count[s]);
      }
      out_sem[kept] = best;
    }
    ++kept;
  }
  return kept;
}

int32_t su_version() { return 1; }

}  // extern "C"
