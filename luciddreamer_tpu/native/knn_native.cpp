// Native host-side point-cloud ops: exact k-NN (KD-tree) and Morton codes.
//
// CPU counterpart of the reference's simple-knn CUDA extension
// (submodules/simple-knn/simple_knn.cu): mean of squared distances to the 3
// nearest neighbors, used to initialize Gaussian scales.  The TPU compute
// path uses the MXU implementation (luciddreamer_tpu/points/knn.py); this
// native version serves host-side tooling (ply preprocessing, data loaders)
// and as an independent exact oracle.  Original design: a median-split
// KD-tree with best-first descent, not a port of the reference's
// Morton-box algorithm.
//
// Plain C ABI, loaded via ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Node {
  int left = -1, right = -1;
  int start = 0, end = 0;  // leaf range into the index array
  int axis = 0;
  float split = 0.f;
};

struct KDTree {
  const float* pts;  // (n, 3)
  std::vector<int> idx;
  std::vector<Node> nodes;
  int leaf_size = 16;

  int build(int start, int end) {
    int me = (int)nodes.size();
    nodes.emplace_back();
    if (end - start <= leaf_size) {
      nodes[me].start = start;
      nodes[me].end = end;
      return me;
    }
    // pick the widest axis
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = start; i < end; ++i) {
      const float* p = pts + 3 * idx[i];
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], p[a]);
        hi[a] = std::max(hi[a], p[a]);
      }
    }
    int axis = 0;
    for (int a = 1; a < 3; ++a)
      if (hi[a] - lo[a] > hi[axis] - lo[axis]) axis = a;
    int mid = (start + end) / 2;
    std::nth_element(
        idx.begin() + start, idx.begin() + mid, idx.begin() + end,
        [&](int a, int b) { return pts[3 * a + axis] < pts[3 * b + axis]; });
    nodes[me].axis = axis;
    nodes[me].split = pts[3 * idx[mid] + axis];
    nodes[me].start = -1;
    int l = build(start, mid);
    int r = build(mid, end);
    nodes[me].left = l;
    nodes[me].right = r;
    return me;
  }
};

struct Best {
  float d[3] = {1e30f, 1e30f, 1e30f};
  void push(float v) {
    if (v >= d[2]) return;
    if (v < d[0]) {
      d[2] = d[1]; d[1] = d[0]; d[0] = v;
    } else if (v < d[1]) {
      d[2] = d[1]; d[1] = v;
    } else {
      d[2] = v;
    }
  }
};

void query(const KDTree& t, int node, const float* q, int self, Best& best) {
  const Node& n = t.nodes[node];
  if (n.start >= 0) {
    for (int i = n.start; i < n.end; ++i) {
      int j = t.idx[i];
      if (j == self) continue;
      const float* p = t.pts + 3 * j;
      float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
      best.push(dx * dx + dy * dy + dz * dz);
    }
    return;
  }
  float delta = q[n.axis] - n.split;
  int near = delta < 0 ? n.left : n.right;
  int far = delta < 0 ? n.right : n.left;
  query(t, near, q, self, best);
  if (delta * delta < best.d[2]) query(t, far, q, self, best);
}

}  // namespace

extern "C" {

// mean of squared distances to the 3 nearest neighbors, per point.
// points: (n, 3) float32; out: (n,) float32.  Returns 0 on success.
int mean_sq_dist_3nn(const float* points, int64_t n, float* out) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = 0.f;
    return 0;
  }
  KDTree t;
  t.pts = points;
  t.idx.resize(n);
  for (int64_t i = 0; i < n; ++i) t.idx[i] = (int)i;
  t.nodes.reserve(2 * n / t.leaf_size + 4);
  t.build(0, (int)n);
  for (int64_t i = 0; i < n; ++i) {
    Best b;
    query(t, 0, points + 3 * i, (int)i, b);
    float s = 0.f;
    int cnt = 0;
    for (int k = 0; k < 3; ++k)
      if (b.d[k] < 1e29f) { s += b.d[k]; ++cnt; }
    out[i] = cnt ? s / 3.f : 0.f;  // reference divides by 3 (simple_knn.cu:182)
  }
  return 0;
}

// 63-bit Morton codes from normalized coordinates.
// points (n, 3) f32 -> codes (n,) uint64 (21 bits per axis).
int morton3d(const float* points, int64_t n, uint64_t* codes) {
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a) {
      lo[a] = std::min(lo[a], points[3 * i + a]);
      hi[a] = std::max(hi[a], points[3 * i + a]);
    }
  auto expand = [](uint64_t v) {
    v &= 0x1fffff;
    v = (v | v << 32) & 0x1f00000000ffffULL;
    v = (v | v << 16) & 0x1f0000ff0000ffULL;
    v = (v | v << 8) & 0x100f00f00f00f00fULL;
    v = (v | v << 4) & 0x10c30c30c30c30c3ULL;
    v = (v | v << 2) & 0x1249249249249249ULL;
    return v;
  };
  for (int64_t i = 0; i < n; ++i) {
    uint64_t c = 0;
    for (int a = 0; a < 3; ++a) {
      float range = std::max(hi[a] - lo[a], 1e-12f);
      float f = (points[3 * i + a] - lo[a]) / range;
      uint64_t q = (uint64_t)(f * 2097151.0f);  // 2^21 - 1
      c |= expand(q) << a;
    }
    codes[i] = c;
  }
  return 0;
}

// Morton-ordered subsampling: pick ``m`` spatially stratified points.
// Writes chosen indices to out_idx (m,) int64.
int morton_subsample(const float* points, int64_t n, int64_t m,
                     int64_t* out_idx) {
  if (m >= n) {
    for (int64_t i = 0; i < n; ++i) out_idx[i] = i;
    return (int)n;
  }
  std::vector<uint64_t> codes(n);
  morton3d(points, n, codes.data());
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return codes[a] < codes[b]; });
  for (int64_t i = 0; i < m; ++i) out_idx[i] = order[i * n / m];
  return (int)m;
}

}  // extern "C"
