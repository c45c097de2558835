// mesh_sdf: BVH-accelerated signed-distance queries from triangle meshes.
//
// The reference delegates mesh -> SDF ground truth to the external
// `mesh_to_sdf` package (pyrender virtual scans + scipy cKDTree; see
// /root/reference/prepare_shapenet_dataset.py:32-35). This is the
// in-framework native replacement: a median-split AABB BVH over triangles,
// exact point-to-triangle distances via BVH traversal with branch-and-bound
// pruning, and sign from +x ray-crossing parity (majority over 3 axis rays
// for robustness on imperfect meshes). Queries fan out over hardware threads.
//
// C ABI (ctypes-friendly):
//   void* mesh_sdf_create(const float* vertices, int n_vertices,
//                         const int* faces, int n_faces);
//   void  mesh_sdf_query(void* handle, const float* points, int n_points,
//                        float* out_sdf);        // signed distance
//   void  mesh_sdf_query_unsigned(void*, const float*, int, float*);
//   void  mesh_sdf_destroy(void* handle);
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//            mesh_sdf.cpp -o libmesh_sdf.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <functional>
#include <limits>
#include <thread>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator*(float s) const { return {x * s, y * s, z * s}; }
};

inline float dot(const Vec3& a, const Vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float norm2(const Vec3& a) { return dot(a, a); }

// Squared distance from point p to triangle (a, b, c). Ericson, RTCD 5.1.5.
float point_triangle_dist2(const Vec3& p, const Vec3& a, const Vec3& b, const Vec3& c) {
  Vec3 ab = b - a, ac = c - a, ap = p - a;
  float d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0 && d2 <= 0) return norm2(ap);

  Vec3 bp = p - b;
  float d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0 && d4 <= d3) return norm2(bp);

  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    float v = d1 / (d1 - d3);
    return norm2(ap - ab * v);
  }

  Vec3 cp = p - c;
  float d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0 && d5 <= d6) return norm2(cp);

  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    float w = d2 / (d2 - d6);
    return norm2(ap - ac * w);
  }

  float va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    Vec3 bc = c - b;
    return norm2(bp - bc * w);
  }

  float denom = 1.0f / (va + vb + vc);
  float v = vb * denom, w = vc * denom;
  Vec3 closest = a + ab * v + ac * w;
  return norm2(p - closest);
}

struct AABB {
  Vec3 lo{std::numeric_limits<float>::max(), std::numeric_limits<float>::max(),
          std::numeric_limits<float>::max()};
  Vec3 hi{-std::numeric_limits<float>::max(), -std::numeric_limits<float>::max(),
          -std::numeric_limits<float>::max()};
  void grow(const Vec3& p) {
    lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y); lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y); hi.z = std::max(hi.z, p.z);
  }
  float dist2(const Vec3& p) const {
    float dx = std::max({lo.x - p.x, 0.0f, p.x - hi.x});
    float dy = std::max({lo.y - p.y, 0.0f, p.y - hi.y});
    float dz = std::max({lo.z - p.z, 0.0f, p.z - hi.z});
    return dx * dx + dy * dy + dz * dz;
  }
  // General slab test for a ray from p along (unit) direction d, t >= 0.
  bool hit_by_ray(const Vec3& p, const Vec3& inv_d) const {
    float tmin = 0.0f, tmax = std::numeric_limits<float>::max();
    const float* plo = &lo.x;
    const float* phi = &hi.x;
    const float* pp = &p.x;
    const float* pinv = &inv_d.x;
    for (int i = 0; i < 3; ++i) {
      float t0 = (plo[i] - pp[i]) * pinv[i];
      float t1 = (phi[i] - pp[i]) * pinv[i];
      if (t0 > t1) std::swap(t0, t1);
      tmin = std::max(tmin, t0);
      tmax = std::min(tmax, t1);
      if (tmin > tmax) return false;
    }
    return true;
  }
};

struct Node {
  AABB box;
  int left = -1, right = -1;   // children (internal) …
  int first = 0, count = 0;    // … or triangle range (leaf)
  bool is_leaf() const { return count > 0; }
};

struct BVH {
  std::vector<Vec3> v0, e1, e2;  // per-triangle: origin vertex + edge vectors
  std::vector<Vec3> centroids;
  std::vector<int> tri_order;
  std::vector<Node> nodes;

  void build(const float* vertices, const int* faces, int n_faces) {
    v0.resize(n_faces); e1.resize(n_faces); e2.resize(n_faces);
    centroids.resize(n_faces);
    tri_order.resize(n_faces);
    for (int f = 0; f < n_faces; ++f) {
      Vec3 a{vertices[3 * faces[3 * f] + 0], vertices[3 * faces[3 * f] + 1],
             vertices[3 * faces[3 * f] + 2]};
      Vec3 b{vertices[3 * faces[3 * f + 1] + 0], vertices[3 * faces[3 * f + 1] + 1],
             vertices[3 * faces[3 * f + 1] + 2]};
      Vec3 c{vertices[3 * faces[3 * f + 2] + 0], vertices[3 * faces[3 * f + 2] + 1],
             vertices[3 * faces[3 * f + 2] + 2]};
      v0[f] = a; e1[f] = b - a; e2[f] = c - a;
      centroids[f] = (a + b + c) * (1.0f / 3.0f);
      tri_order[f] = f;
    }
    nodes.reserve(2 * n_faces);
    build_node(0, n_faces);
  }

  int build_node(int first, int count) {
    int idx = (int)nodes.size();
    nodes.push_back({});
    AABB box;
    for (int i = first; i < first + count; ++i) {
      int t = tri_order[i];
      box.grow(v0[t]); box.grow(v0[t] + e1[t]); box.grow(v0[t] + e2[t]);
    }
    nodes[idx].box = box;
    if (count <= 4) {
      nodes[idx].first = first;
      nodes[idx].count = count;
      return idx;
    }
    Vec3 extent = box.hi - box.lo;
    int axis = (extent.x > extent.y && extent.x > extent.z) ? 0 : (extent.y > extent.z ? 1 : 2);
    int mid = first + count / 2;
    std::nth_element(
        tri_order.begin() + first, tri_order.begin() + mid, tri_order.begin() + first + count,
        [&](int a, int b) { return (&centroids[a].x)[axis] < (&centroids[b].x)[axis]; });
    int left = build_node(first, count / 2);
    int right = build_node(mid, count - count / 2);
    nodes[idx].left = left;
    nodes[idx].right = right;
    nodes[idx].count = 0;
    return idx;
  }

  float closest_dist2(const Vec3& p) const {
    float best = std::numeric_limits<float>::max();
    int stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp > 0) {
      const Node& node = nodes[stack[--sp]];
      if (node.box.dist2(p) >= best) continue;
      if (node.is_leaf()) {
        for (int i = node.first; i < node.first + node.count; ++i) {
          int t = tri_order[i];
          best = std::min(best,
                          point_triangle_dist2(p, v0[t], v0[t] + e1[t], v0[t] + e2[t]));
        }
      } else {
        float dl = nodes[node.left].box.dist2(p);
        float dr = nodes[node.right].box.dist2(p);
        // Visit nearer child first for tighter pruning.
        if (dl < dr) {
          if (dr < best) stack[sp++] = node.right;
          if (dl < best) stack[sp++] = node.left;
        } else {
          if (dl < best) stack[sp++] = node.left;
          if (dr < best) stack[sp++] = node.right;
        }
      }
    }
    return best;
  }

  // Count crossings of a ray from p along dir (Möller–Trumbore).
  int ray_crossings(const Vec3& p, const Vec3& dir) const {
    Vec3 inv_d{1.0f / dir.x, 1.0f / dir.y, 1.0f / dir.z};
    int crossings = 0;
    int stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp > 0) {
      const Node& node = nodes[stack[--sp]];
      if (!node.box.hit_by_ray(p, inv_d)) continue;
      if (node.is_leaf()) {
        for (int i = node.first; i < node.first + node.count; ++i) {
          int t = tri_order[i];
          Vec3 pvec = cross(dir, e2[t]);
          float det = dot(e1[t], pvec);
          if (std::fabs(det) < 1e-12f) continue;
          float inv = 1.0f / det;
          Vec3 tvec = p - v0[t];
          float u = dot(tvec, pvec) * inv;
          if (u < 0 || u > 1) continue;
          Vec3 qvec = cross(tvec, e1[t]);
          float v = dot(dir, qvec) * inv;
          if (v < 0 || u + v > 1) continue;
          float thit = dot(e2[t], qvec) * inv;
          if (thit > 1e-8f) ++crossings;
        }
      } else {
        stack[sp++] = node.left;
        stack[sp++] = node.right;
      }
    }
    return crossings;
  }

  float signed_distance(const Vec3& p) const {
    float d = std::sqrt(closest_dist2(p));
    // Majority vote over three fixed skew-direction parity tests: arbitrary
    // irrational-ish directions avoid the shared-edge double counting that
    // axis rays hit on symmetric/grid-extracted meshes.
    static const Vec3 kDirs[3] = {
        {0.8491679f, 0.3717402f, 0.3756200f},
        {-0.2917509f, 0.9124136f, 0.2877602f},
        {0.3266091f, -0.2465251f, 0.9124458f},
    };
    int votes = 0;
    for (const Vec3& dir : kDirs) {
      votes += (ray_crossings(p, dir) % 2 == 1) ? 1 : 0;
    }
    return votes >= 2 ? -d : d;
  }
};

void parallel_for(int n, const std::function<void(int, int)>& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int n_threads = std::min<int>(hw, std::max(1, n / 256));
  if (n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

void* mesh_sdf_create(const float* vertices, int n_vertices, const int* faces, int n_faces) {
  (void)n_vertices;
  auto* bvh = new BVH();
  bvh->build(vertices, faces, n_faces);
  return bvh;
}

void mesh_sdf_query(void* handle, const float* points, int n_points, float* out_sdf) {
  auto* bvh = static_cast<BVH*>(handle);
  parallel_for(n_points, [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) {
      Vec3 p{points[3 * i], points[3 * i + 1], points[3 * i + 2]};
      out_sdf[i] = bvh->signed_distance(p);
    }
  });
}

void mesh_sdf_query_unsigned(void* handle, const float* points, int n_points, float* out) {
  auto* bvh = static_cast<BVH*>(handle);
  parallel_for(n_points, [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) {
      Vec3 p{points[3 * i], points[3 * i + 1], points[3 * i + 2]};
      out[i] = std::sqrt(bvh->closest_dist2(p));
    }
  });
}

void mesh_sdf_destroy(void* handle) { delete static_cast<BVH*>(handle); }

}  // extern "C"
