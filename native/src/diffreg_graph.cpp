// diffreg_graph — deformable-scene graph utilities (C ABI, loaded via ctypes).
//
// Re-implements the NeuralTracking-heritage toolbox the reference vendors in
// vision3d/csrc/cpu/{graph_proc,deformation_graph,node_sampling}: depth-map
// triangulation, mesh erosion, coverage node sampling, geodesic/euclidean
// graph edges, graph cleanup, connected components, pixel skinning anchors,
// min-distance FPS, and the voxel-hash deformation-graph builder. These are
// host-side data-prep utilities (off the Diff-Reg live path); the
// implementations here are fresh (flat adjacency arrays + binary heaps
// instead of Eigen/std::set graphs), with the reference's contracts:
//
//   * edges rows are -1-padded;
//   * skinning weights w = exp(-d^2 / (2 c^2)) normalized per row (uniform
//     when the sum underflows);
//   * geodesic searches expand only to 2*node_coverage unless
//     `enforce_total_num_neighbors`;
//   * compute_edges_euclidean keeps the reference's documented quirk of
//     comparing SQUARED distance against the unsquared max_influence
//     (vision3d euclidean edges, compute_edges_euclidean);
//   * pixel geodesic anchors are selected by ascending geodesic distance
//     (the NeuralTracking intent; the vendored copy builds the
//     distance-sorted set and then accidentally iterates its by-id map —
//     we keep the intended ordering and document the divergence).
//
// Built by native/build.sh into libdiffreg_native.so.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

inline float dist(const V3& a, const V3& b) {
  float dx = a.x - b.x, dy = a.y - b.y, dz = a.z - b.z;
  return std::sqrt(dx * dx + dy * dy + dz * dz);
}

inline float sq_dist(const V3& a, const V3& b) {
  float dx = a.x - b.x, dy = a.y - b.y, dz = a.z - b.z;
  return dx * dx + dy * dy + dz * dz;
}

inline float skin_weight(float d, float coverage) {
  return std::exp(-(d * d) / (2.0f * coverage * coverage));
}

inline V3 at(const float* p, int i) { return {p[3 * i], p[3 * i + 1], p[3 * i + 2]}; }

// Flat CSR adjacency built from triangle faces (vertex -> vertex).
struct MeshAdjacency {
  std::vector<int32_t> offsets;  // n+1
  std::vector<int32_t> nbrs;

  MeshAdjacency(int n, const int32_t* faces, int m) {
    std::vector<std::vector<int32_t>> adj(n);
    auto link = [&](int a, int b) {
      auto& v = adj[a];
      if (std::find(v.begin(), v.end(), b) == v.end()) v.push_back(b);
    };
    for (int f = 0; f < m; ++f) {
      int a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
      link(a, b); link(a, c); link(b, a); link(b, c); link(c, a); link(c, b);
    }
    offsets.resize(n + 1);
    offsets[0] = 0;
    for (int i = 0; i < n; ++i) offsets[i + 1] = offsets[i] + (int32_t)adj[i].size();
    nbrs.resize(offsets[n]);
    for (int i = 0; i < n; ++i)
      std::copy(adj[i].begin(), adj[i].end(), nbrs.begin() + offsets[i]);
  }
};

void normalize_or_uniform(float* w, int n) {
  float s = 0.f;
  for (int i = 0; i < n; ++i) s += w[i];
  if (s > 0.f) {
    for (int i = 0; i < n; ++i) w[i] /= s;
  } else if (n > 0) {
    for (int i = 0; i < n; ++i) w[i] = 1.0f / n;
  }
}

}  // namespace

extern "C" {

// --------------------------------------------------------------------- //
// depth_to_mesh: [H, W, 3] camera-space point image -> triangle mesh.
// Two camera-facing triangles per pixel quad, kept when all three vertices
// have z > 0 and every edge is <= max_edge. Vertices deduplicated in pixel
// scan order. Outputs sized by the caller: vertices/pixels up to H*W rows,
// faces up to 2*(H-1)*(W-1) rows. counts = {n_vertices, n_faces}.
void graph_depth_to_mesh(const float* point_image, int32_t height, int32_t width,
                         float max_edge, float* out_vertices, int32_t* out_pixels,
                         int32_t* out_faces, int32_t* counts) {
  std::vector<int32_t> pix2vert((size_t)height * width, -1);
  int32_t nv = 0, nf = 0;

  auto P = [&](int y, int x) { return at(point_image, y * width + x); };
  auto vertex_of = [&](int y, int x) {
    int idx = y * width + x;
    if (pix2vert[idx] < 0) {
      V3 p = P(y, x);
      out_vertices[3 * nv] = p.x;
      out_vertices[3 * nv + 1] = p.y;
      out_vertices[3 * nv + 2] = p.z;
      out_pixels[2 * nv] = x;
      out_pixels[2 * nv + 1] = y;
      pix2vert[idx] = nv++;
    }
    return pix2vert[idx];
  };

  for (int y = 0; y + 1 < height; ++y) {
    for (int x = 0; x + 1 < width; ++x) {
      V3 p00 = P(y, x), p01 = P(y + 1, x), p10 = P(y, x + 1), p11 = P(y + 1, x + 1);
      bool v00 = p00.z > 0, v01 = p01.z > 0, v10 = p10.z > 0, v11 = p11.z > 0;

      // upper-left triangle (00, 01, 10) — normal toward the camera
      if (v00 && v01 && v10 && dist(p00, p01) <= max_edge &&
          dist(p00, p10) <= max_edge && dist(p01, p10) <= max_edge) {
        out_faces[3 * nf] = vertex_of(y, x);
        out_faces[3 * nf + 1] = vertex_of(y + 1, x);
        out_faces[3 * nf + 2] = vertex_of(y, x + 1);
        ++nf;
      }
      // lower-right triangle (11, 10, 01)
      if (v01 && v10 && v11 && dist(p10, p01) <= max_edge &&
          dist(p10, p11) <= max_edge && dist(p01, p11) <= max_edge) {
        out_faces[3 * nf] = vertex_of(y + 1, x + 1);
        out_faces[3 * nf + 1] = vertex_of(y, x + 1);
        out_faces[3 * nf + 2] = vertex_of(y + 1, x);
        ++nf;
      }
    }
  }
  counts[0] = nv;
  counts[1] = nf;
}

// --------------------------------------------------------------------- //
// erode_mesh: drop faces touching low-degree vertices for n_iterations;
// a vertex survives iff it appears in a surviving face.
void graph_erode_mesh(int32_t n_vertices, const int32_t* faces, int32_t n_faces,
                      int32_t n_iterations, int32_t min_neighbors,
                      uint8_t* out_mask) {
  std::vector<int32_t> cur(faces, faces + (size_t)3 * n_faces);
  for (int it = 0; it < n_iterations; ++it) {
    int m = (int)cur.size() / 3;
    std::vector<int32_t> degree(n_vertices, 0);
    for (int f = 0; f < m; ++f)
      for (int j = 0; j < 3; ++j) degree[cur[3 * f + j]] += 1;
    std::vector<int32_t> kept;
    kept.reserve(cur.size());
    for (int f = 0; f < m; ++f) {
      if (degree[cur[3 * f]] >= min_neighbors &&
          degree[cur[3 * f + 1]] >= min_neighbors &&
          degree[cur[3 * f + 2]] >= min_neighbors) {
        kept.insert(kept.end(), cur.begin() + 3 * f, cur.begin() + 3 * f + 3);
      }
    }
    cur.swap(kept);
  }
  std::memset(out_mask, 0, n_vertices);
  for (size_t i = 0; i < cur.size(); ++i) out_mask[cur[i]] = 1;
}

// --------------------------------------------------------------------- //
// sample_nodes: greedy coverage sampling — a vertex becomes a node iff no
// prior node is within node_coverage. seed >= 0 shuffles the visit order
// with a SEEDED rng (the reference uses random_device; a seed keeps the
// data pipeline reproducible); seed < 0 visits in index order.
int32_t graph_sample_nodes(const float* vertices, int32_t n, const uint8_t* non_eroded,
                           float coverage, int32_t only_non_eroded, int64_t seed,
                           float* out_pos, int32_t* out_idx) {
  std::vector<int32_t> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  if (seed >= 0) {
    std::mt19937_64 rng((uint64_t)seed);
    std::shuffle(order.begin(), order.end(), rng);
  }
  float cov2 = coverage * coverage;
  int32_t k = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (only_non_eroded && !non_eroded[i]) continue;
    V3 p = at(vertices, i);
    bool is_node = true;
    for (int j = 0; j < k; ++j) {
      if (sq_dist(p, at(out_pos, j)) <= cov2) { is_node = false; break; }
    }
    if (is_node) {
      out_pos[3 * k] = p.x; out_pos[3 * k + 1] = p.y; out_pos[3 * k + 2] = p.z;
      out_idx[k] = i;
      ++k;
    }
  }
  return k;
}

// --------------------------------------------------------------------- //
// compute_edges_geodesic: Dijkstra from each node over the mesh adjacency;
// collects up to max_neighbors other nodes in ascending geodesic order.
// node_to_vertex [k, n] gets each visited vertex's geodesic distance
// (pre-fill with -1 on the Python side). Weights are normalized skinning
// weights; edges/dists -1/0-padded.
void graph_compute_edges_geodesic(
    const float* vertices, const uint8_t* valid_vertices, int32_t n_vertices,
    const int32_t* faces, int32_t n_faces, const int32_t* node_indices,
    int32_t n_nodes, int32_t max_neighbors, float node_coverage,
    int32_t allow_only_valid, int32_t enforce_total, int32_t* out_edges,
    float* out_weights, float* out_dists, float* node_to_vertex) {
  MeshAdjacency adj(n_vertices, faces, n_faces);

  std::vector<int32_t> vert2node(n_vertices, -1);
  for (int i = 0; i < n_nodes; ++i)
    if (node_indices[i] >= 0) vert2node[node_indices[i]] = i;

  float max_influence = 2.0f * node_coverage;
  std::vector<uint8_t> visited(n_vertices);
  using QE = std::pair<float, int32_t>;  // (dist, vertex)

  for (int ni = 0; ni < n_nodes; ++ni) {
    int32_t* edges = out_edges + (size_t)ni * max_neighbors;
    float* weights = out_weights + (size_t)ni * max_neighbors;
    float* dists = out_dists + (size_t)ni * max_neighbors;
    for (int j = 0; j < max_neighbors; ++j) { edges[j] = -1; weights[j] = 0.f; dists[j] = 0.f; }

    int start = node_indices[ni];
    if (start < 0) continue;

    std::fill(visited.begin(), visited.end(), 0);
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> heap;
    heap.push({0.f, start});
    int found = 0;

    while (!heap.empty()) {
      auto [d, v] = heap.top();
      heap.pop();
      if (visited[v]) continue;
      visited[v] = 1;

      int nid = vert2node[v];
      if (nid >= 0 && nid != ni) {
        edges[found] = nid;
        weights[found] = skin_weight(d, node_coverage);
        dists[found] = d;
        if (++found >= max_neighbors) break;
      }
      node_to_vertex[(size_t)ni * n_vertices + v] = d;

      V3 pv = at(vertices, v);
      for (int e = adj.offsets[v]; e < adj.offsets[v + 1]; ++e) {
        int w = adj.nbrs[e];
        if (visited[w]) continue;
        if (allow_only_valid && !valid_vertices[w]) continue;
        float nd = d + dist(pv, at(vertices, w));
        if (enforce_total || nd <= max_influence) heap.push({nd, w});
      }
    }
    normalize_or_uniform(weights, found);
  }
}

// --------------------------------------------------------------------- //
// compute_edges_euclidean: k nearest nodes per node. NOTE: preserves the
// reference's comparison of SQUARED distance against the raw max_influence
// threshold (see header comment).
void graph_compute_edges_euclidean(const float* nodes, int32_t n_nodes,
                                   int32_t max_neighbors, float max_influence,
                                   int32_t* out_edges) {
  std::vector<std::pair<float, int32_t>> cand;
  for (int i = 0; i < n_nodes; ++i) {
    V3 p = at(nodes, i);
    cand.clear();
    for (int j = 0; j < n_nodes; ++j) {
      if (j == i) continue;
      float d2 = sq_dist(p, at(nodes, j));
      if (d2 > max_influence) continue;  // reference quirk: d^2 vs raw threshold
      cand.push_back({d2, j});
    }
    int keep = std::min<int>((int)cand.size(), max_neighbors);
    std::partial_sort(cand.begin(), cand.begin() + keep, cand.end());
    int32_t* row = out_edges + (size_t)i * max_neighbors;
    for (int j = 0; j < keep; ++j) row[j] = cand[j].second;
    for (int j = keep; j < max_neighbors; ++j) row[j] = -1;
  }
}

// --------------------------------------------------------------------- //
// node_and_edge_clean_up: iteratively invalidate nodes with <= 1 valid
// neighbor until a fixed point (valid_mask is in/out, 0/1).
void graph_node_and_edge_clean_up(const int32_t* edges, int32_t n_nodes,
                                  int32_t max_neighbors, uint8_t* valid_mask) {
  bool changed = true;
  while (changed) {
    changed = false;
    for (int i = 0; i < n_nodes; ++i) {
      if (!valid_mask[i]) continue;
      int cnt = 0;
      for (int j = 0; j < max_neighbors; ++j) {
        int nb = edges[(size_t)i * max_neighbors + j];
        if (nb < 0) break;           // rows are front-packed by construction
        if (valid_mask[nb]) ++cnt;
      }
      if (cnt <= 1) {
        valid_mask[i] = 0;
        changed = true;
      }
    }
  }
}

// --------------------------------------------------------------------- //
// compute_clusters: connected components over the UNDIRECTED closure of the
// edge lists. out_clusters gets the component id per node; returns the
// number of components; out_sizes (capacity n_nodes) gets their sizes.
int32_t graph_compute_clusters(const int32_t* edges, int32_t n_nodes,
                               int32_t max_neighbors, int32_t* out_clusters,
                               int32_t* out_sizes) {
  std::vector<std::vector<int32_t>> adj(n_nodes);
  for (int i = 0; i < n_nodes; ++i) {
    for (int j = 0; j < max_neighbors; ++j) {
      int nb = edges[(size_t)i * max_neighbors + j];
      if (nb < 0) break;
      adj[i].push_back(nb);
      adj[nb].push_back(i);
    }
  }
  std::fill(out_clusters, out_clusters + n_nodes, -1);
  int32_t n_clusters = 0;
  std::vector<int32_t> stack;
  for (int i = 0; i < n_nodes; ++i) {
    if (out_clusters[i] != -1) continue;
    int32_t size = 0;
    stack.assign(1, i);
    while (!stack.empty()) {
      int v = stack.back();
      stack.pop_back();
      if (out_clusters[v] != -1) continue;
      out_clusters[v] = n_clusters;
      ++size;
      for (int nb : adj[v])
        if (out_clusters[nb] == -1) stack.push_back(nb);
    }
    out_sizes[n_clusters++] = size;
  }
  return n_clusters;
}

// --------------------------------------------------------------------- //
// compute_pixel_anchors_geodesic: per mesh vertex, the num_anchors nearest
// VALID nodes by geodesic distance (from node_to_vertex, -1 = unreached),
// written at the vertex's pixel with normalized skinning weights.
// anchors pre-filled with -1 by the caller.
void graph_compute_pixel_anchors_geodesic(
    const float* node_to_vertex, const uint8_t* valid_nodes, int32_t n_nodes,
    int32_t n_vertices, const int32_t* vertex_pixels, int32_t height,
    int32_t width, int32_t num_anchors, float node_coverage,
    int32_t* out_anchors, float* out_weights) {
  std::vector<std::pair<float, int32_t>> cand;
  for (int v = 0; v < n_vertices; ++v) {
    int x = vertex_pixels[2 * v], y = vertex_pixels[2 * v + 1];
    cand.clear();
    for (int ni = 0; ni < n_nodes; ++ni) {
      if (!valid_nodes[ni]) continue;
      float d = node_to_vertex[(size_t)ni * n_vertices + v];
      if (d >= 0.f) cand.push_back({d, ni});
    }
    // clamp to the wsum capacity: >64 anchors would smash the stack
    int keep = std::min<int>(std::min<int>((int)cand.size(), num_anchors), 64);
    std::partial_sort(cand.begin(), cand.begin() + keep, cand.end());
    size_t base = ((size_t)y * width + x) * num_anchors;
    float wsum[64];  // bounded: num_anchors clamped to 64 at entry
    for (int j = 0; j < keep; ++j) {
      out_anchors[base + j] = cand[j].second;
      wsum[j] = skin_weight(cand[j].first, node_coverage);
    }
    normalize_or_uniform(wsum, keep);
    for (int j = 0; j < keep; ++j) out_weights[base + j] = wsum[j];
  }
}

// --------------------------------------------------------------------- //
// compute_pixel_anchors_euclidean: per pixel with z > 0, the num_anchors
// euclidean-nearest nodes with normalized skinning weights.
void graph_compute_pixel_anchors_euclidean(
    const float* nodes, int32_t n_nodes, const float* point_image,
    int32_t height, int32_t width, int32_t num_anchors, float node_coverage,
    int32_t* out_anchors, float* out_weights) {
  std::vector<std::pair<float, int32_t>> cand;
  for (int y = 0; y < height; ++y) {
    for (int x = 0; x < width; ++x) {
      V3 p = at(point_image, y * width + x);
      if (p.z <= 0.f) continue;
      cand.clear();
      for (int ni = 0; ni < n_nodes; ++ni) cand.push_back({sq_dist(p, at(nodes, ni)), ni});
      int keep = std::min<int>(std::min<int>((int)cand.size(), num_anchors), 64);
      std::partial_sort(cand.begin(), cand.begin() + keep, cand.end());
      size_t base = ((size_t)y * width + x) * num_anchors;
      float wsum[64];  // bounded: num_anchors clamped to 64 at entry
      for (int j = 0; j < keep; ++j) {
        out_anchors[base + j] = cand[j].second;
        wsum[j] = skin_weight(std::sqrt(cand[j].first), node_coverage);
      }
      normalize_or_uniform(wsum, keep);
      for (int j = 0; j < keep; ++j) out_weights[base + j] = wsum[j];
    }
  }
}

// --------------------------------------------------------------------- //
// update_pixel_anchors: remap anchor ids through mapping[old] = new
// (mapping has n_old entries; -1 anchors pass through).
void graph_update_pixel_anchors(const int32_t* mapping, int32_t n_old,
                                int32_t* anchors, int64_t n_entries) {
  for (int64_t i = 0; i < n_entries; ++i) {
    int32_t a = anchors[i];
    if (a >= 0 && a < n_old) anchors[i] = mapping[a];
  }
}

// --------------------------------------------------------------------- //
// sample_nodes_with_fps: farthest-point sampling starting at index 0;
// candidates closer than min_distance to the selected set are pruned;
// stops at num_samples (<=0 = unlimited) or when the farthest remaining
// candidate is within min_distance. Returns the node count.
int32_t graph_sample_nodes_fps(const float* points, int32_t n, float min_distance,
                               int32_t num_samples, int32_t* out_indices) {
  if (n <= 0) return 0;
  std::vector<int32_t> pool(n);
  for (int i = 0; i < n; ++i) pool[i] = i;
  int pool_n = n;
  std::vector<float> best(n, 1e30f);

  int32_t count = 0;
  int pick = 0;  // position in pool; index 0 first (reference convention)
  for (;;) {
    int cur = pool[pick];
    out_indices[count++] = cur;
    pool[pick] = pool[--pool_n];
    if (num_samples > 0 && count >= num_samples) break;

    V3 pc = at(points, cur);
    pick = -1;
    float best_d = 0.f;
    int i = 0;
    while (i < pool_n) {
      int pi = pool[i];
      float d = std::min(best[pi], dist(pc, at(points, pi)));
      best[pi] = d;
      if (d < min_distance) {
        pool[i] = pool[--pool_n];
        continue;
      }
      if (d > best_d) { best_d = d; pick = i; }
      ++i;
    }
    if (pick < 0 || best_d < min_distance) break;
  }
  return count;
}

// --------------------------------------------------------------------- //
// build_deformation_graph: voxel-hash point adjacency (edge when within
// max_distance), then per-node Dijkstra bounded by 2*node_coverage:
//   * node neighbors: first num_neighbors OTHER nodes reached (the source
//     node itself is reached first and skipped);
//   * per-point anchors: the num_anchors nearest nodes by geodesic
//     distance, with normalized skinning weights.
// neighbor_* sized [k, num_neighbors] (-1 padded); anchor_* sized
// [n, num_anchors] (-1 padded).
void graph_build_deformation_graph(
    const float* points, int32_t n_points, const int32_t* node_indices,
    int32_t n_nodes, int32_t num_neighbors, int32_t num_anchors,
    float max_distance, float node_coverage, int32_t* neighbor_indices,
    float* neighbor_distances, float* neighbor_weights,
    int32_t* anchor_indices, float* anchor_distances, float* anchor_weights) {
  // --- voxel-hash adjacency (cell = max_distance, 27-cell scan) ---
  struct Key {
    int64_t v;
    bool operator==(const Key& o) const { return v == o.v; }
  };
  auto voxel_of = [&](const V3& p) {
    int64_t vx = (int64_t)std::floor(p.x / max_distance);
    int64_t vy = (int64_t)std::floor(p.y / max_distance);
    int64_t vz = (int64_t)std::floor(p.z / max_distance);
    return (vx * 73856093LL) ^ (vy * 19349669LL) ^ (vz * 83492791LL);
  };
  // open-addressing map voxelkey -> bucket id
  size_t cap = 16;
  while (cap < (size_t)n_points * 2) cap <<= 1;
  std::vector<int64_t> hkeys(cap, INT64_MIN);
  std::vector<int32_t> hvals(cap, -1);
  std::vector<std::vector<int32_t>> buckets;
  auto bucket_of = [&](int64_t key, bool insert) -> int32_t {
    size_t i = ((uint64_t)key * 0x9E3779B97F4A7C15ull) & (cap - 1);
    for (;;) {
      if (hkeys[i] == key) return hvals[i];
      if (hkeys[i] == INT64_MIN) {
        if (!insert) return -1;
        hkeys[i] = key;
        hvals[i] = (int32_t)buckets.size();
        buckets.emplace_back();
        return hvals[i];
      }
      i = (i + 1) & (cap - 1);
    }
  };
  for (int i = 0; i < n_points; ++i)
    buckets[bucket_of(voxel_of(at(points, i)), true)].push_back(i);

  std::vector<std::vector<std::pair<int32_t, float>>> edges(n_points);
  for (int i = 0; i < n_points; ++i) {
    V3 p = at(points, i);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          V3 q{p.x + dx * max_distance, p.y + dy * max_distance,
               p.z + dz * max_distance};
          int b = bucket_of(voxel_of(q), false);
          if (b < 0) continue;
          for (int j : buckets[b]) {
            if (i >= j) continue;
            float d = dist(p, at(points, j));
            if (d < max_distance) {
              edges[i].push_back({j, d});
              edges[j].push_back({i, d});
            }
          }
        }
  }

  // --- per-node bounded Dijkstra ---
  std::vector<int32_t> point2node(n_points, -1);
  for (int i = 0; i < n_nodes; ++i) point2node[node_indices[i]] = i;

  std::vector<std::vector<std::pair<float, int32_t>>> point_anchors(n_points);
  std::vector<int32_t> stamp(n_points, -1);
  using QE = std::pair<float, int32_t>;

  for (int ni = 0; ni < n_nodes; ++ni) {
    int32_t* nrow = neighbor_indices + (size_t)ni * num_neighbors;
    float* drow = neighbor_distances + (size_t)ni * num_neighbors;
    float* wrow = neighbor_weights + (size_t)ni * num_neighbors;
    for (int j = 0; j < num_neighbors; ++j) { nrow[j] = -1; drow[j] = 0.f; wrow[j] = 0.f; }

    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> heap;
    heap.push({0.f, node_indices[ni]});
    int found = 0;

    while (!heap.empty()) {
      auto [d, x] = heap.top();
      heap.pop();
      if (stamp[x] == ni) continue;
      stamp[x] = ni;

      int nid = point2node[x];
      if (nid >= 0 && nid != ni && found < num_neighbors) {
        nrow[found] = nid;
        drow[found] = d;
        wrow[found] = skin_weight(d, node_coverage);
        ++found;
      }
      point_anchors[x].push_back({d, ni});

      for (const auto& e : edges[x]) {
        if (stamp[e.first] == ni) continue;
        float nd = d + e.second;
        if (nd > 2.0f * node_coverage) continue;
        heap.push({nd, e.first});
      }
    }
  }

  // --- per-point anchors ---
  for (int i = 0; i < n_points; ++i) {
    int32_t* arow = anchor_indices + (size_t)i * num_anchors;
    float* adrow = anchor_distances + (size_t)i * num_anchors;
    float* awrow = anchor_weights + (size_t)i * num_anchors;
    for (int j = 0; j < num_anchors; ++j) { arow[j] = -1; adrow[j] = 0.f; awrow[j] = 0.f; }
    auto& cand = point_anchors[i];
    if (cand.empty()) continue;
    int keep = std::min<int>((int)cand.size(), num_anchors);
    std::partial_sort(cand.begin(), cand.begin() + keep, cand.end());
    for (int j = 0; j < keep; ++j) {
      arow[j] = cand[j].second;
      adrow[j] = cand[j].first;
      awrow[j] = skin_weight(cand[j].first, node_coverage);
    }
    normalize_or_uniform(awrow, keep);
  }
}

}  // extern "C"
