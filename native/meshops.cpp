// Native mesh operations for lgm_tpu.
//
// TPU-native replacement for the reference's external C++ mesh deps:
// PyMCubes marching cubes (ref: convert.py:13,288) and
// pymeshlab-based clean/decimate via kiui.mesh_utils
// (ref: convert.py:294-296,338-340; SURVEY.md §2b N5/N11).
//
// Isosurface extraction uses marching tetrahedra (6-tet cube split along
// the 0-6 diagonal): the case tables are derived in code instead of the
// 256-entry marching-cubes tri-table, which makes the implementation
// self-contained and verifiable; triangle count is ~2x MC, which the
// decimator then reduces. Vertices on shared edges are welded during
// extraction via an edge-key hash map.
//
// Decimation is uniform-grid vertex clustering: vertices are pooled to
// their cluster centroid and degenerate faces dropped — O(n), adequate
// for the 5e4-face target the reference uses.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

// The 6 tetrahedra sharing the 0-6 main diagonal of a unit cube.
// Cube corner numbering: bit0 = x, bit1 = y, bit2 = z.
static const int kTets[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
    {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6},
};

inline void corner_offset(int corner, int* dx, int* dy, int* dz) {
  // Corners ordered as the usual MC ring: 0:(0,0,0) 1:(1,0,0) 2:(1,1,0)
  // 3:(0,1,0) 4:(0,0,1) 5:(1,0,1) 6:(1,1,1) 7:(0,1,1)
  static const int off[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                                {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
  *dx = off[corner][0];
  *dy = off[corner][1];
  *dz = off[corner][2];
}

struct Extractor {
  const float* grid;
  int nx, ny, nz;
  float iso;
  std::vector<float> verts;
  std::vector<int> faces;
  std::unordered_map<uint64_t, int> edge_to_vert;

  inline float sample(int x, int y, int z) const {
    return grid[(size_t)x * ny * nz + (size_t)y * nz + z];
  }

  inline uint64_t node_id(int x, int y, int z) const {
    return ((uint64_t)x * (ny + 1) + y) * (nz + 1) + z;
  }

  // Vertex on the edge between grid nodes a and b, interpolated to iso.
  int edge_vertex(int ax, int ay, int az, int bx, int by, int bz) {
    uint64_t ka = node_id(ax, ay, az), kb = node_id(bx, by, bz);
    uint64_t key = ka < kb ? (ka << 32 | kb) : (kb << 32 | ka);
    auto it = edge_to_vert.find(key);
    if (it != edge_to_vert.end()) return it->second;
    float va = sample(ax, ay, az), vb = sample(bx, by, bz);
    float t = (iso - va) / (vb - va + 1e-12f);
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    int idx = (int)(verts.size() / 3);
    verts.push_back(ax + t * (bx - ax));
    verts.push_back(ay + t * (by - ay));
    verts.push_back(az + t * (bz - az));
    edge_to_vert.emplace(key, idx);
    return idx;
  }

  void emit_tri(int a, int b, int c) {
    if (a == b || b == c || a == c) return;
    faces.push_back(a);
    faces.push_back(b);
    faces.push_back(c);
  }

  void process_tet(const int cx[4], const int cy[4], const int cz[4],
                   const float v[4]) {
    int mask = 0;
    for (int i = 0; i < 4; i++)
      if (v[i] > iso) mask |= 1 << i;
    if (mask == 0 || mask == 15) return;

    auto ev = [&](int i, int j) {
      return edge_vertex(cx[i], cy[i], cz[i], cx[j], cy[j], cz[j]);
    };

    // Canonical per-case emission; orientation kept consistent with the
    // gradient (inside = value > iso).
    switch (mask) {
      case 1:  emit_tri(ev(0, 1), ev(0, 2), ev(0, 3)); break;
      case 14: emit_tri(ev(0, 1), ev(0, 3), ev(0, 2)); break;
      case 2:  emit_tri(ev(1, 0), ev(1, 3), ev(1, 2)); break;
      case 13: emit_tri(ev(1, 0), ev(1, 2), ev(1, 3)); break;
      case 4:  emit_tri(ev(2, 0), ev(2, 1), ev(2, 3)); break;
      case 11: emit_tri(ev(2, 0), ev(2, 3), ev(2, 1)); break;
      case 8:  emit_tri(ev(3, 0), ev(3, 2), ev(3, 1)); break;
      case 7:  emit_tri(ev(3, 0), ev(3, 1), ev(3, 2)); break;
      case 3:  // 0,1 inside
        emit_tri(ev(0, 2), ev(0, 3), ev(1, 3));
        emit_tri(ev(0, 2), ev(1, 3), ev(1, 2));
        break;
      case 12:
        emit_tri(ev(0, 2), ev(1, 3), ev(0, 3));
        emit_tri(ev(0, 2), ev(1, 2), ev(1, 3));
        break;
      case 5:  // 0,2 inside
        emit_tri(ev(0, 1), ev(2, 3), ev(0, 3));
        emit_tri(ev(0, 1), ev(2, 1), ev(2, 3));
        break;
      case 10:
        emit_tri(ev(0, 1), ev(0, 3), ev(2, 3));
        emit_tri(ev(0, 1), ev(2, 3), ev(2, 1));
        break;
      case 6:  // 1,2 inside
        emit_tri(ev(1, 0), ev(2, 0), ev(2, 3));
        emit_tri(ev(1, 0), ev(2, 3), ev(1, 3));
        break;
      case 9:
        emit_tri(ev(1, 0), ev(2, 3), ev(2, 0));
        emit_tri(ev(1, 0), ev(1, 3), ev(2, 3));
        break;
    }
  }

  void run() {
    int cx[4], cy[4], cz[4];
    float v[4];
    for (int x = 0; x < nx - 1; x++)
      for (int y = 0; y < ny - 1; y++)
        for (int z = 0; z < nz - 1; z++) {
          // Quick reject: all 8 corners on one side.
          bool any_in = false, any_out = false;
          float cv[8];
          for (int c = 0; c < 8; c++) {
            int dx, dy, dz;
            corner_offset(c, &dx, &dy, &dz);
            cv[c] = sample(x + dx, y + dy, z + dz);
            (cv[c] > iso ? any_in : any_out) = true;
          }
          if (!any_in || !any_out) continue;
          for (int t = 0; t < 6; t++) {
            for (int i = 0; i < 4; i++) {
              int c = kTets[t][i], dx, dy, dz;
              corner_offset(c, &dx, &dy, &dz);
              cx[i] = x + dx;
              cy[i] = y + dy;
              cz[i] = z + dz;
              v[i] = cv[c];
            }
            process_tet(cx, cy, cz, v);
          }
        }
  }
};

}  // namespace

extern "C" {

// Returns 0 on success; outputs are allocated by the caller with
// capacities max_verts/max_faces (counts written regardless, so callers
// can retry with larger buffers when the return is 1).
int lgm_marching_tetrahedra(const float* grid, int nx, int ny, int nz,
                            float iso, float* out_verts, int max_verts,
                            int* out_faces, int max_faces, int* n_verts,
                            int* n_faces) {
  Extractor ex;
  ex.grid = grid;
  ex.nx = nx;
  ex.ny = ny;
  ex.nz = nz;
  ex.iso = iso;
  ex.run();
  *n_verts = (int)(ex.verts.size() / 3);
  *n_faces = (int)(ex.faces.size() / 3);
  if (*n_verts > max_verts || *n_faces > max_faces) return 1;
  memcpy(out_verts, ex.verts.data(), ex.verts.size() * sizeof(float));
  memcpy(out_faces, ex.faces.data(), ex.faces.size() * sizeof(int));
  return 0;
}

// Uniform-grid vertex clustering decimation. cell > 0 in mesh units.
int lgm_decimate_cluster(const float* verts, int nv, const int* faces,
                         int nf, float cell, float* out_verts,
                         int* out_faces, int* n_verts, int* n_faces) {
  std::unordered_map<uint64_t, int> cluster_of;
  std::vector<int> vmap(nv);
  std::vector<float> acc;
  std::vector<int> cnt;
  for (int i = 0; i < nv; i++) {
    int64_t gx = (int64_t)std::floor(verts[3 * i + 0] / cell);
    int64_t gy = (int64_t)std::floor(verts[3 * i + 1] / cell);
    int64_t gz = (int64_t)std::floor(verts[3 * i + 2] / cell);
    uint64_t key = ((uint64_t)(gx & 0x1FFFFF) << 42) |
                   ((uint64_t)(gy & 0x1FFFFF) << 21) |
                   (uint64_t)(gz & 0x1FFFFF);
    auto it = cluster_of.find(key);
    int c;
    if (it == cluster_of.end()) {
      c = (int)cnt.size();
      cluster_of.emplace(key, c);
      acc.insert(acc.end(), {0.f, 0.f, 0.f});
      cnt.push_back(0);
    } else {
      c = it->second;
    }
    vmap[i] = c;
    acc[3 * c + 0] += verts[3 * i + 0];
    acc[3 * c + 1] += verts[3 * i + 1];
    acc[3 * c + 2] += verts[3 * i + 2];
    cnt[c]++;
  }
  int ncl = (int)cnt.size();
  for (int c = 0; c < ncl; c++) {
    out_verts[3 * c + 0] = acc[3 * c + 0] / cnt[c];
    out_verts[3 * c + 1] = acc[3 * c + 1] / cnt[c];
    out_verts[3 * c + 2] = acc[3 * c + 2] / cnt[c];
  }
  int m = 0;
  for (int f = 0; f < nf; f++) {
    int a = vmap[faces[3 * f]], b = vmap[faces[3 * f + 1]],
        c = vmap[faces[3 * f + 2]];
    if (a == b || b == c || a == c) continue;
    out_faces[3 * m] = a;
    out_faces[3 * m + 1] = b;
    out_faces[3 * m + 2] = c;
    m++;
  }
  *n_verts = ncl;
  *n_faces = m;
  return 0;
}

// Weld duplicate vertices within eps (hash on quantized position) and
// drop degenerate faces + unreferenced vertices.
int lgm_weld_and_clean(const float* verts, int nv, const int* faces, int nf,
                       float eps, float* out_verts, int* out_faces,
                       int* n_verts, int* n_faces) {
  std::unordered_map<uint64_t, int> seen;
  std::vector<int> vmap(nv);
  std::vector<float> vkeep;
  float inv = eps > 0 ? 1.0f / eps : 1e6f;
  for (int i = 0; i < nv; i++) {
    int64_t gx = (int64_t)std::llround(verts[3 * i + 0] * inv);
    int64_t gy = (int64_t)std::llround(verts[3 * i + 1] * inv);
    int64_t gz = (int64_t)std::llround(verts[3 * i + 2] * inv);
    uint64_t key = ((uint64_t)(gx & 0x1FFFFF) << 42) |
                   ((uint64_t)(gy & 0x1FFFFF) << 21) |
                   (uint64_t)(gz & 0x1FFFFF);
    auto it = seen.find(key);
    if (it == seen.end()) {
      int idx = (int)(vkeep.size() / 3);
      seen.emplace(key, idx);
      vkeep.insert(vkeep.end(),
                   {verts[3 * i], verts[3 * i + 1], verts[3 * i + 2]});
      vmap[i] = idx;
    } else {
      vmap[i] = it->second;
    }
  }
  // Faces with welded indices; drop degenerates.
  std::vector<int> fkeep;
  for (int f = 0; f < nf; f++) {
    int a = vmap[faces[3 * f]], b = vmap[faces[3 * f + 1]],
        c = vmap[faces[3 * f + 2]];
    if (a == b || b == c || a == c) continue;
    fkeep.insert(fkeep.end(), {a, b, c});
  }
  // Remove unreferenced vertices.
  int nv2 = (int)(vkeep.size() / 3);
  std::vector<int> used(nv2, -1);
  int nkeep = 0;
  for (int idx : fkeep)
    if (used[idx] < 0) used[idx] = nkeep++;
  for (int v = 0; v < nv2; v++) {
    if (used[v] < 0) continue;
    out_verts[3 * used[v] + 0] = vkeep[3 * v + 0];
    out_verts[3 * used[v] + 1] = vkeep[3 * v + 1];
    out_verts[3 * used[v] + 2] = vkeep[3 * v + 2];
  }
  for (size_t f = 0; f < fkeep.size(); f++) out_faces[f] = used[fkeep[f]];
  *n_verts = nkeep;
  *n_faces = (int)(fkeep.size() / 3);
  return 0;
}

}  // extern "C"
