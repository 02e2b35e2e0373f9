// Isosurface extraction for SDF voxel grids via marching tetrahedra.
//
// Native-runtime component of qsp_slam_tpu: the reference delegates mesh
// extraction to skimage.measure.marching_cubes
// (reconstruct/utils.py:98-141).  This image has no skimage, and the
// algorithm is branchy/irregular — a poor fit for XLA — so it lives in C++
// behind a ctypes seam.  Marching tetrahedra is used instead of classic
// marching cubes: each cell splits into 6 tets whose 16 sign cases reduce to
// pure logic (no 256-entry tables), produces a watertight, hole-free surface,
// and shares vertices through an edge hash.
//
// C ABI:
//   int marching_cubes(const float* sdf, int nx, int ny, int nz,
//                      float iso, float* out_verts /* cap*3 */,
//                      int* out_tris /* cap*3 */, int vert_cap, int tri_cap,
//                      int* n_verts, int* n_tris);
// Returns 0 on success, 1 if capacity exceeded (results truncated).
// Vertices are in voxel-index coordinates (x, y, z); callers rescale.

#include <cstdint>
#include <unordered_map>

namespace {

struct V3 {
  float x, y, z;
};

// The 6-tetrahedra decomposition of a cube (corner indices 0..7 with
// corner c at offset (c&1, (c>>1)&1, (c>>2)&1)).  All tets share the main
// diagonal 0-7, which guarantees face-consistent triangulation between
// neighboring cells.
static const int kTets[6][4] = {
    {0, 5, 1, 7}, {0, 1, 3, 7}, {0, 3, 2, 7},
    {0, 2, 6, 7}, {0, 6, 4, 7}, {0, 4, 5, 7},
};

inline int64_t corner_id(int x, int y, int z, int nx, int ny) {
  return (static_cast<int64_t>(z) * ny + y) * nx + x;
}

}  // namespace

extern "C" int marching_cubes(const float* sdf, int nx, int ny, int nz,
                              float iso, float* out_verts, int* out_tris,
                              int vert_cap, int tri_cap, int* n_verts,
                              int* n_tris) {
  auto sample = [&](int64_t cid) -> float { return sdf[cid]; };

  std::unordered_map<int64_t, int> edge_to_vert;
  edge_to_vert.reserve(1 << 16);
  int nv = 0, nt = 0;
  bool overflow = false;

  // Emit (or reuse) the interpolated vertex on edge (ca, cb).
  auto emit_vertex = [&](int64_t ca, V3 pa, float va, int64_t cb, V3 pb,
                         float vb) -> int {
    if (cb < ca) {
      std::swap(ca, cb);
      std::swap(pa, pb);
      std::swap(va, vb);
    }
    const int64_t ncorners = static_cast<int64_t>(nx) * ny * nz;
    int64_t key = ca * ncorners + cb;  // collision-free pair key
    auto it = edge_to_vert.find(key);
    if (it != edge_to_vert.end()) return it->second;
    if (nv >= vert_cap) {
      overflow = true;
      return 0;
    }
    float denom = vb - va;
    float t = (denom == 0.0f) ? 0.5f : (iso - va) / denom;
    t = t < 0.0f ? 0.0f : (t > 1.0f ? 1.0f : t);
    out_verts[nv * 3 + 0] = pa.x + t * (pb.x - pa.x);
    out_verts[nv * 3 + 1] = pa.y + t * (pb.y - pa.y);
    out_verts[nv * 3 + 2] = pa.z + t * (pb.z - pa.z);
    edge_to_vert.emplace(key, nv);
    return nv++;
  };

  // Emit a triangle oriented so its normal has positive dot with `dir`
  // (the local inside->outside direction), giving globally consistent
  // outward winding.
  auto emit_tri = [&](int a, int b, int c, V3 dir) {
    if (nt >= tri_cap) {
      overflow = true;
      return;
    }
    const float* pa = &out_verts[a * 3];
    const float* pb = &out_verts[b * 3];
    const float* pc = &out_verts[c * 3];
    float e1[3] = {pb[0] - pa[0], pb[1] - pa[1], pb[2] - pa[2]};
    float e2[3] = {pc[0] - pa[0], pc[1] - pa[1], pc[2] - pa[2]};
    float n0 = e1[1] * e2[2] - e1[2] * e2[1];
    float n1 = e1[2] * e2[0] - e1[0] * e2[2];
    float n2 = e1[0] * e2[1] - e1[1] * e2[0];
    if (n0 * dir.x + n1 * dir.y + n2 * dir.z < 0.0f) std::swap(b, c);
    out_tris[nt * 3 + 0] = a;
    out_tris[nt * 3 + 1] = b;
    out_tris[nt * 3 + 2] = c;
    ++nt;
  };

  for (int z = 0; z + 1 < nz; ++z) {
    for (int y = 0; y + 1 < ny; ++y) {
      for (int x = 0; x + 1 < nx; ++x) {
        int64_t cid[8];
        V3 pos[8];
        float val[8];
        bool any_neg = false, any_pos = false;
        for (int c = 0; c < 8; ++c) {
          int cx = x + (c & 1), cy = y + ((c >> 1) & 1), cz = z + ((c >> 2) & 1);
          cid[c] = corner_id(cx, cy, cz, nx, ny);
          pos[c] = {static_cast<float>(cx), static_cast<float>(cy),
                    static_cast<float>(cz)};
          val[c] = sample(cid[c]);
          (val[c] < iso ? any_neg : any_pos) = true;
        }
        if (!any_neg || !any_pos) continue;

        for (const auto& tet : kTets) {
          int idx[4] = {tet[0], tet[1], tet[2], tet[3]};
          // Classify corners: inside = below iso.
          int inside[4], ni = 0;
          for (int k = 0; k < 4; ++k)
            if (val[idx[k]] < iso) inside[ni++] = k;
          if (ni == 0 || ni == 4) continue;

          // Order helpers.
          auto vert_on = [&](int ka, int kb) {
            int a = idx[ka], b = idx[kb];
            return emit_vertex(cid[a], pos[a], val[a], cid[b], pos[b], val[b]);
          };

          // inside->outside direction for winding orientation.
          auto centroid_dir = [&]() -> V3 {
            V3 ci{0, 0, 0}, co{0, 0, 0};
            int nin = 0, nout = 0;
            for (int k = 0; k < 4; ++k) {
              const V3& p = pos[idx[k]];
              if (val[idx[k]] < iso) {
                ci.x += p.x; ci.y += p.y; ci.z += p.z; ++nin;
              } else {
                co.x += p.x; co.y += p.y; co.z += p.z; ++nout;
              }
            }
            return {co.x / nout - ci.x / nin, co.y / nout - ci.y / nin,
                    co.z / nout - ci.z / nin};
          };
          V3 dir = centroid_dir();

          if (ni == 1) {
            int a = inside[0];
            int o[3], m = 0;
            for (int k = 0; k < 4; ++k)
              if (k != a) o[m++] = k;
            emit_tri(vert_on(a, o[0]), vert_on(a, o[1]), vert_on(a, o[2]), dir);
          } else if (ni == 3) {
            int a = -1;  // the single outside corner
            bool is_in[4] = {false, false, false, false};
            for (int k = 0; k < ni; ++k) is_in[inside[k]] = true;
            for (int k = 0; k < 4; ++k)
              if (!is_in[k]) a = k;
            int o[3], m = 0;
            for (int k = 0; k < 4; ++k)
              if (k != a) o[m++] = k;
            emit_tri(vert_on(o[0], a), vert_on(o[1], a), vert_on(o[2], a), dir);
          } else {  // ni == 2 -> quad split into two triangles
            int a = inside[0], b = inside[1];
            int o[2], m = 0;
            for (int k = 0; k < 4; ++k)
              if (k != a && k != b) o[m++] = k;
            int v00 = vert_on(a, o[0]);
            int v01 = vert_on(a, o[1]);
            int v10 = vert_on(b, o[0]);
            int v11 = vert_on(b, o[1]);
            emit_tri(v00, v10, v11, dir);
            emit_tri(v00, v11, v01, dir);
          }
        }
      }
    }
  }
  *n_verts = nv;
  *n_tris = nt;
  return overflow ? 1 : 0;
}
