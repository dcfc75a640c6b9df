// Marching-tetrahedra isosurface extraction (native fast path).
//
// C ABI consumed via ctypes from rise_sdf_tpu/ops/mcubes_native.py.
// Algorithm matches the numpy reference in rise_sdf_tpu/ops/mcubes.py:
// each active cube (sign change) splits into 6 tets around the 0-7
// diagonal; each tet emits 0-2 triangles with vertices interpolated on
// edges; vertices dedup'd globally by (min_gid, max_gid) edge key.
//
// Build: make -C native   (produces libmcubes.so)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Result {
  std::vector<float> verts;     // 3 * n_verts
  std::vector<int64_t> faces;   // 3 * n_faces
};

const int kTets[6][4] = {
    {0, 5, 1, 7}, {0, 1, 3, 7}, {0, 3, 2, 7},
    {0, 2, 6, 7}, {0, 6, 4, 7}, {0, 4, 5, 7},
};

// corner i offsets: x=(i>>2)&1, y=(i>>1)&1, z=i&1

inline int64_t edge_key(int64_t a, int64_t b, int64_t n) {
  if (a > b) std::swap(a, b);
  return a * n + b;
}

}  // namespace

extern "C" {

// Returns an opaque handle; query counts then copy out.
void* mcubes_run(const float* level, int64_t rx, int64_t ry, int64_t rz,
                 float threshold) {
  auto* res = new Result();
  std::unordered_map<int64_t, int64_t> edge_to_vert;
  const int64_t n_total = rx * ry * rz;

  auto f = [&](int64_t x, int64_t y, int64_t z) -> float {
    return level[(x * ry + y) * rz + z] - threshold;
  };
  auto gid = [&](int64_t x, int64_t y, int64_t z) -> int64_t {
    return (x * ry + y) * rz + z;
  };

  auto emit_vertex = [&](int64_t ga, int64_t gb, float va, float vb) -> int64_t {
    int64_t key = edge_key(ga, gb, n_total);
    auto it = edge_to_vert.find(key);
    if (it != edge_to_vert.end()) return it->second;
    float denom = vb - va;
    float t = (std::abs(denom) > 1e-12f) ? (-va / denom) : 0.5f;
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    // decode gids to coordinates
    int64_t az = ga % rz, ay = (ga / rz) % ry, ax = ga / (rz * ry);
    int64_t bz = gb % rz, by = (gb / rz) % ry, bx = gb / (rz * ry);
    int64_t idx = static_cast<int64_t>(res->verts.size() / 3);
    res->verts.push_back(ax + t * (bx - ax));
    res->verts.push_back(ay + t * (by - ay));
    res->verts.push_back(az + t * (bz - az));
    edge_to_vert.emplace(key, idx);
    return idx;
  };

  for (int64_t x = 0; x < rx - 1; ++x) {
    for (int64_t y = 0; y < ry - 1; ++y) {
      for (int64_t z = 0; z < rz - 1; ++z) {
        float cv[8];
        int64_t cg[8];
        int inside = 0;
        for (int i = 0; i < 8; ++i) {
          int64_t cx = x + ((i >> 2) & 1);
          int64_t cy = y + ((i >> 1) & 1);
          int64_t cz = z + (i & 1);
          cv[i] = f(cx, cy, cz);
          cg[i] = gid(cx, cy, cz);
          inside += cv[i] < 0.f;
        }
        if (inside == 0 || inside == 8) continue;
        for (int t = 0; t < 6; ++t) {
          const int* tet = kTets[t];
          float tv[4];
          int64_t tg[4];
          int mask = 0;
          for (int i = 0; i < 4; ++i) {
            tv[i] = cv[tet[i]];
            tg[i] = cg[tet[i]];
            if (tv[i] < 0.f) mask |= 1 << i;
          }
          if (mask == 0 || mask == 15) continue;
          int in[4], out[4], ni = 0, no = 0;
          for (int i = 0; i < 4; ++i) {
            if (mask & (1 << i)) in[ni++] = i; else out[no++] = i;
          }
          auto V = [&](int a, int b) {
            return emit_vertex(tg[a], tg[b], tv[a], tv[b]);
          };
          if (ni == 1) {
            int a = in[0];
            int64_t v0 = V(a, out[0]), v1 = V(a, out[1]), v2 = V(a, out[2]);
            res->faces.insert(res->faces.end(), {v0, v1, v2});
          } else if (ni == 3) {
            int a = out[0];
            int64_t v0 = V(in[0], a), v1 = V(in[1], a), v2 = V(in[2], a);
            res->faces.insert(res->faces.end(), {v0, v2, v1});
          } else {  // ni == 2
            int i0 = in[0], i1 = in[1], o0 = out[0], o1 = out[1];
            int64_t e00 = V(i0, o0), e01 = V(i0, o1);
            int64_t e10 = V(i1, o0), e11 = V(i1, o1);
            res->faces.insert(res->faces.end(), {e00, e01, e11});
            res->faces.insert(res->faces.end(), {e00, e11, e10});
          }
        }
      }
    }
  }
  return res;
}

int64_t mcubes_num_verts(void* handle) {
  return static_cast<Result*>(handle)->verts.size() / 3;
}

int64_t mcubes_num_faces(void* handle) {
  return static_cast<Result*>(handle)->faces.size() / 3;
}

void mcubes_copy(void* handle, float* verts_out, int64_t* faces_out) {
  auto* res = static_cast<Result*>(handle);
  std::memcpy(verts_out, res->verts.data(), res->verts.size() * sizeof(float));
  std::memcpy(faces_out, res->faces.data(),
              res->faces.size() * sizeof(int64_t));
}

void mcubes_free(void* handle) { delete static_cast<Result*>(handle); }

}  // extern "C"
