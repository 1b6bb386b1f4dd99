// Host-side data-path kernels (OpenMP), C ABI for ctypes.
//
// Native equivalent of the reference's pybind `utils_lib`
// (external/utils_lib/python/utils_lib.cpp): velodyne -> depth projection
// with occlusion filtering, and hole-filling depth upsampling. Used by the
// KITTI loader hot path; the numpy backend in data/velodyne.py implements
// identical semantics and serves as the oracle in tests.
//
// Build: see build.py (g++ -O3 -fopenmp -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// velodata: [n, 4] row-major; intr: [3, 4]; m: [4, 4]; out: [height*width]
void generate_depth(const float* velodata, int64_t n, const float* intr,
                    const float* m, int width, int height, int filtering,
                    float filterdiff, float* out) {
  std::vector<float> dmap((size_t)width * height, 0.f);

  // transform + cull + project + z-buffer (sequential: z-buffer races)
  for (int64_t i = 0; i < n; i++) {
    const float* p = velodata + 4 * i;
    float x = m[0] * p[0] + m[1] * p[1] + m[2] * p[2] + m[3] * p[3];
    float y = m[4] * p[0] + m[5] * p[1] + m[6] * p[2] + m[7] * p[3];
    float z = m[8] * p[0] + m[9] * p[1] + m[10] * p[2] + m[11] * p[3];
    if (z < 0.1f) continue;
    float pu = intr[0] * x + intr[1] * y + intr[2] * z + intr[3];
    float pv = intr[4] * x + intr[5] * y + intr[6] * z + intr[7];
    float pw = intr[8] * x + intr[9] * y + intr[10] * z + intr[11];
    int u = (int)(pu / pw - 0.5f);
    int v = (int)(pv / pw - 0.5f);
    if (u < 0 || u >= width || v < 0 || v >= height) continue;
    float& cur = dmap[(size_t)v * width + u];
    if (cur == 0.f || z < cur) cur = z;
  }

  // neighborhood occlusion filter
  std::memset(out, 0, sizeof(float) * (size_t)width * height);
  int o = filtering;
  if (o <= 0) {
    std::memcpy(out, dmap.data(), sizeof(float) * (size_t)width * height);
    return;
  }
#pragma omp parallel for schedule(static)
  for (int v = o; v < height - o - 1; v++) {
    for (int u = o; u < width - o - 1; u++) {
      float z = dmap[(size_t)v * width + u];
      bool bad = false;
      for (int vv = v - o; vv <= v + o && !bad; vv++) {
        for (int uu = u - o; uu <= u + o; uu++) {
          if (vv == v && uu == u) continue;
          float zn = dmap[(size_t)vv * width + uu];
          if (zn == 0.f) continue;
          if ((zn - z) < -filterdiff) { bad = true; break; }
        }
      }
      if (!bad) out[(size_t)v * width + u] = z;
    }
  }
}

// depth: [height, width]; out: same
void upsample_depth(const float* depth, int height, int width, int filtering,
                    float maxdiff, float* out) {
  std::memset(out, 0, sizeof(float) * (size_t)width * height);
  int o = filtering;
#pragma omp parallel for schedule(static)
  for (int v = o; v < height - o - 1; v++) {
    for (int u = o; u < width - o - 1; u++) {
      float z = depth[(size_t)v * width + u];
      if (z != 0.f) { out[(size_t)v * width + u] = z; continue; }
      float max_z = 0.f, min_z = 1e8f, sum_z = 0.f;
      int count = 0;
      for (int vv = v - o; vv <= v + o; vv++) {
        for (int uu = u - o; uu <= u + o; uu++) {
          if (vv == v && uu == u) continue;
          float zn = depth[(size_t)vv * width + uu];
          if (zn == 0.f) continue;
          count++; sum_z += zn;
          if (zn > max_z) max_z = zn;
          if (zn < min_z) min_z = zn;
        }
      }
      if (count == 0) continue;
      if (std::fabs(max_z - min_z) < maxdiff)
        out[(size_t)v * width + u] = sum_z / count;
    }
  }
}

}  // extern "C"
