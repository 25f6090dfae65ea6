// Multi-threaded exact Euclidean distance transform (Felzenszwalb &
// Huttenlocher separable parabola-envelope algorithm), anisotropy-aware.
//
// Native replacement for the reference's `edt` pip dependency (the only
// C++ component in the reference's dependency set used by its own code:
// ffn/inference/seed.py:27). Exposed to Python via ctypes
// (ffn_tpu/native/__init__.py); build with ffn_tpu/native/build.py.
//
// API: edt_f32(binary uint8[n], shape[3], anisotropy[3], out float32[n],
//              n_threads)
//   Computes, for every nonzero voxel, the distance to the nearest zero
//   voxel; 0 elsewhere. If the array has no zero voxel, all distances are
//   +inf (matching the edt package).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

// 1D squared distance transform under weight w (lower envelope of
// parabolas). f: input squared distances, d: output, n: length.
// v, z: scratch of size n and n+1.
void dt1d(const float* f, float* d, int n, float w2, int* v, float* z) {
  int k = -1;
  float s = 0.0f;
  for (int q = 0; q < n; q++) {
    if (f[q] == kInf) continue;  // only finite parabolas enter the envelope
    while (k >= 0) {
      int p = v[k];
      s = ((f[q] + w2 * q * q) - (f[p] + w2 * p * p)) /
          (2 * w2 * (q - p));
      if (s <= z[k]) {
        k--;
      } else {
        break;
      }
    }
    k++;
    v[k] = q;
    z[k] = (k == 0) ? -kInf : s;
    z[k + 1] = kInf;
  }
  if (k < 0) {
    for (int q = 0; q < n; q++) d[q] = kInf;
    return;
  }
  int kk = 0;
  for (int q = 0; q < n; q++) {
    while (z[kk + 1] < q) kk++;
    int p = v[kk];
    d[q] = w2 * (q - p) * (q - p) + f[p];
  }
}

struct Shape {
  int64_t z, y, x;
};

void parallel_for(int64_t n, int n_threads,
                  const std::function<void(int64_t, int64_t)>& fn) {
  if (n_threads <= 1 || n < 2) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

void edt_f32(const uint8_t* binary, const int64_t* shape,
             const float* anisotropy, float* out, int n_threads) {
  Shape s{shape[0], shape[1], shape[2]};
  const int64_t plane = s.y * s.x;
  const float wz = anisotropy[0] * anisotropy[0];
  const float wy = anisotropy[1] * anisotropy[1];
  const float wx = anisotropy[2] * anisotropy[2];

  // Init: 0 at background, inf at foreground.
  const int64_t total = s.z * plane;
  parallel_for(total, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) out[i] = binary[i] ? kInf : 0.0f;
  });

  // Pass 1: along x (contiguous rows).
  parallel_for(s.z * s.y, n_threads, [&](int64_t lo, int64_t hi) {
    std::vector<float> f(s.x), d(s.x), z(s.x + 1);
    std::vector<int> v(s.x);
    for (int64_t row = lo; row < hi; row++) {
      float* base = out + row * s.x;
      std::memcpy(f.data(), base, s.x * sizeof(float));
      dt1d(f.data(), d.data(), s.x, wx, v.data(), z.data());
      std::memcpy(base, d.data(), s.x * sizeof(float));
    }
  });

  // Pass 2: along y.
  parallel_for(s.z, n_threads, [&](int64_t zlo, int64_t zhi) {
    std::vector<float> f(s.y), d(s.y), z(s.y + 1);
    std::vector<int> v(s.y);
    for (int64_t zz = zlo; zz < zhi; zz++) {
      for (int64_t xx = 0; xx < s.x; xx++) {
        float* base = out + zz * plane + xx;
        for (int64_t yy = 0; yy < s.y; yy++) f[yy] = base[yy * s.x];
        dt1d(f.data(), d.data(), s.y, wy, v.data(), z.data());
        for (int64_t yy = 0; yy < s.y; yy++) base[yy * s.x] = d[yy];
      }
    }
  });

  // Pass 3: along z.
  parallel_for(s.y, n_threads, [&](int64_t ylo, int64_t yhi) {
    std::vector<float> f(s.z), d(s.z), z(s.z + 1);
    std::vector<int> v(s.z);
    for (int64_t yy = ylo; yy < yhi; yy++) {
      for (int64_t xx = 0; xx < s.x; xx++) {
        float* base = out + yy * s.x + xx;
        for (int64_t zz = 0; zz < s.z; zz++) f[zz] = base[zz * plane];
        dt1d(f.data(), d.data(), s.z, wz, v.data(), z.data());
        for (int64_t zz = 0; zz < s.z; zz++) base[zz * plane] = d[zz];
      }
    }
  });

  // Sqrt.
  parallel_for(total, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) out[i] = std::sqrt(out[i]);
  });
}

}  // extern "C"
