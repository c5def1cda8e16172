// Host-side data-pipeline kernels for the TPU feed path.
//
// The reference repo has no native code (SURVEY.md §2.9) — its data loading
// is torchvision/PIL in the Python loop. At the TPU build's throughput target
// (hundreds of explanations/sec/chip) host preprocessing becomes the
// bottleneck, so the hot host ops live here:
//
//   * normalize_chw: uint8 HWC -> normalized float32 CHW (mean/std),
//     multithreaded over the batch;
//   * resize_bilinear_chw: float32 CHW bilinear resize (align_corners=false,
//     matching jax.image.resize/torch default semantics);
//
// Exposed as a plain C ABI consumed via ctypes
// (transformer_explainability_tpu/native/__init__.py). Build: `make -C
// transformer_explainability_tpu/native` or the on-demand compile in the
// Python wrapper.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

void normalize_range(const uint8_t* src, float* dst, int64_t b0, int64_t b1,
                     int64_t H, int64_t W, const float* mean,
                     const float* inv_std) {
  const int64_t plane = H * W;
  for (int64_t b = b0; b < b1; ++b) {
    const uint8_t* s = src + b * plane * 3;
    float* d = dst + b * plane * 3;
    for (int64_t p = 0; p < plane; ++p) {
      const uint8_t* px = s + p * 3;  // HWC
      d[0 * plane + p] = (px[0] * (1.0f / 255.0f) - mean[0]) * inv_std[0];
      d[1 * plane + p] = (px[1] * (1.0f / 255.0f) - mean[1]) * inv_std[1];
      d[2 * plane + p] = (px[2] * (1.0f / 255.0f) - mean[2]) * inv_std[2];
    }
  }
}

void parallel_for_batch(int64_t B, int threads,
                        const std::function<void(int64_t, int64_t)>& fn) {
  if (threads <= 1 || B <= 1) {
    fn(0, B);
    return;
  }
  threads = std::min<int64_t>(threads, B);
  std::vector<std::thread> pool;
  pool.reserve(threads);
  const int64_t chunk = (B + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t b0 = t * chunk;
    const int64_t b1 = std::min<int64_t>(B, b0 + chunk);
    if (b0 >= b1) break;
    pool.emplace_back(fn, b0, b1);
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// uint8 (B, H, W, 3) -> float32 (B, 3, H, W), (x/255 - mean) / std.
void te_normalize_chw(const uint8_t* src, float* dst, int64_t B, int64_t H,
                      int64_t W, const float* mean, const float* std_,
                      int threads) {
  float inv_std[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
  parallel_for_batch(B, threads, [&](int64_t b0, int64_t b1) {
    normalize_range(src, dst, b0, b1, H, W, mean, inv_std);
  });
}

// float32 (B, C, H, W) -> (B, C, OH, OW), bilinear, align_corners=false.
void te_resize_bilinear_chw(const float* src, float* dst, int64_t B,
                            int64_t C, int64_t H, int64_t W, int64_t OH,
                            int64_t OW, int threads) {
  const float sy = static_cast<float>(H) / OH;
  const float sx = static_cast<float>(W) / OW;
  parallel_for_batch(B * C, threads, [&](int64_t p0, int64_t p1) {
    for (int64_t pc = p0; pc < p1; ++pc) {
      const float* s = src + pc * H * W;
      float* d = dst + pc * OH * OW;
      for (int64_t oy = 0; oy < OH; ++oy) {
        float fy = (oy + 0.5f) * sy - 0.5f;
        fy = std::max(0.0f, std::min(fy, static_cast<float>(H - 1)));
        const int64_t y0 = static_cast<int64_t>(fy);
        const int64_t y1 = std::min<int64_t>(y0 + 1, H - 1);
        const float wy = fy - y0;
        for (int64_t ox = 0; ox < OW; ++ox) {
          float fx = (ox + 0.5f) * sx - 0.5f;
          fx = std::max(0.0f, std::min(fx, static_cast<float>(W - 1)));
          const int64_t x0 = static_cast<int64_t>(fx);
          const int64_t x1 = std::min<int64_t>(x0 + 1, W - 1);
          const float wx = fx - x0;
          const float top = s[y0 * W + x0] * (1 - wx) + s[y0 * W + x1] * wx;
          const float bot = s[y1 * W + x0] * (1 - wx) + s[y1 * W + x1] * wx;
          d[oy * OW + ox] = top * (1 - wy) + bot * wy;
        }
      }
    }
  });
}

}  // extern "C"
