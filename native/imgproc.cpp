// Native image preprocessing for the data pipeline.
//
// TPU-native counterpart of the host-side work the reference delegates
// to native libraries (decord/PyAV decode + HF image processors;
// reference: mantis/train/data.py:507-560, processing_llava.py:231-252).
// The device sustains ~185 img/s encoded; PIL-based preprocessing costs
// several ms/image on the host and becomes the pipeline bottleneck —
// this library does batched resize + normalize + HWC->CHW in
// OpenMP-parallel C++.
//
// Exact spec (tested against a numpy reference implementation):
//   - bilinear resize with half-pixel centers (align_corners=false)
//   - out[c,y,x] = (in[y,x,c]/255 - mean[c]) / std[c]
//
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Resize one uint8 HWC image bilinearly and emit normalized f32 CHW.
void resize_normalize_u8_to_chw(
    const uint8_t* src, int sh, int sw, int channels,
    float* dst, int dh, int dw,
    const float* mean, const float* std_) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  float inv_std[8];
  for (int c = 0; c < channels; ++c) inv_std[c] = 1.0f / std_[c];
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy < 0 ? 0 : fy);
    y0 = std::min(y0, sh - 1);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - static_cast<float>(y0);
    wy = wy < 0 ? 0.f : (wy > 1 ? 1.f : wy);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx < 0 ? 0 : fx);
      x0 = std::min(x0, sw - 1);
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - static_cast<float>(x0);
      wx = wx < 0 ? 0.f : (wx > 1 ? 1.f : wx);
      for (int c = 0; c < channels; ++c) {
        const float p00 = src[(y0 * sw + x0) * channels + c];
        const float p01 = src[(y0 * sw + x1) * channels + c];
        const float p10 = src[(y1 * sw + x0) * channels + c];
        const float p11 = src[(y1 * sw + x1) * channels + c];
        const float top = p00 + (p01 - p00) * wx;
        const float bot = p10 + (p11 - p10) * wx;
        const float v = (top + (bot - top) * wy) * (1.0f / 255.0f);
        dst[(c * dh + y) * dw + x] = (v - mean[c]) * inv_std[c];
      }
    }
  }
}

// Batched variant: n images, each sh x sw x channels, contiguous.
void batch_resize_normalize(
    const uint8_t* src, int n, int sh, int sw, int channels,
    float* dst, int dh, int dw,
    const float* mean, const float* std_) {
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    resize_normalize_u8_to_chw(
        src + static_cast<int64_t>(i) * sh * sw * channels,
        sh, sw, channels,
        dst + static_cast<int64_t>(i) * channels * dh * dw,
        dh, dw, mean, std_);
  }
}

// Fuyu-style patchify: f32 CHW-normalized canvas -> [rows*cols, c*p*p]
// rows of channel-last flattened patches (reference HF Fuyu layout,
// mantis_tpu/models/mfuyu/model.py patchify()).
void patchify_hwc(
    const float* canvas, int h, int w, int channels, int patch,
    float* dst) {
  const int rows = h / patch, cols = w / patch;
#pragma omp parallel for schedule(static)
  for (int r = 0; r < rows; ++r) {
    for (int cidx = 0; cidx < cols; ++cidx) {
      float* out = dst + (static_cast<int64_t>(r) * cols + cidx)
                   * patch * patch * channels;
      for (int py = 0; py < patch; ++py) {
        const float* row = canvas
            + ((static_cast<int64_t>(r) * patch + py) * w
               + cidx * patch) * channels;
        std::memcpy(out + py * patch * channels, row,
                    sizeof(float) * patch * channels);
      }
    }
  }
}

}  // extern "C"
