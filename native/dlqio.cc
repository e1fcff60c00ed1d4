// dlqio — native runtime utilities for dlq_tpu.
//
// TPU-native counterpart of the reference's C++ runtime layer
// (cpp/fp32/runtime/utils.hpp: binary tensor IO, validation, timing) and of
// its host-side data path (tools/preprocess_to_bin.py). On TPU the compute
// lives in XLA/Pallas, so the native layer's job is everything AROUND the
// device: fast parallel file IO for weight/fixture .bin stores, image
// preprocessing for the input pipeline (resize/crop/normalize at data-loader
// throughput), and nibble packing for int4 weight stores.
//
// Exposed as a plain C ABI consumed via ctypes (dlq_tpu/native.py).
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC -pthread)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Binary tensor IO (utils.hpp load_bin_f32/save_bin_f32 capability, with
// size validation and without the per-call allocation churn).
// Returns 0 on success, negative error codes otherwise.
// ---------------------------------------------------------------------------

int dlq_read_f32(const char* path, float* out, int64_t expect_elems) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  int64_t bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (bytes != expect_elems * (int64_t)sizeof(float)) {
    std::fclose(f);
    return -2;  // size mismatch: the reference exits(1) here (utils.hpp:52-58)
  }
  int64_t got = (int64_t)std::fread(out, sizeof(float), expect_elems, f);
  std::fclose(f);
  return got == expect_elems ? 0 : -3;
}

int dlq_write_f32(const char* path, const float* data, int64_t elems) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  int64_t put = (int64_t)std::fwrite(data, sizeof(float), elems, f);
  std::fclose(f);
  return put == elems ? 0 : -3;
}

// Parallel multi-file reader: loads `n` equally-typed f32 files into one
// contiguous arena concurrently (weight-store cold-start path; the reference
// reloaded every weight per process launch, SURVEY §3.4 — we amortize with
// threads instead).
int dlq_read_f32_many(const char** paths, const int64_t* elems, int n,
                      float* arena, const int64_t* offsets, int threads) {
  std::atomic<int> next(0), err(0);
  auto work = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      int r = dlq_read_f32(paths[i], arena + offsets[i], elems[i]);
      if (r != 0) err.store(r);
    }
  };
  int t = threads > 0 ? threads : (int)std::thread::hardware_concurrency();
  if (t > n) t = n;
  std::vector<std::thread> pool;
  for (int i = 0; i < t; i++) pool.emplace_back(work);
  for (auto& th : pool) th.join();
  return err.load();
}

// ---------------------------------------------------------------------------
// Image preprocessing: HWC uint8 -> bilinear shorter-side resize ->
// center-crop -> /255 -> mean/std normalize -> fp32 NHWC.
// Mirrors tools/preprocess_to_bin.py:8-44 semantics, vectorized + threaded
// over a batch (the input-pipeline hot loop on multi-host inference).
// ---------------------------------------------------------------------------

static inline float lerp(float a, float b, float t) { return a + (b - a) * t; }

static void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                               float* dst, int dh, int dw) {
  // align_corners=false convention (matches PIL/torchvision bilinear grid)
  float ry = (float)sh / dh, rx = (float)sw / dw;
  for (int y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * ry - 0.5f;
    int y0 = (int)std::floor(fy);
    float ty = fy - y0;
    int y1 = y0 + 1;
    if (y0 < 0) y0 = 0;
    if (y1 >= sh) y1 = sh - 1;
    for (int x = 0; x < dw; x++) {
      float fx = (x + 0.5f) * rx - 0.5f;
      int x0 = (int)std::floor(fx);
      float tx = fx - x0;
      int x1 = x0 + 1;
      if (x0 < 0) x0 = 0;
      if (x1 >= sw) x1 = sw - 1;
      for (int ch = 0; ch < c; ch++) {
        float v00 = src[(y0 * sw + x0) * c + ch];
        float v01 = src[(y0 * sw + x1) * c + ch];
        float v10 = src[(y1 * sw + x0) * c + ch];
        float v11 = src[(y1 * sw + x1) * c + ch];
        dst[(y * dw + x) * c + ch] = lerp(lerp(v00, v01, tx), lerp(v10, v11, tx), ty);
      }
    }
  }
}

// One image: src HWC uint8 [sh, sw, 3] -> out HWC fp32 [size, size, 3].
int dlq_preprocess_image(const uint8_t* src, int sh, int sw, float* out,
                         int resize_to, int size, const float* mean,
                         const float* std3) {
  if (sh <= 0 || sw <= 0 || resize_to < size) return -1;
  int dh, dw;
  if (sw <= sh) {
    dw = resize_to;
    dh = (int)std::lround((double)sh * resize_to / sw);
  } else {
    dh = resize_to;
    dw = (int)std::lround((double)sw * resize_to / sh);
  }
  std::vector<float> resized((size_t)dh * dw * 3);
  resize_bilinear_u8(src, sh, sw, 3, resized.data(), dh, dw);
  int top = (dh - size) / 2, left = (dw - size) / 2;
  for (int y = 0; y < size; y++) {
    for (int x = 0; x < size; x++) {
      for (int ch = 0; ch < 3; ch++) {
        float v = resized[((y + top) * dw + (x + left)) * 3 + ch] / 255.0f;
        out[(y * size + x) * 3 + ch] = (v - mean[ch]) / std3[ch];
      }
    }
  }
  return 0;
}

// Batch variant: `n` images with per-image dims, threaded.
int dlq_preprocess_batch(const uint8_t** srcs, const int* shs, const int* sws,
                         int n, float* out, int resize_to, int size,
                         const float* mean, const float* std3, int threads) {
  std::atomic<int> next(0), err(0);
  int64_t stride = (int64_t)size * size * 3;
  auto work = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      int r = dlq_preprocess_image(srcs[i], shs[i], sws[i], out + i * stride,
                                   resize_to, size, mean, std3);
      if (r != 0) err.store(r);
    }
  };
  int t = threads > 0 ? threads : (int)std::thread::hardware_concurrency();
  if (t > n) t = n;
  std::vector<std::thread> pool;
  for (int i = 0; i < t; i++) pool.emplace_back(work);
  for (auto& th : pool) th.join();
  return err.load();
}

// ---------------------------------------------------------------------------
// int4 nibble packing (axis-0 pairs; matches quant.quantize.pack_int4).
// ---------------------------------------------------------------------------

int dlq_pack_int4(const int8_t* q, int64_t rows, int64_t cols, uint8_t* out) {
  if (rows % 2 != 0) return -1;
  int64_t orows = rows / 2;
  for (int64_t r = 0; r < orows; r++) {
    const int8_t* lo = q + (2 * r) * cols;
    const int8_t* hi = q + (2 * r + 1) * cols;
    uint8_t* o = out + r * cols;
    for (int64_t cidx = 0; cidx < cols; cidx++) {
      o[cidx] = (uint8_t)((lo[cidx] & 0xF) | ((hi[cidx] & 0xF) << 4));
    }
  }
  return 0;
}

int dlq_unpack_int4(const uint8_t* packed, int64_t orows, int64_t cols, int8_t* out) {
  for (int64_t r = 0; r < orows; r++) {
    const uint8_t* p = packed + r * cols;
    int8_t* lo = out + (2 * r) * cols;
    int8_t* hi = out + (2 * r + 1) * cols;
    for (int64_t cidx = 0; cidx < cols; cidx++) {
      int8_t l = (int8_t)(p[cidx] & 0xF);
      int8_t h = (int8_t)((p[cidx] >> 4) & 0xF);
      lo[cidx] = l >= 8 ? l - 16 : l;
      hi[cidx] = h >= 8 ? h - 16 : h;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Monotonic timer (utils.hpp Timer / v3.c clock_gettime capability).
// ---------------------------------------------------------------------------

double dlq_now() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + ts.tv_nsec * 1e-9;
}

int dlq_version() { return 1; }

}  // extern "C"
