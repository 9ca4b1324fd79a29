// Native host data plane: JPEG decode + resize + center-crop.
//
// The online input pipeline (dl_vqa_tpu/data/online.py) needs to feed a
// TPU chip >10k images/sec; the Python/PIL decode path tops out far below
// that per host core. This library does the whole per-image transform in
// C++ (libjpeg decode, PIL-compatible triangle-filter resize of the
// shorter edge, center crop) across an internal thread pool, writing
// directly into a caller-provided uint8 NHWC batch buffer.
//
// Resize semantics: PIL's BILINEAR resampling is a triangle filter whose
// support scales with the downscale factor (i.e. antialiased area
// averaging), NOT naive 4-tap bilinear. We reproduce that algorithm in
// float; outputs match PIL within +-1 uint8 LSB (PIL uses fixed-point
// coefficients), which is far below the fp16 quantization of the
// reference's image cache.
//
// Exposed C ABI (ctypes-friendly):
//   vqa_process_batch_status(paths, n, image_size, central_fraction, out,
//                            n_threads, status) -> number of failed images
//                            (status: n bytes, 0 = ok / 1 = failed)
//   vqa_process_batch(...) — same without the status array
//   vqa_decode_one(path, image_size, central_fraction, out) -> 0/err

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include "transform.h"

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to RGB8. Returns true on success.
bool DecodeJpeg(const char* path, std::vector<uint8_t>* pixels, int* width,
                int* height) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *width = cinfo.output_width;
  *height = cinfo.output_height;
  pixels->resize(size_t(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() + size_t(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  return true;
}

// Decode an in-memory JPEG buffer to RGB8 (serving path). Same error
// discipline as the file variant: libjpeg hard errors longjmp back here
// and report false instead of killing the process.
bool DecodeJpegMem(const uint8_t* data, size_t len, std::vector<uint8_t>* pixels,
                   int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // Decompression-bomb guard (untrusted serving input): a few-hundred-
  // byte JPEG can declare 65535x65535 and force a ~13 GB allocation.
  // Reject above PIL's DecompressionBombError threshold (2x
  // MAX_IMAGE_PIXELS = 178,956,970 px) — the same inputs the Python
  // front's PIL decode refuses.
  constexpr uint64_t kMaxPixels = 178956970;
  if (uint64_t(cinfo.image_width) * cinfo.image_height > kMaxPixels) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_start_decompress(&cinfo);

  *width = cinfo.output_width;
  *height = cinfo.output_height;
  pixels->resize(size_t(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() + size_t(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Precompute PIL-style triangle-filter taps (BILINEAR: support 1.0 scaled
// by the downscale factor) for one axis.
struct ResampleTaps {
  std::vector<int> xmin;          // per output position
  std::vector<int> n;             // taps per output position
  std::vector<std::vector<float>> weights;
};

ResampleTaps ComputeTaps(int in_size, int out_size) {
  ResampleTaps taps;
  taps.xmin.resize(out_size);
  taps.n.resize(out_size);
  taps.weights.resize(out_size);
  const double scale = double(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // BILINEAR support = 1.0
  for (int xout = 0; xout < out_size; ++xout) {
    const double center = (xout + 0.5) * scale;
    const int xmin = int(std::max(0.0, std::floor(center - support)));
    const int xmax = int(std::min(double(in_size), std::ceil(center + support)));
    const int n = xmax - xmin;
    std::vector<float> w(n);
    double wsum = 0.0;
    for (int j = 0; j < n; ++j) {
      double dist = std::abs((xmin + j + 0.5 - center) / filterscale);
      double wj = dist >= 1.0 ? 0.0 : 1.0 - dist;
      w[j] = float(wj);
      wsum += wj;
    }
    for (int j = 0; j < n; ++j) w[j] = float(w[j] / wsum);
    taps.xmin[xout] = xmin;
    taps.n[xout] = n;
    taps.weights[xout] = std::move(w);
  }
  return taps;
}

// Horizontal pass: [rows x in_w x 3] -> [rows x out_w x 3].
void HorizontalPass(const float* in, float* out, int in_w, int out_w,
                    int rows, const ResampleTaps& taps) {
  for (int y = 0; y < rows; ++y) {
    const float* src = in + size_t(y) * in_w * 3;
    float* dst = out + size_t(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      const float* w = taps.weights[x].data();
      const float* p = src + size_t(taps.xmin[x]) * 3;
      float a0 = 0, a1 = 0, a2 = 0;
      for (int j = 0; j < taps.n[x]; ++j, p += 3) {
        a0 += w[j] * p[0];
        a1 += w[j] * p[1];
        a2 += w[j] * p[2];
      }
      dst[x * 3 + 0] = a0;
      dst[x * 3 + 1] = a1;
      dst[x * 3 + 2] = a2;
    }
  }
}

// Vertical pass: [in_h x width x 3] -> [out_h x width x 3]. Each output
// row is a weighted sum of whole input rows — contiguous AXPYs the
// compiler vectorizes.
void VerticalPass(const float* in, float* out, int in_h, int out_h,
                  int width, const ResampleTaps& taps) {
  const size_t row = size_t(width) * 3;
  for (int y = 0; y < out_h; ++y) {
    float* dst = out + size_t(y) * row;
    std::memset(dst, 0, row * sizeof(float));
    for (int j = 0; j < taps.n[y]; ++j) {
      const float w = taps.weights[y][j];
      const float* src = in + size_t(taps.xmin[y] + j) * row;
      for (size_t x = 0; x < row; ++x) dst[x] += w * src[x];
    }
  }
}

// Resize + center-crop tail of the reference transform, shared by the
// file and in-memory decode entry points: decoded RGB8 [h, w, 3] ->
// uint8 [image_size, image_size, 3].
bool ResampleCropTail(const std::vector<uint8_t>& pixels, int w, int h,
                      int image_size, double central_fraction, uint8_t* out) {
  // Shorter-edge target (ref: int(image_size / central_fraction)).
  const int target = int(image_size / central_fraction);
  int new_w, new_h;
  if (w <= h) {
    new_w = target;
    new_h = int(double(target) * h / w);
  } else {
    new_h = target;
    new_w = int(double(target) * w / h);
  }

  std::vector<float> src(pixels.size());
  for (size_t i = 0; i < pixels.size(); ++i) src[i] = pixels[i];

  // Horizontal then vertical pass (PIL order).
  std::vector<float> tmp(size_t(h) * new_w * 3);
  HorizontalPass(src.data(), tmp.data(), w, new_w, h, ComputeTaps(w, new_w));
  std::vector<float> resized(size_t(new_h) * new_w * 3);
  VerticalPass(tmp.data(), resized.data(), h, new_h, new_w,
               ComputeTaps(h, new_h));

  // Center crop. torchvision/Python round() is ties-to-even (banker's):
  // round((341-224)/2) = round(58.5) = 58, NOT 59 — std::nearbyint under
  // the default FE_TONEAREST mode matches; lround would be off by one.
  const int left = int(std::nearbyint((new_w - image_size) / 2.0));
  const int top = int(std::nearbyint((new_h - image_size) / 2.0));
  for (int y = 0; y < image_size; ++y) {
    const float* row = resized.data() + (size_t(top + y) * new_w + left) * 3;
    uint8_t* dst = out + size_t(y) * image_size * 3;
    for (int x = 0; x < image_size * 3; ++x) {
      float v = row[x];
      v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
      dst[x] = uint8_t(std::lround(v));
    }
  }
  return true;
}

}  // namespace

namespace vqa {

// Exception firewall: a corrupt header can declare huge dimensions whose
// buffer allocations throw std::bad_alloc — an exception escaping a
// std::thread worker calls std::terminate and kills the host process,
// violating the "returns the number of failures" contract.
bool TransformFile(const char* path, int image_size, double central_fraction,
                   uint8_t* out) {
  try {
    std::vector<uint8_t> pixels;
    int w = 0, h = 0;
    if (!DecodeJpeg(path, &pixels, &w, &h)) return false;
    return ResampleCropTail(pixels, w, h, image_size, central_fraction, out);
  } catch (...) {
    return false;
  }
}

bool TransformMem(const uint8_t* data, size_t len, int image_size,
                  double central_fraction, uint8_t* out) {
  try {
    std::vector<uint8_t> pixels;
    int w = 0, h = 0;
    if (!DecodeJpegMem(data, len, &pixels, &w, &h)) return false;
    return ResampleCropTail(pixels, w, h, image_size, central_fraction, out);
  } catch (...) {
    return false;
  }
}

}  // namespace vqa

namespace {
using vqa::TransformFile;
}  // namespace

extern "C" {

// Decode one JPEG into out[image_size*image_size*3]. Returns 0 on success.
int vqa_decode_one(const char* path, int image_size, double central_fraction,
                   uint8_t* out) {
  return TransformFile(path, image_size, central_fraction, out) ? 0 : 1;
}

// Batch across an internal thread pool with per-image status reporting.
// `paths` is an array of n C strings; `out` is n*image_size*image_size*3
// bytes; `status` (may be null) receives n bytes: 0 = ok, 1 = failed.
// Returns the number of failures (failed slots are zero-filled). The
// status array is what lets a caller rescue ONLY the failed slots through
// a fallback decoder instead of re-scanning the whole batch serially.
int vqa_process_batch_status(const char** paths, int n, int image_size,
                             double central_fraction, uint8_t* out,
                             int n_threads, uint8_t* status) {
  const size_t img_bytes = size_t(image_size) * image_size * 3;
  std::atomic<int> next(0), failures(0);
  if (n_threads < 1) n_threads = 1;

  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      uint8_t* dst = out + size_t(i) * img_bytes;
      const bool ok =
          TransformFile(paths[i], image_size, central_fraction, dst);
      if (!ok) {
        std::memset(dst, 0, img_bytes);
        failures.fetch_add(1);
      }
      if (status) status[i] = ok ? 0 : 1;
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < std::min(n_threads, n); ++t)
    threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Backward-compatible entry point (no status array).
int vqa_process_batch(const char** paths, int n, int image_size,
                      double central_fraction, uint8_t* out, int n_threads) {
  return vqa_process_batch_status(paths, n, image_size, central_fraction,
                                  out, n_threads, nullptr);
}

}  // extern "C"
