// Native multithreaded image loader for the training input pipeline.
//
// The reference feeds training from torch DataLoader workers doing
// PIL decode + bicubic resize (`train/latent_wm_pretrain.py:58-94`,
// `train/ppft_train.py:789-887`).  This is the C++ equivalent for the TPU
// build: libjpeg/libpng decode, bicubic resample to a square resolution,
// [-1, 1] float32 HWC output, with a std::thread batch API so one host
// call fills a whole batch in parallel.  Exposed to Python via ctypes
// (aqualora_tpu/core/native_loader.py); PIL remains the fallback.
//
// Build: g++ -O3 -shared -fPIC imageloader.cpp -o libimageloader.so -ljpeg -lpng

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC, RGB
  int h = 0, w = 0;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (n >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (n >= 8 && !memcmp(magic, "\x89PNG\r\n\x1a\n", 8)) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// Catmull-Rom bicubic kernel (a = -0.5), PIL-style resize to a square.
inline float cubic(float x) {
  x = std::fabs(x);
  if (x < 1.0f) return 1.5f * x * x * x - 2.5f * x * x + 1.0f;
  if (x < 2.0f) return -0.5f * x * x * x + 2.5f * x * x - 4.0f * x + 2.0f;
  return 0.0f;
}

// Precompute antialiased bicubic weights for one axis (PIL semantics:
// on downscale the kernel support widens by the scale factor).
struct AxisWeights {
  std::vector<int> start;      // first source index per output pixel
  std::vector<int> count;      // taps per output pixel
  std::vector<float> w;        // weights, `max_taps` stride
  int max_taps = 0;
};

AxisWeights axis_weights(int in_size, int out_size) {
  AxisWeights aw;
  const float scale = float(in_size) / out_size;
  const float filterscale = std::max(scale, 1.0f);
  const float support = 2.0f * filterscale;
  aw.max_taps = int(std::ceil(support)) * 2 + 1;
  aw.start.resize(out_size);
  aw.count.resize(out_size);
  aw.w.assign(size_t(out_size) * aw.max_taps, 0.0f);
  for (int o = 0; o < out_size; ++o) {
    const float center = (o + 0.5f) * scale;
    int lo = std::max(int(center - support + 0.5f), 0);
    int hi = std::min(int(center + support + 0.5f), in_size);
    aw.start[o] = lo;
    aw.count[o] = hi - lo;
    float wsum = 0;
    for (int x = lo; x < hi; ++x) {
      float v = cubic((x + 0.5f - center) / filterscale);
      aw.w[size_t(o) * aw.max_taps + (x - lo)] = v;
      wsum += v;
    }
    if (wsum != 0)
      for (int k = 0; k < hi - lo; ++k)
        aw.w[size_t(o) * aw.max_taps + k] /= wsum;
  }
  return aw;
}

void resize_bicubic_normalize(const Image& img, int out_size, float* out) {
  const AxisWeights ax = axis_weights(img.w, out_size);
  const AxisWeights ay = axis_weights(img.h, out_size);
  std::vector<float> tmp(size_t(img.h) * out_size * 3);  // horizontal pass
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* row = img.data.data() + size_t(y) * img.w * 3;
    for (int ox = 0; ox < out_size; ++ox) {
      float acc[3] = {0, 0, 0};
      const float* w = ax.w.data() + size_t(ox) * ax.max_taps;
      for (int k = 0; k < ax.count[ox]; ++k) {
        const uint8_t* p = row + size_t(ax.start[ox] + k) * 3;
        for (int c = 0; c < 3; ++c) acc[c] += w[k] * p[c];
      }
      float* q = tmp.data() + (size_t(y) * out_size + ox) * 3;
      for (int c = 0; c < 3; ++c) q[c] = acc[c];
    }
  }
  for (int oy = 0; oy < out_size; ++oy) {
    const float* w = ay.w.data() + size_t(oy) * ay.max_taps;
    for (int ox = 0; ox < out_size; ++ox) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < ay.count[oy]; ++k) {
        const float* p = tmp.data()
            + (size_t(ay.start[oy] + k) * out_size + ox) * 3;
        for (int c = 0; c < 3; ++c) acc[c] += w[k] * p[c];
      }
      float* q = out + (size_t(oy) * out_size + ox) * 3;
      for (int c = 0; c < 3; ++c)
        q[c] = std::min(std::max(acc[c], 0.0f), 255.0f) / 127.5f - 1.0f;
    }
  }
}

// In-memory JPEG round-trip (the eval robustness benchmark's real-JPEG
// attack, `evaluation/utils_eval.py:284-290`): encode RGB -> quality-q
// JPEG bytes -> decode back.  Uses libjpeg defaults (JDCT_ISLOW, 4:2:0
// subsampling, baseline) — the same code path PIL takes, so the output
// is bit-identical to PIL's save/open round-trip (parity-tested).
bool jpeg_roundtrip_one(const uint8_t* in, int h, int w, int quality,
                        uint8_t* out) {
  // volatile: modified between setjmp and a potential longjmp — without
  // it the error path may see a register-cached stale value (libjpeg's
  // own example.c uses the same pattern) and leak/misuse the buffer
  unsigned char* volatile buf = nullptr;
  volatile unsigned long buf_size = 0;
  {
    jpeg_compress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
      jpeg_destroy_compress(&cinfo);
      if (buf) free(buf);
      return false;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, (unsigned char**)&buf, (unsigned long*)&buf_size);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
      JSAMPROW row = const_cast<uint8_t*>(
          in + size_t(cinfo.next_scanline) * w * 3);
      jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
  }
  bool ok = false;
  {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (!setjmp(jerr.jb)) {
      jpeg_create_decompress(&cinfo);
      jpeg_mem_src(&cinfo, buf, buf_size);
      jpeg_read_header(&cinfo, TRUE);
      cinfo.out_color_space = JCS_RGB;
      jpeg_start_decompress(&cinfo);
      ok = int(cinfo.output_width) == w && int(cinfo.output_height) == h;
      while (ok && cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out + size_t(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
      }
      jpeg_finish_decompress(&cinfo);
    } else {
      ok = false;
    }
    jpeg_destroy_decompress(&cinfo);
  }
  free(buf);
  return ok;
}

}  // namespace

extern "C" {

// Decode one image file into out[out_size, out_size, 3] float32 in [-1,1].
// Returns 0 on success, nonzero on failure.
int decode_resize(const char* path, int out_size, float* out) {
  Image img;
  if (!decode_file(path, &img) || img.w <= 0 || img.h <= 0) return 1;
  resize_bicubic_normalize(img, out_size, out);
  return 0;
}

// Decode a batch in parallel. paths: array of n C strings; out: contiguous
// [n, out_size, out_size, 3] float32. Returns the number of failures.
int decode_batch(const char** paths, int n, int out_size, float* out,
                 int nthreads) {
  if (nthreads <= 0) nthreads = std::thread::hardware_concurrency();
  nthreads = std::max(1, std::min(nthreads, n));
  std::vector<int> fails(nthreads, 0);
  const size_t stride = size_t(out_size) * out_size * 3;
  std::vector<std::thread> pool;
  for (int t = 0; t < nthreads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += nthreads)
        fails[t] += decode_resize(paths[i], out_size, out + stride * i) != 0;
    });
  }
  for (auto& th : pool) th.join();
  int total = 0;
  for (int f : fails) total += f;
  return total;
}

// Threaded batch JPEG round-trip: in/out [n, h, w, 3] uint8 RGB.
// Returns the number of failures.
int jpeg_roundtrip_batch(const unsigned char* in, int n, int h, int w,
                         int quality, unsigned char* out, int nthreads) {
  if (nthreads <= 0) nthreads = std::thread::hardware_concurrency();
  nthreads = std::max(1, std::min(nthreads, n));
  const size_t stride = size_t(h) * w * 3;
  std::vector<int> fails(nthreads, 0);
  std::vector<std::thread> pool;
  for (int t = 0; t < nthreads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += nthreads)
        fails[t] += !jpeg_roundtrip_one(in + stride * i, h, w, quality,
                                        out + stride * i);
    });
  }
  for (auto& th : pool) th.join();
  int total = 0;
  for (int f : fails) total += f;
  return total;
}

}  // extern "C"
