// Native host-side image decode + letterbox for the BASI-TPU ingest path.
//
// TPU-native replacement for the reference's PIL-in-worker-process decode
// (SURVEY §2.16): JPEG via libjpeg, PNG via libpng, fixed-point bilinear
// letterbox resize into a caller-owned uint8 RGB canvas. All entry points
// are GIL-free C, called from Python via ctypes from a thread pool, plus a
// built-in std::thread batch API for multi-core hosts.
//
// Exports:
//   basi_decode_letterbox(path, size, nearest, out[size*size*3], &oh, &ow)
//   basi_decode_batch(paths, n, size, nearest, out[n*size*size*3], hw[n*2],
//                     threads)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  std::vector<uint8_t> data;  // H*W*3 RGB
  int h = 0, w = 0;
};

// ---------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
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
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->data.resize(size_t(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG ----
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
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  // Strip alpha UNCONDITIONALLY (no-op when absent): checking the original
  // color_type's ALPHA mask misses alpha channels introduced by the
  // transforms above — png_set_palette_to_rgb expands palette+tRNS to
  // RGBA — and libpng would then write 4 bytes/px into rows laid out for
  // 3 (heap overflow). Transparent pixels decode to their underlying RGB.
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  if (png_get_channels(png, info) != 3) {  // defense: never overflow rows
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  out->h = int(h);
  out->w = int(w);
  out->data.resize(size_t(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// --------------------------------------------------------------- resize ----
// Fixed-point (16.16) separable bilinear letterbox resize, half-pixel
// convention identical to basi_tpu.ops.resize (align_corners=False).
void letterbox(const Image& src, int size, bool nearest, uint8_t* out) {
  std::memset(out, 0, size_t(size) * size * 3);
  double scale = double(size) / std::max(src.h, src.w);
  int vh = std::max(1, int(src.h * scale + 0.5));
  int vw = std::max(1, int(src.w * scale + 0.5));

  const int64_t kOne = 1 << 16;
  std::vector<int> x0(vw), x1(vw);
  std::vector<int64_t> fx(vw);
  double rx = double(src.w) / vw;
  for (int j = 0; j < vw; ++j) {
    // nearest: CENTER convention floor((j+0.5)*rx), matching PIL NEAREST
    // (the PIL fallback decoder) — the origin convention floor(j*rx)
    // sampled different source pixels, so GT masks differed by backend.
    double s = nearest ? std::min(double(src.w - 1),
                                  std::floor((j + 0.5) * rx))
                       : std::max(0.0, (j + 0.5) * rx - 0.5);
    int lo = std::min(int(s), src.w - 1);
    x0[j] = lo;
    x1[j] = std::min(lo + 1, src.w - 1);
    fx[j] = nearest ? 0 : int64_t((s - lo) * kOne);
  }
  double ry = double(src.h) / vh;
  for (int i = 0; i < vh; ++i) {
    double s = nearest ? std::min(double(src.h - 1),
                                  std::floor((i + 0.5) * ry))
                       : std::max(0.0, (i + 0.5) * ry - 0.5);
    int ylo = std::min(int(s), src.h - 1);
    int yhi = std::min(ylo + 1, src.h - 1);
    int64_t fy = nearest ? 0 : int64_t((s - ylo) * kOne);
    const uint8_t* r0 = src.data.data() + size_t(ylo) * src.w * 3;
    const uint8_t* r1 = src.data.data() + size_t(yhi) * src.w * 3;
    uint8_t* dst = out + size_t(i) * size * 3;
    for (int j = 0; j < vw; ++j) {
      const uint8_t* p00 = r0 + x0[j] * 3;
      const uint8_t* p01 = r0 + x1[j] * 3;
      const uint8_t* p10 = r1 + x0[j] * 3;
      const uint8_t* p11 = r1 + x1[j] * 3;
      int64_t wx = fx[j];
      for (int c = 0; c < 3; ++c) {
        int64_t top = p00[c] * (kOne - wx) + p01[c] * wx;       // 8.16
        int64_t bot = p10[c] * (kOne - wx) + p11[c] * wx;       // 8.16
        int64_t val = (top >> 8) * ((kOne - fy) >> 8) + (bot >> 8) * (fy >> 8);
        dst[j * 3 + c] = uint8_t((val + (1 << 15)) >> 16);
      }
    }
  }
}

}  // namespace

extern "C" {

int basi_decode_letterbox(const char* path, int size, int nearest,
                          uint8_t* out, int* orig_h, int* orig_w) {
  Image img;
  if (!decode_file(path, &img)) return 1;
  letterbox(img, size, nearest != 0, out);
  *orig_h = img.h;
  *orig_w = img.w;
  return 0;
}

// Decode n images concurrently into out[n, size, size, 3]; hw[n, 2] gets
// original sizes. Returns the number of failures.
int basi_decode_batch(const char** paths, int n, int size, int nearest,
                      uint8_t* out, int* hw, int threads) {
  if (threads < 1) threads = 1;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      Image img;
      if (!decode_file(paths[i], &img)) {
        failures.fetch_add(1);
        std::memset(out + size_t(i) * size * size * 3, 0,
                    size_t(size) * size * 3);
        hw[i * 2] = hw[i * 2 + 1] = 0;
        continue;
      }
      letterbox(img, size, nearest != 0, out + size_t(i) * size * size * 3);
      hw[i * 2] = img.h;
      hw[i * 2 + 1] = img.w;
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < std::min(threads, n); ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
