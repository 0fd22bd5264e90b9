// Native data-loading runtime for lgm_tpu.
//
// TPU-native replacement for the decode half of the reference's data
// pipeline: the reference feeds training through a torch DataLoader
// worker pool whose hot work is native cv2 PNG decode + numpy composite
// and resize (ref: core/provider_objaverse.py:83-105, main.py:52-70).
// Here that hot path is one C++ call per scene: decode every view
// (PNG via libpng, JPEG via libjpeg, dispatched on magic bytes),
// composite onto a white background, and bilinear-resize to up to two
// target sizes (network input size + supervision output size) — one
// decode, two resizes — fanned out over an internal thread pool so the
// Python-side loader threads stay free for pose parsing and batching.
//
// Conventions matched to the Python/cv2 path (lgm_tpu/data/provider.py):
// - float32 RGB in [0, 1], white-bg composite rgb*a + (1-a);
// - bilinear resize with half-pixel-center sampling
//   (src = (dst + 0.5) * scale - 0.5), clamped at borders — the
//   cv2.INTER_LINEAR convention;
// - images without an alpha channel get mask == 1.
//
// C ABI + ctypes (no pybind11 in this environment); see
// lgm_tpu/native.py for the bindings.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Decoding: bytes -> 8-bit RGBA
// ---------------------------------------------------------------------------

struct Image8 {
  std::vector<uint8_t> rgba;  // [h * w * 4]
  int h = 0, w = 0;
  bool has_alpha = false;
};

bool decode_png(const uint8_t* bytes, size_t n, Image8* out) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, bytes, n)) return false;
  out->has_alpha = (image.format & PNG_FORMAT_FLAG_ALPHA) != 0;
  image.format = PNG_FORMAT_RGBA;
  out->h = image.height;
  out->w = image.width;
  out->rgba.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, out->rgba.data(), 0,
                             nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  std::longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

bool decode_jpeg(const uint8_t* bytes, size_t n, Image8* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(bytes),
               static_cast<unsigned long>(n));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->has_alpha = false;
  out->rgba.resize(size_t(out->h) * out->w * 4);
  std::vector<uint8_t> row(size_t(out->w) * 3);
  uint8_t* rp = row.data();
  for (int y = 0; y < out->h; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = out->rgba.data() + size_t(y) * out->w * 4;
    for (int x = 0; x < out->w; ++x) {
      dst[4 * x + 0] = row[3 * x + 0];
      dst[4 * x + 1] = row[3 * x + 1];
      dst[4 * x + 2] = row[3 * x + 2];
      dst[4 * x + 3] = 255;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_file(const char* path, Image8* out) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 8) {
    std::fclose(f);
    return false;
  }
  std::vector<uint8_t> bytes(n);
  size_t got = std::fread(bytes.data(), 1, n, f);
  std::fclose(f);
  if (got != size_t(n)) return false;
  static const uint8_t png_magic[4] = {0x89, 'P', 'N', 'G'};
  if (!std::memcmp(bytes.data(), png_magic, 4))
    return decode_png(bytes.data(), bytes.size(), out);
  if (bytes[0] == 0xFF && bytes[1] == 0xD8)
    return decode_jpeg(bytes.data(), bytes.size(), out);
  return false;
}

// ---------------------------------------------------------------------------
// Composite + resize
// ---------------------------------------------------------------------------

// White-bg composite into float planes: rgb = c*a + (1-a), mask = a.
void composite(const Image8& im, std::vector<float>* rgb,
               std::vector<float>* mask) {
  const size_t np = size_t(im.h) * im.w;
  rgb->resize(np * 3);
  mask->resize(np);
  constexpr float k = 1.0f / 255.0f;
  for (size_t i = 0; i < np; ++i) {
    const uint8_t* p = im.rgba.data() + 4 * i;
    const float a = im.has_alpha ? p[3] * k : 1.0f;
    const float bg = 1.0f - a;
    (*rgb)[3 * i + 0] = p[0] * k * a + bg;
    (*rgb)[3 * i + 1] = p[1] * k * a + bg;
    (*rgb)[3 * i + 2] = p[2] * k * a + bg;
    (*mask)[i] = im.has_alpha ? a : 1.0f;
  }
}

// Bilinear resize [h, w, c] -> [s, s, c], half-pixel centers (the
// cv2.INTER_LINEAR convention), border-clamped.
void resize_bilinear(const float* src, int h, int w, int c, int s,
                     float* dst) {
  if (h == s && w == s) {
    std::memcpy(dst, src, size_t(s) * s * c * sizeof(float));
    return;
  }
  const float sy = float(h) / s;
  const float sx = float(w) / s;
  std::vector<int> x0v(s), x1v(s);
  std::vector<float> fxv(s);
  for (int x = 0; x < s; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int x0 = int(std::floor(fx));
    fx -= x0;
    if (x0 < 0) { x0 = 0; fx = 0.0f; }
    int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
    if (x0 > w - 1) { x0 = w - 1; fx = 0.0f; }
    x0v[x] = x0;
    x1v[x] = x1;
    fxv[x] = fx;
  }
  for (int y = 0; y < s; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = int(std::floor(fy));
    fy -= y0;
    if (y0 < 0) { y0 = 0; fy = 0.0f; }
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    if (y0 > h - 1) { y0 = h - 1; fy = 0.0f; }
    const float* r0 = src + size_t(y0) * w * c;
    const float* r1 = src + size_t(y1) * w * c;
    float* out = dst + size_t(y) * s * c;
    for (int x = 0; x < s; ++x) {
      const float fx = fxv[x];
      const float w00 = (1 - fy) * (1 - fx), w01 = (1 - fy) * fx;
      const float w10 = fy * (1 - fx), w11 = fy * fx;
      const float* p00 = r0 + size_t(x0v[x]) * c;
      const float* p01 = r0 + size_t(x1v[x]) * c;
      const float* p10 = r1 + size_t(x0v[x]) * c;
      const float* p11 = r1 + size_t(x1v[x]) * c;
      for (int k = 0; k < c; ++k)
        out[size_t(x) * c + k] = w00 * p00[k] + w01 * p01[k] +
                                 w10 * p10[k] + w11 * p11[k];
    }
  }
}

void load_one(const char* path, int size_a, float* rgb_a, float* mask_a,
              int size_b, float* rgb_b, float* mask_b, uint8_t* ok) {
  Image8 im;
  if (!decode_file(path, &im)) {
    *ok = 0;
    return;
  }
  std::vector<float> rgb, mask;
  composite(im, &rgb, &mask);
  if (size_a > 0) {
    resize_bilinear(rgb.data(), im.h, im.w, 3, size_a, rgb_a);
    resize_bilinear(mask.data(), im.h, im.w, 1, size_a, mask_a);
  }
  if (size_b > 0) {
    resize_bilinear(rgb.data(), im.h, im.w, 3, size_b, rgb_b);
    resize_bilinear(mask.data(), im.h, im.w, 1, size_b, mask_b);
  }
  *ok = 1;
}

}  // namespace

extern "C" {

// Decode + composite + resize `n` images to up to two square sizes.
// paths: concatenated NUL-terminated strings; offsets[i] indexes path i.
// rgb_a [n, size_a, size_a, 3], mask_a [n, size_a, size_a]; likewise _b
// (size_b == 0 skips the second target; the _b pointers may be null).
// ok[i] = 1 on success, 0 on unreadable/corrupt (outputs undefined
// there — callers skip-and-pad, matching provider semantics).
// Returns the number of successfully loaded images.
int lgm_load_views(const char* paths, const int64_t* offsets, int n,
                   int size_a, float* rgb_a, float* mask_a, int size_b,
                   float* rgb_b, float* mask_b, uint8_t* ok,
                   int n_threads) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  const size_t pa = size_t(size_a) * size_a;
  const size_t pb = size_t(size_b) * size_b;
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      load_one(paths + offsets[i],
               size_a, rgb_a ? rgb_a + i * pa * 3 : nullptr,
               mask_a ? mask_a + i * pa : nullptr,
               size_b, rgb_b ? rgb_b + i * pb * 3 : nullptr,
               mask_b ? mask_b + i * pb : nullptr, ok + i);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  int loaded = 0;
  for (int i = 0; i < n; ++i) loaded += ok[i];
  return loaded;
}

// Single-image decode into a caller-provided RGBA float buffer of
// capacity cap_hw x cap_hw. Returns 0 on success (h/w report the true
// size), -1 on decode failure, -2 if the image exceeds the capacity.
int lgm_decode_rgba(const char* path, float* rgba, int cap_hw, int* h,
                    int* w) {
  Image8 im;
  if (!decode_file(path, &im)) return -1;
  if (im.h > cap_hw || im.w > cap_hw) {
    *h = im.h;
    *w = im.w;
    return -2;
  }
  constexpr float k = 1.0f / 255.0f;
  const size_t np = size_t(im.h) * im.w;
  for (size_t i = 0; i < np; ++i) {
    rgba[4 * i + 0] = im.rgba[4 * i + 0] * k;
    rgba[4 * i + 1] = im.rgba[4 * i + 1] * k;
    rgba[4 * i + 2] = im.rgba[4 * i + 2] * k;
    rgba[4 * i + 3] = im.has_alpha ? im.rgba[4 * i + 3] * k : 1.0f;
  }
  *h = im.h;
  *w = im.w;
  return 0;
}

}  // extern "C"
