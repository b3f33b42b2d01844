// medt_io — native data-plane for the medt_tpu framework.
//
// The reference delegates image IO to cv2/PIL from a single-worker torch
// DataLoader (reference utils.py:151-157, train.py:90). At TPU step rates the
// host decode is the pipeline bottleneck (SURVEY.md §7 hard-part #5), so this
// library provides:
//   * libpng decode straight into caller-owned buffers (no Python object
//     churn, no intermediate copies),
//   * a std::thread fan-out batch decoder that fills one contiguous
//     NHWC uint8 batch buffer,
//   * fused mask binarization (>thresh -> 1) during decode.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).
#include <png.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Decoded {
  int h = 0, w = 0, c = 0;
};

// Decode one PNG into `out` (caller-owned, capacity cap_h*cap_w*want_c).
// want_c: 1 = grayscale, 3 = BGR (matching the reference's cv2 channel
// order). Returns 0 on success.
int decode_png(const char* path, uint8_t* out, int cap_h, int cap_w,
               int want_c, Decoded* meta) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return 2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    std::fclose(fp);
    return 3;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  const int h = png_get_image_height(png, info);
  const int w = png_get_image_width(png, info);
  const int bit_depth = png_get_bit_depth(png, info);
  const int color_type = png_get_color_type(png, info);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (want_c == 1) {
    if (color_type & PNG_COLOR_MASK_COLOR)
      png_set_rgb_to_gray_fixed(png, 1, 29900, 58700);  // ITU-R 601 (cv2-compatible)
  } else {
    if (!(color_type & PNG_COLOR_MASK_COLOR)) png_set_gray_to_rgb(png);
    png_set_bgr(png);  // cv2-compatible channel order
  }
  png_read_update_info(png, info);

  if (h > cap_h || w > cap_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 4;
  }
  const size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes != static_cast<size_t>(w) * want_c) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 5;
  }
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = out + static_cast<size_t>(y) * w * want_c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  meta->h = h;
  meta->w = w;
  meta->c = want_c;
  return 0;
}

// ---- fused color jitter ----------------------------------------------------
//
// The Python jitter chain (data/transforms.py _adjust_{brightness,contrast,
// saturation,hue}) costs ~5.5 ms per 128x128 image — 30x the per-core budget
// at TPU step rates — because the numpy HSV round trip makes a dozen full
// passes with boolean-mask selects. This native version runs the whole chain
// (brightness -> contrast -> saturation -> hue, torchvision order, same
// formulas) in two passes over the image: one to apply brightness and reduce
// the contrast mean, one applying the remaining per-pixel math in registers.

inline float clamp01(float x) {
  return x < 0.0f ? 0.0f : (x > 1.0f ? 1.0f : x);
}

// Scalar hue shift on one RGB pixel (colorsys semantics, matching the
// vectorized _rgb_to_hsv/_hsv_to_rgb pair in data/transforms.py).
inline void hue_shift(float& r, float& g, float& b, float shift) {
  const float maxc = r > g ? (r > b ? r : b) : (g > b ? g : b);
  const float minc = r < g ? (r < b ? r : b) : (g < b ? g : b);
  const float v = maxc;
  const float delta = maxc - minc;
  const float s = maxc > 0.0f ? delta / (maxc > 1e-12f ? maxc : 1e-12f) : 0.0f;
  const float safe = delta > 1e-12f ? delta : 1e-12f;
  float h;
  if (r == maxc)
    h = ((maxc - b) / safe) - ((maxc - g) / safe);
  else if (g == maxc)
    h = 2.0f + ((maxc - r) / safe) - ((maxc - b) / safe);
  else
    h = 4.0f + ((maxc - g) / safe) - ((maxc - r) / safe);
  h = delta > 0.0f ? (h / 6.0f) - std::floor(h / 6.0f) : 0.0f;
  h += shift;
  h -= std::floor(h);
  const float i6 = std::floor(h * 6.0f);
  const float f = h * 6.0f - i6;
  const float p = v * (1.0f - s);
  const float q = v * (1.0f - s * f);
  const float t = v * (1.0f - s * (1.0f - f));
  switch (static_cast<long>(i6) % 6) {
    case 0: r = v; g = t; b = p; break;
    case 1: r = q; g = v; b = p; break;
    case 2: r = p; g = v; b = t; break;
    case 3: r = p; g = q; b = v; break;
    case 4: r = t; g = p; b = v; break;
    default: r = v; g = p; b = q; break;
  }
  r = clamp01(r);
  g = clamp01(g);
  b = clamp01(b);
}

}  // namespace

extern "C" {

// In-place fused color jitter on a float32 HWC image in [0, 1].
// Factors: fb/fc/fs multiply brightness/contrast/saturation; fh shifts hue
// in turns (|fh| <= 0.5). Saturation/hue apply only when c == 3, mirroring
// the Python path. Returns 0 on success.
int medt_color_jitter(float* img, int h, int w, int c, float fb, float fc,
                      float fs, float fh) {
  if (c != 1 && c != 3) return 1;
  const size_t count = static_cast<size_t>(h) * w * c;
  double sum = 0.0;
  for (size_t i = 0; i < count; ++i) {
    img[i] = clamp01(img[i] * fb);
    sum += img[i];
  }
  const float mean = static_cast<float>(sum / static_cast<double>(count));
  if (c == 1) {
    for (size_t i = 0; i < count; ++i)
      img[i] = clamp01((img[i] - mean) * fc + mean);
    return 0;
  }
  const bool do_hue = fh != 0.0f;
  for (size_t i = 0; i < count; i += 3) {
    float r = clamp01((img[i] - mean) * fc + mean);
    float g = clamp01((img[i + 1] - mean) * fc + mean);
    float b = clamp01((img[i + 2] - mean) * fc + mean);
    const float gray = (r + g + b) * (1.0f / 3.0f);
    r = clamp01((r - gray) * fs + gray);
    g = clamp01((g - gray) * fs + gray);
    b = clamp01((b - gray) * fs + gray);
    if (do_hue) hue_shift(r, g, b, fh);
    img[i] = r;
    img[i + 1] = g;
    img[i + 2] = b;
  }
  return 0;
}

// Decode one image. Returns 0 on success; fills h/w/c.
int medt_decode_image(const char* path, uint8_t* out, int cap_h, int cap_w,
                      int want_c, int* h, int* w, int* c) {
  Decoded meta;
  const int rc = decode_png(path, out, cap_h, cap_w, want_c, &meta);
  if (rc == 0) {
    *h = meta.h;
    *w = meta.w;
    *c = meta.c;
  }
  return rc;
}

// Decode a batch of same-sized images into one contiguous (n, H, W, C)
// buffer with `threads` workers. If binarize_thresh >= 0 each pixel becomes
// (pixel > thresh) ? 1 : 0 (the rgb-mode mask rule, reference utils.py:156) —
// pass ge_semantics=1 for (pixel >= thresh) (gray mode, utils_gray.py:159).
// Returns the number of failed images (0 == all good).
int medt_decode_batch(const char** paths, int n, int H, int W, int C,
                      int binarize_thresh, int ge_semantics, int threads,
                      uint8_t* out) {
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      uint8_t* dst = out + static_cast<size_t>(i) * H * W * C;
      Decoded meta;
      if (decode_png(paths[i], dst, H, W, C, &meta) != 0 || meta.h != H ||
          meta.w != W) {
        failures.fetch_add(1);
        continue;
      }
      if (binarize_thresh >= 0) {
        const size_t count = static_cast<size_t>(H) * W * C;
        const uint8_t t = static_cast<uint8_t>(binarize_thresh);
        if (ge_semantics) {
          for (size_t p = 0; p < count; ++p) dst[p] = dst[p] >= t ? 1 : 0;
        } else {
          for (size_t p = 0; p < count; ++p) dst[p] = dst[p] > t ? 1 : 0;
        }
      }
    }
  };
  const int nt = threads < 1 ? 1 : threads;
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

int medt_io_version() { return 2; }

}  // extern "C"
