// s2r_tpu native host pipeline: PNG decode, PIL-compatible resize, label
// remap, normalization, and a threaded batch loader.
//
// The reference delegates its host pipeline to torch DataLoader worker
// processes running PIL (dataloders/, SURVEY.md §2.3).  This library is the
// framework's native runtime for the same work: one C call decodes,
// resizes, remaps and normalizes a whole batch on a std::thread pool with no
// Python-object hops, writing directly into the caller's pinned NHWC
// buffers.
//
// Build: s2r_tpu/native/__init__.py::_build (g++ -O3 -shared, links libpng/z).

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

struct MemReader {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

static void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->len) {
    png_error(png, "read past end");
  }
  std::memcpy(out, r->data + r->pos, n);
  r->pos += n;
}

// Decode a PNG byte buffer.  force_channels: 1 (gray) or 3 (RGB).
// Returns 0 on success; fills *w, *h.  `out` must hold w*h*force_channels
// (query first with out == nullptr via s2r_png_info).
int s2r_png_info(const uint8_t* data, size_t len, int* w, int* h) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return 1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 1;
  }
  MemReader reader{data, len, 0};
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 2;
  }
  png_set_read_fn(png, &reader, png_mem_read);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

int s2r_png_decode(const uint8_t* data, size_t len, int force_channels,
                   uint8_t* out, int* w, int* h) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return 1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 1;
  }
  MemReader reader{data, len, 0};
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 2;
  }
  png_set_read_fn(png, &reader, png_mem_read);
  png_read_info(png, info);

  int width = png_get_image_width(png, info);
  int height = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  // strip alpha
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (force_channels == 3 &&
      (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)) {
    png_set_gray_to_rgb(png);
  }
  if (force_channels == 1 &&
      (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
       color == PNG_COLOR_TYPE_PALETTE)) {
    // ITU-R 601-2 luma, like PIL convert('L')
    png_set_rgb_to_gray(png, 1, 0.299, 0.114);
  }
  png_read_update_info(png, info);

  size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes != static_cast<size_t>(width) * force_channels) {
    // channel plumbing failed
    png_destroy_read_struct(&png, &info, nullptr);
    return 3;
  }
  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; ++y) rows[y] = out + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  *w = width;
  *h = height;
  return 0;
}

// ---------------------------------------------------------------------------
// Resize — PIL-compatible
// ---------------------------------------------------------------------------

// PIL BILINEAR: triangle filter with support scaled by the downscale factor,
// separable horizontal-then-vertical passes (Pillow Resample.c semantics,
// float accumulation).
static void resample_1d_weights(int in_size, int out_size, double support_base,
                                std::vector<int>& bounds,
                                std::vector<double>& weights, int& ksize) {
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = support_base * filterscale;
  ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds.resize(out_size * 2);
  weights.assign(static_cast<size_t>(out_size) * ksize, 0.0);
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* w = &weights[static_cast<size_t>(i) * ksize];
    double total = 0.0;
    for (int x = 0; x < xmax; ++x) {
      double arg = (x + xmin - center + 0.5) / filterscale;
      double val = arg < 0 ? 1.0 + arg : 1.0 - arg;  // triangle
      if (val < 0) val = 0;
      w[x] = val;
      total += val;
    }
    if (total != 0.0) {
      for (int x = 0; x < xmax; ++x) w[x] /= total;
    }
    bounds[i * 2] = xmin;
    bounds[i * 2 + 1] = xmax;
  }
}

// Pillow 8bpc fixed-point coefficients: normalized double weights quantized
// to int32 at PRECISION_BITS, accumulated in int with a rounding bias, u8
// intermediate between the passes (Pillow Resample.c semantics, bit-exact).
static const int kPrecisionBits = 32 - 8 - 2;

static void coefs_int(int in_size, int out_size, std::vector<int>& bounds,
                      std::vector<int32_t>& kk, int& ksize) {
  std::vector<double> w;
  resample_1d_weights(in_size, out_size, 1.0, bounds, w, ksize);
  kk.assign(static_cast<size_t>(out_size) * ksize, 0);
  for (int i = 0; i < out_size; ++i) {
    size_t off = static_cast<size_t>(i) * ksize;
    for (int j = 0; j < bounds[i * 2 + 1]; ++j) {
      double v = w[off + j] * (1 << kPrecisionBits);
      kk[off + j] = static_cast<int32_t>(v < 0 ? v - 0.5 : v + 0.5);
    }
  }
}

static inline uint8_t clip8(int64_t v) {
  v >>= kPrecisionBits;
  return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

// uint8 HWC bilinear resize (any channel count), Pillow-bit-exact.
int s2r_resize_bilinear_u8(const uint8_t* src, int sw, int sh, int ch,
                           uint8_t* dst, int dw, int dh) {
  std::vector<int> hb, vb;
  std::vector<int32_t> hk_, vk_;
  int hk, vk;
  coefs_int(sw, dw, hb, hk_, hk);
  coefs_int(sh, dh, vb, vk_, vk);

  // horizontal pass: (sh, sw, ch) -> (sh, dw, ch), u8 intermediate
  std::vector<uint8_t> tmp(static_cast<size_t>(sh) * dw * ch);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * ch;
    uint8_t* trow = &tmp[static_cast<size_t>(y) * dw * ch];
    for (int x = 0; x < dw; ++x) {
      int xmin = hb[x * 2], xmax = hb[x * 2 + 1];
      const int32_t* w = &hk_[static_cast<size_t>(x) * hk];
      for (int c = 0; c < ch; ++c) {
        int64_t acc = 1 << (kPrecisionBits - 1);
        for (int k = 0; k < xmax; ++k) {
          acc += static_cast<int64_t>(row[(xmin + k) * ch + c]) * w[k];
        }
        trow[x * ch + c] = clip8(acc);
      }
    }
  }
  // vertical pass: (sh, dw, ch) -> (dh, dw, ch)
  for (int y = 0; y < dh; ++y) {
    int ymin = vb[y * 2], ymax = vb[y * 2 + 1];
    const int32_t* w = &vk_[static_cast<size_t>(y) * vk];
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * ch;
    for (int x = 0; x < dw; ++x) {
      for (int c = 0; c < ch; ++c) {
        int64_t acc = 1 << (kPrecisionBits - 1);
        for (int k = 0; k < ymax; ++k) {
          acc += static_cast<int64_t>(
                     tmp[(static_cast<size_t>(ymin + k) * dw + x) * ch + c]) *
                 w[k];
        }
        drow[x * ch + c] = clip8(acc);
      }
    }
  }
  return 0;
}

// PIL NEAREST: src index = floor((i + 0.5) * scale) clamped.
int s2r_resize_nearest_u8(const uint8_t* src, int sw, int sh, int ch,
                          uint8_t* dst, int dw, int dh) {
  double xs = static_cast<double>(sw) / dw;
  double ys = static_cast<double>(sh) / dh;
  std::vector<int> xmap(dw);
  for (int x = 0; x < dw; ++x) {
    int v = static_cast<int>((x + 0.5) * xs);
    xmap[x] = std::min(v, sw - 1);
  }
  for (int y = 0; y < dh; ++y) {
    int sy = std::min(static_cast<int>((y + 0.5) * ys), sh - 1);
    const uint8_t* srow = src + static_cast<size_t>(sy) * sw * ch;
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * ch;
    for (int x = 0; x < dw; ++x) {
      std::memcpy(drow + static_cast<size_t>(x) * ch,
                  srow + static_cast<size_t>(xmap[x]) * ch, ch);
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Pixel ops
// ---------------------------------------------------------------------------

void s2r_remap_u8(const uint8_t* in, uint8_t* out, size_t n,
                  const uint8_t* lut) {
  for (size_t i = 0; i < n; ++i) out[i] = lut[in[i]];
}

// (x/255 - mean) / std, RGB interleaved -> float32 HWC
void s2r_normalize_f32(const uint8_t* rgb, size_t npix, const float* mean,
                       const float* stdv, float* out) {
  float scale[3], bias[3];
  for (int c = 0; c < 3; ++c) {
    scale[c] = 1.0f / (255.0f * stdv[c]);
    bias[c] = -mean[c] / stdv[c];
  }
  for (size_t i = 0; i < npix; ++i) {
    for (int c = 0; c < 3; ++c) {
      out[i * 3 + c] = rgb[i * 3 + c] * scale[c] + bias[c];
    }
  }
}

// ---------------------------------------------------------------------------
// Threaded batch eval pipeline:
//   per item: read file -> decode PNG -> resize to (crop, crop)
//   image: bilinear + normalize -> out_images[i]  [crop, crop, 3] f32
//   label: nearest + LUT remap  -> out_labels[i]  [crop, crop]   i32
// Returns 0 on success, else the 1-based index of the first failed item.
// ---------------------------------------------------------------------------

static bool read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf.resize(n);
  size_t got = std::fread(buf.data(), 1, n, f);
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

// ---------------------------------------------------------------------------
// Windowed resample: emit only the crop window of resize(src -> (ow, oh))
// padded right/bottom with `fill` — the RandomScaleCrop composition
// (custom_transforms.py:108-147) without materializing the full resized
// frame.  Output is (crop_h, crop_w, ch) at offset (x1, y1) of the padded
// resized frame.
// ---------------------------------------------------------------------------

static void resample_window_bilinear_u8(const uint8_t* src, int sw, int sh,
                                        int ch, int ow, int oh, int x1,
                                        int y1, int cw, int crop_h,
                                        uint8_t fill, uint8_t* dst) {
  std::vector<int> hb, vb;
  std::vector<int32_t> hk_, vk_;
  int hk, vk;
  coefs_int(sw, ow, hb, hk_, hk);
  coefs_int(sh, oh, vb, vk_, vk);

  int cx_lo = x1, cx_hi = std::min(x1 + cw, ow);  // real (non-pad) out cols
  int cy_lo = y1, cy_hi = std::min(y1 + crop_h, oh);
  int ncols = std::max(cx_hi - cx_lo, 0);
  int nrows = std::max(cy_hi - cy_lo, 0);

  if (nrows > 0 && ncols > 0) {
    // source row span feeding the needed output rows
    int row_lo = sh, row_hi = 0;
    for (int y = cy_lo; y < cy_hi; ++y) {
      row_lo = std::min(row_lo, vb[y * 2]);
      row_hi = std::max(row_hi, vb[y * 2] + vb[y * 2 + 1]);
    }
    // horizontal pass restricted to needed cols and rows (u8 intermediate,
    // identical per-pixel math to the full-frame pass -> bit-exact window)
    std::vector<uint8_t> tmp(static_cast<size_t>(row_hi - row_lo) * ncols *
                             ch);
    for (int y = row_lo; y < row_hi; ++y) {
      const uint8_t* row = src + static_cast<size_t>(y) * sw * ch;
      uint8_t* trow = &tmp[static_cast<size_t>(y - row_lo) * ncols * ch];
      for (int x = 0; x < ncols; ++x) {
        int ox = cx_lo + x;
        int xmin = hb[ox * 2], xmax = hb[ox * 2 + 1];
        const int32_t* w = &hk_[static_cast<size_t>(ox) * hk];
        for (int c = 0; c < ch; ++c) {
          int64_t acc = 1 << (kPrecisionBits - 1);
          for (int k = 0; k < xmax; ++k) {
            acc += static_cast<int64_t>(row[(xmin + k) * ch + c]) * w[k];
          }
          trow[x * ch + c] = clip8(acc);
        }
      }
    }
    // vertical pass into the destination window
    for (int y = cy_lo; y < cy_hi; ++y) {
      int ymin = vb[y * 2], ymax = vb[y * 2 + 1];
      const int32_t* w = &vk_[static_cast<size_t>(y) * vk];
      uint8_t* drow = dst + static_cast<size_t>(y - y1) * cw * ch;
      for (int x = 0; x < ncols; ++x) {
        for (int c = 0; c < ch; ++c) {
          int64_t acc = 1 << (kPrecisionBits - 1);
          for (int k = 0; k < ymax; ++k) {
            acc += static_cast<int64_t>(
                       tmp[(static_cast<size_t>(ymin - row_lo + k) * ncols +
                            x) * ch + c]) * w[k];
          }
          drow[x * ch + c] = clip8(acc);
        }
      }
    }
  }
  // right/bottom pad fill
  for (int y = 0; y < crop_h; ++y) {
    uint8_t* drow = dst + static_cast<size_t>(y) * cw * ch;
    int real_cols = (y1 + y < oh) ? ncols : 0;
    if (real_cols < cw) {
      std::memset(drow + static_cast<size_t>(real_cols) * ch, fill,
                  static_cast<size_t>(cw - real_cols) * ch);
    }
  }
}

static void resample_window_nearest_u8(const uint8_t* src, int sw, int sh,
                                       int ch, int ow, int oh, int x1, int y1,
                                       int cw, int crop_h, uint8_t fill,
                                       uint8_t* dst) {
  double xs = static_cast<double>(sw) / ow;
  double ys = static_cast<double>(sh) / oh;
  for (int y = 0; y < crop_h; ++y) {
    uint8_t* drow = dst + static_cast<size_t>(y) * cw * ch;
    int oy = y1 + y;
    if (oy >= oh) {
      std::memset(drow, fill, static_cast<size_t>(cw) * ch);
      continue;
    }
    int sy = std::min(static_cast<int>((oy + 0.5) * ys), sh - 1);
    const uint8_t* srow = src + static_cast<size_t>(sy) * sw * ch;
    for (int x = 0; x < cw; ++x) {
      int ox = x1 + x;
      if (ox >= ow) {
        std::memset(drow + static_cast<size_t>(x) * ch, fill,
                    static_cast<size_t>(cw - x) * ch);
        break;
      }
      int sx = std::min(static_cast<int>((ox + 0.5) * xs), sw - 1);
      std::memcpy(drow + static_cast<size_t>(x) * ch,
                  srow + static_cast<size_t>(sx) * ch, ch);
    }
  }
}

// Separable Gaussian blur, sigma = PIL GaussianBlur radius, clamped edges.
// (Approximate vs Pillow's implementation; augmentation parity is asserted
// at the distribution/mIoU level, SURVEY.md §7 hard-part 4.)
static void gaussian_blur_u8(uint8_t* img, int w, int h, int ch,
                             double sigma) {
  if (sigma <= 1e-3) return;
  int k = std::max(1, static_cast<int>(std::ceil(sigma * 3.0)));
  std::vector<float> kern(2 * k + 1);
  double s2 = 2.0 * sigma * sigma, total = 0.0;
  for (int i = -k; i <= k; ++i) {
    kern[i + k] = static_cast<float>(std::exp(-(double)i * i / s2));
    total += kern[i + k];
  }
  for (auto& v : kern) v = static_cast<float>(v / total);
  std::vector<float> tmp(static_cast<size_t>(w) * h * ch);
  for (int y = 0; y < h; ++y) {   // horizontal
    const uint8_t* row = img + static_cast<size_t>(y) * w * ch;
    float* trow = &tmp[static_cast<size_t>(y) * w * ch];
    for (int x = 0; x < w; ++x) {
      for (int c = 0; c < ch; ++c) {
        float acc = 0.f;
        for (int i = -k; i <= k; ++i) {
          int xx = std::min(std::max(x + i, 0), w - 1);
          acc += row[xx * ch + c] * kern[i + k];
        }
        trow[x * ch + c] = acc;
      }
    }
  }
  for (int y = 0; y < h; ++y) {   // vertical
    uint8_t* drow = img + static_cast<size_t>(y) * w * ch;
    for (int x = 0; x < w; ++x) {
      for (int c = 0; c < ch; ++c) {
        float acc = 0.f;
        for (int i = -k; i <= k; ++i) {
          int yy = std::min(std::max(y + i, 0), h - 1);
          acc += tmp[(static_cast<size_t>(yy) * w + x) * ch + c] * kern[i + k];
        }
        int v = static_cast<int>(std::lround(acc));
        drow[x * ch + c] = static_cast<uint8_t>(std::min(255, std::max(0, v)));
      }
    }
  }
}

static void hflip_u8(uint8_t* img, int w, int h, int ch) {
  std::vector<uint8_t> px(ch);
  for (int y = 0; y < h; ++y) {
    uint8_t* row = img + static_cast<size_t>(y) * w * ch;
    for (int x = 0; x < w / 2; ++x) {
      uint8_t* a = row + static_cast<size_t>(x) * ch;
      uint8_t* b = row + static_cast<size_t>(w - 1 - x) * ch;
      std::memcpy(px.data(), a, ch);
      std::memcpy(a, b, ch);
      std::memcpy(b, px.data(), ch);
    }
  }
}

// splitmix64 — deterministic per-sample augmentation RNG
static inline uint64_t sm64(uint64_t& s) {
  uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}
static inline double rng01(uint64_t& s) {
  return (sm64(s) >> 11) * (1.0 / 9007199254740992.0);
}
static inline int rng_int(uint64_t& s, int lo, int hi) {  // inclusive
  return lo + static_cast<int>(sm64(s) % static_cast<uint64_t>(hi - lo + 1));
}

// ---------------------------------------------------------------------------
// Threaded TRAIN batch pipeline — the full paired train-path per sample
// (reference worker pipeline, custom_transforms.py:7-147 composed per
// gtav2cityscapes.py:66-74):
//   decode src/lbl/tgt -> joint hflip(p=.5) -> RandomScaleCrop(base, crop)
//   -> GaussianBlur(p=.5, radius U(0,1), per image) -> normalize/remap.
// Label remap happens after crop (LUT commutes with NEAREST resize; pad
// fill 255 maps to 255).  tgt_paths may be null (source-only / gta5 path:
// outputs go to out_src/out_lbl only).
// `forced` (nullable, n*4 i32: flip, short_size, x1, y1) pins the geometric
// draws for cross-implementation tests; blur is skipped in forced mode.
// `emit_u8`: skip normalization and write u8 RGB into out_src/out_tgt
// (reinterpreted as uint8*) — 4x less host->device traffic; the consumer
// normalizes on device (s2r_tpu/data/device_aug.py::normalize_u8).
// Returns 0 on success, else 1-based index of the first failed item.
// ---------------------------------------------------------------------------

int s2r_train_batch(const char** src_paths, const char** lbl_paths,
                    const char** tgt_paths, int n, int base_size, int crop_h,
                    int crop_w, const uint8_t* lut, const float* mean,
                    const float* stdv, const uint64_t* seeds,
                    int blur_enable, const int32_t* forced, int emit_u8,
                    float* out_src, int32_t* out_lbl, float* out_tgt,
                    int nthreads) {
  std::atomic<int> next(0), failed(0);
  auto worker = [&]() {
    std::vector<uint8_t> buf, simg, slbl, timg, win, lwin;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      uint64_t rs = seeds ? seeds[i] : 0x243f6a8885a308d3ULL + i;
      int w = 0, h = 0, wl = 0, hl = 0, wt = 0, ht = 0;

      if (!read_file(src_paths[i], buf) ||
          s2r_png_info(buf.data(), buf.size(), &w, &h)) {
        failed.store(i + 1);
        return;
      }
      simg.resize(static_cast<size_t>(w) * h * 3);
      if (s2r_png_decode(buf.data(), buf.size(), 3, simg.data(), &w, &h)) {
        failed.store(i + 1);
        return;
      }
      if (!read_file(lbl_paths[i], buf) ||
          s2r_png_info(buf.data(), buf.size(), &wl, &hl)) {
        failed.store(i + 1);
        return;
      }
      slbl.resize(static_cast<size_t>(wl) * hl);
      if (s2r_png_decode(buf.data(), buf.size(), 1, slbl.data(), &wl, &hl)) {
        failed.store(i + 1);
        return;
      }
      bool has_tgt = tgt_paths && tgt_paths[i] && tgt_paths[i][0];
      if (has_tgt) {
        if (!read_file(tgt_paths[i], buf) ||
            s2r_png_info(buf.data(), buf.size(), &wt, &ht)) {
          failed.store(i + 1);
          return;
        }
        timg.resize(static_cast<size_t>(wt) * ht * 3);
        if (s2r_png_decode(buf.data(), buf.size(), 3, timg.data(), &wt,
                           &ht)) {
          failed.store(i + 1);
          return;
        }
      }

      // --- joint geometric draws (order fixed for reproducibility) ---
      int flip, short_size, x1, y1;
      if (forced) {
        flip = forced[i * 4];
        short_size = forced[i * 4 + 1];
        x1 = forced[i * 4 + 2];
        y1 = forced[i * 4 + 3];
      } else {
        flip = rng01(rs) < 0.5;
        short_size = rng_int(rs, base_size / 2, base_size * 2);
      }
      // resized dims derive from the FIRST dict entry (src image) — all
      // entries resize to the same (ow, oh) like the reference
      int ow, oh;
      if (h > w) {
        ow = short_size;
        oh = static_cast<int>(1.0 * h * ow / w);
      } else {
        oh = short_size;
        ow = static_cast<int>(1.0 * w * oh / h);
      }
      int W = ow + std::max(crop_w - ow, 0);
      int H = oh + std::max(crop_h - oh, 0);
      if (!forced) {
        x1 = rng_int(rs, 0, W - crop_w);
        y1 = rng_int(rs, 0, H - crop_h);
      }

      if (flip) {
        hflip_u8(simg.data(), w, h, 3);
        hflip_u8(slbl.data(), wl, hl, 1);
        if (has_tgt) hflip_u8(timg.data(), wt, ht, 3);
      }

      win.resize(static_cast<size_t>(crop_h) * crop_w * 3);
      lwin.resize(static_cast<size_t>(crop_h) * crop_w);
      size_t npix = static_cast<size_t>(crop_h) * crop_w;

      double blur_coin = forced ? 1.0 : rng01(rs);
      resample_window_bilinear_u8(simg.data(), w, h, 3, ow, oh, x1, y1,
                                  crop_w, crop_h, 0, win.data());
      if (!forced && blur_enable && blur_coin < 0.5) {
        gaussian_blur_u8(win.data(), crop_w, crop_h, 3, rng01(rs));
      }
      if (emit_u8) {
        std::memcpy(reinterpret_cast<uint8_t*>(out_src) + static_cast<size_t>(i) * npix * 3,
                    win.data(), npix * 3);
      } else {
        s2r_normalize_f32(win.data(), npix, mean, stdv,
                          out_src + static_cast<size_t>(i) * npix * 3);
      }

      resample_window_nearest_u8(slbl.data(), wl, hl, 1, ow, oh, x1, y1,
                                 crop_w, crop_h, 255, lwin.data());
      if (emit_u8) {  // trainIds fit u8 (0..18, 255)
        uint8_t* ldst = reinterpret_cast<uint8_t*>(out_lbl) +
                        static_cast<size_t>(i) * npix;
        for (size_t p = 0; p < npix; ++p) ldst[p] = lut[lwin[p]];
      } else {
        int32_t* ldst = out_lbl + static_cast<size_t>(i) * npix;
        for (size_t p = 0; p < npix; ++p) ldst[p] = lut[lwin[p]];
      }

      if (has_tgt) {
        resample_window_bilinear_u8(timg.data(), wt, ht, 3, ow, oh, x1, y1,
                                    crop_w, crop_h, 0, win.data());
        if (!forced && blur_enable && blur_coin < 0.5) {
          gaussian_blur_u8(win.data(), crop_w, crop_h, 3, rng01(rs));
        }
        if (emit_u8) {
          std::memcpy(reinterpret_cast<uint8_t*>(out_tgt) + static_cast<size_t>(i) * npix * 3,
                      win.data(), npix * 3);
        } else {
          s2r_normalize_f32(win.data(), npix, mean, stdv,
                            out_tgt + static_cast<size_t>(i) * npix * 3);
        }
      }
    }
  };
  int nt = std::max(1, std::min(nthreads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

int s2r_eval_batch(const char** img_paths, const char** lbl_paths, int n,
                   int crop, const uint8_t* lut, const float* mean,
                   const float* stdv, float* out_images, int32_t* out_labels,
                   int nthreads) {
  std::atomic<int> next(0), failed(0);
  auto worker = [&]() {
    std::vector<uint8_t> buf, img, lbl, rimg, rlbl;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      int w = 0, h = 0;
      // image
      if (!read_file(img_paths[i], buf) ||
          s2r_png_info(buf.data(), buf.size(), &w, &h)) {
        failed.store(i + 1);
        return;
      }
      img.resize(static_cast<size_t>(w) * h * 3);
      if (s2r_png_decode(buf.data(), buf.size(), 3, img.data(), &w, &h)) {
        failed.store(i + 1);
        return;
      }
      rimg.resize(static_cast<size_t>(crop) * crop * 3);
      s2r_resize_bilinear_u8(img.data(), w, h, 3, rimg.data(), crop, crop);
      s2r_normalize_f32(rimg.data(), static_cast<size_t>(crop) * crop, mean,
                        stdv,
                        out_images + static_cast<size_t>(i) * crop * crop * 3);
      // label (optional)
      if (lbl_paths && lbl_paths[i] && lbl_paths[i][0]) {
        if (!read_file(lbl_paths[i], buf) ||
            s2r_png_info(buf.data(), buf.size(), &w, &h)) {
          failed.store(i + 1);
          return;
        }
        lbl.resize(static_cast<size_t>(w) * h);
        if (s2r_png_decode(buf.data(), buf.size(), 1, lbl.data(), &w, &h)) {
          failed.store(i + 1);
          return;
        }
        rlbl.resize(static_cast<size_t>(crop) * crop);
        s2r_resize_nearest_u8(lbl.data(), w, h, 1, rlbl.data(), crop, crop);
        int32_t* dst = out_labels + static_cast<size_t>(i) * crop * crop;
        for (size_t p = 0; p < static_cast<size_t>(crop) * crop; ++p) {
          dst[p] = lut[rlbl[p]];
        }
      }
    }
  };
  int nt = std::max(1, std::min(nthreads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
