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

// uint8 HWC bilinear resize (any channel count).
int s2r_resize_bilinear_u8(const uint8_t* src, int sw, int sh, int ch,
                           uint8_t* dst, int dw, int dh) {
  std::vector<int> hb, vb;
  std::vector<double> hw_, vw_;
  int hk, vk;
  resample_1d_weights(sw, dw, 1.0, hb, hw_, hk);
  resample_1d_weights(sh, dh, 1.0, vb, vw_, vk);

  // horizontal pass: (sh, sw, ch) -> (sh, dw, ch) in float
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * ch);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * ch;
    float* trow = &tmp[static_cast<size_t>(y) * dw * ch];
    for (int x = 0; x < dw; ++x) {
      int xmin = hb[x * 2], xmax = hb[x * 2 + 1];
      const double* w = &hw_[static_cast<size_t>(x) * hk];
      for (int c = 0; c < ch; ++c) {
        double acc = 0.0;
        for (int k = 0; k < xmax; ++k) {
          acc += row[(xmin + k) * ch + c] * w[k];
        }
        trow[x * ch + c] = static_cast<float>(acc);
      }
    }
  }
  // vertical pass: (sh, dw, ch) -> (dh, dw, ch)
  for (int y = 0; y < dh; ++y) {
    int ymin = vb[y * 2], ymax = vb[y * 2 + 1];
    const double* w = &vw_[static_cast<size_t>(y) * vk];
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * ch;
    for (int x = 0; x < dw; ++x) {
      for (int c = 0; c < ch; ++c) {
        double acc = 0.0;
        for (int k = 0; k < ymax; ++k) {
          acc += tmp[(static_cast<size_t>(ymin + k) * dw + x) * ch + c] * w[k];
        }
        int v = static_cast<int>(std::lround(acc));
        drow[x * ch + c] = static_cast<uint8_t>(std::min(255, std::max(0, v)));
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
