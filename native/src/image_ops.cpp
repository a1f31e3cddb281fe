// Native image pipeline for the MGNet-TPU data loader.
//
// Plays the role the reference delegates to PIL/torchvision inside torch
// DataLoader worker processes (reference: mgnet/data/dataset_mapper.py,
// DATALOADER.NUM_WORKERS=10): PNG/JPEG decode and geometric resampling are
// the hot host-side ops feeding the TPU; here they are C++ with OpenMP-free
// thread-safe entry points exposed through a C ABI (ctypes).
//
// Build: see native/CMakeLists.txt (links libpng + libjpeg + zlib).

#include <cstdint>
#include <cmath>
#include <cstring>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <algorithm>
#include <vector>

#include <png.h>
#include <jpeglib.h>

extern "C" {

// ---------------------------------------------------------------------------
// PNG decode (8/16-bit, gray/RGB/RGBA -> requested channels)
// ---------------------------------------------------------------------------

struct MemReader {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

static void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->size) {
    png_error(png, "png: read past end");
  }
  std::memcpy(out, r->data + r->pos, n);
  r->pos += n;
}

// Returns 0 on success. Fills h/w/channels/bit_depth.
int mg_png_info(const uint8_t* bytes, size_t len, int* h, int* w,
             int* channels, int* bit_depth) {
  if (len < 8 || png_sig_cmp(bytes, 0, 8)) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -3;
  }
  MemReader reader{bytes, len, 0};
  png_set_read_fn(png, &reader, png_mem_read);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  *channels = png_get_channels(png, info);
  *bit_depth = png_get_bit_depth(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// Decode into caller buffer, converting to out_channels u8 (rgb) or
// keeping 16-bit single channel when out_bit_depth == 16.
int mg_png_decode(const uint8_t* bytes, size_t len, uint8_t* out,
               int out_channels, int out_bit_depth) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -3;
  }
  MemReader reader{bytes, len, 0};
  png_set_read_fn(png, &reader, png_mem_read);
  png_read_info(png, info);

  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);

  if (out_bit_depth == 8 && bit_depth == 16) png_set_strip_16(png);
  if (out_bit_depth == 16 && bit_depth == 16) png_set_swap(png);  // LE host
  if (out_channels >= 3 &&
      (color_type == PNG_COLOR_TYPE_GRAY ||
       color_type == PNG_COLOR_TYPE_GRAY_ALPHA))
    png_set_gray_to_rgb(png);
  if (out_channels == 3) png_set_strip_alpha(png);
  if (out_channels == 1 &&
      (color_type == PNG_COLOR_TYPE_RGB ||
       color_type == PNG_COLOR_TYPE_RGB_ALPHA))
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);

  png_read_update_info(png, info);
  int h = png_get_image_height(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);

  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG decode (baseline/progressive -> RGB u8)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

int mg_jpeg_info(const uint8_t* bytes, size_t len, int* h, int* w, int* c) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, bytes, len);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  *c = cinfo.num_components;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int mg_jpeg_decode(const uint8_t* bytes, size_t len, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, bytes, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  int stride = cinfo.output_width * cinfo.output_components;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// Resampling — half-pixel-center bilinear (cv2 INTER_LINEAR semantics)
// and nearest (torch F.interpolate 'nearest': src = floor(dst*in/out)).
// ---------------------------------------------------------------------------

void resize_bilinear_u8(const uint8_t* src, int h, int w, int c,
                        uint8_t* dst, int oh, int ow) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  std::vector<int> x0s(ow), x1s(ow);
  std::vector<float> fxs(ow);
  for (int x = 0; x < ow; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int x0 = static_cast<int>(std::floor(fx));
    float t = fx - x0;
    x0s[x] = std::clamp(x0, 0, w - 1);
    x1s[x] = std::clamp(x0 + 1, 0, w - 1);
    fxs[x] = t;
  }
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float ty = fy - y0;
    int y0c = std::clamp(y0, 0, h - 1);
    int y1c = std::clamp(y0 + 1, 0, h - 1);
    const uint8_t* r0 = src + static_cast<size_t>(y0c) * w * c;
    const uint8_t* r1 = src + static_cast<size_t>(y1c) * w * c;
    uint8_t* orow = dst + static_cast<size_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      float tx = fxs[x];
      const uint8_t* p00 = r0 + x0s[x] * c;
      const uint8_t* p01 = r0 + x1s[x] * c;
      const uint8_t* p10 = r1 + x0s[x] * c;
      const uint8_t* p11 = r1 + x1s[x] * c;
      for (int k = 0; k < c; ++k) {
        float v = (1 - ty) * ((1 - tx) * p00[k] + tx * p01[k]) +
                  ty * ((1 - tx) * p10[k] + tx * p11[k]);
        orow[x * c + k] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

void resize_nearest_u8(const uint8_t* src, int h, int w, int c,
                       uint8_t* dst, int oh, int ow) {
  std::vector<int> xs(ow);
  for (int x = 0; x < ow; ++x)
    xs[x] = std::min(static_cast<int>(static_cast<int64_t>(x) * w / ow), w - 1);
  for (int y = 0; y < oh; ++y) {
    int sy = std::min(static_cast<int>(static_cast<int64_t>(y) * h / oh), h - 1);
    const uint8_t* srow = src + static_cast<size_t>(sy) * w * c;
    uint8_t* orow = dst + static_cast<size_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x)
      std::memcpy(orow + x * c, srow + xs[x] * c, c);
  }
}

// ---------------------------------------------------------------------------
// Color-jitter ops with bit-exact Pillow/torchvision-PIL semantics.
//
// The train mapper's color jitter must match the reference's torchvision
// PIL backend bit-for-bit (reference: mgnet/data/transform.py:208-221;
// golden tests: tests/test_golden_mapper.py). Pillow's binding rounding
// sites — derived empirically and verified over ALL 2^24 inputs against
// Pillow itself (see mgnet_tpu/data/transforms.py _rgb2hsv_pil /
// _hsv2rgb_pil, the numpy reference implementations of the same math) —
// are replicated here:
//   rgb->hsv: f32 (maxc-x)/cr ratios; maxc==r branch subtracts in f32;
//     the g/b branches promote through the C double literals 2.0/4.0 and
//     round back to f32 on store; /6 and the mod-1 wrap in f32; final
//     *255 truncates. S = 255*cr/maxc integer division.
//   hsv->rgb: colorsys in doubles, round-half-up p/q/t, trunc i=(int)h6.
//   saturation (ImageEnhance.Color): per-pixel f32 blend with the
//     integer L luma, truncating store.
// NOTE: these functions require -ffp-contract=off (an FMA in the blend
// would change f32 rounding vs numpy/Pillow); set for this file in both
// build paths (native/CMakeLists.txt, data/native.py).
// ---------------------------------------------------------------------------

static inline uint8_t luma_l(int r, int g, int b) {
  // Pillow convert("L") integer luma (convert.c L24 macro)
  return static_cast<uint8_t>(
      (static_cast<uint32_t>(r) * 19595 + static_cast<uint32_t>(g) * 38470 +
       static_cast<uint32_t>(b) * 7471 + 0x8000) >> 16);
}

void mg_adjust_saturation(const uint8_t* in, int64_t n_px, float factor,
                          uint8_t* out) {
  for (int64_t i = 0; i < n_px; ++i) {
    const uint8_t* p = in + 3 * i;
    uint8_t* o = out + 3 * i;
    float gray = static_cast<float>(luma_l(p[0], p[1], p[2]));
    for (int k = 0; k < 3; ++k) {
      float v = gray + factor * (static_cast<float>(p[k]) - gray);
      v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
      o[k] = static_cast<uint8_t>(v);  // truncates like Pillow Blend.c
    }
  }
}

// Division-free tables for mg_adjust_hue. Each entry stores EXACTLY the
// value the scalar expression produced (one correctly-rounded op), so the
// table rewrite cannot change a bit — it only removes the ~6 FP divisions
// per pixel that made the first version ~100 ns/px (BENCH_NOTES §Data
// pipeline round 5). Magic-static init, ~1.3 MB total, read-only after.
struct HueTables {
  float ratio[256 * 256];    // [cr*256 + d] = (float)d / (float)cr
  uint8_t sat[256 * 256];    // [cr*256 + maxc] = 255*cr/maxc
  double s_tab[256];         // [us] = us/255.0
  double f_tab[256];         // [uh] = frac part of h6(uh)
  double omf_tab[256];       // [uh] = 1.0 - f(uh)
  int i6[256];               // [uh] = ((int)h6) % 6
  HueTables() {
    for (int cr = 0; cr < 256; ++cr)
      for (int d = 0; d < 256; ++d) {
        ratio[cr * 256 + d] =
            cr ? static_cast<float>(d) / static_cast<float>(cr) : 0.0f;
        // sat is indexed by (cr, maxc); maxc >= 1 whenever cr >= 1
        sat[cr * 256 + d] = d ? static_cast<uint8_t>(255 * cr / d) : 0;
      }
    for (int uh = 0; uh < 256; ++uh) {
      const double h6 = (static_cast<double>(uh) / 255.0) * 6.0;
      const int i = static_cast<int>(h6);
      f_tab[uh] = h6 - static_cast<double>(i);
      omf_tab[uh] = 1.0 - f_tab[uh];
      i6[uh] = i % 6;
    }
    for (int us = 0; us < 256; ++us)
      s_tab[us] = static_cast<double>(us) / 255.0;
  }
};

void mg_adjust_hue(const uint8_t* in, int64_t n_px, int shift, uint8_t* out) {
  static const HueTables T;
  for (int64_t idx = 0; idx < n_px; ++idx) {
    const int r = in[3 * idx], g = in[3 * idx + 1], b = in[3 * idx + 2];
    int maxc = r > g ? r : g;
    if (b > maxc) maxc = b;
    int minc = r < g ? r : g;
    if (b < minc) minc = b;
    const uint8_t uv = static_cast<uint8_t>(maxc);
    uint8_t uh, us;
    if (maxc == minc) {
      uh = 0;
      us = 0;
    } else {
      const int cr = maxc - minc;
      us = T.sat[cr * 256 + maxc];
      const float* rr = T.ratio + cr * 256;
      const float rc = rr[maxc - r];
      const float gc = rr[maxc - g];
      const float bc = rr[maxc - b];
      // all three branch values computed, selected by cmov — the
      // per-pixel maxc branch is data-dependent and mispredicts
      const float h0 = bc - gc;
      const float h1 = static_cast<float>(2.0 + rc - bc);  // double arith,
      const float h2 = static_cast<float>(4.0 + gc - rc);  // f32 store
      const float h = maxc == r ? h0 : (maxc == g ? h1 : h2);
      // h/6 is always in (-1/6, 5/6) here (h in [-1, 5]), so
      // fmodf(x, 1) is exactly x — the numpy-% wrap reduces to a sign
      // fixup, no libm call
      const float m0 = h / 6.0f;
      const float m = m0 < 0.0f ? m0 + 1.0f : m0;
      uh = static_cast<uint8_t>(static_cast<double>(m) * 255.0);
    }
    uh = static_cast<uint8_t>(uh + shift);  // uint8 wraparound shift
    uint8_t* o = out + 3 * idx;
    if (us == 0) {
      o[0] = o[1] = o[2] = uv;
      continue;
    }
    const double v = static_cast<double>(uv);
    const double s = T.s_tab[us];
    // vals = {uv, q, p, t}; output channel order per sextant via an
    // index table instead of a (mispredicting) 6-way switch
    uint8_t vals[4];
    vals[0] = uv;
    vals[1] = static_cast<uint8_t>(v * (1.0 - s * T.f_tab[uh]) + 0.5);  // q
    vals[2] = static_cast<uint8_t>(v * (1.0 - s) + 0.5);                // p
    vals[3] = static_cast<uint8_t>(v * (1.0 - s * T.omf_tab[uh]) + 0.5);  // t
    static const uint8_t kSel[6][3] = {{0, 3, 2}, {1, 0, 2}, {2, 0, 3},
                                       {2, 1, 0}, {3, 2, 0}, {0, 2, 1}};
    const uint8_t* sel = kSel[T.i6[uh]];
    o[0] = vals[sel[0]];
    o[1] = vals[sel[1]];
    o[2] = vals[sel[2]];
  }
}

// 256-entry LUT apply: the brightness/contrast jitters are per-VALUE maps
// (Pillow Blend.c over a scalar degenerate); numpy fancy-indexing costs
// ~7 ns/byte, this loop is memory-bound (~0.3 ns/byte).
void mg_apply_lut(const uint8_t* in, int64_t n, const uint8_t* lut,
                  uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = lut[in[i]];
}

// ImageEnhance.Contrast's scalar degenerate: int(mean(L image) + 0.5).
// The uint64 sum is exact, and numpy's pairwise f64 mean of integer
// values is also exact (every partial sum is an integer < 2^53), so
// (double)sum / n_px is the identical double — same low bit.
int mg_gray_mean_round(const uint8_t* in, int64_t n_px) {
  uint64_t sum = 0;
  for (int64_t i = 0; i < n_px; ++i)
    sum += luma_l(in[3 * i], in[3 * i + 1], in[3 * i + 2]);
  return static_cast<int>(
      static_cast<double>(sum) / static_cast<double>(n_px) + 0.5);
}

// Normalize u8 HWC -> f32 HWC: (x/255 - mean) / std, per channel.
void normalize_u8_to_f32(const uint8_t* src, int n_pixels, int c,
                         const float* mean, const float* stdv, float* dst) {
  std::vector<float> scale(c), bias(c);
  for (int k = 0; k < c; ++k) {
    scale[k] = 1.0f / (255.0f * stdv[k]);
    bias[k] = -mean[k] / stdv[k];
  }
  for (int i = 0; i < n_pixels; ++i) {
    for (int k = 0; k < c; ++k) {
      dst[i * c + k] = src[i * c + k] * scale[k] + bias[k];
    }
  }
}

}  // extern "C"
