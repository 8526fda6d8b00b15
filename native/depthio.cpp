// depthio: native data-path for nconv-tpu.
//
// The reference's data layer decodes PNGs with cv2 on the training thread
// (SURVEY.md §3.1: num_workers=0, main-process IO). This library provides
// the hot IO path as C++ — 16-bit depth PNG decode (the KITTI/VOID /256
// fixed-point convention), RGB decode straight into the streaming engine's
// wire formats (uint8 BGR / uint16 depth), crops and sparsifier kernels —
// callable from Python via ctypes. ctypes foreign calls release the GIL, so
// a Python thread pool over these entry points decodes truly in parallel.
//
// Build: make -C native   (g++ -O3 -shared, links libpng16 + zlib)

#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct PngImage {
  std::vector<png_bytep> rows;
  std::vector<png_byte> data;
  png_uint_32 width = 0, height = 0;
  int bit_depth = 0, color_type = 0, channels = 0;
};

// Decode any PNG into 8- or 16-bit rows. Returns 0 on success.
int read_png(const char* path, PngImage* img, bool want_rgb8) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return -2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return -3;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -4;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  img->width = png_get_image_width(png, info);
  img->height = png_get_image_height(png, info);
  img->bit_depth = png_get_bit_depth(png, info);
  img->color_type = png_get_color_type(png, info);

  if (want_rgb8) {
    if (img->bit_depth == 16) png_set_strip_16(png);
    if (img->color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (img->color_type == PNG_COLOR_TYPE_GRAY && img->bit_depth < 8)
      png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (img->color_type == PNG_COLOR_TYPE_GRAY ||
        img->color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
  } else {
    // 16-bit grayscale depth: PNG stores big-endian; swap to host LE
    if (img->bit_depth == 16) png_set_swap(png);
  }
  png_read_update_info(png, info);

  img->channels = png_get_channels(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  img->data.resize(rowbytes * img->height);
  img->rows.resize(img->height);
  for (png_uint_32 y = 0; y < img->height; ++y)
    img->rows[y] = img->data.data() + y * rowbytes;
  png_read_image(png, img->rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

}  // namespace

extern "C" {

int depthio_version() { return 1; }

// Query dimensions without full decode.
int depthio_png_info(const char* path, int* w, int* h, int* bit_depth,
                     int* channels) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return -2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  *bit_depth = png_get_bit_depth(png, info);
  *channels = png_get_channels(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// 16-bit (or 8-bit) grayscale depth PNG -> float32 meters (value / scale_div).
// out must hold h*w floats; (h, w) must match the file. Returns 0 on success.
int depthio_load_depth_f32(const char* path, float scale_div, float* out,
                           int h, int w) {
  PngImage img;
  int rc = read_png(path, &img, /*want_rgb8=*/false);
  if (rc) return rc;
  if ((int)img.height != h || (int)img.width != w || img.channels != 1)
    return -10;
  const float inv = 1.0f / scale_div;
  if (img.bit_depth == 16) {
    for (int y = 0; y < h; ++y) {
      const uint16_t* row = reinterpret_cast<const uint16_t*>(img.rows[y]);
      float* orow = out + (size_t)y * w;
      for (int x = 0; x < w; ++x) orow[x] = row[x] * inv;
    }
  } else if (img.bit_depth == 8) {
    for (int y = 0; y < h; ++y) {
      const uint8_t* row = img.rows[y];
      float* orow = out + (size_t)y * w;
      for (int x = 0; x < w; ++x) orow[x] = row[x] * inv;
    }
  } else {
    return -11;
  }
  return 0;
}

// Depth PNG -> raw uint16 fixed-point (the streaming wire format; for
// 16-bit files this is a bit-exact passthrough of the sensor encoding).
int depthio_load_depth_u16(const char* path, uint16_t* out, int h, int w) {
  PngImage img;
  int rc = read_png(path, &img, false);
  if (rc) return rc;
  if ((int)img.height != h || (int)img.width != w || img.channels != 1)
    return -10;
  if (img.bit_depth != 16) return -11;
  for (int y = 0; y < h; ++y)
    std::memcpy(out + (size_t)y * w, img.rows[y], sizeof(uint16_t) * w);
  return 0;
}

// RGB PNG -> float32 HWC, 0..255, BGR (reference cv2 convention) or RGB.
int depthio_load_rgb_f32(const char* path, int bgr, float* out, int h, int w) {
  PngImage img;
  int rc = read_png(path, &img, /*want_rgb8=*/true);
  if (rc) return rc;
  if ((int)img.height != h || (int)img.width != w || img.channels != 3)
    return -10;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = img.rows[y];
    float* orow = out + (size_t)y * w * 3;
    if (bgr) {
      for (int x = 0; x < w; ++x) {
        orow[3 * x + 0] = row[3 * x + 2];
        orow[3 * x + 1] = row[3 * x + 1];
        orow[3 * x + 2] = row[3 * x + 0];
      }
    } else {
      for (int x = 0; x < w * 3; ++x) orow[x] = row[x];
    }
  }
  return 0;
}

// RGB PNG -> uint8 HWC wire format (BGR or RGB).
int depthio_load_rgb_u8(const char* path, int bgr, uint8_t* out, int h, int w) {
  PngImage img;
  int rc = read_png(path, &img, true);
  if (rc) return rc;
  if ((int)img.height != h || (int)img.width != w || img.channels != 3)
    return -10;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = img.rows[y];
    uint8_t* orow = out + (size_t)y * w * 3;
    if (bgr) {
      for (int x = 0; x < w; ++x) {
        orow[3 * x + 0] = row[3 * x + 2];
        orow[3 * x + 1] = row[3 * x + 1];
        orow[3 * x + 2] = row[3 * x + 0];
      }
    } else {
      std::memcpy(orow, row, (size_t)w * 3);
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Single-open decoders: info + pixels in one open/parse. The two-call
// png_info() + load() pattern opened and header-parsed every file twice,
// which serializes threads on filesystem work; these return the dimensions
// through out-params instead. `cap` is the element capacity of `out`;
// returns -20 if the image doesn't fit (caller grows its buffer and
// retries).
// ---------------------------------------------------------------------------

int depthio_read_depth_f32(const char* path, float scale_div, float* out,
                           long cap, int* h, int* w) {
  PngImage img;
  int rc = read_png(path, &img, /*want_rgb8=*/false);
  if (rc) return rc;
  if (img.channels != 1) return -10;
  *h = (int)img.height;
  *w = (int)img.width;
  if ((long)img.height * img.width > cap) return -20;
  const float inv = 1.0f / scale_div;
  if (img.bit_depth == 16) {
    for (png_uint_32 y = 0; y < img.height; ++y) {
      const uint16_t* row = reinterpret_cast<const uint16_t*>(img.rows[y]);
      float* orow = out + (size_t)y * img.width;
      for (png_uint_32 x = 0; x < img.width; ++x) orow[x] = row[x] * inv;
    }
  } else if (img.bit_depth == 8) {
    for (png_uint_32 y = 0; y < img.height; ++y) {
      const uint8_t* row = img.rows[y];
      float* orow = out + (size_t)y * img.width;
      for (png_uint_32 x = 0; x < img.width; ++x) orow[x] = row[x] * inv;
    }
  } else {
    return -11;
  }
  return 0;
}

int depthio_read_depth_u16(const char* path, uint16_t* out, long cap, int* h,
                           int* w) {
  PngImage img;
  int rc = read_png(path, &img, false);
  if (rc) return rc;
  if (img.channels != 1 || img.bit_depth != 16) return -11;
  *h = (int)img.height;
  *w = (int)img.width;
  if ((long)img.height * img.width > cap) return -20;
  for (png_uint_32 y = 0; y < img.height; ++y)
    std::memcpy(out + (size_t)y * img.width, img.rows[y],
                sizeof(uint16_t) * img.width);
  return 0;
}

int depthio_read_rgb_u8(const char* path, int bgr, uint8_t* out, long cap,
                        int* h, int* w) {
  PngImage img;
  int rc = read_png(path, &img, /*want_rgb8=*/true);
  if (rc) return rc;
  if (img.channels != 3) return -10;
  *h = (int)img.height;
  *w = (int)img.width;
  if ((long)img.height * img.width * 3 > cap) return -20;
  for (png_uint_32 y = 0; y < img.height; ++y) {
    const uint8_t* row = img.rows[y];
    uint8_t* orow = out + (size_t)y * img.width * 3;
    if (bgr) {
      for (png_uint_32 x = 0; x < img.width; ++x) {
        orow[3 * x + 0] = row[3 * x + 2];
        orow[3 * x + 1] = row[3 * x + 1];
        orow[3 * x + 2] = row[3 * x + 0];
      }
    } else {
      std::memcpy(orow, row, (size_t)img.width * 3);
    }
  }
  return 0;
}

int depthio_read_rgb_f32(const char* path, int bgr, float* out, long cap,
                         int* h, int* w) {
  PngImage img;
  int rc = read_png(path, &img, true);
  if (rc) return rc;
  if (img.channels != 3) return -10;
  *h = (int)img.height;
  *w = (int)img.width;
  if ((long)img.height * img.width * 3 > cap) return -20;
  for (png_uint_32 y = 0; y < img.height; ++y) {
    const uint8_t* row = img.rows[y];
    float* orow = out + (size_t)y * img.width * 3;
    if (bgr) {
      for (png_uint_32 x = 0; x < img.width; ++x) {
        orow[3 * x + 0] = row[3 * x + 2];
        orow[3 * x + 1] = row[3 * x + 1];
        orow[3 * x + 2] = row[3 * x + 0];
      }
    } else {
      for (png_uint_32 x = 0; x < img.width * 3; ++x) orow[x] = row[x];
    }
  }
  return 0;
}

// Top-aligned-row / centered-col crop (the dataset convention,
// kittiloader.py:53-59): in (h, w, c) -> out (oh, ow, c).
void depthio_crop_top_center(const float* in, int h, int w, int c, int oh,
                             int ow, float* out) {
  int tp = h - oh;
  int lp = (w - ow) / 2;
  for (int y = 0; y < oh; ++y) {
    const float* irow = in + ((size_t)(y + tp) * w + lp) * c;
    std::memcpy(out + (size_t)y * ow * c, irow, sizeof(float) * ow * c);
  }
}

// depth *= mask (the mask-pool sparsifier's inner loop)
void depthio_apply_mask(float* depth, const float* mask, long n) {
  for (long i = 0; i < n; ++i) depth[i] *= mask[i];
}

// fused: float depth (meters) -> uint16 wire (d * scale, clipped); scale is
// the engine's DEPTH_SCALE knob (256 = KITTI PNG convention)
void depthio_encode_depth_wire(const float* depth, uint16_t* out, long n,
                               float scale) {
  for (long i = 0; i < n; ++i) {
    float v = depth[i] * scale;
    if (v < 0.0f) v = 0.0f;
    if (v > 65535.0f) v = 65535.0f;
    out[i] = (uint16_t)v;
  }
}

// fused single-pass COO depth encode for the streaming wire: scan the float
// depth map, write (flat_index:int32, value:uint16 = d*scale clipped) pairs
// for nonzero pixels into caller buffers of element capacity `capacity`, and
// zero the tail (padding rows must be (0, 0) — the in-graph rasterizer adds
// them to pixel 0 where they contribute nothing). Returns the TOTAL number
// of nonzero points seen (callers detect overflow via ret > capacity).
// Replaces a numpy flatnonzero + fancy-index + clip + two-allocation chain
// that dominated the COO stream's dispatch thread.
long depthio_encode_depth_coo(const float* depth, long n, long capacity,
                              float scale, int32_t* idx_out,
                              uint16_t* val_out) {
  long k = 0;
  for (long i = 0; i < n; ++i) {
    float d = depth[i];
    if (d == 0.0f) continue;
    if (k < capacity) {
      float v = d * scale;
      if (v < 0.0f) v = 0.0f;
      if (v > 65535.0f) v = 65535.0f;
      idx_out[k] = (int32_t)i;
      val_out[k] = (uint16_t)v;
    }
    ++k;
  }
  long fill = k < capacity ? k : capacity;
  std::memset(idx_out + fill, 0, sizeof(int32_t) * (size_t)(capacity - fill));
  std::memset(val_out + fill, 0, sizeof(uint16_t) * (size_t)(capacity - fill));
  return k;
}

// RGB -> planar YUV420 (BT.601 full-range, 2x2-averaged chroma): the
// streaming wire's half-size RGB format (1.5 B/px vs 3). Input is HWC uint8
// with even h, w; outputs are y[h*w], u[h/2*w/2], v[h/2*w/2]. Chroma is
// computed on the 2x2 mean RGB (not the mean of per-pixel chroma) — same
// result in exact arithmetic, one conversion per block instead of four.
void depthio_encode_yuv420(const uint8_t* rgb, int h, int w, uint8_t* y_out,
                           uint8_t* u_out, uint8_t* v_out) {
  const int cw = w / 2;
  for (int yy = 0; yy < h; ++yy) {
    const uint8_t* row = rgb + (size_t)yy * w * 3;
    uint8_t* yrow = y_out + (size_t)yy * w;
    for (int x = 0; x < w; ++x) {
      const int r = row[3 * x], g = row[3 * x + 1], b = row[3 * x + 2];
      // integer BT.601 full-range luma, 16-bit fixed point
      yrow[x] = (uint8_t)((19595 * r + 38470 * g + 7471 * b + 32768) >> 16);
    }
  }
  for (int cy = 0; cy < h / 2; ++cy) {
    const uint8_t* r0 = rgb + (size_t)(2 * cy) * w * 3;
    const uint8_t* r1 = r0 + (size_t)w * 3;
    uint8_t* urow = u_out + (size_t)cy * cw;
    uint8_t* vrow = v_out + (size_t)cy * cw;
    for (int cx = 0; cx < cw; ++cx) {
      const int o = 6 * cx;
      const int r = r0[o] + r0[o + 3] + r1[o] + r1[o + 3];
      const int g = r0[o + 1] + r0[o + 4] + r1[o + 1] + r1[o + 4];
      const int b = r0[o + 2] + r0[o + 5] + r1[o + 2] + r1[o + 5];
      // sums are 4x the mean; fixed-point coeffs divided accordingly
      int u = ((-2764 * r - 5428 * g + 8192 * b + 32768) >> 16) + 128;
      int v = ((8192 * r - 6860 * g - 1332 * b + 32768) >> 16) + 128;
      urow[cx] = (uint8_t)(u < 0 ? 0 : (u > 255 ? 255 : u));
      vrow[cx] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

// RGB -> planar YUV422 (BT.601 full-range, CO-SITED chroma: sampled at the
// even pixel, not a pair mean — the decoder reconstructs even pixels
// exactly and midpoint-interpolates odd ones, roughly halving chroma
// reconstruction error vs box-mean): the 2 B/px wire for streams that need
// tighter parity than 4:2:0 holds. Input is HWC uint8 with even w; outputs
// are y[h*w], u[h*w/2], v[h*w/2].
void depthio_encode_yuv422(const uint8_t* rgb, int h, int w, uint8_t* y_out,
                           uint8_t* u_out, uint8_t* v_out) {
  const int cw = w / 2;
  for (int yy = 0; yy < h; ++yy) {
    const uint8_t* row = rgb + (size_t)yy * w * 3;
    uint8_t* yrow = y_out + (size_t)yy * w;
    uint8_t* urow = u_out + (size_t)yy * cw;
    uint8_t* vrow = v_out + (size_t)yy * cw;
    for (int x = 0; x < w; ++x) {
      const int r = row[3 * x], g = row[3 * x + 1], b = row[3 * x + 2];
      yrow[x] = (uint8_t)((19595 * r + 38470 * g + 7471 * b + 32768) >> 16);
    }
    for (int cx = 0; cx < cw; ++cx) {
      const int o = 6 * cx;  // even pixel only (co-sited)
      const int r = row[o], g = row[o + 1], b = row[o + 2];
      int u = ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16) + 128;
      int v = ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128;
      urow[cx] = (uint8_t)(u < 0 ? 0 : (u > 255 ? 255 : u));
      vrow[cx] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

}  // extern "C"
