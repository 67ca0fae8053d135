// Native image decoding for the data loader (C++, libpng/libjpeg/zlib).
//
// The reference leans on torch DataLoader worker processes doing PIL
// decodes (train_bd.py:84-114); here a thread pool calls these functions
// through ctypes (the GIL is released during the call, so Python threads
// decode in parallel at native speed).
//
// Functions:
//  - decode_depth_png: 16-bit grayscale PNG -> float32 metres (x1e-3),
//    invalid (0 or >= max) -> NaN, optional nearest resize. Exact parity
//    with the PIL path (nearest sampling on the integer grid).
//  - decode_color_jpeg: JPEG -> float32 RGB in [0,1], bilinear resize
//    with half-pixel centres.
//
// Build: g++ -O3 -shared -fPIC imageio.cpp -o libimageio.so -lpng -ljpeg -lz

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>

#include <png.h>

extern "C" {
#include <jpeglib.h>
}

namespace {

float kNaN = std::numeric_limits<float>::quiet_NaN();

}  // namespace

extern "C" {

// Returns 0 on success. out must hold out_h*out_w floats.
// Values are raw_png_value * scale; raw==0 or scaled value outside
// (min_valid, max_valid) become NaN. Nearest resize samples the source at
// floor((i + 0.5) * src/dst) like PIL's NEAREST.
int decode_depth_png(
    const char* path, int32_t out_h, int32_t out_w,
    float scale, float min_valid, float max_valid, float* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  const int w = png_get_image_width(png, info);
  const int h = png_get_image_height(png, info);
  const int depth = png_get_bit_depth(png, info);
  const int color = png_get_color_type(png, info);
  if (color != PNG_COLOR_TYPE_GRAY) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -3;
  }
  png_set_swap(png);  // PNG is big-endian; we want little-endian uint16
  png_read_update_info(png, info);

  uint16_t* raw16 = new uint16_t[(size_t)w * h];
  uint8_t* raw8 = (depth == 8) ? new uint8_t[(size_t)w * h] : nullptr;
  png_bytep* rows = new png_bytep[h];
  for (int y = 0; y < h; ++y) {
    rows[y] = depth == 16 ? (png_bytep)(raw16 + (size_t)y * w)
                          : (png_bytep)(raw8 + (size_t)y * w);
  }
  png_read_image(png, rows);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);

  for (int oy = 0; oy < out_h; ++oy) {
    const int sy = (h == out_h) ? oy : (int)((oy + 0.5f) * h / out_h);
    for (int ox = 0; ox < out_w; ++ox) {
      const int sx = (w == out_w) ? ox : (int)((ox + 0.5f) * w / out_w);
      const float raw = depth == 16 ? (float)raw16[(size_t)sy * w + sx]
                                    : (float)raw8[(size_t)sy * w + sx];
      const float val = raw * scale;
      out[(size_t)oy * out_w + ox] =
          (val > min_valid && val < max_valid) ? val : kNaN;
    }
  }
  delete[] raw16;
  delete[] raw8;
  delete[] rows;
  return 0;
}

// Returns 0 on success. out must hold out_h*out_w*3 floats in [0,1].
// Bilinear resize with half-pixel centres (align_corners=False).
int decode_color_jpeg(const char* path, int32_t out_h, int32_t out_w, float* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // let libjpeg DCT-downscale toward the target to cut decode cost
  while (cinfo.scale_denom < 8 &&
         (int)(cinfo.image_width / (cinfo.scale_denom * 2)) >= out_w &&
         (int)(cinfo.image_height / (cinfo.scale_denom * 2)) >= out_h) {
    cinfo.scale_denom *= 2;
  }
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  uint8_t* rgb = new uint8_t[(size_t)w * h * 3];
  while ((int)cinfo.output_scanline < h) {
    uint8_t* row = rgb + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);

  const float sx_ratio = (float)w / out_w;
  const float sy_ratio = (float)h / out_h;
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy_ratio - 0.5f;
    int y0 = (int)std::floor(fy);
    float dy = fy - y0;
    int y1 = y0 + 1;
    y0 = y0 < 0 ? 0 : (y0 >= h ? h - 1 : y0);
    y1 = y1 < 0 ? 0 : (y1 >= h ? h - 1 : y1);
    for (int ox = 0; ox < out_w; ++ox) {
      float fx = (ox + 0.5f) * sx_ratio - 0.5f;
      int x0 = (int)std::floor(fx);
      float dx = fx - x0;
      int x1 = x0 + 1;
      x0 = x0 < 0 ? 0 : (x0 >= w ? w - 1 : x0);
      x1 = x1 < 0 ? 0 : (x1 >= w ? w - 1 : x1);
      for (int c = 0; c < 3; ++c) {
        const float v00 = rgb[((size_t)y0 * w + x0) * 3 + c];
        const float v01 = rgb[((size_t)y0 * w + x1) * 3 + c];
        const float v10 = rgb[((size_t)y1 * w + x0) * 3 + c];
        const float v11 = rgb[((size_t)y1 * w + x1) * 3 + c];
        const float top = v00 * (1 - dx) + v01 * dx;
        const float bot = v10 * (1 - dx) + v11 * dx;
        out[((size_t)oy * out_w + ox) * 3 + c] = (top * (1 - dy) + bot * dy) / 255.0f;
      }
    }
  }
  delete[] rgb;
  return 0;
}

}  // extern "C"
