// Native image IO for the episode data path.
//
// Replaces the reference's OpenCV/PIL image loading (C++ OpenCV via
// opencv-python, /root/reference evoworld data path: PIL in
// dataset/CameraTrajDataset.py:443-445, cv2 across the reprojection tools)
// with a dependency-light threaded loader: libpng/libjpeg decode, bilinear
// resize, float [-1,1] or [0,1] conversion. Exposed as a C ABI consumed via
// ctypes (evoworld_tpu/data/native_io.py).
//
// Build: make -C native  (produces libevoworld_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>
#include <atomic>

#include <png.h>
#include <jpeglib.h>

namespace {

struct Image {
  std::vector<uint8_t> rgb;  // H*W*3
  int h = 0, w = 0;
  bool ok = false;
};

Image decode_png(const char* path) {
  Image out;
  FILE* fp = fopen(path, "rb");
  if (!fp) return out;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return out;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return out;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  out.w = png_get_image_width(png, info);
  out.h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out.rgb.resize(size_t(out.h) * out.w * 3);
  std::vector<png_bytep> rows(out.h);
  for (int y = 0; y < out.h; ++y) rows[y] = out.rgb.data() + size_t(y) * out.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  out.ok = true;
  return out;
}

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

Image decode_jpeg(const char* path) {
  Image out;
  FILE* fp = fopen(path, "rb");
  if (!fp) return out;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.w = cinfo.output_width;
  out.h = cinfo.output_height;
  out.rgb.resize(size_t(out.h) * out.w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out.rgb.data() + size_t(cinfo.output_scanline) * out.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  out.ok = true;
  return out;
}

Image decode_any(const char* path) {
  size_t n = strlen(path);
  if (n > 4 && (strcmp(path + n - 4, ".jpg") == 0 || strcmp(path + n - 5, ".jpeg") == 0))
    return decode_jpeg(path);
  Image img = decode_png(path);
  if (!img.ok) img = decode_jpeg(path);
  return img;
}

// Bilinear resize uint8 HWC -> float HWC with optional [-1,1] rescale.
void resize_to_float(const Image& src, float* dst, int th, int tw, int minus1_1) {
  const float sy = float(src.h) / th;
  const float sx = float(src.w) / tw;
  const float scale = minus1_1 ? 2.0f / 255.0f : 1.0f / 255.0f;
  const float bias = minus1_1 ? -1.0f : 0.0f;
  for (int y = 0; y < th; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : int(fy);
    if (y0 > src.h - 1) y0 = src.h - 1;
    int y1 = y0 + 1 > src.h - 1 ? src.h - 1 : y0 + 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < tw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : int(fx);
      if (x0 > src.w - 1) x0 = src.w - 1;
      int x1 = x0 + 1 > src.w - 1 ? src.w - 1 : x0 + 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      const uint8_t* p00 = &src.rgb[(size_t(y0) * src.w + x0) * 3];
      const uint8_t* p01 = &src.rgb[(size_t(y0) * src.w + x1) * 3];
      const uint8_t* p10 = &src.rgb[(size_t(y1) * src.w + x0) * 3];
      const uint8_t* p11 = &src.rgb[(size_t(y1) * src.w + x1) * 3];
      float* o = dst + (size_t(y) * tw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] * (1 - wx) + p01[c] * wx;
        float bot = p10[c] * (1 - wx) + p11[c] * wx;
        o[c] = (top * (1 - wy) + bot * wy) * scale + bias;
      }
    }
  }
}

// Encode uint8 HWC RGB to a PNG file. Returns true on success.
bool encode_png(const char* path, const uint8_t* rgb, int h, int w) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return false;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  // Match the artifact role (final frames): favor encode speed — PNG is
  // lossless at any level, and level 1 halves the write time of the
  // default 6 at these image sizes. Adaptive row filtering is the other
  // half of the cost: libpng's default tries all 5 filters per row, and a
  // measured A/B on a real 2000x1000 pano frame gives 206 ms (ALL) vs
  // 100 ms (NONE) per frame at level 1 — with the NONE file slightly
  // SMALLER (0.97 vs 0.99 MB) on this content. Skip filtering entirely.
  png_set_compression_level(png, 1);
  png_set_filter(png, 0, PNG_FILTER_NONE);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(rgb + size_t(y) * w * 3);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(fp);
  return true;
}

}  // namespace

extern "C" {

// Save one uint8 HWC RGB image as PNG. Returns 0 on success.
int ev_save_png(const char* path, const uint8_t* rgb, int h, int w) {
  return encode_png(path, rgb, h, w) ? 0 : 1;
}

// Threaded batch save: n images of h*w*3 uint8 at data + i*h*w*3, written
// to paths[i]. Returns the number of failed writes.
int ev_save_png_batch(const char** paths, const uint8_t* data, int n, int h,
                      int w, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), failed(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      if (!encode_png(paths[i], data + size_t(i) * h * w * 3, h, w))
        failed.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int nt = n_threads < n ? n_threads : n;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

// Load one image into dst (th*tw*3 floats). Returns 0 on success.
int ev_load_image(const char* path, float* dst, int th, int tw, int minus1_1) {
  Image img = decode_any(path);
  if (!img.ok) return 1;
  resize_to_float(img, dst, th, tw, minus1_1);
  return 0;
}

// Threaded batch load: paths are n null-terminated strings; dst is
// n*th*tw*3 floats. Returns the number of failed images.
int ev_load_image_batch(const char** paths, int n, float* dst, int th, int tw,
                        int minus1_1, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), failed(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      if (ev_load_image(paths[i], dst + size_t(i) * th * tw * 3, th, tw, minus1_1))
        failed.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int nt = n_threads < n ? n_threads : n;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
