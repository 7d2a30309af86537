// Native image I/O runtime for realsr_tpu.
//
// The reference's codec layer is native (stb_image/stb_image_write/libwebp,
// SURVEY.md §2.4 — vendored at /root/reference/src/stb_image.h etc.); this
// is the TPU build's equivalent, written against the system libpng/libjpeg/
// libwebp instead of vendoring decoders. Exposed as a minimal C ABI consumed
// by ctypes (realsr_tpu/io/native.py) and by the C++ CLI.
//
// Semantics match the reference load/save stages:
//  - decode: webp probed first (main.cpp:232-235), then png/jpg by magic;
//    grayscale -> RGB and gray+alpha -> RGBA promotion (main.cpp:247-260)
//    so callers only see 3- or 4-channel uint8.
//  - encode: webp LOSSLESS (webp_image.h:66-76), jpg quality 100
//    (main.cpp:391), png default.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <string>
#include <vector>

#include <png.h>
#include <jpeglib.h>
#include <webp/decode.h>
#include <webp/encode.h>

extern "C" {

unsigned char* rsio_decode(const char* path, int* w, int* h, int* c);
void rsio_free(unsigned char* p);
int rsio_encode(const char* path, int w, int h, int c,
                const unsigned char* pixels, const char* ext);
const char* rsio_version(void);
}

namespace {

std::vector<unsigned char> read_file(const char* path) {
  std::vector<unsigned char> data;
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return data;
  std::fseek(fp, 0, SEEK_END);
  long len = std::ftell(fp);
  std::rewind(fp);
  if (len > 0) {
    data.resize(static_cast<size_t>(len));
    if (std::fread(data.data(), 1, data.size(), fp) != data.size()) data.clear();
  }
  std::fclose(fp);
  return data;
}

// ---- webp ---------------------------------------------------------------

unsigned char* decode_webp(const unsigned char* data, size_t len, int* w,
                           int* h, int* c) {
  WebPBitstreamFeatures feat;
  if (WebPGetFeatures(data, len, &feat) != VP8_STATUS_OK) return nullptr;
  uint8_t* out;
  if (feat.has_alpha) {
    out = WebPDecodeRGBA(data, len, w, h);
    *c = 4;
  } else {
    out = WebPDecodeRGB(data, len, w, h);
    *c = 3;
  }
  if (!out) return nullptr;
  // move to malloc-owned buffer so rsio_free is uniform
  size_t n = static_cast<size_t>(*w) * *h * *c;
  unsigned char* buf = static_cast<unsigned char*>(std::malloc(n));
  if (!buf) {
    WebPFree(out);
    return nullptr;
  }
  std::memcpy(buf, out, n);
  WebPFree(out);
  return buf;
}

// ---- png ----------------------------------------------------------------

struct PngReadState {
  const unsigned char* data;
  size_t len;
  size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t count) {
  auto* st = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (st->pos + count > st->len) png_error(png, "png: read past end");
  std::memcpy(out, st->data + st->pos, count);
  st->pos += count;
}

unsigned char* decode_png(const unsigned char* data, size_t len, int* w,
                          int* h, int* c) {
  if (len < 8 || png_sig_cmp(data, 0, 8)) return nullptr;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return nullptr;
  png_infop info = png_create_info_struct(png);
  unsigned char* buf = nullptr;
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    std::free(buf);
    png_destroy_read_struct(&png, &info, nullptr);
    return nullptr;
  }
  PngReadState st{data, len, 0};
  png_set_read_fn(png, &st, png_mem_read);
  png_read_info(png, info);

  png_uint_32 width, height;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &width, &height, &bit_depth, &color_type, nullptr,
               nullptr, nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  // grayscale promotion (main.cpp:247-260 semantics)
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  int channels = static_cast<int>(png_get_channels(png, info));
  size_t stride = png_get_rowbytes(png, info);
  buf = static_cast<unsigned char*>(std::malloc(stride * height));
  if (!buf) png_error(png, "png: oom");
  rows.resize(height);
  for (png_uint_32 y = 0; y < height; y++) rows[y] = buf + y * stride;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  *w = static_cast<int>(width);
  *h = static_cast<int>(height);
  *c = channels;
  return buf;
}

// ---- jpeg ---------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

unsigned char* decode_jpeg(const unsigned char* data, size_t len, int* w,
                           int* h, int* c) {
  if (len < 3 || data[0] != 0xFF || data[1] != 0xD8) return nullptr;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  unsigned char* buf = nullptr;
  if (setjmp(jerr.jb)) {
    std::free(buf);
    jpeg_destroy_decompress(&cinfo);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // promotes grayscale too
  jpeg_start_decompress(&cinfo);
  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  *c = 3;
  size_t stride = static_cast<size_t>(*w) * 3;
  buf = static_cast<unsigned char*>(std::malloc(stride * *h));
  if (!buf) longjmp(jerr.jb, 1);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = buf + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return buf;
}

// ---- encoders -----------------------------------------------------------

int encode_png(const char* path, int w, int h, int c,
               const unsigned char* pixels) {
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return 0;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(fp);
    return 0;
  }
  png_init_io(png, fp);
  int color = c == 4 ? PNG_COLOR_TYPE_RGBA
             : c == 3 ? PNG_COLOR_TYPE_RGB
                      : PNG_COLOR_TYPE_GRAY;
  png_set_IHDR(png, info, w, h, 8, color, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; y++)
    rows[y] = const_cast<png_bytep>(pixels + static_cast<size_t>(y) * w * c);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return 1;
}

int encode_jpeg(const char* path, int w, int h, int c,
                const unsigned char* pixels) {
  if (c != 3) return 0;  // alpha jpg is redirected upstream (main.cpp:279)
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return 0;
  jpeg_compress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_compress(&cinfo);
    std::fclose(fp);
    return 0;
  }
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, fp);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, 100, TRUE);  // main.cpp:391
  jpeg_start_compress(&cinfo, TRUE);
  size_t stride = static_cast<size_t>(w) * 3;
  while (cinfo.next_scanline < cinfo.image_height) {
    const unsigned char* row = pixels + cinfo.next_scanline * stride;
    jpeg_write_scanlines(&cinfo, const_cast<unsigned char**>(&row), 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  std::fclose(fp);
  return 1;
}

int encode_webp(const char* path, int w, int h, int c,
                const unsigned char* pixels) {
  uint8_t* out = nullptr;
  size_t size = 0;
  // lossless, matching webp_image.h:66-76
  if (c == 3)
    size = WebPEncodeLosslessRGB(pixels, w, h, w * 3, &out);
  else if (c == 4)
    size = WebPEncodeLosslessRGBA(pixels, w, h, w * 4, &out);
  if (!size || !out) return 0;
  FILE* fp = std::fopen(path, "wb");
  int ok = 0;
  if (fp) {
    ok = std::fwrite(out, 1, size, fp) == size;
    std::fclose(fp);
  }
  WebPFree(out);
  return ok;
}

}  // namespace

extern "C" {

unsigned char* rsio_decode(const char* path, int* w, int* h, int* c) {
  std::vector<unsigned char> data = read_file(path);
  if (data.empty()) return nullptr;
  // webp first (main.cpp:232-235), then magic-dispatched png/jpg
  if (unsigned char* p = decode_webp(data.data(), data.size(), w, h, c))
    return p;
  if (unsigned char* p = decode_png(data.data(), data.size(), w, h, c))
    return p;
  if (unsigned char* p = decode_jpeg(data.data(), data.size(), w, h, c))
    return p;
  return nullptr;
}

void rsio_free(unsigned char* p) { std::free(p); }

int rsio_encode(const char* path, int w, int h, int c,
                const unsigned char* pixels, const char* ext) {
  std::string e(ext ? ext : "");
  for (auto& ch : e) ch = static_cast<char>(std::tolower(ch));
  if (e == "png") return encode_png(path, w, h, c, pixels);
  if (e == "jpg" || e == "jpeg") return encode_jpeg(path, w, h, c, pixels);
  if (e == "webp") return encode_webp(path, w, h, c, pixels);
  return 0;
}

const char* rsio_version(void) { return "realsr_io 0.1.0"; }
}
