// chadaloader — native host data loader for chadavit_tpu.
//
// TPU-native replacement for the reference's host-side decode stack
// (PIL / opencv / NVIDIA DALI wrappers, reference src/data/dali_dataloader.py
// and custom_datasets.py:166-190): a C++ threadpool that decodes per-channel
// image files (PNG 8/16-bit via libpng, JPEG via libjpeg), bilinear-resizes,
// scales, and writes directly into a dense (B, C_max, H, W) float32 batch
// buffer — the exact layout the jitted train step consumes. No Python in the
// per-image inner loop; the GIL is released for the whole batch.
//
// C ABI (ctypes-friendly):
//   chada_decode_plane(path, out, out_cap, &w, &h)     decode one plane (native size)
//   chada_load_dense_batch(paths, offsets, counts, B, C_max, H, W, out, threads, scale)
//
// Build: g++ -O3 -march=native -shared -fPIC chadaloader.cpp -lpng -ljpeg -lz
//        (driven by chadavit_tpu/data/native.py)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <png.h>
extern "C" {
#include <jpeglib.h>
}

namespace {

struct Plane {
  std::vector<float> data;
  int w = 0, h = 0;
  bool ok = false;
};

// ---------------------------------------------------------------- PNG ----
Plane decode_png(FILE* f) {
  Plane out;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return out;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return out;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return out;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);

  // normalize to 8- or 16-bit grayscale (single-channel microscopy planes;
  // color inputs collapse to their first channel after rgb->gray)
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  if (bit_depth == 16) png_set_swap(png);  // PNG is big-endian; we want LE u16
  png_read_update_info(png, info);

  bit_depth = png_get_bit_depth(png, info);
  const size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> raw(rowbytes * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = raw.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);

  out.w = (int)w;
  out.h = (int)h;
  out.data.resize((size_t)w * h);
  if (bit_depth == 16) {
    const uint16_t* p = reinterpret_cast<const uint16_t*>(raw.data());
    for (size_t i = 0; i < out.data.size(); ++i) out.data[i] = (float)p[i];
  } else {
    for (size_t i = 0; i < out.data.size(); ++i) out.data[i] = (float)raw[i];
  }
  out.ok = true;
  return out;
}

// --------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};
void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

Plane decode_jpeg(FILE* f) {
  Plane out;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  out.w = cinfo.output_width;
  out.h = cinfo.output_height;
  out.data.resize((size_t)out.w * out.h);
  std::vector<uint8_t> row(out.w);
  JSAMPROW rp = row.data();
  int y = 0;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = out.data.data() + (size_t)y * out.w;
    for (int x = 0; x < out.w; ++x) dst[x] = (float)row[x];
    ++y;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out.ok = true;
  return out;
}

Plane decode_file(const char* path) {
  Plane out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;
  uint8_t magic[4] = {0};
  if (fread(magic, 1, 4, f) != 4) {
    fclose(f);
    return out;
  }
  rewind(f);
  if (magic[0] == 0x89 && magic[1] == 'P')
    out = decode_png(f);
  else if (magic[0] == 0xFF && magic[1] == 0xD8)
    out = decode_jpeg(f);
  fclose(f);
  return out;
}

// bilinear resize (half-pixel centers), src (h,w) -> dst (th,tw)
void resize_bilinear(const float* src, int h, int w, float* dst, int th, int tw,
                     float scale) {
  if (h == th && w == tw) {
    for (size_t i = 0; i < (size_t)th * tw; ++i) dst[i] = src[i] * scale;
    return;
  }
  const float sy = (float)h / th, sx = (float)w / tw;
  for (int y = 0; y < th; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, h - 1);
    y0 = std::max(y0, 0);
    for (int x = 0; x < tw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x1 = std::min(x0 + 1, w - 1);
      x0 = std::max(x0, 0);
      float v00 = src[(size_t)y0 * w + x0], v01 = src[(size_t)y0 * w + x1];
      float v10 = src[(size_t)y1 * w + x0], v11 = src[(size_t)y1 * w + x1];
      dst[(size_t)y * tw + x] =
          ((v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy) *
          scale;
    }
  }
}

}  // namespace

extern "C" {

// Decode one plane at native resolution into out (capacity out_cap floats).
// Returns 0 on success, negative on failure; writes natural size to w/h.
int chada_decode_plane(const char* path, float* out, long out_cap, int* w, int* h) {
  Plane p = decode_file(path);
  if (!p.ok) return -1;
  if ((long)p.data.size() > out_cap) {
    *w = p.w;
    *h = p.h;
    return -2;  // caller must re-alloc and retry
  }
  std::memcpy(out, p.data.data(), p.data.size() * sizeof(float));
  *w = p.w;
  *h = p.h;
  return 0;
}

// Decode + resize + scale a whole batch into a dense (B, C_max, H, W) float32
// buffer (padded channel planes left untouched — caller zero-fills).
//   paths:   flat array of C-string pointers, grouped per image
//   offsets: per-image start index into paths (len B+1)
//   counts:  out (B,) actual channel counts (min(cap, files))
// Returns number of failed planes (0 == all good).
int chada_load_dense_batch(const char** paths, const long* offsets, int batch,
                           int max_channels, int th, int tw, float* out,
                           int* counts, int num_threads, float scale) {
  std::atomic<int> failures{0};
  std::atomic<int> next{0};

  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= batch) return;
      long s = offsets[i], e = offsets[i + 1];
      int c = (int)std::min<long>(e - s, max_channels);
      counts[i] = c;
      for (int j = 0; j < c; ++j) {
        Plane p = decode_file(paths[s + j]);
        float* dst = out + ((size_t)i * max_channels + j) * th * tw;
        if (!p.ok) {
          failures.fetch_add(1);
          std::memset(dst, 0, (size_t)th * tw * sizeof(float));
          continue;
        }
        resize_bilinear(p.data.data(), p.h, p.w, dst, th, tw, scale);
      }
    }
  };

  int nt = std::max(1, std::min(num_threads, batch));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
