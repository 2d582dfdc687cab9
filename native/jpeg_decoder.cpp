// Native JPEG decode + resize pool for the host input pipeline.
//
// The reference's data layer leaned on Pillow/OpenCV C extensions under a
// Python generator (SURVEY.md §2 #5); the rebuild's host runtime does the
// same job natively: a pthread worker pool decoding JPEG files straight
// into a caller-owned uint8 canvas batch, bypassing the GIL entirely.
// Python binds via ctypes (no pybind11 in this image — task Environment).
//
// Exposed C ABI:
//   odt_decode_batch(paths, n, size, out, n_threads) -> 0 on success
//     paths: array of n C strings; out: n*size*size*3 uint8 buffer.
//   odt_decode_single(path, size, out) -> 0 on success
//
// Decode path: libjpeg with DCT scaling (scale to >= target, like PIL
// draft mode) followed by box-filter resize to (size, size).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Area-average resize from (sw, sh) RGB to (dw, dh) RGB.
void resize_area(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                 int dh) {
  for (int dy = 0; dy < dh; ++dy) {
    const int sy0 = dy * sh / dh;
    int sy1 = (dy + 1) * sh / dh;
    if (sy1 <= sy0) sy1 = sy0 + 1;
    for (int dx = 0; dx < dw; ++dx) {
      const int sx0 = dx * sw / dw;
      int sx1 = (dx + 1) * sw / dw;
      if (sx1 <= sx0) sx1 = sx0 + 1;
      uint32_t acc[3] = {0, 0, 0};
      const uint32_t count =
          static_cast<uint32_t>(sy1 - sy0) * static_cast<uint32_t>(sx1 - sx0);
      for (int sy = sy0; sy < sy1; ++sy) {
        const uint8_t* row = src + (static_cast<size_t>(sy) * sw + sx0) * 3;
        for (int sx = sx0; sx < sx1; ++sx) {
          acc[0] += row[0];
          acc[1] += row[1];
          acc[2] += row[2];
          row += 3;
        }
      }
      uint8_t* out = dst + (static_cast<size_t>(dy) * dw + dx) * 3;
      out[0] = static_cast<uint8_t>(acc[0] / count);
      out[1] = static_cast<uint8_t>(acc[1] / count);
      out[2] = static_cast<uint8_t>(acc[2] / count);
    }
  }
}

int decode_one(const char* path, int size, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  std::vector<uint8_t> pixels;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);

  // DCT-domain downscale: pick the smallest scale keeping both dims >= size.
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (unsigned denom = 8; denom >= 2; denom--) {
    if (cinfo.image_width / denom >= static_cast<unsigned>(size) &&
        cinfo.image_height / denom >= static_cast<unsigned>(size)) {
      cinfo.scale_denom = denom;
      break;
    }
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int sw = cinfo.output_width;
  const int sh = cinfo.output_height;
  pixels.resize(static_cast<size_t>(sw) * sh * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() + static_cast<size_t>(cinfo.output_scanline) * sw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);

  resize_area(pixels.data(), sw, sh, out, size, size);
  return 0;
}

}  // namespace

extern "C" {

int odt_decode_single(const char* path, int size, uint8_t* out) {
  return decode_one(path, size, out);
}

// status: optional per-file result array (0 = ok, nonzero = decode_one
// error code); failed slots are zero-filled in `out` so callers can
// re-decode them through a fallback path. Returns the failure count.
int odt_decode_batch_status(const char** paths, int n, int size, uint8_t* out,
                            uint8_t* status, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(size) * size * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      const int rc = decode_one(paths[i], size, out + stride * i);
      if (status) status[i] = static_cast<uint8_t>(rc);
      if (rc != 0) {
        failures.fetch_add(1);
        std::memset(out + stride * i, 0, stride);
      }
    }
  };
  std::vector<std::thread> threads;
  const int tcount = n_threads > n ? n : n_threads;
  threads.reserve(tcount);
  for (int t = 0; t < tcount; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

int odt_decode_batch(const char** paths, int n, int size, uint8_t* out,
                     int n_threads) {
  return odt_decode_batch_status(paths, n, size, out, nullptr, n_threads);
}

}  // extern "C"
