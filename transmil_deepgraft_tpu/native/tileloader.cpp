// Threaded JPEG tile loader: decode + bilinear resize + ImageNet normalize.
//
// The raw-image MIL path (ref JPGMILDataloader / DALI pipeline,
// code/datasets/jpg_dataloader.py, dali_dataloader.py) spends its host time in
// single-threaded PIL decode. This library decodes a BATCH of jpeg tiles with
// a thread pool straight into one float32 NHWC buffer: libjpeg decompress,
// bilinear resize to tile_size, (x/255 - mean)/std per channel. Exposed via a
// plain C ABI for ctypes (see transmil_deepgraft_tpu/data/native_tiles.py).
//
// Build: make -C native libtileloader.so   (links -ljpeg)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void err_exit(j_common_ptr cinfo) {
  ErrMgr* mgr = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(mgr->jump, 1);
}

bool decode_jpeg(const char* path, std::vector<unsigned char>& rgb, int& w, int& h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = static_cast<int>(cinfo.output_width);
  h = static_cast<int>(cinfo.output_height);
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// bilinear resize (half-pixel centers, the jax.image.resize / OpenCV
// convention) from (h, w, 3) u8 to (size, size, 3) u8-range floats
void resize_normalize(const std::vector<unsigned char>& src, int w, int h,
                      int size, const float* mean, const float* stdev,
                      float* dst) {
  const float sx = static_cast<float>(w) / size;
  const float sy = static_cast<float>(h) / size;
  for (int oy = 0; oy < size; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    if (y0 > h - 1) y0 = h - 1;
    int y1 = y0 + 1 > h - 1 ? h - 1 : y0 + 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int ox = 0; ox < size; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      if (x0 > w - 1) x0 = w - 1;
      int x1 = x0 + 1 > w - 1 ? w - 1 : x0 + 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(static_cast<size_t>(y0) * w + x0) * 3 + c];
        float v01 = src[(static_cast<size_t>(y0) * w + x1) * 3 + c];
        float v10 = src[(static_cast<size_t>(y1) * w + x0) * 3 + c];
        float v11 = src[(static_cast<size_t>(y1) * w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(static_cast<size_t>(oy) * size + ox) * 3 + c] =
            (v / 255.0f - mean[c]) / stdev[c];
      }
    }
  }
}

}  // namespace

namespace {

// bilinear resize to u8 (no normalization): the device-side-normalize path
// ships 4x less host->device data than normalized f32 tiles
void resize_u8(const std::vector<unsigned char>& src, int w, int h, int size,
               unsigned char* dst) {
  const float sx = static_cast<float>(w) / size;
  const float sy = static_cast<float>(h) / size;
  for (int oy = 0; oy < size; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    if (y0 > h - 1) y0 = h - 1;
    int y1 = y0 + 1 > h - 1 ? h - 1 : y0 + 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int ox = 0; ox < size; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      if (x0 > w - 1) x0 = w - 1;
      int x1 = x0 + 1 > w - 1 ? w - 1 : x0 + 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(static_cast<size_t>(y0) * w + x0) * 3 + c];
        float v01 = src[(static_cast<size_t>(y0) * w + x1) * 3 + c];
        float v10 = src[(static_cast<size_t>(y1) * w + x0) * 3 + c];
        float v11 = src[(static_cast<size_t>(y1) * w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(static_cast<size_t>(oy) * size + ox) * 3 + c] =
            static_cast<unsigned char>(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Raw-u8 variant: decode + resize only (normalization happens on-device).
int tl_load_batch_u8(const char** paths, int n, int size, unsigned char* out,
                     int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), ok(0);
  const size_t tile_bytes = static_cast<size_t>(size) * size * 3;
  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int w = 0, h = 0;
      unsigned char* dst = out + tile_bytes * i;
      if (!decode_jpeg(paths[i], rgb, w, h)) {
        memset(dst, 0, tile_bytes);
        continue;
      }
      resize_u8(rgb, w, h, size, dst);
      ok.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// Returns the number of successfully loaded tiles; failed paths leave zeros.
// out must hold n * size * size * 3 floats.
int tl_load_batch(const char** paths, int n, int size, float* out, int n_threads,
                  const float* mean, const float* stdev) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), ok(0);
  const size_t tile_floats = static_cast<size_t>(size) * size * 3;
  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int w = 0, h = 0;
      float* dst = out + tile_floats * i;
      if (!decode_jpeg(paths[i], rgb, w, h)) {
        memset(dst, 0, tile_floats * sizeof(float));
        continue;
      }
      resize_normalize(rgb, w, h, size, mean, stdev, dst);
      ok.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"
