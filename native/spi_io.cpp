// spi_io: native host-side image pipeline for the TPU framework.
//
// Role: the runtime-native equivalent of the reference's dataloader +
// custom-op layer for the HOST side of the system (the device side is
// Pallas/XLA). GAN training and batched inversion are fed from disk;
// Python-side PIL decode of 512^2 JPEGs is the host bottleneck when a
// TPU chip consumes thousands of images per second. This library does
// threaded JPEG/PNG decode -> bilinear resize -> float32 CHW [-1,1]
// normalization with a bounded prefetch queue, exposed through a flat
// C ABI consumed via ctypes (spi_tpu/data/native_loader.py).
//
// Build: `make -C native` -> libspi_io.so (links system libjpeg/libpng).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC interleaved
};

// ---------------------------------------------------------------- JPEG --
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const uint8_t* bytes, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(bytes), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG --
struct PngReadCtx {
  const uint8_t* bytes;
  size_t len, pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->pos + n > ctx->len) {
    png_error(png, "short read");
  }
  memcpy(out, ctx->bytes + ctx->pos, n);
  ctx->pos += n;
}

bool decode_png(const uint8_t* bytes, size_t len, Image* out) {
  if (png_sig_cmp(bytes, 0, 8) != 0) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadCtx ctx{bytes, len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_any(const uint8_t* bytes, size_t len, Image* out) {
  if (len > 3 && bytes[0] == 0xFF && bytes[1] == 0xD8)
    return decode_jpeg(bytes, len, out);
  if (len > 8 && png_sig_cmp(bytes, 0, 8) == 0)
    return decode_png(bytes, len, out);
  return false;
}

// --------------------------------------------------------------- resize --
// Bilinear, half-pixel centers (matches torch interpolate
// align_corners=False / the framework's resize_bilinear).
void resize_normalize_chw(const Image& img, int size, float* out) {
  const float sx = float(img.w) / size;
  const float sy = float(img.h) / size;
  for (int oy = 0; oy < size; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = (int)floorf(fy);
    float ty = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= img.h ? img.h - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= img.h ? img.h - 1 : y0 + 1);
    for (int ox = 0; ox < size; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = (int)floorf(fx);
      float tx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= img.w ? img.w - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= img.w ? img.w - 1 : x0 + 1);
      const uint8_t* p00 = &img.data[(size_t(y0c) * img.w + x0c) * 3];
      const uint8_t* p01 = &img.data[(size_t(y0c) * img.w + x1c) * 3];
      const uint8_t* p10 = &img.data[(size_t(y1c) * img.w + x0c) * 3];
      const uint8_t* p11 = &img.data[(size_t(y1c) * img.w + x1c) * 3];
      for (int ch = 0; ch < 3; ++ch) {
        float top = p00[ch] * (1 - tx) + p01[ch] * tx;
        float bot = p10[ch] * (1 - tx) + p11[ch] * tx;
        float v = top * (1 - ty) + bot * ty;
        // CHW, [-1, 1]
        out[(size_t(ch) * size + oy) * size + ox] = v / 127.5f - 1.0f;
      }
    }
  }
}

bool load_file(const std::string& path, std::vector<uint8_t>* bytes) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  bytes->resize(n);
  size_t got = fread(bytes->data(), 1, n, f);
  fclose(f);
  return got == size_t(n);
}

// --------------------------------------------------------------- loader --
struct Batch {
  std::vector<float> data;
  std::vector<int64_t> indices;
};

struct Loader {
  std::vector<std::string> paths;
  int out_size, batch, n_threads;
  bool shuffle;
  uint64_t seed;
  size_t max_queue;

  std::vector<std::thread> workers;
  std::deque<Batch> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::atomic<bool> stop{false};

  // index stream state (InfiniteSampler-style endless shuffle)
  std::vector<int64_t> order;
  size_t cursor = 0;
  std::mt19937_64 rng;
  std::mutex idx_mu;

  int64_t next_index() {
    std::lock_guard<std::mutex> lk(idx_mu);
    if (cursor >= order.size()) {
      cursor = 0;
      if (shuffle) std::shuffle(order.begin(), order.end(), rng);
    }
    return order[cursor++];
  }

  void worker() {
    const size_t img_floats = size_t(3) * out_size * out_size;
    while (!stop.load()) {
      Batch b;
      b.data.resize(img_floats * batch);
      b.indices.resize(batch);
      for (int i = 0; i < batch; ++i) {
        int64_t idx = next_index();
        b.indices[i] = idx;
        std::vector<uint8_t> bytes;
        Image img;
        if (!load_file(paths[idx], &bytes) ||
            !decode_any(bytes.data(), bytes.size(), &img)) {
          // unreadable image: zero-fill and mark with negative index
          // (caller decides; mirrors the reference's per-image try/except)
          b.indices[i] = -1 - idx;
          memset(b.data.data() + i * img_floats, 0, img_floats * sizeof(float));
          continue;
        }
        resize_normalize_chw(img, out_size, b.data.data() + i * img_floats);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] { return queue.size() < max_queue || stop.load(); });
      if (stop.load()) return;
      queue.push_back(std::move(b));
      cv_pop.notify_one();
    }
  }
};

}  // namespace

extern "C" {

// One-shot decode: bytes -> float32 CHW [-1,1] at out_size^2. Returns 0 on
// success.
int spi_decode_image(const uint8_t* bytes, int64_t len, int out_size,
                     float* out) {
  Image img;
  if (!decode_any(bytes, size_t(len), &img)) return 1;
  resize_normalize_chw(img, out_size, out);
  return 0;
}

// paths: '\n'-joined file list.
void* spi_loader_create(const char* paths_joined, int64_t n_paths,
                        int out_size, int batch, int n_threads,
                        uint64_t seed, int shuffle, int max_queue) {
  auto* L = new Loader();
  L->out_size = out_size;
  L->batch = batch;
  L->n_threads = n_threads;
  L->shuffle = shuffle != 0;
  L->seed = seed;
  L->max_queue = max_queue > 0 ? max_queue : 4;
  std::string all(paths_joined);
  size_t start = 0;
  while (start < all.size() && int64_t(L->paths.size()) < n_paths) {
    size_t nl = all.find('\n', start);
    if (nl == std::string::npos) nl = all.size();
    L->paths.emplace_back(all.substr(start, nl - start));
    start = nl + 1;
  }
  L->order.resize(L->paths.size());
  for (size_t i = 0; i < L->order.size(); ++i) L->order[i] = i;
  L->rng.seed(seed);
  if (L->shuffle) std::shuffle(L->order.begin(), L->order.end(), L->rng);
  L->cursor = 0;
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

// Blocks until a batch is ready. out: (batch, 3, S, S) float32;
// indices: (batch,) int64 (negative = decode failure of index -1-i).
int spi_loader_next(void* handle, float* out, int64_t* indices) {
  auto* L = static_cast<Loader*>(handle);
  Batch b;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_pop.wait(lk, [&] { return !L->queue.empty() || L->stop.load(); });
    if (L->queue.empty()) return 1;
    b = std::move(L->queue.front());
    L->queue.pop_front();
    L->cv_push.notify_one();
  }
  memcpy(out, b.data.data(), b.data.size() * sizeof(float));
  memcpy(indices, b.indices.data(), b.indices.size() * sizeof(int64_t));
  return 0;
}

void spi_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_push.notify_all();
  L->cv_pop.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
