// Native dataset loader: PNG decode + threaded frame prefetch.
//
// Role parity: the reference's dataset IO layer is native C++ —
// `src/tum_rgbd/io.h` (TUMRGBD::Dataset, cv::imread per frame) and the
// CLI's per-frame load loop (`qsp_slam_rgbd.cc:329-361`).  Python/PIL
// decode costs ~10-20 ms/frame on the 4-core host and runs serially with
// tracking; this library decodes on a worker pool so the next frames'
// IO+decode overlap the current frame's device work.
//
// Scope: PNG color types 0 (gray), 2 (RGB), 6 (RGBA); bit depths 8 and 16
// (big-endian per spec); all five scanline filters; no Adam7 interlacing
// (returns an error -> the Python caller falls back to PIL).  RGB(A)
// converts to luminance with PIL's exact integer formula so native and
// fallback paths are bit-identical.
//
// Exposed via ctypes (see qsp_slam_tpu/data/native_loader.py).

#include <zlib.h>

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, channels = 0, bitdepth = 0;
  std::vector<uint8_t> data;  // unfiltered raw scanline bytes
};

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode a PNG byte buffer into raw (unfiltered) scanlines.
// Returns 0 on success, negative error code otherwise.
int decode_png(const uint8_t* buf, size_t n, Image* out) {
  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (n < 8 || std::memcmp(buf, magic, 8) != 0) return -1;
  size_t pos = 8;
  std::vector<uint8_t> idat;
  int w = 0, h = 0, bitdepth = 0, color = -1, interlace = 0;
  bool done = false;
  while (pos + 8 <= n && !done) {
    uint32_t len = be32(buf + pos);
    if (pos + 12 + len > n) return -2;
    const uint8_t* type = buf + pos + 4;
    const uint8_t* data = buf + pos + 8;
    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return -3;
      w = int(be32(data));
      h = int(be32(data + 4));
      bitdepth = data[8];
      color = data[9];
      interlace = data[12];
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      done = true;
    }
    pos += 12 + len;  // len + type + crc
  }
  if (w <= 0 || h <= 0 || idat.empty()) return -4;
  if (interlace != 0) return -5;  // Adam7 unsupported
  int channels;
  switch (color) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // rgb
    case 6: channels = 4; break;  // rgba
    default: return -6;           // palette / gray+alpha unsupported
  }
  if (bitdepth != 8 && bitdepth != 16) return -7;

  const int bypp = channels * bitdepth / 8;     // bytes per pixel
  const size_t stride = size_t(w) * bypp;       // bytes per scanline
  std::vector<uint8_t> raw(size_t(h) * (stride + 1));
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size())
    return -8;

  out->w = w;
  out->h = h;
  out->channels = channels;
  out->bitdepth = bitdepth;
  out->data.assign(size_t(h) * stride, 0);
  std::vector<uint8_t> prev(stride, 0);
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = out->data.data() + size_t(y) * stride;
    switch (filter) {
      case 0:
        std::memcpy(dst, src, stride);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < stride; ++x)
          dst[x] = uint8_t(src[x] + (x >= size_t(bypp) ? dst[x - bypp] : 0));
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x) dst[x] = uint8_t(src[x] + prev[x]);
        break;
      case 3:  // Average
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bypp) ? dst[x - bypp] : 0;
          dst[x] = uint8_t(src[x] + ((a + prev[x]) >> 1));
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bypp) ? dst[x - bypp] : 0;
          int c = x >= size_t(bypp) ? prev[x - bypp] : 0;
          dst[x] = uint8_t(src[x] + paeth(a, prev[x], c));
        }
        break;
      default:
        return -9;
    }
    std::memcpy(prev.data(), dst, stride);
  }
  return 0;
}

// Convert raw scanlines to float32.  to_gray: RGB(A) -> PIL's integer
// luminance ((R*19595 + G*38470 + B*7471 + 0x8000) >> 16); 16-bit values
// are big-endian per the PNG spec.  Every output value is multiplied by
// `scale` (1.0 for intensity images, 1/5000 for TUM depth).
void to_float(const Image& im, float scale, float* out) {
  const size_t npix = size_t(im.w) * im.h;
  if (im.bitdepth == 8) {
    if (im.channels == 1) {
      for (size_t i = 0; i < npix; ++i) out[i] = float(im.data[i]) * scale;
    } else {
      const int c = im.channels;
      for (size_t i = 0; i < npix; ++i) {
        const uint8_t* p = &im.data[i * c];
        uint32_t l = (uint32_t(p[0]) * 19595 + uint32_t(p[1]) * 38470 +
                      uint32_t(p[2]) * 7471 + 0x8000u) >> 16;
        out[i] = float(l) * scale;
      }
    }
  } else {  // 16-bit
    const int c = im.channels;
    for (size_t i = 0; i < npix; ++i) {
      const uint8_t* p = &im.data[i * c * 2];
      uint32_t v = (uint32_t(p[0]) << 8) | p[1];
      if (c >= 3) {
        uint32_t g = (uint32_t(p[2]) << 8) | p[3];
        uint32_t b = (uint32_t(p[4]) << 8) | p[5];
        v = (v * 19595u + g * 38470u + b * 7471u + 0x8000u) >> 16;
      }
      out[i] = float(v) * scale;
    }
  }
}

// Decode into an exactly-sized vector (pool path — no max buffer).
int load_png_vec(const char* path, float scale, std::vector<float>* out,
                 int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -100;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(n));
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(n), f);
  std::fclose(f);
  if (got != size_t(n)) return -101;
  Image im;
  int rc = decode_png(buf.data(), buf.size(), &im);
  if (rc != 0) return rc;
  out->resize(size_t(im.w) * im.h);
  to_float(im, scale, out->data());
  *w = im.w;
  *h = im.h;
  return 0;
}

int load_png_file(const char* path, float scale, float* out, int max_pixels,
                  int* w, int* h) {
  std::vector<float> v;
  int rc = load_png_vec(path, scale, &v, w, h);
  if (rc != 0) return rc;
  if (*w * *h > max_pixels) return -102;
  std::memcpy(out, v.data(), sizeof(float) * v.size());
  return 0;
}

// ---------------------------------------------------------------------------
// Prefetch pool: worker threads decode (rgb, depth) frame pairs ahead of
// the consumer (the reference overlaps IO with tracking via its reader
// thread; here a pool replaces it).
// ---------------------------------------------------------------------------

struct Frame {
  int rc = 1;  // 0 = ok
  int w = 0, h = 0;
  std::vector<float> gray, depth;
};

struct Task {
  int64_t idx;
  std::string rgb_path, depth_path;
  float depth_scale;
};

struct Pool {
  std::vector<std::thread> workers;
  std::deque<Task> queue;
  std::map<int64_t, Frame> ready;
  std::mutex mu;
  std::condition_variable cv_task, cv_done;
  bool stop = false;

  explicit Pool(int threads, int /*max_pixels_unused*/) {
    for (int i = 0; i < threads; ++i)
      workers.emplace_back([this] { run(); });
  }

  void run() {
    for (;;) {
      Task t;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_task.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        t = queue.front();
        queue.pop_front();
      }
      Frame f;
      int w1 = 0, h1 = 0, w2 = 0, h2 = 0;
      int rc1 = load_png_vec(t.rgb_path.c_str(), 1.0f, &f.gray, &w1, &h1);
      int rc2 = load_png_vec(t.depth_path.c_str(), t.depth_scale, &f.depth,
                             &w2, &h2);
      f.rc = (rc1 == 0 && rc2 == 0 && w1 == w2 && h1 == h2) ? 0 : -1;
      f.w = w1;
      f.h = h1;
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.emplace(t.idx, std::move(f));
      }
      cv_done.notify_all();
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_task.notify_all();
    for (auto& w : workers) w.join();
  }
};

}  // namespace

extern "C" {

// Synchronous single-image decode.  Returns 0 on success.
int ql_load_png(const char* path, float scale, float* out, int max_pixels,
                int* w, int* h) {
  return load_png_file(path, scale, out, max_pixels, w, h);
}

void* ql_pool_create(int threads, int max_pixels) {
  return new Pool(threads, max_pixels);
}

void ql_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

void ql_pool_submit(void* pool, int64_t idx, const char* rgb_path,
                    const char* depth_path, float depth_scale) {
  Pool* p = static_cast<Pool*>(pool);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->queue.push_back(Task{idx, rgb_path, depth_path, depth_scale});
  }
  p->cv_task.notify_one();
}

// Blocks until frame `idx` is decoded; copies into caller buffers of
// capacity `max_pixels` floats each.  Returns 0 on success, -1 if either
// image failed to decode natively, -102 if the caller buffer is too small.
int ql_pool_wait(void* pool, int64_t idx, float* gray, float* depth, int* w,
                 int* h, int max_pixels) {
  Pool* p = static_cast<Pool*>(pool);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_done.wait(lk, [&] { return p->ready.count(idx) > 0; });
  Frame f = std::move(p->ready[idx]);
  p->ready.erase(idx);
  lk.unlock();
  if (f.rc != 0) return f.rc;
  if (f.w * f.h > max_pixels) return -102;
  std::memcpy(gray, f.gray.data(), sizeof(float) * size_t(f.w) * f.h);
  std::memcpy(depth, f.depth.data(), sizeof(float) * size_t(f.w) * f.h);
  *w = f.w;
  *h = f.h;
  return 0;
}

}  // extern "C"
