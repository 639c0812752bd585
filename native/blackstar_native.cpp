// blackstar_native — native runtime support for the blackstar_tpu framework.
//
// The reference is pure Haskell with no native runtime (SURVEY.md §2); this
// library is the production-IO layer the TPU framework adds around the JAX
// compute path:
//
//   * sRGB gamma encode + uint8 quantisation (multithreaded, matches
//     Raytracer.hs:23-27 semantics incl. round-half-even `toWord8`)
//   * PNG encoding (zlib deflate) and file write
//   * an asynchronous frame-writer pool: the render loop submits frames and
//     keeps the TPU busy while worker threads gamma-encode/compress/write —
//     the throughput path for batch/animation rendering (app/Main.hs:64-78).
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (blackstar_tpu/native.py).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// sRGB encode (linear float -> gamma uint8)
// ---------------------------------------------------------------------------

inline uint8_t srgb_u8(float x) {
  float v = x < 0.0031308f ? 12.92f * x
                           : 1.055f * std::pow(std::max(x, 0.0031308f),
                                               1.0f / 2.4f) -
                                 0.055f;
  v = std::min(std::max(v, 0.0f), 1.0f) * 255.0f;
  // Round-half-even to match numpy rint / Haskell toWord8.
  return static_cast<uint8_t>(std::nearbyint(v));
}

void srgb_encode_rows(const float* in, uint8_t* out, int64_t n, int n_threads) {
  if (n_threads <= 1 || n < (1 << 16)) {
    for (int64_t i = 0; i < n; ++i) out[i] = srgb_u8(in[i]);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=] {
      for (int64_t i = lo; i < hi; ++i) out[i] = srgb_u8(in[i]);
    });
  }
  for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------------
// PNG encoding
// ---------------------------------------------------------------------------

void put_u32be(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24);
  v.push_back((x >> 16) & 0xff);
  v.push_back((x >> 8) & 0xff);
  v.push_back(x & 0xff);
}

void put_chunk(std::vector<uint8_t>& out, const char tag[4],
               const uint8_t* data, size_t len) {
  put_u32be(out, static_cast<uint32_t>(len));
  size_t tag_pos = out.size();
  out.insert(out.end(), tag, tag + 4);
  out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + tag_pos, static_cast<uInt>(4 + len));
  put_u32be(out, crc);
}

// RGB8 rows -> complete PNG byte stream (filter 0 per row).
bool encode_png(const uint8_t* rgb, int w, int h, int level,
                std::vector<uint8_t>& out) {
  const size_t stride = static_cast<size_t>(w) * 3;
  std::vector<uint8_t> raw((stride + 1) * h);
  for (int y = 0; y < h; ++y) {
    raw[y * (stride + 1)] = 0;  // filter type 0 (None)
    std::memcpy(&raw[y * (stride + 1) + 1], rgb + y * stride, stride);
  }

  uLongf bound = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> z(bound);
  if (compress2(z.data(), &bound, raw.data(), static_cast<uLong>(raw.size()),
                level) != Z_OK)
    return false;
  z.resize(bound);

  out.clear();
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = w >> 24; ihdr[1] = (w >> 16) & 0xff; ihdr[2] = (w >> 8) & 0xff;
  ihdr[3] = w & 0xff;
  ihdr[4] = h >> 24; ihdr[5] = (h >> 16) & 0xff; ihdr[6] = (h >> 8) & 0xff;
  ihdr[7] = h & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // colour type: truecolour RGB
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", z.data(), z.size());
  put_chunk(out, "IEND", nullptr, 0);
  return true;
}

bool write_file(const char* path, const std::vector<uint8_t>& bytes) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  size_t n = std::fwrite(bytes.data(), 1, bytes.size(), f);
  std::fclose(f);
  return n == bytes.size();
}

// ---------------------------------------------------------------------------
// Async frame-writer pool
// ---------------------------------------------------------------------------

struct Job {
  std::string path;
  std::vector<float> linear;  // owned copy of the linear RGB frame, or
  std::vector<uint8_t> rgb8;  // an already-encoded sRGB frame (one is empty)
  int w, h, level;
};

struct Writer {
  std::deque<Job> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::condition_variable done_cv;
  std::vector<std::thread> threads;
  std::atomic<int> errors{0};
  int in_flight = 0;
  bool stop = false;

  explicit Writer(int n_threads) {
    for (int i = 0; i < n_threads; ++i)
      threads.emplace_back([this] { run(); });
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stop || !queue.empty(); });
        if (queue.empty()) return;  // stop && drained
        job = std::move(queue.front());
        queue.pop_front();
      }
      const int64_t n = static_cast<int64_t>(job.w) * job.h * 3;
      std::vector<uint8_t> rgb8;
      if (job.rgb8.empty()) {
        rgb8.resize(n);
        srgb_encode_rows(job.linear.data(), rgb8.data(), n, 1);
      } else {
        rgb8 = std::move(job.rgb8);
      }
      std::vector<uint8_t> png;
      bool ok = encode_png(rgb8.data(), job.w, job.h, job.level, png) &&
                write_file(job.path.c_str(), png);
      if (!ok) errors.fetch_add(1);
      {
        std::lock_guard<std::mutex> lk(mu);
        --in_flight;
      }
      done_cv.notify_all();
    }
  }

  void submit(const char* path, const float* linear, int w, int h, int level) {
    Job job;
    job.path = path;
    job.linear.assign(linear, linear + static_cast<int64_t>(w) * h * 3);
    job.w = w; job.h = h; job.level = level;
    enqueue(std::move(job));
  }

  void submit_rgb8(const char* path, const uint8_t* rgb, int w, int h,
                   int level) {
    Job job;
    job.path = path;
    job.rgb8.assign(rgb, rgb + static_cast<int64_t>(w) * h * 3);
    job.w = w; job.h = h; job.level = level;
    enqueue(std::move(job));
  }

  void enqueue(Job&& job) {
    {
      std::lock_guard<std::mutex> lk(mu);
      queue.push_back(std::move(job));
      ++in_flight;
    }
    cv.notify_one();
  }

  int wait() {
    std::unique_lock<std::mutex> lk(mu);
    done_cv.wait(lk, [this] { return in_flight == 0; });
    return errors.load();
  }

  ~Writer() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& t : threads) t.join();
  }
};

}  // namespace

extern "C" {

// Linear float RGB (h*w*3) -> sRGB uint8, multithreaded.
void bs_srgb_encode(const float* in, uint8_t* out, int64_t n, int n_threads) {
  srgb_encode_rows(in, out, n, n_threads);
}

// Synchronous: uint8 RGB -> PNG file. Returns 0 on success.
int bs_write_png_rgb8(const char* path, const uint8_t* rgb, int w, int h,
                      int level) {
  std::vector<uint8_t> png;
  if (!encode_png(rgb, w, h, level, png)) return 1;
  return write_file(path, png) ? 0 : 2;
}

// Synchronous: linear float RGB -> sRGB -> PNG file. Returns 0 on success.
int bs_write_png_linear(const char* path, const float* linear, int w, int h,
                        int level, int n_threads) {
  const int64_t n = static_cast<int64_t>(w) * h * 3;
  std::vector<uint8_t> rgb8(n);
  srgb_encode_rows(linear, rgb8.data(), n, n_threads);
  return bs_write_png_rgb8(path, rgb8.data(), w, h, level);
}

void* bs_writer_create(int n_threads) {
  return new Writer(n_threads > 0 ? n_threads : 2);
}

void bs_writer_submit(void* writer, const char* path, const float* linear,
                      int w, int h, int level) {
  static_cast<Writer*>(writer)->submit(path, linear, w, h, level);
}

// Like bs_writer_submit but for frames already quantised to sRGB uint8
// (e.g. encoded on-device so only a quarter of the bytes cross the host
// boundary).
void bs_writer_submit_rgb8(void* writer, const char* path, const uint8_t* rgb,
                           int w, int h, int level) {
  static_cast<Writer*>(writer)->submit_rgb8(path, rgb, w, h, level);
}

// Blocks until all submitted frames are on disk; returns the error count.
int bs_writer_wait(void* writer) { return static_cast<Writer*>(writer)->wait(); }

void bs_writer_destroy(void* writer) { delete static_cast<Writer*>(writer); }

}  // extern "C"
