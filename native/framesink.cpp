// Async frame sink: threaded PNG writer for the interactive render loop.
//
// The reference's interactive loop displays frames through dearpygui on the
// render thread (reference: nerf/gui.py:948). Our headless loop writes
// PNGs; encoding 800x800 in Python costs ~25 ms — comparable to a whole
// TPU frame. This native sink accepts raw RGB8 frames and encodes/writes
// them on worker threads so the TPU loop never blocks.
//
// Plain C ABI (ctypes-friendly; pybind11 is not available in this image).
// PNG encoding is self-contained on top of zlib.
//
// Build: native/build.sh  ->  pienerf_tpu/io/_framesink.so

#include <zlib.h>

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24);
  v.push_back((x >> 16) & 0xff);
  v.push_back((x >> 8) & 0xff);
  v.push_back(x & 0xff);
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t n) {
  put_be32(out, static_cast<uint32_t>(n));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  out.insert(out.end(), data, data + n);
  uint32_t crc = crc32(0, out.data() + start, static_cast<uInt>(n + 4));
  put_be32(out, crc);
}

// minimal RGB8 PNG encoder (filter 0 rows + zlib stream)
std::vector<uint8_t> encode_png(const uint8_t* rgb, int w, int h) {
  std::vector<uint8_t> raw;
  raw.reserve(static_cast<size_t>(h) * (1 + 3 * w));
  for (int y = 0; y < h; y++) {
    raw.push_back(0);  // filter type: none
    raw.insert(raw.end(), rgb + static_cast<size_t>(y) * w * 3,
               rgb + static_cast<size_t>(y + 1) * w * 3);
  }
  uLongf zcap = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> z(zcap);
  compress2(z.data(), &zcap, raw.data(), static_cast<uLong>(raw.size()), 6);
  z.resize(zcap);

  std::vector<uint8_t> out;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = w >> 24; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff; ihdr[3] = w & 0xff;
  ihdr[4] = h >> 24; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff; ihdr[7] = h & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type: RGB
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", z.data(), z.size());
  put_chunk(out, "IEND", nullptr, 0);
  return out;
}

struct Job {
  std::string path;
  std::vector<uint8_t> rgb;
  int w, h;
};

struct Sink {
  std::queue<Job> q;
  std::mutex mu;
  std::condition_variable cv;
  std::vector<std::thread> workers;
  bool stop = false;
  int pending = 0;
  std::condition_variable cv_done;

  explicit Sink(int nthreads) {
    for (int i = 0; i < nthreads; i++) {
      workers.emplace_back([this] { run(); });
    }
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stop || !q.empty(); });
        if (q.empty()) {
          if (stop) return;
          continue;
        }
        job = std::move(q.front());
        q.pop();
      }
      auto png = encode_png(job.rgb.data(), job.w, job.h);
      FILE* f = fopen(job.path.c_str(), "wb");
      if (f) {
        fwrite(png.data(), 1, png.size(), f);
        fclose(f);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        pending--;
        cv_done.notify_all();
      }
    }
  }

  void push(const char* path, const uint8_t* rgb, int w, int h) {
    Job job;
    job.path = path;
    job.rgb.assign(rgb, rgb + static_cast<size_t>(w) * h * 3);
    job.w = w;
    job.h = h;
    {
      std::lock_guard<std::mutex> lk(mu);
      q.push(std::move(job));
      pending++;
    }
    cv.notify_one();
  }

  void flush() {
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [this] { return pending == 0; });
  }

  ~Sink() {
    flush();
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& t : workers) t.join();
  }
};

}  // namespace

extern "C" {

void* framesink_create(int nthreads) { return new Sink(nthreads); }

void framesink_push(void* sink, const char* path, const uint8_t* rgb,
                    int w, int h) {
  static_cast<Sink*>(sink)->push(path, rgb, w, h);
}

void framesink_flush(void* sink) { static_cast<Sink*>(sink)->flush(); }

void framesink_destroy(void* sink) { delete static_cast<Sink*>(sink); }

// synchronous single-shot encoder (testing / fallback use)
int framesink_write_png(const char* path, const uint8_t* rgb, int w, int h) {
  auto png = encode_png(rgb, w, h);
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  fwrite(png.data(), 1, png.size(), f);
  fclose(f);
  return 0;
}

}  // extern "C"
