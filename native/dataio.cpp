// mvi_dataio: native image decoding + threaded prefetch for the training
// input pipeline.
//
// The reference feeds its SVD trainer through torch DataLoader worker
// processes (C++ under the hood; num_workers=4 in the configs). This is
// the TPU-framework counterpart: a small C library that decodes PNG
// (critical chunks, zlib inflate, all 5 scanline filters, 8-bit
// gray/RGB/RGBA -> RGB8) and prefetches whole files on a pthread pool so
// the JAX host thread never blocks on disk or decode.
//
// Exposed C ABI (consumed via ctypes from
// multiview_inpaint_tpu/data/native_io.py):
//   mvi_png_info(data, len, &w, &h)                -> 0 on success
//   mvi_png_decode_rgb8(data, len, out, w, h)      -> 0 on success
//   mvi_loader_create(n_threads)                   -> handle
//   mvi_loader_submit(h, id, path)                 -> enqueue file
//   mvi_loader_take_rgb8(h, id, out, cap, &w, &h)  -> blocks until ready
//   mvi_loader_destroy(h)
//
// Build: make -C native   (g++ -O2 -shared -fPIC, links zlib)

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

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct PngInfo {
  int w = 0, h = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
};

// Parse critical chunks. Returns empty string on success, error otherwise.
std::string parse_png(const uint8_t* data, size_t len, PngInfo* out) {
  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || memcmp(data, magic, 8) != 0) return "not a PNG";
  size_t pos = 8;
  bool saw_ihdr = false;
  while (pos + 8 <= len) {
    uint32_t clen = be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + clen > len) return "truncated chunk";
    if (!memcmp(type, "IHDR", 4)) {
      if (clen != 13) return "bad IHDR";
      out->w = int(be32(body));
      out->h = int(be32(body + 4));
      out->bit_depth = body[8];
      out->color_type = body[9];
      out->interlace = body[12];
      saw_ihdr = true;
    } else if (!memcmp(type, "IDAT", 4)) {
      out->idat.insert(out->idat.end(), body, body + clen);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  if (!saw_ihdr) return "missing IHDR";
  if (out->interlace) return "interlaced PNG unsupported";
  if (out->bit_depth != 8) return "only 8-bit PNGs supported";
  if (out->color_type != 0 && out->color_type != 2 && out->color_type != 6)
    return "only gray/RGB/RGBA supported";
  return "";
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

std::string decode_rgb8(const PngInfo& info, uint8_t* out) {
  int ch = info.color_type == 0 ? 1 : (info.color_type == 2 ? 3 : 4);
  size_t stride = size_t(info.w) * ch;
  std::vector<uint8_t> raw((stride + 1) * info.h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, info.idat.data(),
                 info.idat.size()) != Z_OK)
    return "inflate failed";
  std::vector<uint8_t> prev(stride, 0), cur(stride);
  for (int y = 0; y < info.h; ++y) {
    const uint8_t* line = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = line[0];
    const uint8_t* src = line + 1;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(ch) ? cur[x - ch] : 0;
      int b = prev[x];
      int c = x >= size_t(ch) ? prev[x - ch] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return "bad filter byte";
      }
      cur[x] = uint8_t(v);
    }
    uint8_t* dst = out + size_t(y) * info.w * 3;
    if (ch == 3) {
      memcpy(dst, cur.data(), stride);
    } else if (ch == 1) {
      for (int x = 0; x < info.w; ++x)
        dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = cur[x];
    } else {  // RGBA -> RGB
      for (int x = 0; x < info.w; ++x) {
        dst[3 * x] = cur[4 * x];
        dst[3 * x + 1] = cur[4 * x + 1];
        dst[3 * x + 2] = cur[4 * x + 2];
      }
    }
    std::swap(prev, cur);
  }
  return "";
}

struct Result {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  std::string error;
  bool ready = false;
};

struct Loader {
  std::vector<std::thread> threads;
  std::deque<std::pair<int64_t, std::string>> queue;
  std::map<int64_t, Result> results;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  bool stop = false;

  explicit Loader(int n) {
    for (int i = 0; i < n; ++i)
      threads.emplace_back([this] { worker(); });
  }

  void worker() {
    for (;;) {
      std::pair<int64_t, std::string> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        job = queue.front();
        queue.pop_front();
      }
      Result r;
      FILE* f = fopen(job.second.c_str(), "rb");
      if (!f) {
        r.error = "open failed: " + job.second;
      } else {
        fseek(f, 0, SEEK_END);
        long n = ftell(f);
        fseek(f, 0, SEEK_SET);
        std::vector<uint8_t> buf(static_cast<size_t>(n), 0);
        if (fread(buf.data(), 1, size_t(n), f) != size_t(n))
          r.error = "read failed";
        fclose(f);
        if (r.error.empty()) {
          PngInfo info;
          r.error = parse_png(buf.data(), buf.size(), &info);
          if (r.error.empty()) {
            r.w = info.w;
            r.h = info.h;
            r.rgb.resize(size_t(info.w) * info.h * 3);
            r.error = decode_rgb8(info, r.rgb.data());
          }
        }
      }
      r.ready = true;
      {
        std::lock_guard<std::mutex> lk(mu);
        results[job.first] = std::move(r);
      }
      cv_done.notify_all();
    }
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_work.notify_all();
    for (auto& t : threads) t.join();
  }
};

}  // namespace

extern "C" {

int mvi_png_info(const uint8_t* data, size_t len, int* w, int* h) {
  PngInfo info;
  std::string err = parse_png(data, len, &info);
  if (!err.empty()) return -1;
  *w = info.w;
  *h = info.h;
  return 0;
}

int mvi_png_decode_rgb8(const uint8_t* data, size_t len, uint8_t* out,
                        int w, int h) {
  PngInfo info;
  std::string err = parse_png(data, len, &info);
  if (!err.empty() || info.w != w || info.h != h) return -1;
  return decode_rgb8(info, out).empty() ? 0 : -2;
}

void* mvi_loader_create(int n_threads) {
  return new Loader(n_threads > 0 ? n_threads : 4);
}

void mvi_loader_submit(void* handle, int64_t id, const char* path) {
  auto* l = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->queue.emplace_back(id, std::string(path));
  }
  l->cv_work.notify_one();
}

// Blocks until the id is decoded; copies at most `cap` bytes of RGB8.
// Returns 0 ok, -1 error, -2 buffer too small.
int mvi_loader_take_rgb8(void* handle, int64_t id, uint8_t* out,
                         size_t cap, int* w, int* h) {
  auto* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_done.wait(lk, [&] {
    auto it = l->results.find(id);
    return it != l->results.end() && it->second.ready;
  });
  Result r = std::move(l->results[id]);
  l->results.erase(id);
  lk.unlock();
  if (!r.error.empty()) return -1;
  if (r.rgb.size() > cap) return -2;
  memcpy(out, r.rgb.data(), r.rgb.size());
  *w = r.w;
  *h = r.h;
  return 0;
}

void mvi_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

}  // extern "C"
