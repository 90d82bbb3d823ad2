// Native batch WAV decoder for the host input pipeline.
//
// The reference leans on librosa (Python) inside torch DataLoader worker
// processes (data.py:254-256, train.py:109-113). Here the host decode path
// is a small C++ library driven from Python via ctypes: RIFF/WAVE parsing
// for PCM 8/16/24/32 and IEEE float32/64, mono mixdown, and a std::thread
// pool for batch decode — no GIL contention with the JAX dispatch thread,
// one pread-style read per file.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread wavloader.cpp -o libwavloader.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Fmt {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t rate = 0;
  uint16_t bits = 0;
};

// Reads the whole file; returns true on success.
bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n < 44) { std::fclose(f); return false; }
  buf->resize(static_cast<size_t>(n));
  size_t got = std::fread(buf->data(), 1, buf->size(), f);
  std::fclose(f);
  return got == buf->size();
}

uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }

// Parses fmt + data chunk locations. Returns false on malformed input.
bool parse(const std::vector<uint8_t>& b, Fmt* fmt, const uint8_t** data,
           uint32_t* data_len) {
  if (b.size() < 12 || std::memcmp(b.data(), "RIFF", 4) ||
      std::memcmp(b.data() + 8, "WAVE", 4))
    return false;
  size_t pos = 12;
  bool have_fmt = false, have_data = false;
  while (pos + 8 <= b.size()) {
    uint32_t size = rd32(&b[pos + 4]);
    const uint8_t* body = &b[pos + 8];
    if (pos + 8 + size > b.size()) size = static_cast<uint32_t>(b.size() - pos - 8);
    if (!std::memcmp(&b[pos], "fmt ", 4) && size >= 16) {
      fmt->format = rd16(body);
      fmt->channels = rd16(body + 2);
      fmt->rate = rd32(body + 4);
      fmt->bits = rd16(body + 14);
      if (fmt->format == 0xFFFE) fmt->format = (fmt->bits == 32 || fmt->bits == 64) ? 3 : 1;
      have_fmt = true;
    } else if (!std::memcmp(&b[pos], "data", 4)) {
      *data = body;
      *data_len = size;
      have_data = true;
    }
    pos += 8 + size + (size & 1);
  }
  return have_fmt && have_data && fmt->channels > 0;
}

// Decodes to mono float32; returns sample count or -1.
long decode(const std::vector<uint8_t>& b, float* out, long max_samples,
            uint32_t* rate_out) {
  Fmt fmt;
  const uint8_t* data = nullptr;
  uint32_t len = 0;
  if (!parse(b, &fmt, &data, &len)) return -1;
  if (rate_out) *rate_out = fmt.rate;
  const int ch = fmt.channels;
  const int bytes = fmt.bits / 8;
  if (bytes == 0) return -1;
  long frames = len / (ch * bytes);
  if (frames > max_samples) frames = max_samples;
  const float inv_ch = 1.0f / ch;

  for (long i = 0; i < frames; ++i) {
    float acc = 0.0f;
    for (int c = 0; c < ch; ++c) {
      const uint8_t* p = data + (i * ch + c) * bytes;
      float v;
      if (fmt.format == 1) {  // PCM
        switch (fmt.bits) {
          case 16: v = static_cast<int16_t>(rd16(p)) / 32768.0f; break;
          case 32: v = static_cast<int32_t>(rd32(p)) / 2147483648.0f; break;
          case 24: {
            int32_t s = p[0] | (p[1] << 8) | (p[2] << 16);
            s = (s << 8) >> 8;  // sign-extend
            v = s / 8388608.0f;
            break;
          }
          case 8: v = (static_cast<int>(p[0]) - 128) / 128.0f; break;
          default: return -1;
        }
      } else if (fmt.format == 3) {  // IEEE float
        if (fmt.bits == 32) {
          float fv;
          std::memcpy(&fv, p, 4);
          v = fv;
        } else if (fmt.bits == 64) {
          double dv;
          std::memcpy(&dv, p, 8);
          v = static_cast<float>(dv);
        } else {
          return -1;
        }
      } else {
        return -1;
      }
      acc += v;
    }
    out[i] = acc * inv_ch;
  }
  return frames;
}

}  // namespace

extern "C" {

// Decode one file to mono float32. Returns sample count or -1.
// rate_out may be null.
long wav_decode(const char* path, float* out, long max_samples,
                uint32_t* rate_out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  return decode(buf, out, max_samples, rate_out);
}

namespace {

// Persistent worker pool: spawned once, jobs dispatched via a shared batch
// descriptor (per-call thread spawn dominated latency on small batches).

struct BatchJob {
  const char** paths = nullptr;
  int n = 0;
  float* out = nullptr;
  long max_samples = 0;
  long* lengths = nullptr;
  uint32_t* rates = nullptr;
};

struct Pool {
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::vector<std::thread> workers;
  BatchJob job;
  std::atomic<int> next{0};
  std::atomic<int> done{0};
  std::atomic<int> failed{0};
  int active = 0;   // workers inside the item loop (guarded by mu)
  bool busy = false;  // a run() is in flight (guarded by mu)
  uint64_t generation = 0;
  bool stop = false;

  void worker_loop() {
    uint64_t seen = 0;
    for (;;) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return stop || generation != seen; });
        if (stop) return;
        seen = generation;
        ++active;
      }
      for (;;) {
        int i = next.fetch_add(1);
        if (i >= job.n) break;
        uint32_t rate = 0;
        long got = wav_decode(job.paths[i],
                              job.out + static_cast<long>(i) * job.max_samples,
                              job.max_samples, &rate);
        job.lengths[i] = got;
        if (job.rates) job.rates[i] = rate;
        if (got < 0) failed.store(1);
        done.fetch_add(1);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        --active;
        cv_done.notify_all();
      }
    }
  }

  void ensure(int n_threads) {
    while (static_cast<int>(workers.size()) < n_threads)
      workers.emplace_back([this] { worker_loop(); });
  }

  int run(const BatchJob& j, int n_threads) {
    std::unique_lock<std::mutex> lk(mu);
    // cv_done.wait below RELEASES mu, so the mutex alone does not exclude
    // a second caller from swapping the job mid-flight; busy does.
    cv_done.wait(lk, [&] { return !busy; });
    busy = true;
    ensure(n_threads);
    job = j;
    done.store(0);
    failed.store(0);
    next.store(0);
    ++generation;
    cv_work.notify_all();
    // Completion requires BOTH all items done and all woken workers back
    // out of the item loop — a worker paused between fetch_add and the
    // bounds check must not overlap the next run()'s setup.
    cv_done.wait(lk, [&] { return done.load() >= job.n && active == 0; });
    busy = false;
    int rc = failed.load() ? -1 : 0;
    cv_done.notify_all();  // wake queued callers
    return rc;
  }
};

Pool* pool() {
  // Intentionally leaked: joinable std::threads in a static's destructor
  // would std::terminate at process exit.
  static Pool* p = new Pool();
  return p;
}

}  // namespace

// Parallel batch decode. paths[n]; out is [n, max_samples] row-major;
// lengths[n] receives per-file sample counts (-1 on error); rates[n]
// receives sample rates (may be null). Returns 0, or -1 if any file failed.
int wav_decode_batch(const char** paths, int n, float* out, long max_samples,
                     long* lengths, uint32_t* rates, int n_threads) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  if (n == 1) {
    uint32_t rate = 0;
    lengths[0] = wav_decode(paths[0], out, max_samples, &rate);
    if (rates) rates[0] = rate;
    return lengths[0] < 0 ? -1 : 0;
  }
  BatchJob j{paths, n, out, max_samples, lengths, rates};
  return pool()->run(j, n_threads < n ? n_threads : n);
}

}  // extern "C"
