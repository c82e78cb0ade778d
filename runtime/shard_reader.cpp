// Native ray-shard reader: parallel .npy batch assembly for the R2L input
// pipeline.
//
// The training corpus is O(100k) small .npy shards ([4096, 9+] float32,
// reference create_data.py:854-872). Python-side assembly (np.load +
// np.concatenate per batch) burns the host CPUs the trainer needs for
// dispatch; this library assembles batches with a C++ thread pool reading
// straight into one contiguous destination buffer (zero intermediate
// copies), exposed through a C ABI consumed via ctypes
// (efficient_nerf_tpu/data/native.py).
//
// Only the .npy subset the pipeline produces is supported: v1.x/2.x header,
// little-endian f4, C-order.

#include <fcntl.h>
#include <unistd.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyInfo {
  size_t data_offset = 0;
  size_t rows = 0;
  size_t cols = 0;
};

// Parse enough of the .npy header to locate the f4 C-order payload.
// Returns false on malformed/unsupported files.
bool parse_npy_header(FILE* f, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  const int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    uint16_t len16;
    if (fread(&len16, 2, 1, f) != 1) return false;
    header_len = len16;
    info->data_offset = 10 + header_len;
  } else {
    if (fread(&header_len, 4, 1, f) != 1) return false;
    info->data_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(header.data(), 1, header_len, f) != header_len) return false;

  if (header.find("'<f4'") == std::string::npos &&
      header.find("'|f4'") == std::string::npos)
    return false;
  if (header.find("'fortran_order': False") == std::string::npos)
    return false;

  const size_t sp = header.find("'shape':");
  if (sp == std::string::npos) return false;
  const size_t open = header.find('(', sp);
  const size_t close = header.find(')', open);
  if (open == std::string::npos || close == std::string::npos) return false;
  std::string dims = header.substr(open + 1, close - open - 1);
  size_t r = 0, c = 1;
  if (sscanf(dims.c_str(), "%zu , %zu", &r, &c) < 1) {
    if (sscanf(dims.c_str(), "%zu,%zu", &r, &c) < 1) return false;
  }
  info->rows = r;
  info->cols = c;
  return true;
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { Loop(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

struct Reader {
  std::vector<std::string> paths;
  size_t rows;
  size_t cols;
  std::unique_ptr<ThreadPool> pool;
};

// Read one shard's payload into dst ([rows * cols] floats) with raw
// open/pread (single syscall for the payload; stdio buffering measurably
// loses to numpy on small files). Short files are zero-filled; returns 0 on
// success, negative on error.
int read_shard(const std::string& path, size_t rows, size_t cols, float* dst) {
  const int fd = open(path.c_str(), O_RDONLY);
  if (fd < 0) return -1;
  // headers for our shard sizes fit well within 512 bytes
  unsigned char head[512];
  const ssize_t hgot = pread(fd, head, sizeof(head), 0);
  if (hgot < 16) {
    close(fd);
    return -2;
  }
  FILE* hf = fmemopen(head, (size_t)hgot, "rb");
  NpyInfo info;
  const bool ok = hf && parse_npy_header(hf, &info);
  if (hf) fclose(hf);
  if (!ok || info.cols != cols || info.data_offset > (size_t)hgot) {
    close(fd);
    return -2;
  }
  const size_t want_bytes = std::min(info.rows, rows) * cols * sizeof(float);
  size_t off = 0;
  while (off < want_bytes) {
    const ssize_t got = pread(fd, (char*)dst + off, want_bytes - off,
                              (off_t)(info.data_offset + off));
    if (got <= 0) {
      close(fd);
      return -4;
    }
    off += (size_t)got;
  }
  close(fd);
  const size_t want = want_bytes / sizeof(float);
  if (want < rows * cols)
    memset(dst + want, 0, (rows * cols - want) * sizeof(float));
  return 0;
}

}  // namespace

extern "C" {

// paths: n null-terminated strings; rows/cols: shard shape; n_threads <= 0
// picks hardware_concurrency.
void* ens_reader_create(const char** paths, int n, int rows, int cols,
                        int n_threads) {
  auto* r = new Reader();
  r->paths.reserve(n);
  for (int i = 0; i < n; ++i) r->paths.emplace_back(paths[i]);
  r->rows = (size_t)rows;
  r->cols = (size_t)cols;
  int threads = n_threads > 0 ? n_threads
                              : (int)std::thread::hardware_concurrency();
  if (threads < 1) threads = 1;
  r->pool = std::make_unique<ThreadPool>(threads);
  return r;
}

void ens_reader_destroy(void* handle) { delete (Reader*)handle; }

int ens_reader_num_shards(void* handle) {
  return (int)((Reader*)handle)->paths.size();
}

// Assemble k shards (by index) into out [k * rows, cols], parallel across
// the pool. Returns 0 on success, else the first nonzero shard error.
int ens_reader_load_batch(void* handle, const int* indices, int k,
                          float* out) {
  auto* r = (Reader*)handle;
  std::atomic<int> err{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < k; ++i) {
    const int idx = indices[i];
    float* dst = out + (size_t)i * r->rows * r->cols;
    r->pool->Submit([r, idx, dst, &err, &done, &cv, &mu, k] {
      if (idx < 0 || idx >= (int)r->paths.size()) {
        int expected = 0;
        err.compare_exchange_strong(expected, -10);
      } else {
        const int rc = read_shard(r->paths[idx], r->rows, r->cols, dst);
        if (rc != 0) {
          int expected = 0;
          err.compare_exchange_strong(expected, rc);
        }
      }
      if (done.fetch_add(1) + 1 == k) {
        std::unique_lock<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == k; });
  return err.load();
}

}  // extern "C"
