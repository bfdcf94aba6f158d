// vecstore — file-backed vector store with double-buffered streaming.
//
// Native runtime tier of iterative_solver_tpu: the analogue of the
// reference's DistrArrayFile (one temp binary file of vectors,
// array/DistrArrayFile.cpp) combined with BufferManager's two-page
// prefetch pipeline (array/util/BufferManager.h:136-173).  On a TPU host
// this is the spill tier for Q-space histories that exceed HBM: rows live
// in a (possibly unlinked) file, and the block numerics — inner-product
// matrices and linear combinations against a host block — stream rows
// through two buffers with a dedicated IO thread prefetching row i+1 while
// the compute thread consumes row i.
//
// Exposed as a plain C ABI for ctypes; all matrices are row-major double.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <new>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

struct VecStore {
  int fd = -1;
  int64_t capacity = 0;
  int64_t row_len = 0;
  std::string path;
  bool unlink_on_close = false;

  size_t row_bytes() const { return static_cast<size_t>(row_len) * sizeof(double); }
};

bool read_row(const VecStore* vs, int64_t slot, double* out) {
  size_t want = vs->row_bytes();
  off_t off = static_cast<off_t>(slot) * static_cast<off_t>(want);
  size_t done = 0;
  while (done < want) {
    ssize_t r = pread(vs->fd, reinterpret_cast<char*>(out) + done, want - done, off + done);
    if (r < 0) return false;
    if (r == 0) {  // sparse/unwritten region reads as zeros
      std::memset(reinterpret_cast<char*>(out) + done, 0, want - done);
      return true;
    }
    done += static_cast<size_t>(r);
  }
  return true;
}

bool write_row(VecStore* vs, int64_t slot, const double* data) {
  size_t want = vs->row_bytes();
  off_t off = static_cast<off_t>(slot) * static_cast<off_t>(want);
  size_t done = 0;
  while (done < want) {
    ssize_t r = pwrite(vs->fd, reinterpret_cast<const char*>(data) + done, want - done, off + done);
    if (r <= 0) return false;
    done += static_cast<size_t>(r);
  }
  return true;
}

// Two-buffer prefetch pipeline: the IO thread fills buffers in order; the
// consumer waits per-row. Mirrors BufferManager's std::async double
// buffering but with one long-lived thread per sweep.
class RowStream {
 public:
  RowStream(const VecStore* vs, const int64_t* slots, int64_t k)
      : vs_(vs), slots_(slots), k_(k), buffers_(2) {
    for (auto& b : buffers_) b.resize(static_cast<size_t>(vs->row_len));
    ready_.assign(2, -1);
    io_ = std::thread([this] { this->io_loop(); });
  }

  ~RowStream() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
      cv_.notify_all();
    }
    io_.join();
  }

  // Blocks until row i is resident; returns pointer valid until release(i).
  const double* acquire(int64_t i) {
    int slot = static_cast<int>(i % 2);
    std::unique_lock<std::mutex> lk(mu_);
    cv_.wait(lk, [&] { return ready_[slot] == i || failed_; });
    return failed_ ? nullptr : buffers_[slot].data();
  }

  void release(int64_t i) {
    std::unique_lock<std::mutex> lk(mu_);
    consumed_ = i;
    cv_.notify_all();
  }

  bool failed() const { return failed_; }

 private:
  void io_loop() {
    for (int64_t i = 0; i < k_; ++i) {
      int slot = static_cast<int>(i % 2);
      {
        // wait until the buffer's previous occupant (row i-2) was consumed
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return stop_ || consumed_ >= i - 2; });
        if (stop_) return;
      }
      if (!read_row(vs_, slots_[i], buffers_[slot].data())) {
        std::unique_lock<std::mutex> lk(mu_);
        failed_ = true;
        cv_.notify_all();
        return;
      }
      std::unique_lock<std::mutex> lk(mu_);
      ready_[slot] = i;
      cv_.notify_all();
    }
  }

  const VecStore* vs_;
  const int64_t* slots_;
  int64_t k_;
  std::vector<std::vector<double>> buffers_;
  std::vector<int64_t> ready_;
  int64_t consumed_ = -1;
  bool stop_ = false;
  std::atomic<bool> failed_{false};
  std::mutex mu_;
  std::condition_variable cv_;
  std::thread io_;
};

}  // namespace

extern "C" {

// Create a store of `capacity` rows of `row_len` doubles. If `path` is NULL
// or empty an anonymous temp file is used (unlinked immediately, like
// DistrArrayFile's scratch files).
void* vecstore_create(int64_t capacity, int64_t row_len, const char* path) {
  auto* vs = new (std::nothrow) VecStore;
  if (!vs) return nullptr;
  vs->capacity = capacity;
  vs->row_len = row_len;
  char tmpl[] = "/tmp/vecstore-XXXXXX";
  if (path && path[0]) {
    vs->path = path;
    vs->fd = open(path, O_RDWR | O_CREAT, 0600);
  } else {
    vs->fd = mkstemp(tmpl);
    vs->path = tmpl;
    if (vs->fd >= 0) unlink(tmpl);  // anonymous scratch
  }
  if (vs->fd < 0) {
    delete vs;
    return nullptr;
  }
  return vs;
}

void vecstore_destroy(void* h) {
  auto* vs = static_cast<VecStore*>(h);
  if (!vs) return;
  if (vs->fd >= 0) close(vs->fd);
  delete vs;
}

int64_t vecstore_capacity(void* h) { return static_cast<VecStore*>(h)->capacity; }
int64_t vecstore_row_len(void* h) { return static_cast<VecStore*>(h)->row_len; }

int vecstore_put(void* h, int64_t slot, const double* data) {
  auto* vs = static_cast<VecStore*>(h);
  if (slot < 0 || slot >= vs->capacity) return -1;
  return write_row(vs, slot, data) ? 0 : -2;
}

int vecstore_get(void* h, int64_t slot, double* out) {
  auto* vs = static_cast<VecStore*>(h);
  if (slot < 0 || slot >= vs->capacity) return -1;
  return read_row(vs, slot, out) ? 0 : -2;
}

// out(m, k) = x(m, n) . rows(slots)(k, n)^T   — streamed with prefetch.
int vecstore_gemm_inner(void* h, const double* x, int64_t m, const int64_t* slots,
                        int64_t k, double* out) {
  auto* vs = static_cast<VecStore*>(h);
  const int64_t n = vs->row_len;
  RowStream stream(vs, slots, k);
  for (int64_t j = 0; j < k; ++j) {
    const double* row = stream.acquire(j);
    if (!row) return -2;
    for (int64_t i = 0; i < m; ++i) {
      const double* xi = x + i * n;
      double acc = 0.0;
      for (int64_t t = 0; t < n; ++t) acc += xi[t] * row[t];
      out[i * k + j] = acc;
    }
    stream.release(j);
  }
  return 0;
}

// out(m, n) += coeff(m, k) . rows(slots)(k, n)   — streamed with prefetch.
int vecstore_gemm_outer(void* h, const double* coeff, int64_t m, const int64_t* slots,
                        int64_t k, double* out) {
  auto* vs = static_cast<VecStore*>(h);
  const int64_t n = vs->row_len;
  RowStream stream(vs, slots, k);
  for (int64_t j = 0; j < k; ++j) {
    const double* row = stream.acquire(j);
    if (!row) return -2;
    for (int64_t i = 0; i < m; ++i) {
      const double c = coeff[i * k + j];
      if (c == 0.0) continue;
      double* oi = out + i * n;
      for (int64_t t = 0; t < n; ++t) oi[t] += c * row[t];
    }
    stream.release(j);
  }
  return 0;
}

// y(slot) += alpha * x
int vecstore_axpy(void* h, int64_t slot, double alpha, const double* x) {
  auto* vs = static_cast<VecStore*>(h);
  if (slot < 0 || slot >= vs->capacity) return -1;
  std::vector<double> row(static_cast<size_t>(vs->row_len));
  if (!read_row(vs, slot, row.data())) return -2;
  for (int64_t t = 0; t < vs->row_len; ++t) row[t] += alpha * x[t];
  return write_row(vs, slot, row.data()) ? 0 : -2;
}

int vecstore_scal(void* h, int64_t slot, double alpha) {
  auto* vs = static_cast<VecStore*>(h);
  if (slot < 0 || slot >= vs->capacity) return -1;
  std::vector<double> row(static_cast<size_t>(vs->row_len));
  if (!read_row(vs, slot, row.data())) return -2;
  for (int64_t t = 0; t < vs->row_len; ++t) row[t] *= alpha;
  return write_row(vs, slot, row.data()) ? 0 : -2;
}

double vecstore_dot(void* h, int64_t slot_a, int64_t slot_b, int* status) {
  auto* vs = static_cast<VecStore*>(h);
  std::vector<double> a(static_cast<size_t>(vs->row_len)), b(static_cast<size_t>(vs->row_len));
  if (!read_row(vs, slot_a, a.data()) || !read_row(vs, slot_b, b.data())) {
    if (status) *status = -2;
    return 0.0;
  }
  double acc = 0.0;
  for (int64_t t = 0; t < vs->row_len; ++t) acc += a[t] * b[t];
  if (status) *status = 0;
  return acc;
}

}  // extern "C"
