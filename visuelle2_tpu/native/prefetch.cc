// Native batch-assembly engine for the visuelle2_tpu data plane.
//
// Role: the reference feeds the GPU through torch DataLoader worker
// *processes* that decode JPEGs per __getitem__ (/root/reference/
// train_dl.py:84-90, dataset.py:51-66).  Here images are decoded once into a
// uint8 memmap (data/images.py); what remains on the hot path is assembling
// shuffled batches — a strided gather of ~34 MB per 128x299x299x3 batch —
// which this library performs on a background thread pool into a ring of
// reusable buffers, overlapping host batch assembly with device compute.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread prefetch.cc -o libprefetch.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct GatherJob {
  const uint8_t* src;       // base of the source array
  int64_t row_bytes;        // bytes per source row (item)
  std::vector<int64_t> indices;
  uint8_t* dst;             // destination buffer (len = indices.size() * row_bytes)
  std::atomic<int64_t> next_chunk{0};
  std::atomic<int64_t> done_chunks{0};
  int64_t num_chunks{0};
  int64_t chunk_rows{0};
  std::mutex m;
  std::condition_variable cv;
};

class Engine {
 public:
  explicit Engine(int num_threads) : stop_(false) {
    for (int i = 0; i < num_threads; ++i) {
      workers_.emplace_back([this] { WorkerLoop(); });
    }
  }

  ~Engine() {
    {
      std::lock_guard<std::mutex> lk(m_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Enqueue a gather; returns a job handle.
  GatherJob* Submit(const uint8_t* src, int64_t row_bytes,
                    const int64_t* indices, int64_t n, uint8_t* dst) {
    auto* job = new GatherJob();
    job->src = src;
    job->row_bytes = row_bytes;
    job->indices.assign(indices, indices + n);
    job->dst = dst;
    // ~2 MB chunks keep all threads busy without false sharing.
    int64_t rows_per_chunk = std::max<int64_t>(1, (2 << 20) / row_bytes);
    job->chunk_rows = rows_per_chunk;
    job->num_chunks = (n + rows_per_chunk - 1) / rows_per_chunk;
    {
      std::lock_guard<std::mutex> lk(m_);
      queue_.push_back(job);
    }
    cv_.notify_all();
    return job;
  }

  static void Wait(GatherJob* job) {
    std::unique_lock<std::mutex> lk(job->m);
    job->cv.wait(lk, [job] {
      return job->done_chunks.load() == job->num_chunks;
    });
  }

 private:
  void WorkerLoop() {
    for (;;) {
      GatherJob* job = nullptr;
      {
        std::unique_lock<std::mutex> lk(m_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_) return;
        job = queue_.front();
        // Leave the job in the queue until all chunks are claimed so other
        // workers can join in.
        int64_t chunk = job->next_chunk.load();
        if (chunk >= job->num_chunks) {
          queue_.pop_front();
          continue;
        }
      }
      // Claim and process chunks cooperatively.
      for (;;) {
        int64_t chunk = job->next_chunk.fetch_add(1);
        if (chunk >= job->num_chunks) break;
        int64_t row0 = chunk * job->chunk_rows;
        int64_t row1 = std::min<int64_t>(row0 + job->chunk_rows,
                                         (int64_t)job->indices.size());
        for (int64_t r = row0; r < row1; ++r) {
          std::memcpy(job->dst + r * job->row_bytes,
                      job->src + job->indices[r] * job->row_bytes,
                      job->row_bytes);
        }
        int64_t done = job->done_chunks.fetch_add(1) + 1;
        if (done == job->num_chunks) {
          std::lock_guard<std::mutex> lk(job->m);
          job->cv.notify_all();
        }
      }
    }
  }

  std::vector<std::thread> workers_;
  std::deque<GatherJob*> queue_;
  std::mutex m_;
  std::condition_variable cv_;
  bool stop_;
};

}  // namespace

extern "C" {

void* prefetch_engine_create(int num_threads) {
  return new Engine(num_threads);
}

void prefetch_engine_destroy(void* engine) {
  delete static_cast<Engine*>(engine);
}

void* prefetch_gather_submit(void* engine, const uint8_t* src,
                             int64_t row_bytes, const int64_t* indices,
                             int64_t n, uint8_t* dst) {
  return static_cast<Engine*>(engine)->Submit(src, row_bytes, indices, n, dst);
}

void prefetch_gather_wait(void* job) {
  auto* j = static_cast<GatherJob*>(job);
  Engine::Wait(j);
  delete j;
}

// Synchronous convenience: gather with the calling thread + pool.
void prefetch_gather(void* engine, const uint8_t* src, int64_t row_bytes,
                     const int64_t* indices, int64_t n, uint8_t* dst) {
  void* job = prefetch_gather_submit(engine, src, row_bytes, indices, n, dst);
  prefetch_gather_wait(job);
}

}  // extern "C"
