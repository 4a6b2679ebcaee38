// Native data-loading runtime: KITTI velodyne .bin decoding and batch
// assembly.
//
// Role parity with the reference's native layer: the reference's only native
// code is its CUDA neighbor-gather ops (tf_ops/) whose compute-path
// equivalents here are Pallas/XLA kernels; this library covers the *runtime*
// side — the host input pipeline that the reference runs as synchronous
// single-threaded Python (kitti_dataset.py:76-77, main.py:301-341), which is
// its single biggest throughput bottleneck (SURVEY.md §3.1).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in the image).
//
// Build: make -C native

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Reads one KITTI .bin scan (float32 x,y,z,intensity records), writing the
// first 3 channels into out[num_points*3] zero-padded/truncated.
// Returns the number of points written, or -1 on IO error.
int64_t elo_read_scan(const char* path, float* out, int64_t num_points) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  std::memset(out, 0, sizeof(float) * num_points * 3);

  constexpr int64_t kChunk = 4096;  // points per read
  std::vector<float> buf(kChunk * 4);
  int64_t written = 0;
  while (written < num_points) {
    size_t got = std::fread(buf.data(), sizeof(float) * 4, kChunk, f);
    if (got == 0) break;
    int64_t take = std::min<int64_t>(got, num_points - written);
    for (int64_t i = 0; i < take; ++i) {
      out[(written + i) * 3 + 0] = buf[i * 4 + 0];
      out[(written + i) * 3 + 1] = buf[i * 4 + 1];
      out[(written + i) * 3 + 2] = buf[i * 4 + 2];
    }
    written += take;
    if (got < static_cast<size_t>(kChunk)) break;
  }
  std::fclose(f);
  return written;
}

// Reads a batch of scans in parallel with a thread pool.
// paths: array of batch_size C strings; out: [batch_size, num_points, 3].
// counts: per-scan point counts (or -1 on error).  Returns 0 on success,
// -1 if any scan failed.
int32_t elo_read_batch(const char** paths, int64_t batch_size, float* out,
                       int64_t num_points, int64_t* counts,
                       int32_t num_threads) {
  if (num_threads <= 0) num_threads = 4;
  std::atomic<int64_t> next(0);
  std::atomic<int32_t> failed(0);

  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= batch_size) return;
      int64_t n = elo_read_scan(paths[i], out + i * num_points * 3, num_points);
      counts[i] = n;
      if (n < 0) failed.store(1);
    }
  };

  std::vector<std::thread> threads;
  int32_t nt = static_cast<int32_t>(
      std::min<int64_t>(num_threads, batch_size));
  threads.reserve(nt);
  for (int32_t t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load() ? -1 : 0;
}

// Library self-identification for load-time sanity checks.
int32_t elo_abi_version() { return 1; }

}  // extern "C"
