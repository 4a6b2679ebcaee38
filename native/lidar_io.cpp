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

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
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

// Cylindrical range-image projection on the host.
//
// Exact semantics of ops/projection.py pixel_coords + min-range collision
// resolution (lowest point index wins exact range ties; invalid x=y=z=0
// points never scatter; empty pixels stay (0,0,0)), replicating the behavior
// of reference model_util.py:181-292 without its batch Python loop.  All
// arithmetic is float32 with truncation-toward-zero pixel casts, matching
// the device formulation bit-for-bit except for libm ulp differences in
// atan2/asin at pixel boundaries.
//
// Rationale: TPU has no vector-scatter hardware, so the on-device projection
// serializes at ~13 cycles/point (docs/projection_perf.md) — the single
// largest non-matmul op of the pipeline.  On the host it is a trivial
// streaming pass; serving paths can project here and feed the device the
// dense image, freeing the TensorCore entirely.
//
namespace {

// One sequential pass over points [begin, end), updating img/best_r in
// place.  best_r starts at +inf; strict < keeps the first (lowest-index)
// point on exact range ties, matching ops/projection.py.
void project_range(const float* points, int64_t begin, int64_t end,
                   float* img, float* best_r, int32_t height, int32_t width,
                   float vfov_up_rad, float vfov_down_rad,
                   float crop_radius) {
  const float kPi = 3.14159265358979323846f;
  const float az_res = 2.0f * kPi / static_cast<float>(width);
  const float v_res =
      (vfov_up_rad - vfov_down_rad) /
      static_cast<float>(height > 1 ? height - 1 : 1);
  const float v_off = -vfov_down_rad / v_res;
  const float crop_sq =
      crop_radius > 0.0f ? crop_radius * crop_radius : 0.0f;

  for (int64_t i = begin; i < end; ++i) {
    const float x = points[i * 3 + 0];
    const float y = points[i * 3 + 1];
    const float z = points[i * 3 + 2];
    const float r_sq = x * x + y * y + z * z;
    if (r_sq <= 1e-10f) continue;
    if (crop_sq > 0.0f && x * x + y * y > crop_sq) continue;
    const float r = std::sqrt(r_sq);

    int32_t col = static_cast<int32_t>((kPi - std::atan2(y, x)) / az_res);
    float sz = z / r;
    sz = sz < -1.0f ? -1.0f : (sz > 1.0f ? 1.0f : sz);
    const float beta = std::asin(sz);
    int32_t row = height - static_cast<int32_t>(beta / v_res + v_off);
    row = row < 0 ? 0 : (row >= height ? height - 1 : row);
    col = col < 0 ? 0 : (col >= width ? width - 1 : col);

    const int64_t pix = static_cast<int64_t>(row) * width + col;
    if (r < best_r[pix]) {
      best_r[pix] = r;
      img[pix * 3 + 0] = x;
      img[pix * 3 + 1] = y;
      img[pix * 3 + 2] = z;
    }
  }
}

}  // namespace

// points: [n, 3] float32.  img: [height*width*3] float32 (overwritten).
// crop_radius <= 0 disables the planar crop; otherwise points with
// sqrt(x^2+y^2) > crop_radius are dropped (the network's 35 m crop,
// models/preprocess.py).
//
// num_threads > 1 splits the point stream into index-ordered chunks with
// per-thread private planes, then merges pixel stripes in parallel; the
// merge prefers lower chunk index on exact range ties, so the result is
// identical to the sequential pass.
void elo_project_scan(const float* points, int64_t n, float* img,
                      int32_t height, int32_t width, float vfov_up_rad,
                      float vfov_down_rad, float crop_radius,
                      int32_t num_threads) {
  const int64_t num_pix = static_cast<int64_t>(height) * width;
  std::memset(img, 0, sizeof(float) * num_pix * 3);

  if (num_threads <= 1 || n < (1 << 14)) {
    std::vector<float> best_r(num_pix,
                              std::numeric_limits<float>::infinity());
    project_range(points, 0, n, img, best_r.data(), height, width,
                  vfov_up_rad, vfov_down_rad, crop_radius);
    return;
  }

  const int32_t nt = static_cast<int32_t>(
      std::min<int64_t>(num_threads, (n + (1 << 14) - 1) >> 14));
  std::vector<std::vector<float>> imgs(nt),
      bests(nt, std::vector<float>(
                    num_pix, std::numeric_limits<float>::infinity()));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  const int64_t chunk = (n + nt - 1) / nt;
  for (int32_t t = 0; t < nt; ++t) {
    imgs[t].assign(num_pix * 3, 0.0f);
    threads.emplace_back([&, t]() {
      const int64_t b = t * chunk, e = std::min<int64_t>(n, b + chunk);
      project_range(points, b, e, imgs[t].data(), bests[t].data(), height,
                    width, vfov_up_rad, vfov_down_rad, crop_radius);
    });
  }
  for (auto& t : threads) t.join();

  threads.clear();
  const int64_t stripe = (num_pix + nt - 1) / nt;
  for (int32_t t = 0; t < nt; ++t) {
    threads.emplace_back([&, t]() {
      const int64_t b = t * stripe,
                    e = std::min<int64_t>(num_pix, b + stripe);
      for (int64_t p = b; p < e; ++p) {
        float best = std::numeric_limits<float>::infinity();
        int32_t win = -1;
        for (int32_t c = 0; c < nt; ++c) {
          if (bests[c][p] < best) {  // lower chunk keeps exact ties
            best = bests[c][p];
            win = c;
          }
        }
        if (win >= 0) {
          img[p * 3 + 0] = imgs[win][p * 3 + 0];
          img[p * 3 + 1] = imgs[win][p * 3 + 1];
          img[p * 3 + 2] = imgs[win][p * 3 + 2];
        }
      }
    });
  }
  for (auto& t : threads) t.join();
}

// Batch variant: points [batch, n, 3] -> img [batch, height, width, 3].
// Large batches parallelize one thread per scan; small batches (fewer scans
// than threads) give each scan the chunk-parallel path instead.
void elo_project_batch(const float* points, int64_t batch_size, int64_t n,
                       float* img, int32_t height, int32_t width,
                       float vfov_up_rad, float vfov_down_rad,
                       float crop_radius, int32_t num_threads) {
  if (num_threads <= 0) num_threads = 4;
  const int64_t pix3 = static_cast<int64_t>(height) * width * 3;

  if (batch_size < num_threads) {
    const int32_t per_scan =
        static_cast<int32_t>(num_threads / batch_size);
    for (int64_t i = 0; i < batch_size; ++i) {
      elo_project_scan(points + i * n * 3, n, img + i * pix3, height, width,
                       vfov_up_rad, vfov_down_rad, crop_radius, per_scan);
    }
    return;
  }

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= batch_size) return;
      elo_project_scan(points + i * n * 3, n, img + i * pix3, height, width,
                       vfov_up_rad, vfov_down_rad, crop_radius, 1);
    }
  };

  std::vector<std::thread> threads;
  int32_t nt =
      static_cast<int32_t>(std::min<int64_t>(num_threads, batch_size));
  threads.reserve(nt);
  for (int32_t t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Fused crop -> SE(3) perturbation -> projection for the host-projected
// training path (data/host_preprocess.py).
//
// Semantics: one streaming pass per cloud replicating
// crop_and_augment + elo_project_scan back-to-back —
//   * validity: points with x==y==z==0 are padding and never scatter
//     (crop_and_augment's `np.any(pc != 0)` mask);
//   * planar crop on the ORIGINAL coordinates (reference model_util.py
//     crops before the perturbation): drop when x^2+y^2 > radius^2;
//   * if apply[b], transform by the row-major 4x4 T[b] in float32 with
//     the same multiply/add association as the numpy einsum twin;
//   * then the exact min-range / lowest-index projection of project_range
//     with its r^2 <= 1e-10 guard on the TRANSFORMED point (a perturbed
//     near-origin point projects exactly as in the two-pass pipeline).
//
// Rationale: the numpy twin materializes ~15 full (B, N, 3) temporaries
// per batch (masks, norms, einsum, where) and measured 560 ms/batch on the
// 4-CPU loader host — 5x the native projection itself and the training
// input pipeline's bottleneck.  Fusing removes every intermediate: each
// point is loaded once, transformed in registers, and scattered.
namespace {

void augment_project_one(const float* points, int64_t n, const float* T,
                         bool apply, float ysign, float max_planar_radius,
                         float* img, float* best_r, int32_t height,
                         int32_t width, float vfov_up_rad,
                         float vfov_down_rad) {
  const float kPi = 3.14159265358979323846f;
  const float az_res = 2.0f * kPi / static_cast<float>(width);
  const float v_res =
      (vfov_up_rad - vfov_down_rad) /
      static_cast<float>(height > 1 ? height - 1 : 1);
  const float v_off = -vfov_down_rad / v_res;
  const float crop_sq = max_planar_radius * max_planar_radius;

  for (int64_t i = 0; i < n; ++i) {
    float x = points[i * 3 + 0];
    float y = points[i * 3 + 1];
    float z = points[i * 3 + 2];
    if (x == 0.0f && y == 0.0f && z == 0.0f) continue;
    if (x * x + y * y > crop_sq) continue;
    y *= ysign;  // x-z plane reflection (augmentation.mirror_batch)
    if (apply) {
      const float xn = ((T[0] * x + T[1] * y) + T[2] * z) + T[3];
      const float yn = ((T[4] * x + T[5] * y) + T[6] * z) + T[7];
      const float zn = ((T[8] * x + T[9] * y) + T[10] * z) + T[11];
      x = xn;
      y = yn;
      z = zn;
    }
    const float r_sq = x * x + y * y + z * z;
    if (r_sq <= 1e-10f) continue;
    const float r = std::sqrt(r_sq);

    int32_t col = static_cast<int32_t>((kPi - std::atan2(y, x)) / az_res);
    float sz = z / r;
    sz = sz < -1.0f ? -1.0f : (sz > 1.0f ? 1.0f : sz);
    const float beta = std::asin(sz);
    int32_t row = height - static_cast<int32_t>(beta / v_res + v_off);
    row = row < 0 ? 0 : (row >= height ? height - 1 : row);
    col = col < 0 ? 0 : (col >= width ? width - 1 : col);

    const int64_t pix = static_cast<int64_t>(row) * width + col;
    if (r < best_r[pix]) {
      best_r[pix] = r;
      img[pix * 3 + 0] = x;
      img[pix * 3 + 1] = y;
      img[pix * 3 + 2] = z;
    }
  }
}

}  // namespace

// points: [batch, n, 3] raw clouds; T: [batch, 16] row-major 4x4
// perturbations; apply: [batch] whether this cloud is the perturbed frame;
// ysign: [batch] +1/-1 per-cloud x-z reflection (mirror augmentation,
// applied before the perturbation exactly like mirror_batch ->
// crop_and_augment).  img: [batch, height, width, 3] (overwritten).
// One thread per cloud (training batches exceed the host's core count).
void elo_augment_project_batch(const float* points, const float* T,
                               const uint8_t* apply, const float* ysign,
                               int64_t batch_size,
                               int64_t n, float max_planar_radius, float* img,
                               int32_t height, int32_t width,
                               float vfov_up_rad, float vfov_down_rad,
                               int32_t num_threads) {
  if (num_threads <= 0) num_threads = 4;
  const int64_t num_pix = static_cast<int64_t>(height) * width;

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    std::vector<float> best_r(num_pix);
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= batch_size) return;
      std::memset(img + i * num_pix * 3, 0, sizeof(float) * num_pix * 3);
      std::fill(best_r.begin(), best_r.end(),
                std::numeric_limits<float>::infinity());
      augment_project_one(points + i * n * 3, n, T + i * 16,
                          apply[i] != 0, ysign ? ysign[i] : 1.0f,
                          max_planar_radius,
                          img + i * num_pix * 3, best_r.data(), height,
                          width, vfov_up_rad, vfov_down_rad);
    }
  };

  std::vector<std::thread> threads;
  int32_t nt =
      static_cast<int32_t>(std::min<int64_t>(num_threads, batch_size));
  threads.reserve(nt);
  for (int32_t t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Library self-identification for load-time sanity checks.
int32_t elo_abi_version() { return 3; }

}  // extern "C"
