// Fused batched crop + normalize + collate for the host input pipeline.
//
// The reference hides zarr/host latency behind torch DataLoader worker
// *processes* (viscy_data/hcs.py num_workers); a TPU host feeds one process,
// so the steady-state cost is assembling (N, C, z, y, x) patch batches from
// mmap-staged volumes: strided memcpy + (x - mean) / std. This kernel fuses
// the copy with normalization (one pass, no numpy temporaries) and threads
// across patches/rows, scaling with host cores.
//
// Built on demand with g++ (no pybind11 in this image); bound via ctypes —
// see viscy_tpu/native/__init__.py.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

extern "C" {

// src: (C, Z, Y, X) float32 volume (contiguous)
// origins: (n, 3) int64 (z0, y0, x0) per patch
// means/stds: per-channel (C) normalization stats; std of 0 disables
// out: (n, C, pz, py, px) float32
void crop_norm_f32(const float* src, int64_t C, int64_t Z, int64_t Y, int64_t X,
                   const int64_t* origins, int64_t n, int64_t pz, int64_t py,
                   int64_t px, const float* means, const float* stds, float* out,
                   int64_t n_threads) {
  const int64_t rows_per_patch = C * pz * py;           // one row = px floats
  const int64_t total_rows = n * rows_per_patch;
  if (n_threads <= 0) {
    n_threads = static_cast<int64_t>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = std::min<int64_t>(n_threads, std::max<int64_t>(total_rows, 1));

  std::atomic<int64_t> next_chunk{0};
  const int64_t chunk_rows = 64;
  const int64_t n_chunks = (total_rows + chunk_rows - 1) / chunk_rows;

  auto worker = [&]() {
    for (;;) {
      const int64_t chunk = next_chunk.fetch_add(1);
      if (chunk >= n_chunks) return;
      const int64_t row0 = chunk * chunk_rows;
      const int64_t row1 = std::min(row0 + chunk_rows, total_rows);
      for (int64_t row = row0; row < row1; ++row) {
        const int64_t patch = row / rows_per_patch;
        int64_t r = row % rows_per_patch;
        const int64_t c = r / (pz * py);
        r %= pz * py;
        const int64_t z = r / py;
        const int64_t y = r % py;
        const int64_t z0 = origins[patch * 3 + 0];
        const int64_t y0 = origins[patch * 3 + 1];
        const int64_t x0 = origins[patch * 3 + 2];
        const float* s =
            src + ((c * Z + z0 + z) * Y + (y0 + y)) * X + x0;
        float* d = out + row * px;
        const float mean = means ? means[c] : 0.0f;
        const float std_ = stds ? stds[c] : 0.0f;
        if (std_ > 0.0f) {
          const float inv = 1.0f / std_;
          for (int64_t i = 0; i < px; ++i) d[i] = (s[i] - mean) * inv;
        } else {
          std::copy(s, s + px, d);
        }
      }
    }
  };

  if (n_threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(static_cast<size_t>(n_threads));
  for (int64_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// uint16 variant: plain crop + collate (no normalization — under
// native_transfer the cast + (x - mean)/std run on device, and shipping
// raw uint16 halves the host->device bytes). Same row-parallel layout.
void crop_u16(const uint16_t* src, int64_t C, int64_t Z, int64_t Y, int64_t X,
              const int64_t* origins, int64_t n, int64_t pz, int64_t py,
              int64_t px, uint16_t* out, int64_t n_threads) {
  const int64_t rows_per_patch = C * pz * py;
  const int64_t total_rows = n * rows_per_patch;
  if (n_threads <= 0) {
    n_threads = static_cast<int64_t>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = std::min<int64_t>(n_threads, std::max<int64_t>(total_rows, 1));

  std::atomic<int64_t> next_chunk{0};
  const int64_t chunk_rows = 64;
  const int64_t n_chunks = (total_rows + chunk_rows - 1) / chunk_rows;

  auto worker = [&]() {
    for (;;) {
      const int64_t chunk = next_chunk.fetch_add(1);
      if (chunk >= n_chunks) return;
      const int64_t row0 = chunk * chunk_rows;
      const int64_t row1 = std::min(row0 + chunk_rows, total_rows);
      for (int64_t row = row0; row < row1; ++row) {
        const int64_t patch = row / rows_per_patch;
        int64_t r = row % rows_per_patch;
        const int64_t c = r / (pz * py);
        r %= pz * py;
        const int64_t z = r / py;
        const int64_t y = r % py;
        const int64_t z0 = origins[patch * 3 + 0];
        const int64_t y0 = origins[patch * 3 + 1];
        const int64_t x0 = origins[patch * 3 + 2];
        const uint16_t* s = src + ((c * Z + z0 + z) * Y + (y0 + y)) * X + x0;
        std::copy(s, s + px, out + row * px);
      }
    }
  };

  if (n_threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(static_cast<size_t>(n_threads));
  for (int64_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
