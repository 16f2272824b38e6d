// Host-side ingestion kernels for vptq_tpu.
//
// TPU-native counterpart of the reference's native layer: where the
// reference ships CUDA device kernels (reference csrc/), the TPU build
// keeps device compute in Pallas/XLA and moves the *ingestion* hot
// loops (bit-stream unpacking — reference csrc/util/cuda_utils.cuh
// iterator_packed_tensor semantics — exact codebook dequantization,
// and the int8 runtime re-encode) into multithreaded C++. The numpy
// implementations in vptq_tpu/ops remain the semantic oracle; this
// library is a drop-in accelerator loaded via ctypes.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread vptq_host.cc
//        -o libvptq_host.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <thread>
#include <vector>

namespace {

// Run fn(begin, end) over [0, n) split across hardware threads.
template <typename F>
void parallel_for(int64_t n, F fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::max<int64_t>(1, std::min<int64_t>(hw, n));
  if (n_threads == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = std::min(n, begin + chunk);
    if (begin >= end) break;
    threads.emplace_back([=] { fn(begin, end); });
  }
  for (auto& th : threads) th.join();
}

// Extract `bits` wide value starting at absolute bit offset `pos` from
// a little-endian (LSB-first) packed word stream. Handles word
// straddle (same layout as reference pack.py:26-102).
inline uint32_t extract_bits(const uint32_t* words, int64_t pos,
                             int bits) {
  int64_t word = pos >> 5;
  int off = static_cast<int>(pos & 31);
  uint64_t lo = words[word];
  uint64_t hi = (off + bits > 32) ? words[word + 1] : 0;
  uint64_t merged = lo | (hi << 32);
  return static_cast<uint32_t>((merged >> off) &
                               ((1ull << bits) - 1ull));
}

}  // namespace

extern "C" {

// Unpack a packed index stream.
//   packed: int32 words, shape (rows, packed_words) — rows =
//           num_codebooks * num_indices; each row is an independent
//           bitstream of group_size merged ids (res<<index_bits|main).
//   main_out: uint16 (rows, group_size)
//   res_out:  uint16 (rows, group_size) or nullptr when res_bits == 0
void vptq_unpack_indices(const int32_t* packed, int64_t rows,
                         int64_t packed_words, int64_t group_size,
                         int index_bits, int res_bits,
                         uint16_t* main_out, uint16_t* res_out) {
  const int total_bits = index_bits + res_bits;
  const uint32_t main_mask = (1u << index_bits) - 1u;
  parallel_for(rows, [=](int64_t begin, int64_t end) {
    for (int64_t r = begin; r < end; ++r) {
      const uint32_t* words =
          reinterpret_cast<const uint32_t*>(packed) + r * packed_words;
      uint16_t* mo = main_out + r * group_size;
      uint16_t* ro = res_out ? res_out + r * group_size : nullptr;
      int64_t pos = 0;
      for (int64_t g = 0; g < group_size; ++g, pos += total_bits) {
        uint32_t merged = extract_bits(words, pos, total_bits);
        mo[g] = static_cast<uint16_t>(merged & main_mask);
        if (ro) ro[g] = static_cast<uint16_t>(merged >> index_bits);
      }
    }
  });
}

// Exact VPTQ weight reconstruction (semantics of reference
// vptq/ops/quant_gemm.py:43-158 on normalized planes).
//   centroids:  f32 (num_codebooks, num_centroids, vector_len)
//   ids:        u16 (num_codebooks, num_indices, group_size)
//   res_*:      optional residual stage (nullptr disables)
//   outlier_*:  optional outlier stage covering the first outlier_size
//               input columns (vector_len = outlier_vector_len)
//   inv_perm:   optional i32 (in_features,) column gather
//   scale,bias: optional f32 (in_features,) per-column norm
//   out:        f32 (out_features, in_features)
void vptq_dequant(const float* centroids, const uint16_t* ids,
                  const float* res_centroids, const uint16_t* res_ids,
                  const float* outlier_centroids,
                  const uint16_t* outlier_ids, const int32_t* inv_perm,
                  const float* scale, const float* bias,
                  int64_t out_features, int64_t in_features,
                  int64_t num_codebooks, int64_t num_centroids,
                  int64_t num_res_centroids, int64_t vector_len,
                  int64_t group_size, int64_t num_indices,
                  int64_t outlier_size, int64_t num_outlier_centroids,
                  int64_t outlier_vector_len,
                  int64_t outlier_num_indices, float* out) {
  (void)num_outlier_centroids;
  (void)outlier_num_indices;
  parallel_for(out_features, [=](int64_t begin, int64_t end) {
    for (int64_t o = begin; o < end; ++o) {
      float* row = out + o * in_features;
      const int64_t vrow = o / vector_len;
      const int64_t vj = o % vector_len;
      const int64_t ovrow =
          outlier_size > 0 ? o / outlier_vector_len : 0;
      const int64_t ovj =
          outlier_size > 0 ? o % outlier_vector_len : 0;
      for (int64_t c = 0; c < in_features; ++c) {
        int64_t col = inv_perm ? inv_perm[c] : c;
        float val;
        if (col < outlier_size) {
          const uint16_t id =
              outlier_ids[ovrow * outlier_size + col];
          val = outlier_centroids[(id * outlier_vector_len) + ovj];
        } else {
          const int64_t g = col - outlier_size;
          const int64_t cb = g / group_size;
          const int64_t gg = g % group_size;
          const int64_t idx_off =
              (cb * num_indices + vrow) * group_size + gg;
          const uint16_t id = ids[idx_off];
          val = centroids[(cb * num_centroids + id) * vector_len + vj];
          if (res_centroids) {
            const uint16_t rid = res_ids[idx_off];
            val += res_centroids[(cb * (num_res_centroids) + rid) *
                                     vector_len +
                                 vj];
          }
        }
        if (scale) val = val * scale[c] + bias[c];
        row[c] = val;
      }
    }
  });
}

namespace {

// Round f32 to nearest-even bf16, returned widened back to f32 — the
// int4 scale storage dtype (must match ops/packing.py _bf16_rne).
inline float bf16_rne(float x) {
  uint32_t u;
  std::memcpy(&u, &x, 4);
  uint32_t lsb = (u >> 16) & 1u;
  u += 0x7fffu + lsb;
  u &= 0xffff0000u;
  float y;
  std::memcpy(&y, &u, 4);
  return y;
}

// Scale-search grid; must match ops/packing.py INT4_SCALE_CANDIDATES.
constexpr int kNumInt4Candidates = 8;

}  // namespace

// Symmetric per-(row, group) int4 quantization with MSE-optimal scale
// search (same semantics as ops/packing.py quantize_int4 with
// optimize=true; the numpy version is the oracle).
//   w: f32 (rows, cols) with cols % group == 0
//   q: int8 in [-7,7] (rows, cols); scales: f32 (rows, cols/group)
void vptq_int4_quant(const float* w, int64_t rows, int64_t cols,
                     int64_t group, int optimize, int8_t* q,
                     float* scales) {
  const int64_t n_groups = cols / group;
  parallel_for(rows, [=](int64_t begin, int64_t end) {
    for (int64_t r = begin; r < end; ++r) {
      const float* wr = w + r * cols;
      int8_t* qr = q + r * cols;
      float* sr = scales + r * n_groups;
      for (int64_t gidx = 0; gidx < n_groups; ++gidx) {
        const float* wg = wr + gidx * group;
        int8_t* qg = qr + gidx * group;
        float amax = 0.f;
        for (int64_t i = 0; i < group; ++i)
          amax = std::max(amax, std::fabs(wg[i]));
        const float base = amax > 0.f ? amax / 7.f : 1.f;
        float best_s = bf16_rne(base);
        float best_err = -1.f;
        const int n_cand = optimize ? kNumInt4Candidates : 1;
        for (int c = 0; c < n_cand; ++c) {
          const float f = 1.f - 0.05f * static_cast<float>(c);
          const float s = bf16_rne(base * f);
          const float inv = 1.f / s;
          float err = 0.f;
          for (int64_t i = 0; i < group; ++i) {
            float v = std::nearbyint(wg[i] * inv);
            v = std::max(-7.f, std::min(7.f, v));
            const float d = wg[i] - v * s;
            err += d * d;
          }
          if (best_err < 0.f || err < best_err) {
            best_err = err;
            best_s = s;
          }
        }
        sr[gidx] = best_s;
        const float inv = 1.f / best_s;
        for (int64_t i = 0; i < group; ++i) {
          float v = std::nearbyint(wg[i] * inv);
          v = std::max(-7.f, std::min(7.f, v));
          qg[i] = static_cast<int8_t>(v);
        }
      }
    }
  });
}

// Half-offset per-(row, group) int2 quantization with MSE-optimal
// scale search (same semantics as ops/packing.py quantize_int2 with
// optimize=true; the numpy version is the oracle). Levels are
// (q + 0.5) * s with q in [-2, 1]; the grid runs a deeper shrink
// ladder than int4 (13 candidates — 2-bit MSE favours clipping).
//   w: f32 (rows, cols) with cols % group == 0
//   q: int8 in [-2,1] (rows, cols); scales: f32 (rows, cols/group)
void vptq_int2_quant(const float* w, int64_t rows, int64_t cols,
                     int64_t group, int optimize, int8_t* q,
                     float* scales) {
  constexpr int kNumInt2Candidates = 13;
  const int64_t n_groups = cols / group;
  parallel_for(rows, [=](int64_t begin, int64_t end) {
    for (int64_t r = begin; r < end; ++r) {
      const float* wr = w + r * cols;
      int8_t* qr = q + r * cols;
      float* sr = scales + r * n_groups;
      for (int64_t gidx = 0; gidx < n_groups; ++gidx) {
        const float* wg = wr + gidx * group;
        int8_t* qg = qr + gidx * group;
        float amax = 0.f;
        for (int64_t i = 0; i < group; ++i)
          amax = std::max(amax, std::fabs(wg[i]));
        const float base = amax > 0.f ? amax / 1.5f : 1.f;
        float best_s = bf16_rne(base);
        float best_err = -1.f;
        const int n_cand = optimize ? kNumInt2Candidates : 1;
        for (int c = 0; c < n_cand; ++c) {
          const float f = 1.f - 0.05f * static_cast<float>(c);
          const float s = bf16_rne(base * f);
          const float inv = 1.f / s;
          float err = 0.f;
          for (int64_t i = 0; i < group; ++i) {
            float v = std::nearbyint(wg[i] * inv - 0.5f);
            v = std::max(-2.f, std::min(1.f, v));
            const float d = wg[i] - (v + 0.5f) * s;
            err += d * d;
          }
          if (best_err < 0.f || err < best_err) {
            best_err = err;
            best_s = s;
          }
        }
        sr[gidx] = best_s;
        const float inv = 1.f / best_s;
        for (int64_t i = 0; i < group; ++i) {
          float v = std::nearbyint(wg[i] * inv - 0.5f);
          v = std::max(-2.f, std::min(1.f, v));
          qg[i] = static_cast<int8_t>(v);
        }
      }
    }
  });
}

// Symmetric per-(row, group) int8 quantization.
//   w: f32 (rows, cols) with cols % group == 0
//   q: int8 (rows, cols); scales: f32 (rows, cols/group)
void vptq_int8_quant(const float* w, int64_t rows, int64_t cols,
                     int64_t group, int8_t* q, float* scales) {
  const int64_t n_groups = cols / group;
  parallel_for(rows, [=](int64_t begin, int64_t end) {
    for (int64_t r = begin; r < end; ++r) {
      const float* wr = w + r * cols;
      int8_t* qr = q + r * cols;
      float* sr = scales + r * n_groups;
      for (int64_t g = 0; g < n_groups; ++g) {
        const float* wg = wr + g * group;
        float amax = 0.f;
        for (int64_t i = 0; i < group; ++i)
          amax = std::max(amax, std::fabs(wg[i]));
        float s = amax > 0.f ? amax / 127.f : 1.f;
        sr[g] = s;
        float inv = 1.f / s;
        int8_t* qg = qr + g * group;
        for (int64_t i = 0; i < group; ++i) {
          float v = std::nearbyint(wg[i] * inv);
          v = std::max(-127.f, std::min(127.f, v));
          qg[i] = static_cast<int8_t>(v);
        }
      }
    }
  });
}

}  // extern "C"
