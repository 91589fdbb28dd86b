// Native host-side ternary 2-bit plane codec.
//
// The packed layout matches pt2tpu/core/packing.py exactly
// ("contraction-major, plane-interleaved"): for scale-block b of
// `block_size` code columns and row r in [0, block_size/4), output byte
// (b*bs4 + r, j) holds codes for visit-columns b*bs + p*bs4 + r
// (plane p = 0..3) of output-feature j, with code value (T+1) in bits
// 2p..2p+1.
//
// Rationale: packing/unpacking multi-GB code matrices on the host (artifact
// writes during quantization of 13B/70B models, artifact loads before
// device_put) is memory-bandwidth work that the Python/numpy path does with
// several large temporaries; this codec is single-pass and threaded.
//
// C API (ctypes-friendly); all matrices row-major:
//   pt2_pack_ternary  : codes (n, K) int8 {-1,0,1} -> packed (K/4, n) int8
//   pt2_unpack_ternary: packed (K/4, n) int8 -> codes_t (K, n) int8
//   pt2_version       : ABI check

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

// Pack a contiguous range of output rows [row0, row1) of the (K/4, n) plane
// matrix. Output row q decomposes as q = b*bs4 + r.
void pack_rows(const int8_t* codes, int64_t n, int64_t K, int64_t bs,
               int8_t* out, int64_t row0, int64_t row1) {
  const int64_t bs4 = bs / 4;
  for (int64_t q = row0; q < row1; ++q) {
    const int64_t b = q / bs4;
    const int64_t r = q - b * bs4;
    const int64_t base = b * bs + r;  // column of plane 0
    int8_t* dst = out + q * n;
    const int8_t* c0 = codes + base;            // stride K over j
    const int8_t* c1 = codes + base + bs4;      // plane 1
    const int8_t* c2 = codes + base + 2 * bs4;  // plane 2
    const int8_t* c3 = codes + base + 3 * bs4;  // plane 3
    for (int64_t j = 0; j < n; ++j) {
      const int64_t off = j * K;
      const uint8_t u0 = static_cast<uint8_t>(c0[off] + 1);
      const uint8_t u1 = static_cast<uint8_t>(c1[off] + 1);
      const uint8_t u2 = static_cast<uint8_t>(c2[off] + 1);
      const uint8_t u3 = static_cast<uint8_t>(c3[off] + 1);
      dst[j] = static_cast<int8_t>(u0 | (u1 << 2) | (u2 << 4) | (u3 << 6));
    }
  }
}

void unpack_rows(const int8_t* packed, int64_t n, int64_t K, int64_t bs,
                 int8_t* codes_t, int64_t row0, int64_t row1) {
  const int64_t bs4 = bs / 4;
  for (int64_t q = row0; q < row1; ++q) {
    const int64_t b = q / bs4;
    const int64_t r = q - b * bs4;
    const int64_t base = b * bs + r;
    const int8_t* src = packed + q * n;
    int8_t* d0 = codes_t + (base)*n;
    int8_t* d1 = codes_t + (base + bs4) * n;
    int8_t* d2 = codes_t + (base + 2 * bs4) * n;
    int8_t* d3 = codes_t + (base + 3 * bs4) * n;
    for (int64_t j = 0; j < n; ++j) {
      const uint8_t v = static_cast<uint8_t>(src[j]);
      d0[j] = static_cast<int8_t>((v & 3) - 1);
      d1[j] = static_cast<int8_t>(((v >> 2) & 3) - 1);
      d2[j] = static_cast<int8_t>(((v >> 4) & 3) - 1);
      d3[j] = static_cast<int8_t>(((v >> 6) & 3) - 1);
    }
  }
}

template <typename Fn>
void parallel_rows(int64_t rows, int threads, Fn fn) {
  if (threads <= 1 || rows < 64) {
    fn(0, rows);
    return;
  }
  threads = std::min<int64_t>(threads, rows);
  std::vector<std::thread> pool;
  const int64_t chunk = (rows + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min(rows, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

int32_t pt2_version() { return 1; }

// Returns 0 on success, nonzero on invalid arguments.
int32_t pt2_pack_ternary(const int8_t* codes, int64_t n, int64_t K,
                         int64_t block_size, int8_t* out, int32_t threads) {
  if (block_size % 4 != 0 || K % block_size != 0 || n <= 0) return 1;
  parallel_rows(K / 4, threads, [&](int64_t lo, int64_t hi) {
    pack_rows(codes, n, K, block_size, out, lo, hi);
  });
  return 0;
}

int32_t pt2_unpack_ternary(const int8_t* packed, int64_t n, int64_t K,
                           int64_t block_size, int8_t* codes_t,
                           int32_t threads) {
  if (block_size % 4 != 0 || K % block_size != 0 || n <= 0) return 1;
  parallel_rows(K / 4, threads, [&](int64_t lo, int64_t hi) {
    unpack_rows(packed, n, K, block_size, codes_t, lo, hi);
  });
  return 0;
}

}  // extern "C"
