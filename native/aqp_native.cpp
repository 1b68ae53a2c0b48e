// Host-side native runtime: seeded relation generators + parallel binary IO.
//
// The reference's data layer is C++ (lib/AppUtilities/src/generator.cpp,
// genzipf.cpp); this is its TPU-host counterpart, exposed through a C ABI
// for ctypes (no pybind11 in this image).  Semantics match
// aqp_tpu/data/generator.py's contracts:
//   - pk: dense {1..n} uniformly shuffled (Fisher-Yates, xoshiro256**)
//   - fk: tiled dense blocks, each independently shuffled; remainder block
//     is a shuffled-prefix sample
//   - zipf: CDF lookup-table inversion over a shuffled alphabet
//
// Build: make -C native   (produces libaqp_native.so)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// xoshiro256** — small, fast, seedable PRNG (public domain algorithm)
struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    // splitmix64 init
    for (int i = 0; i < 4; i++) {
      seed += 0x9E3779B97F4A7C15ULL;
      uint64_t z = seed;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      s[i] = z ^ (z >> 31);
    }
  }
  static uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }
  uint64_t next() {
    uint64_t result = rotl(s[1] * 5, 7) * 9;
    uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  // unbiased bounded draw
  uint64_t below(uint64_t bound) {
    uint64_t threshold = (-bound) % bound;
    for (;;) {
      uint64_t r = next();
      if (r >= threshold) return r % bound;
    }
  }
  double uniform() { return (next() >> 11) * 0x1.0p-53; }
};

void fill_dense_shuffled(int32_t *out, int64_t n, Rng &rng) {
  for (int64_t i = 0; i < n; i++) out[i] = static_cast<int32_t>(i + 1);
  for (int64_t i = n - 1; i > 0; i--) {
    int64_t j = static_cast<int64_t>(rng.below(static_cast<uint64_t>(i + 1)));
    std::swap(out[i], out[j]);
  }
}

}  // namespace

extern "C" {

// keys[n] <- dense {1..n} shuffled
void aqp_gen_pk(int32_t *keys, int64_t n, uint64_t seed) {
  Rng rng(seed);
  fill_dense_shuffled(keys, n, rng);
}

// keys[n] <- tiled shuffled dense blocks over {1..maxid}
void aqp_gen_fk(int32_t *keys, int64_t n, int64_t maxid, uint64_t seed) {
  Rng rng(seed);
  int64_t full = n / maxid;
  std::vector<std::thread> ts;
  std::atomic<int64_t> block{0};
  int nthreads = static_cast<int>(std::thread::hardware_concurrency());
  if (nthreads < 1) nthreads = 1;
  // per-block independent seeds so blocks can generate in parallel
  for (int t = 0; t < nthreads; t++) {
    ts.emplace_back([&, t]() {
      for (;;) {
        int64_t b = block.fetch_add(1);
        if (b >= full) break;
        Rng r(seed + 0x5851F42D4C957F2DULL * static_cast<uint64_t>(b + 1));
        fill_dense_shuffled(keys + b * maxid, maxid, r);
      }
    });
  }
  for (auto &th : ts) th.join();
  int64_t rem = n - full * maxid;
  if (rem > 0) {
    std::vector<int32_t> tmp(static_cast<size_t>(maxid));
    Rng r(seed + 0x9E3779B97F4A7C15ULL);
    fill_dense_shuffled(tmp.data(), maxid, r);
    std::memcpy(keys + full * maxid, tmp.data(), sizeof(int32_t) * rem);
  }
}

// keys[n] <- Zipf(zipf_factor) over shuffled alphabet {1..alphabet}
void aqp_gen_zipf(int32_t *keys, int64_t n, int64_t alphabet, double zipf_factor,
                  uint64_t seed) {
  Rng rng(seed);
  std::vector<double> cdf(static_cast<size_t>(alphabet));
  double sum = 0.0;
  for (int64_t i = 0; i < alphabet; i++) {
    sum += std::pow(static_cast<double>(i + 1), -zipf_factor);
    cdf[static_cast<size_t>(i)] = sum;
  }
  for (int64_t i = 0; i < alphabet; i++) cdf[static_cast<size_t>(i)] /= sum;
  std::vector<int32_t> alpha(static_cast<size_t>(alphabet));
  fill_dense_shuffled(alpha.data(), alphabet, rng);
  for (int64_t i = 0; i < n; i++) {
    double u = rng.uniform();
    // binary search CDF
    int64_t lo = 0, hi = alphabet - 1;
    while (lo < hi) {
      int64_t mid = (lo + hi) / 2;
      if (cdf[static_cast<size_t>(mid)] < u)
        lo = mid + 1;
      else
        hi = mid;
    }
    keys[i] = alpha[static_cast<size_t>(lo)];
  }
}

}  // extern "C"
