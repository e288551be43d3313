// AMX-INT8 GEMM correctness test + microbench.
//
// Exactness check: AmxMatMulInt8's only non-integer arithmetic is the final
// per-element scale, so replicating its row quantization (absmax/127,
// round-to-nearest-even) and accumulating in int64 must reproduce the AMX
// result to fp32 rounding. Any tile-layout/packing bug shows up as a gross
// mismatch, not a tolerance question.
//
// Exits 0 with "SKIP" on hosts without AMX (the dispatch then uses the
// portable widened-float path, covered by the engine parity tests).

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <random>
#include <vector>

#include "../src/nn.h"

namespace {

using funasr_tpu::WTensor;

int failures = 0;

void Check(bool ok, const char* what) {
  if (!ok) {
    std::fprintf(stderr, "FAIL: %s\n", what);
    ++failures;
  }
}

// reference: identical quantization, exact int64 accumulation
std::vector<double> RefInt8Gemm(const std::vector<float>& x, int m, int k,
                                const WTensor& w, const float* bias) {
  const int n = static_cast<int>(w.cols());
  std::vector<double> y(static_cast<size_t>(m) * n, 0.0);
  for (int i = 0; i < m; ++i) {
    float amax = 0.0f;
    for (int j = 0; j < k; ++j) {
      const float a = std::fabs(x[static_cast<size_t>(i) * k + j]);
      amax = a > amax ? a : amax;
    }
    const float sx = amax / 127.0f;
    std::vector<int8_t> xq(k, 0);
    if (amax > 0.0f) {
      const float inv = 127.0f / amax;
      for (int j = 0; j < k; ++j)
        xq[j] = static_cast<int8_t>(
            lrintf(x[static_cast<size_t>(i) * k + j] * inv));
    }
    for (int j = 0; j < n; ++j) {
      int64_t acc = 0;
      for (int kk = 0; kk < k; ++kk)
        acc += static_cast<int64_t>(xq[kk]) *
               w.i8[static_cast<size_t>(kk) * n + j];
      y[static_cast<size_t>(i) * n + j] =
          static_cast<double>(acc) *
              (static_cast<double>(sx) * w.scales[j]) +
          (bias ? bias[j] : 0.0f);
    }
  }
  return y;
}

void TestShape(int m, int k, int n, unsigned seed, bool with_bias) {
  std::mt19937 rng(seed);
  std::uniform_real_distribution<float> uf(-2.0f, 2.0f);
  std::uniform_int_distribution<int> ui(-127, 127);

  WTensor w;
  w.shape = {k, n};
  w.i8.resize(static_cast<size_t>(k) * n);
  for (auto& v : w.i8) v = static_cast<int8_t>(ui(rng));
  w.scales.resize(n);
  for (auto& s : w.scales) s = std::fabs(uf(rng)) * 0.01f + 1e-4f;
  funasr_tpu::AmxPackWeight(w);
  Check(!w.amx_pack.empty(), "pack produced");

  std::vector<float> x(static_cast<size_t>(m) * k);
  for (auto& v : x) v = uf(rng);
  std::vector<float> bias(n);
  for (auto& v : bias) v = uf(rng);

  std::vector<float> y(static_cast<size_t>(m) * n, -1e30f);
  const bool ran = funasr_tpu::AmxMatMulInt8(
      x.data(), m, k, w, with_bias ? bias.data() : nullptr, y.data());
  Check(ran, "AmxMatMulInt8 dispatched");
  if (!ran) return;

  const std::vector<double> ref =
      RefInt8Gemm(x, m, k, w, with_bias ? bias.data() : nullptr);
  double worst = 0.0;
  for (size_t i = 0; i < y.size(); ++i) {
    const double denom = std::max(1.0, std::fabs(ref[i]));
    worst = std::max(worst, std::fabs(y[i] - ref[i]) / denom);
  }
  char msg[128];
  std::snprintf(msg, sizeof(msg),
                "m=%d k=%d n=%d bias=%d rel err %.2e within fp32 rounding", m,
                k, n, with_bias ? 1 : 0, worst);
  Check(worst < 1e-5, msg);
  std::printf("ok %s\n", msg);
}

// bf16 reference: replicate the kernel's rounding (RNE f32->bf16 on both
// operands), accumulate in double; tolerance covers the kernel's f32
// tile accumulation order only.
uint16_t RefF32ToBf16(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  u += 0x7FFFu + ((u >> 16) & 1u);
  return static_cast<uint16_t>(u >> 16);
}

float RefBf16ToF32(uint16_t h) {
  uint32_t u = static_cast<uint32_t>(h) << 16;
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

void TestShapeBf16(int m, int k, int n, unsigned seed, bool with_bias) {
  std::mt19937 rng(seed);
  std::uniform_real_distribution<float> uf(-2.0f, 2.0f);

  WTensor w;
  w.shape = {k, n};
  w.f32.resize(static_cast<size_t>(k) * n);
  for (auto& v : w.f32) v = uf(rng);
  funasr_tpu::AmxPackWeightBf16(w);
  Check(!w.amx_pack.empty() && w.amx_bf16, "bf16 pack produced");

  std::vector<float> x(static_cast<size_t>(m) * k);
  for (auto& v : x) v = uf(rng);
  std::vector<float> bias(n);
  for (auto& v : bias) v = uf(rng);

  std::vector<float> y(static_cast<size_t>(m) * n, -1e30f);
  const bool ran = funasr_tpu::AmxMatMulBf16(
      x.data(), m, k, w, with_bias ? bias.data() : nullptr, y.data());
  Check(ran, "AmxMatMulBf16 dispatched");
  if (!ran) return;

  double worst = 0.0;
  for (int i = 0; i < m; ++i) {
    for (int j = 0; j < n; ++j) {
      double acc = 0.0;
      for (int kk = 0; kk < k; ++kk)
        acc += static_cast<double>(RefBf16ToF32(RefF32ToBf16(
                   x[static_cast<size_t>(i) * k + kk]))) *
               RefBf16ToF32(
                   RefF32ToBf16(w.f32[static_cast<size_t>(kk) * n + j]));
      if (with_bias) acc += bias[j];
      const double got = y[static_cast<size_t>(i) * n + j];
      const double denom = std::max(1.0, std::fabs(acc));
      worst = std::max(worst, std::fabs(got - acc) / denom);
    }
  }
  char msg[128];
  std::snprintf(msg, sizeof(msg),
                "bf16 m=%d k=%d n=%d bias=%d rel err %.2e within f32 accum",
                m, k, n, with_bias ? 1 : 0, worst);
  Check(worst < 1e-5, msg);
  std::printf("ok %s\n", msg);
}

double Now() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

void Bench() {
  const int m = 168, k = 512, n = 2048;
  std::mt19937 rng(7);
  std::uniform_real_distribution<float> uf(-1.0f, 1.0f);
  std::uniform_int_distribution<int> ui(-127, 127);
  WTensor w;
  w.shape = {k, n};
  w.i8.resize(static_cast<size_t>(k) * n);
  for (auto& v : w.i8) v = static_cast<int8_t>(ui(rng));
  w.scales.assign(n, 0.01f);
  funasr_tpu::AmxPackWeight(w);
  std::vector<float> x(static_cast<size_t>(m) * k);
  for (auto& v : x) v = uf(rng);
  std::vector<float> y(static_cast<size_t>(m) * n);
  funasr_tpu::AmxMatMulInt8(x.data(), m, k, w, nullptr, y.data());  // warm
  const int iters = 200;
  const double t0 = Now();
  for (int i = 0; i < iters; ++i)
    funasr_tpu::AmxMatMulInt8(x.data(), m, k, w, nullptr, y.data());
  const double dt = Now() - t0;
  const double gops = 2.0 * m * k * n * iters / dt / 1e9;
  std::printf("amx int8 gemm %dx%dx%d: %.1f GOP/s\n", m, k, n, gops);
}

void TestDynamicBf16(int m, int k, int n, unsigned seed) {
  std::mt19937 rng(seed);
  std::uniform_real_distribution<float> uf(-2.0f, 2.0f);
  std::vector<float> x(static_cast<size_t>(m) * k), w(static_cast<size_t>(k) * n);
  for (auto& v : x) v = uf(rng);
  for (auto& v : w) v = uf(rng);
  std::vector<float> y(static_cast<size_t>(m) * n, -1e30f);
  const bool ran =
      funasr_tpu::AmxGemmBf16Dynamic(x.data(), m, k, w.data(), n, nullptr,
                                     y.data());
  Check(ran, "AmxGemmBf16Dynamic dispatched");
  if (!ran) return;
  double worst = 0.0;
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j) {
      double acc = 0.0;
      for (int kk = 0; kk < k; ++kk)
        acc += static_cast<double>(RefBf16ToF32(RefF32ToBf16(
                   x[static_cast<size_t>(i) * k + kk]))) *
               RefBf16ToF32(RefF32ToBf16(w[static_cast<size_t>(kk) * n + j]));
      const double got = y[static_cast<size_t>(i) * n + j];
      worst = std::max(worst,
                       std::fabs(got - acc) / std::max(1.0, std::fabs(acc)));
    }
  char msg[128];
  std::snprintf(msg, sizeof(msg), "dyn bf16 m=%d k=%d n=%d rel err %.2e", m,
                k, n, worst);
  Check(worst < 1e-5, msg);
  std::printf("ok %s\n", msg);
}

void BenchBf16() {
  const int m = 168, k = 512, n = 2048;
  std::mt19937 rng(7);
  std::uniform_real_distribution<float> uf(-1.0f, 1.0f);
  WTensor w;
  w.shape = {k, n};
  w.f32.resize(static_cast<size_t>(k) * n);
  for (auto& v : w.f32) v = uf(rng);
  funasr_tpu::AmxPackWeightBf16(w);
  std::vector<float> x(static_cast<size_t>(m) * k);
  for (auto& v : x) v = uf(rng);
  std::vector<float> y(static_cast<size_t>(m) * n);
  funasr_tpu::AmxMatMulBf16(x.data(), m, k, w, nullptr, y.data());  // warm
  const int iters = 200;
  const double t0 = Now();
  for (int i = 0; i < iters; ++i)
    funasr_tpu::AmxMatMulBf16(x.data(), m, k, w, nullptr, y.data());
  const double dt = Now() - t0;
  const double gops = 2.0 * m * k * n * iters / dt / 1e9;
  std::printf("amx bf16 gemm %dx%dx%d: %.1f GFLOP/s\n", m, k, n, gops);
}

}  // namespace

int main() {
  if (!funasr_tpu::AmxInt8Available()) {
    std::printf("SKIP: AMX-INT8 not available on this host/toolchain\n");
    return 0;
  }
  // tile-aligned, unaligned-m, unaligned-n, unaligned-k, tiny, single-row
  TestShape(32, 128, 64, 1, true);
  TestShape(20, 512, 2048, 2, true);   // encoder qkv shape class
  TestShape(168, 512, 512, 3, false);  // attention out
  TestShape(10, 320, 70, 4, true);     // streaming chunk + odd n
  TestShape(1, 200, 41, 5, true);      // single token, odd k/n
  TestShape(33, 64, 33, 6, false);
  TestShape(16, 2048, 512, 7, true);   // ffn down
  if (funasr_tpu::AmxBf16Available()) {
    TestShapeBf16(32, 128, 64, 11, true);
    TestShapeBf16(20, 512, 2048, 12, true);
    TestShapeBf16(10, 320, 70, 13, true);   // odd n
    TestShapeBf16(1, 200, 41, 14, true);    // single row, odd k/n
    TestShapeBf16(33, 64, 33, 15, false);
    TestDynamicBf16(168, 128, 168, 21);  // attention scores shape class
    TestDynamicBf16(168, 168, 128, 22);  // attention context
    TestDynamicBf16(20, 100, 37, 23);    // odd everything
    BenchBf16();
  } else {
    std::printf("bf16: not enabled (set FUNASR_TPU_AMX_BF16=1)\n");
  }
  Bench();
  if (failures) {
    std::fprintf(stderr, "%d failures\n", failures);
    return 1;
  }
  std::printf("all AMX tests passed\n");
  return 0;
}
