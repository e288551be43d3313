// AMX-INT8 GEMM backend for the int8 engines (weight-only int8 exports).
//
// The portable int8 path in nn.cc widens int8 codes to float and reuses the
// fp32 microkernel, so int8 buys only memory size. On Sapphire-Rapids-class
// hosts the TMUL unit does 16x64 s8 x 64x16 s8 -> 16x16 s32 per TDPBSSD
// (16,384 MACs/instruction), an order of magnitude past AVX-512 FMA. This TU
// quantizes activations per row on the fly (absmax -> s8, the same dynamic
// scheme onnxruntime uses for the reference's quantized models,
// reference runtime/onnxruntime/src/paraformer.cpp session options) and runs
// s8 x s8 -> s32 tiles, dequantizing once per output element:
//   y[i][j] = C_s32[i][j] * sx[i] * w.scales[j] + bias[j]
//
// Weights are repacked at FTR-load time into the VNNI B-tile layout
// (AmxPackWeight); the kernel is a 2x2 C-tile block (tmm0-3 accumulators,
// tmm4-5 A rows, tmm6-7 B columns) over K blocks of 64 bytes.
//
// Compiled with -mamx-tile -mamx-int8 when the compiler supports it; every
// entry point degrades to "not available" otherwise, and at runtime AMX is
// gated on CPUID + the Linux XTILEDATA permission request (and the
// FUNASR_TPU_NO_AMX=1 kill switch).

#include "nn.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

#if defined(__AMX_INT8__) && defined(__AMX_TILE__) && defined(__linux__)
#define FUNASR_TPU_AMX_IMPL 1
#include <immintrin.h>
#include <cpuid.h>
#include <cstdlib>
#include <sys/syscall.h>
#include <unistd.h>
#if defined(__AMX_BF16__)
#define FUNASR_TPU_AMX_BF16_IMPL 1
#endif
#endif

namespace funasr_tpu {

#ifdef FUNASR_TPU_AMX_IMPL

namespace {

constexpr long kArchReqXcompPerm = 0x1023;  // ARCH_REQ_XCOMP_PERM
constexpr long kXFeatureXtileData = 18;

bool DetectAmx() {
  if (std::getenv("FUNASR_TPU_NO_AMX")) return false;
  unsigned eax = 0, ebx = 0, ecx = 0, edx = 0;
  if (!__get_cpuid_count(7, 0, &eax, &ebx, &ecx, &edx)) return false;
  const bool amx_tile = edx & (1u << 24);
  const bool amx_int8 = edx & (1u << 25);
  if (!amx_tile || !amx_int8) return false;
  // per-process permission to use the XTILEDATA state component
  if (syscall(SYS_arch_prctl, kArchReqXcompPerm, kXFeatureXtileData) != 0)
    return false;
  return true;
}

// 64-byte LDTILECFG operand: palette 1, all eight tiles 16 rows x 64 bytes
// (A: 16x64 s8, B: 16 VNNI rows x 64 bytes, C: 16x16 s32).
struct alignas(64) TileConfig {
  uint8_t palette_id;
  uint8_t start_row;
  uint8_t reserved[14];
  uint16_t colsb[16];
  uint8_t rows[16];
};

inline void EnsureTileConfig() {
  static thread_local bool done = false;
  if (done) return;
  TileConfig cfg;
  std::memset(&cfg, 0, sizeof(cfg));
  cfg.palette_id = 1;
  for (int t = 0; t < 8; ++t) {
    cfg.colsb[t] = 64;
    cfg.rows[t] = 16;
  }
  _tile_loadconfig(&cfg);
  done = true;
}

}  // namespace

bool AmxInt8Available() {
  static const bool ok = DetectAmx();
  return ok;
}

void AmxPackWeight(WTensor& w) {
  if (!AmxInt8Available() || !w.quantized()) return;
  const int64_t k = w.rows(), n = w.cols();
  const int64_t k_pad = (k + 63) & ~int64_t{63};
  const int64_t n_pad = (n + 15) & ~int64_t{15};
  const int64_t kb_n = k_pad / 64, jt_n = n_pad / 16;
  w.amx_pack.assign(static_cast<size_t>(jt_n) * kb_n * 1024, 0);
  const int8_t* src = w.i8.data();
  for (int64_t jt = 0; jt < jt_n; ++jt) {
    const int64_t j0 = jt * 16;
    const int64_t jn = std::min<int64_t>(16, n - j0);
    for (int64_t kb = 0; kb < kb_n; ++kb) {
      int8_t* dst = w.amx_pack.data() + static_cast<size_t>(jt * kb_n + kb) * 1024;
      const int64_t kk0 = kb * 64;
      const int64_t kkn = std::min<int64_t>(64, k - kk0);
      for (int64_t kk = 0; kk < kkn; ++kk) {
        // B VNNI layout: byte for (k=kk, col c) lives at row kk/4,
        // byte offset c*4 + kk%4
        const int8_t* srow = src + (kk0 + kk) * n + j0;
        int8_t* drow = dst + (kk >> 2) * 64 + (kk & 3);
        for (int64_t c = 0; c < jn; ++c) drow[c * 4] = srow[c];
      }
    }
  }
  w.amx_k_pad = k_pad;
  w.amx_n_pad = n_pad;
}

bool AmxMatMulInt8(const float* x, int m, int k, const WTensor& w,
                   const float* bias, float* y) {
  if (!AmxInt8Available() || w.amx_pack.empty()) return false;
  const int n = static_cast<int>(w.cols());
  const int64_t k_pad = (k + 63) & ~int64_t{63};
  if (k_pad != w.amx_k_pad) return false;  // caller passed a sliced view
  const int kb_n = static_cast<int>(k_pad / 64);
  const int m_pad = (m + 15) & ~15;
  const int64_t jt_n = w.amx_n_pad / 16;

  // dynamic per-row activation quantization: sx[i] = absmax/127. The scalar
  // absmax/lrintf loops were the int8 path's hidden cost (the TMUL GEMM runs
  // ~500 GOP/s, so O(mk) scalar prep showed up at ~15% of wall) — both
  // passes are vectorized below; _mm512_cvtps_epi32 rounds to nearest even,
  // identical to lrintf under the default rounding mode.
  static thread_local std::vector<int8_t> xq_buf;
  static thread_local std::vector<float> sx_buf;
  xq_buf.assign(static_cast<size_t>(m_pad) * k_pad, 0);
  sx_buf.resize(m);
  for (int i = 0; i < m; ++i) {
    const float* xi = x + static_cast<int64_t>(i) * k;
    float amax = 0.0f;
    int j = 0;
#if defined(__AVX512F__)
    __m512 vmax = _mm512_setzero_ps();
    const __m512 sign_mask = _mm512_set1_ps(-0.0f);
    for (; j + 16 <= k; j += 16)
      vmax = _mm512_max_ps(vmax,
                           _mm512_andnot_ps(sign_mask,
                                            _mm512_loadu_ps(xi + j)));
    amax = _mm512_reduce_max_ps(vmax);
#endif
    for (; j < k; ++j) {
      const float a = std::fabs(xi[j]);
      amax = a > amax ? a : amax;
    }
    sx_buf[i] = amax / 127.0f;
    if (amax == 0.0f) continue;
    const float inv = 127.0f / amax;
    int8_t* qi = xq_buf.data() + static_cast<size_t>(i) * k_pad;
    j = 0;
#if defined(__AVX512F__)
    const __m512 vinv = _mm512_set1_ps(inv);
    for (; j + 16 <= k; j += 16) {
      const __m512i vi = _mm512_cvtps_epi32(
          _mm512_mul_ps(_mm512_loadu_ps(xi + j), vinv));
      _mm_storeu_si128(reinterpret_cast<__m128i*>(qi + j),
                       _mm512_cvtsepi32_epi8(vi));
    }
#endif
    for (; j < k; ++j)
      qi[j] = static_cast<int8_t>(lrintf(xi[j] * inv));
  }

  // raw pointers: thread_local vectors must not be referenced from inside the
  // OMP region (each worker would see its own empty instance)
  const int8_t* xq = xq_buf.data();
  const float* sx = sx_buf.data();
  const int8_t* pack = w.amx_pack.data();
  const float* scales = w.scales.data();

  const int jt2_n = (n + 31) / 32;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (static_cast<int64_t>(m) * k * n > 1 << 22)
#endif
  for (int jt2 = 0; jt2 < jt2_n; ++jt2) {
    EnsureTileConfig();
    alignas(64) int32_t c[32 * 32];
    const int j0 = jt2 * 32;
    const int64_t jt0 = static_cast<int64_t>(jt2) * 2;
    const bool has_j1 = jt0 + 1 < jt_n;
    for (int i0 = 0; i0 < m_pad; i0 += 32) {
      const bool two = i0 + 16 < m_pad;
      _tile_zero(0);
      if (has_j1) _tile_zero(1);
      if (two) _tile_zero(2);
      if (two && has_j1) _tile_zero(3);
      for (int kb = 0; kb < kb_n; ++kb) {
        _tile_loadd(4, xq + static_cast<size_t>(i0) * k_pad + kb * 64,
                    k_pad);
        const int8_t* b0 = pack + (static_cast<size_t>(jt0) * kb_n + kb) * 1024;
        _tile_loadd(6, b0, 64);
        _tile_dpbssd(0, 4, 6);
        if (two) {
          _tile_loadd(5, xq + static_cast<size_t>(i0 + 16) * k_pad + kb * 64,
                      k_pad);
          _tile_dpbssd(2, 5, 6);
        }
        if (has_j1) {
          const int8_t* b1 =
              pack + (static_cast<size_t>(jt0 + 1) * kb_n + kb) * 1024;
          _tile_loadd(7, b1, 64);
          _tile_dpbssd(1, 4, 7);
          if (two) _tile_dpbssd(3, 5, 7);
        }
      }
      _tile_stored(0, c, 128);
      if (has_j1) _tile_stored(1, c + 16, 128);
      if (two) _tile_stored(2, c + 16 * 32, 128);
      if (two && has_j1) _tile_stored(3, c + 16 * 32 + 16, 128);
      const int mn = std::min(32, m - i0);
      const int jn = std::min(32, n - j0);
      for (int r = 0; r < mn; ++r) {
        const float sr = sx[i0 + r];
        float* yr = y + static_cast<int64_t>(i0 + r) * n + j0;
        const int32_t* cr = c + r * 32;
        for (int j = 0; j < jn; ++j)
          yr[j] = static_cast<float>(cr[j]) * (sr * scales[j0 + j]) +
                  (bias ? bias[j0 + j] : 0.0f);
      }
    }
  }
  return true;
}

#else  // !FUNASR_TPU_AMX_IMPL — compiler or platform without AMX support

bool AmxInt8Available() { return false; }
void AmxPackWeight(WTensor&) {}
bool AmxMatMulInt8(const float*, int, int, const WTensor&, const float*,
                   float*) {
  return false;
}

#endif

#ifdef FUNASR_TPU_AMX_BF16_IMPL

namespace {

// round-to-nearest-even f32 -> bf16 (the same rounding XLA uses on TPU)
inline uint16_t F32ToBf16(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  u += 0x7FFFu + ((u >> 16) & 1u);
  return static_cast<uint16_t>(u >> 16);
}

// vectorized row conversion — the per-call O(mk) conversion is the bf16
// path's prep cost, same roofline math as the int8 quant passes
inline void ConvertRowBf16(const float* src, uint16_t* dst, int n) {
  int j = 0;
#if defined(__AVX512BF16__)
  for (; j + 16 <= n; j += 16)
    _mm256_storeu_si256(
        reinterpret_cast<__m256i*>(dst + j),
        reinterpret_cast<__m256i>(
            _mm512_cvtneps_pbh(_mm512_loadu_ps(src + j))));
#elif defined(__AVX512F__)
  const __m512i bias = _mm512_set1_epi32(0x7FFF);
  const __m512i one = _mm512_set1_epi32(1);
  for (; j + 16 <= n; j += 16) {
    __m512i u = _mm512_loadu_si512(src + j);
    u = _mm512_add_epi32(
        u, _mm512_add_epi32(bias,
                            _mm512_and_si512(_mm512_srli_epi32(u, 16), one)));
    _mm256_storeu_si256(reinterpret_cast<__m256i*>(dst + j),
                        _mm512_cvtepi32_epi16(_mm512_srli_epi32(u, 16)));
  }
#endif
  for (; j < n; ++j) dst[j] = F32ToBf16(src[j]);
}

bool DetectAmxBf16() {
  // opt-in: bf16 weights perturb logits ~0.5%, past the engines' default
  // 1e-4 parity budget — production deployments turn it on explicitly
  if (!std::getenv("FUNASR_TPU_AMX_BF16")) return false;
  if (!AmxInt8Available()) return false;  // tile + XTILEDATA permission
  unsigned eax = 0, ebx = 0, ecx = 0, edx = 0;
  if (!__get_cpuid_count(7, 0, &eax, &ebx, &ecx, &edx)) return false;
  return (edx & (1u << 22)) != 0;  // AMX-BF16
}

}  // namespace

bool AmxBf16Available() {
  static const bool ok = DetectAmxBf16();
  return ok;
}

void AmxPackWeightBf16(WTensor& w) {
  if (!AmxBf16Available() || w.quantized() || w.f32.empty()) return;
  const int64_t k = w.rows(), n = w.cols();
  if (k < 32 || static_cast<int64_t>(w.f32.size()) != k * n) return;
  const int64_t k_pad = (k + 31) & ~int64_t{31};
  const int64_t n_pad = (n + 15) & ~int64_t{15};
  const int64_t kb_n = k_pad / 32, jt_n = n_pad / 16;
  w.amx_pack.assign(static_cast<size_t>(jt_n) * kb_n * 1024, 0);
  const float* src = w.f32.data();
  for (int64_t jt = 0; jt < jt_n; ++jt) {
    const int64_t j0 = jt * 16;
    const int64_t jn = std::min<int64_t>(16, n - j0);
    for (int64_t kb = 0; kb < kb_n; ++kb) {
      int8_t* dst =
          w.amx_pack.data() + static_cast<size_t>(jt * kb_n + kb) * 1024;
      const int64_t kk0 = kb * 32;
      const int64_t kkn = std::min<int64_t>(32, k - kk0);
      for (int64_t kk = 0; kk < kkn; ++kk) {
        // B VNNI bf16 layout: element (k=kk, col c) lives at row kk/2,
        // byte offset c*4 + (kk%2)*2
        const float* srow = src + (kk0 + kk) * n + j0;
        uint16_t* drow = reinterpret_cast<uint16_t*>(
            dst + (kk >> 1) * 64 + (kk & 1) * 2);
        for (int64_t c = 0; c < jn; ++c) drow[c * 2] = F32ToBf16(srow[c]);
      }
    }
  }
  w.amx_k_pad = k_pad;
  w.amx_n_pad = n_pad;
  w.amx_bf16 = true;
}

namespace {

// shared bf16 tile loop: xb is (m_pad, k_pad) bf16 rows, pack is the VNNI
// B-tile arena (jt_n x kb_n x 1024 B)
void Bf16TileLoop(const uint16_t* xb, const int8_t* pack, int m, int m_pad,
                  int64_t k_pad, int n, int64_t jt_n, int kb_n,
                  const float* bias, float* y, int64_t work) {
  const int jt2_n = (n + 31) / 32;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (work > 1 << 22)
#endif
  for (int jt2 = 0; jt2 < jt2_n; ++jt2) {
    EnsureTileConfig();
    alignas(64) float c[32 * 32];
    const int j0 = jt2 * 32;
    const int64_t jt0 = static_cast<int64_t>(jt2) * 2;
    const bool has_j1 = jt0 + 1 < jt_n;
    for (int i0 = 0; i0 < m_pad; i0 += 32) {
      const bool two = i0 + 16 < m_pad;
      _tile_zero(0);
      if (has_j1) _tile_zero(1);
      if (two) _tile_zero(2);
      if (two && has_j1) _tile_zero(3);
      for (int kb = 0; kb < kb_n; ++kb) {
        _tile_loadd(4, xb + static_cast<size_t>(i0) * k_pad + kb * 32,
                    k_pad * 2);
        const int8_t* b0 =
            pack + (static_cast<size_t>(jt0) * kb_n + kb) * 1024;
        _tile_loadd(6, b0, 64);
        _tile_dpbf16ps(0, 4, 6);
        if (two) {
          _tile_loadd(5,
                      xb + static_cast<size_t>(i0 + 16) * k_pad + kb * 32,
                      k_pad * 2);
          _tile_dpbf16ps(2, 5, 6);
        }
        if (has_j1) {
          const int8_t* b1 =
              pack + (static_cast<size_t>(jt0 + 1) * kb_n + kb) * 1024;
          _tile_loadd(7, b1, 64);
          _tile_dpbf16ps(1, 4, 7);
          if (two) _tile_dpbf16ps(3, 5, 7);
        }
      }
      _tile_stored(0, c, 128);
      if (has_j1) _tile_stored(1, c + 16, 128);
      if (two) _tile_stored(2, c + 16 * 32, 128);
      if (two && has_j1) _tile_stored(3, c + 16 * 32 + 16, 128);
      const int mn = std::min(32, m - i0);
      const int jn = std::min(32, n - j0);
      for (int r = 0; r < mn; ++r) {
        float* yr = y + static_cast<int64_t>(i0 + r) * n + j0;
        const float* cr = c + r * 32;
        for (int j = 0; j < jn; ++j)
          yr[j] = cr[j] + (bias ? bias[j0 + j] : 0.0f);
      }
    }
  }
}

}  // namespace

bool AmxMatMulBf16(const float* x, int m, int k, const WTensor& w,
                   const float* bias, float* y) {
  if (!w.amx_bf16 || w.amx_pack.empty()) return false;
  const int n = static_cast<int>(w.cols());
  const int64_t k_pad = (k + 31) & ~int64_t{31};
  if (k_pad != w.amx_k_pad) return false;  // caller passed a sliced view
  const int kb_n = static_cast<int>(k_pad / 32);
  const int m_pad = (m + 15) & ~15;
  const int64_t jt_n = w.amx_n_pad / 16;

  static thread_local std::vector<uint16_t> xb_buf;
  xb_buf.assign(static_cast<size_t>(m_pad) * k_pad, 0);
  for (int i = 0; i < m; ++i) {
    const float* xi = x + static_cast<int64_t>(i) * k;
    uint16_t* bi = xb_buf.data() + static_cast<size_t>(i) * k_pad;
    ConvertRowBf16(xi, bi, k);
  }
  Bf16TileLoop(xb_buf.data(), w.amx_pack.data(), m, m_pad, k_pad, n, jt_n,
               kb_n, bias, y, static_cast<int64_t>(m) * k * n);
  return true;
}

bool AmxGemmBf16Dynamic(const float* x, int m, int k, const float* w, int n,
                        const float* bias, float* y) {
  // activation x activation GEMM (attention Q@K^T / A@V): B has no
  // load-time pack, so convert both operands per call — the O(kn) pack is
  // tiny next to the O(mkn) compute for the shapes the engines hit
  if (!AmxBf16Available() || k < 32) return false;
  const int64_t k_pad = (k + 31) & ~int64_t{31};
  const int64_t n_pad = (n + 15) & ~int64_t{15};
  const int kb_n = static_cast<int>(k_pad / 32);
  const int64_t jt_n = n_pad / 16;
  const int m_pad = (m + 15) & ~15;

  static thread_local std::vector<int8_t> pack_buf;
  static thread_local std::vector<uint16_t> xb_buf;
  pack_buf.assign(static_cast<size_t>(jt_n) * kb_n * 1024, 0);
  for (int64_t jt = 0; jt < jt_n; ++jt) {
    const int64_t j0 = jt * 16;
    const int64_t jn = std::min<int64_t>(16, n - j0);
    for (int64_t kb = 0; kb < kb_n; ++kb) {
      int8_t* dst = pack_buf.data() + static_cast<size_t>(jt * kb_n + kb) * 1024;
      const int64_t kk0 = kb * 32;
      const int64_t kkn = std::min<int64_t>(32, k - kk0);
      for (int64_t kk = 0; kk < kkn; ++kk) {
        const float* srow = w + (kk0 + kk) * n + j0;
        uint16_t* drow = reinterpret_cast<uint16_t*>(
            dst + (kk >> 1) * 64 + (kk & 1) * 2);
        for (int64_t c = 0; c < jn; ++c) drow[c * 2] = F32ToBf16(srow[c]);
      }
    }
  }
  xb_buf.assign(static_cast<size_t>(m_pad) * k_pad, 0);
  for (int i = 0; i < m; ++i) {
    const float* xi = x + static_cast<int64_t>(i) * k;
    uint16_t* bi = xb_buf.data() + static_cast<size_t>(i) * k_pad;
    ConvertRowBf16(xi, bi, k);
  }
  Bf16TileLoop(xb_buf.data(), pack_buf.data(), m, m_pad, k_pad, n, jt_n,
               kb_n, bias, y, static_cast<int64_t>(m) * k * n);
  return true;
}

#else  // !FUNASR_TPU_AMX_BF16_IMPL

bool AmxBf16Available() { return false; }
void AmxPackWeightBf16(WTensor&) {}
bool AmxMatMulBf16(const float*, int, int, const WTensor&, const float*,
                   float*) {
  return false;
}
bool AmxGemmBf16Dynamic(const float*, int, int, const float*, int,
                        const float*, float*) {
  return false;
}

#endif

}  // namespace funasr_tpu
