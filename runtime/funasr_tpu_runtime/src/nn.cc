#include "nn.h"

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace funasr_tpu {

const float* RawF32(const WTensor& w, const char* what) {
  if (w.f32.empty() && w.quantized()) {
    std::fprintf(stderr,
                 "funasr_tpu: tensor %s is int8-quantized but consumed raw as "
                 "f32; re-export with a current exporter\n",
                 what);
    std::abort();
  }
  return w.f32.data();
}

// Cache-tiled GEMM with a register-resident microkernel (the BLIS/gotoBLAS
// scheme, sized for one AVX-512 core): w is walked in KC x NC tiles that stay
// L2-resident and are reused across every row of x, and the MR x NR
// microkernel keeps its accumulators in registers for the whole KC depth
// (MR*NR floats = 24 zmm), so the inner loop runs at FMA throughput instead
// of the y-store bandwidth the old 4-row axpy version was bound by
// (measured 11 -> ~37 GFLOP/s on the 168x512x2048 encoder shape).
// Accumulation is re-associated ((bias + block0) + block1 + ...), which stays
// within the 1e-4 parity budget the engines are tested to vs the JAX path.
namespace {

constexpr int kMR = 12;   // microkernel rows (x rows in flight; 12x32 acc = 24 zmm)
constexpr int kNR = 32;   // microkernel cols (2 zmm vectors)
constexpr int kKC = 512;  // k-depth per L2 tile
constexpr int kNC = 256;  // n-width per L2 tile (KC*NC*4 = 512 KB)

// Fixed-shape microkernel over PACKED panels: xp is kk-major (kb x kMR
// contiguous), wp is kk-major (kb x kNR contiguous), so every kk iteration
// reads two short contiguous runs and the acc[kMR][kNR] block (16 zmm) stays
// in registers (fully unrolled by the compiler at -O3 -march=native).
inline void MicroKernelMain(const float* xp, const float* wp, int k_len,
                            float* y, int ldy) {
  float acc[kMR][kNR] = {};
  for (int kk = 0; kk < k_len; ++kk) {
    const float* wr = wp + static_cast<int64_t>(kk) * kNR;
    const float* xr = xp + static_cast<int64_t>(kk) * kMR;
    for (int r = 0; r < kMR; ++r) {
      const float a = xr[r];
      for (int j = 0; j < kNR; ++j) acc[r][j] += a * wr[j];
    }
  }
  for (int r = 0; r < kMR; ++r) {
    float* yr = y + r * static_cast<int64_t>(ldy);
    for (int j = 0; j < kNR; ++j) yr[j] += acc[r][j];
  }
}

// Same kernel with a partial writeback (m or n remainder; the packed panels
// are zero-padded so the math over real cells is identical).
inline void MicroKernelEdge(const float* xp, const float* wp, int k_len,
                            float* y, int ldy, int mr, int nr) {
  float acc[kMR][kNR] = {};
  for (int kk = 0; kk < k_len; ++kk) {
    const float* wr = wp + static_cast<int64_t>(kk) * kNR;
    const float* xr = xp + static_cast<int64_t>(kk) * kMR;
    for (int r = 0; r < kMR; ++r) {
      const float a = xr[r];
      for (int j = 0; j < kNR; ++j) acc[r][j] += a * wr[j];
    }
  }
  for (int r = 0; r < mr; ++r) {
    float* yr = y + r * static_cast<int64_t>(ldy);
    for (int j = 0; j < nr; ++j) yr[j] += acc[r][j];
  }
}

}  // namespace

void GemmF32(const float* x, int m, int k, const float* wd, int n,
             const float* bias, float* y) {
  // bf16-mode engines (FUNASR_TPU_AMX_BF16=1) also route activation GEMMs
  // (attention Q@K^T / A@V) through the TMUL; tiny shapes keep the f32
  // microkernel — the per-call bf16 conversion would dominate them
  if (static_cast<int64_t>(m) * k * n >= 1 << 16 && m >= 4 &&
      AmxGemmBf16Dynamic(x, m, k, wd, n, bias, y))
    return;
  for (int i = 0; i < m; ++i) {
    float* yi = y + static_cast<int64_t>(i) * n;
    if (bias) std::memcpy(yi, bias, n * sizeof(float));
    else std::memset(yi, 0, n * sizeof(float));
  }
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (static_cast<int64_t>(m) * k * n > 1 << 20)
#endif
    for (int j0 = 0; j0 < n; j0 += kNC) {
      const int nb = n - j0 < kNC ? n - j0 : kNC;
      const int n_panels = (nb + kNR - 1) / kNR;
      thread_local std::vector<float> wpack, xpack;
      wpack.resize(static_cast<size_t>(n_panels) * kKC * kNR);
      xpack.resize(static_cast<size_t>(kKC) * kMR);
      for (int k0 = 0; k0 < k; k0 += kKC) {  // ascending: y += tile by tile
        const int kb = k - k0 < kKC ? k - k0 : kKC;
        // pack the w tile into kk-major NR panels (zero-padded n remainder);
        // packed once, reused by every row block of x
        for (int p = 0; p < n_panels; ++p) {
          const int j1 = p * kNR;
          const int nrb = nb - j1 < kNR ? nb - j1 : kNR;
          float* dst = wpack.data() + static_cast<size_t>(p) * kb * kNR;
          const float* src = wd + static_cast<int64_t>(k0) * n + j0 + j1;
          for (int kk = 0; kk < kb; ++kk) {
            std::memcpy(dst + kk * kNR, src + static_cast<int64_t>(kk) * n,
                        nrb * sizeof(float));
            if (nrb < kNR)
              std::memset(dst + kk * kNR + nrb, 0,
                          (kNR - nrb) * sizeof(float));
          }
        }
        for (int i0 = 0; i0 < m; i0 += kMR) {
          const int mb = m - i0 < kMR ? m - i0 : kMR;
          // pack the x row block kk-major (zero-padded m remainder)
          for (int kk = 0; kk < kb; ++kk) {
            float* dst = xpack.data() + static_cast<size_t>(kk) * kMR;
            for (int r = 0; r < mb; ++r)
              dst[r] = x[static_cast<int64_t>(i0 + r) * k + k0 + kk];
            for (int r = mb; r < kMR; ++r) dst[r] = 0.0f;
          }
          for (int p = 0; p < n_panels; ++p) {
            const int j1 = p * kNR;
            const int nrb = nb - j1 < kNR ? nb - j1 : kNR;
            const float* wp = wpack.data() + static_cast<size_t>(p) * kb * kNR;
            float* yt = y + static_cast<int64_t>(i0) * n + j0 + j1;
            if (mb == kMR && nrb == kNR)
              MicroKernelMain(xpack.data(), wp, kb, yt, n);
            else
              MicroKernelEdge(xpack.data(), wp, kb, yt, n, mb, nrb);
          }
        }
      }
    }
}

void MatMul(const float* x, int m, int k, const WTensor& w, const float* bias,
            float* y) {
  const int n = static_cast<int>(w.cols());
  if (!w.quantized()) {
    // opt-in AMX-BF16 path (FUNASR_TPU_AMX_BF16=1): f32 weights pre-rounded
    // to bf16 tiles at load, f32 accumulation in the TMUL (nn_amx.cc)
    if (AmxMatMulBf16(x, m, k, w, bias, y)) return;
    GemmF32(x, m, k, w.f32.data(), n, bias, y);
  } else {
    // AMX TMUL path: s8 x s8 -> s32 tiles with dynamic per-row activation
    // quantization (nn_amx.cc); an order of magnitude past the widened-float
    // fallback below on Sapphire-Rapids-class hosts
    if (AmxMatMulInt8(x, m, k, w, bias, y)) return;
    // int8 path: identical tiling — the pack step widens int8 -> float (raw
    // code values; per-column scales and bias are applied in one pass after
    // accumulation, exactly as before), so the same register microkernel
    // serves both precisions and int8 keeps only its memory-size advantage
    const int8_t* wd = w.i8.data();
    for (int i = 0; i < m; ++i)
      std::memset(y + static_cast<int64_t>(i) * n, 0, n * sizeof(float));
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (static_cast<int64_t>(m) * k * n > 1 << 20)
#endif
    for (int j0 = 0; j0 < n; j0 += kNC) {
      const int nb = n - j0 < kNC ? n - j0 : kNC;
      const int n_panels = (nb + kNR - 1) / kNR;
      thread_local std::vector<float> wpack, xpack;
      wpack.resize(static_cast<size_t>(n_panels) * kKC * kNR);
      xpack.resize(static_cast<size_t>(kKC) * kMR);
      for (int k0 = 0; k0 < k; k0 += kKC) {
        const int kb = k - k0 < kKC ? k - k0 : kKC;
        for (int p = 0; p < n_panels; ++p) {
          const int j1 = p * kNR;
          const int nrb = nb - j1 < kNR ? nb - j1 : kNR;
          float* dst = wpack.data() + static_cast<size_t>(p) * kb * kNR;
          const int8_t* src = wd + static_cast<int64_t>(k0) * n + j0 + j1;
          for (int kk = 0; kk < kb; ++kk) {
            const int8_t* srow = src + static_cast<int64_t>(kk) * n;
            float* drow = dst + kk * kNR;
            for (int j = 0; j < nrb; ++j)
              drow[j] = static_cast<float>(srow[j]);
            for (int j = nrb; j < kNR; ++j) drow[j] = 0.0f;
          }
        }
        for (int i0 = 0; i0 < m; i0 += kMR) {
          const int mb = m - i0 < kMR ? m - i0 : kMR;
          for (int kk = 0; kk < kb; ++kk) {
            float* dst = xpack.data() + static_cast<size_t>(kk) * kMR;
            for (int r = 0; r < mb; ++r)
              dst[r] = x[static_cast<int64_t>(i0 + r) * k + k0 + kk];
            for (int r = mb; r < kMR; ++r) dst[r] = 0.0f;
          }
          for (int p = 0; p < n_panels; ++p) {
            const int j1 = p * kNR;
            const int nrb = nb - j1 < kNR ? nb - j1 : kNR;
            const float* wp = wpack.data() + static_cast<size_t>(p) * kb * kNR;
            float* yt = y + static_cast<int64_t>(i0) * n + j0 + j1;
            if (mb == kMR && nrb == kNR)
              MicroKernelMain(xpack.data(), wp, kb, yt, n);
            else
              MicroKernelEdge(xpack.data(), wp, kb, yt, n, mb, nrb);
          }
        }
      }
      // per-column dequant scale + bias, once per output element
      for (int i = 0; i < m; ++i) {
        float* yi = y + static_cast<int64_t>(i) * n + j0;
        for (int j = 0; j < nb; ++j) {
          yi[j] *= w.scales[j0 + j];
          if (bias) yi[j] += bias[j0 + j];
        }
      }
    }
  }
}

void LayerNorm(float* x, int t, int c, const float* scale, const float* bias) {
  constexpr float kEps = 1e-12f;
  for (int i = 0; i < t; ++i) {
    float* row = x + i * c;
    double mean = 0.0;
    for (int j = 0; j < c; ++j) mean += row[j];
    mean /= c;
    double var = 0.0;
    for (int j = 0; j < c; ++j) {
      const double d = row[j] - mean;
      var += d * d;
    }
    var /= c;
    const float inv = 1.0f / std::sqrt(static_cast<float>(var) + kEps);
    for (int j = 0; j < c; ++j) {
      row[j] = (row[j] - static_cast<float>(mean)) * inv * scale[j] + bias[j];
    }
  }
}

void Relu(float* x, int64_t n) {
  for (int64_t i = 0; i < n; ++i) x[i] = x[i] > 0.0f ? x[i] : 0.0f;
}

void SigmoidV(float* x, int64_t n) {
  for (int64_t i = 0; i < n; ++i) x[i] = 1.0f / (1.0f + std::exp(-x[i]));
}

void SoftmaxRow(float* x, int n) {
  float mx = x[0];
  for (int i = 1; i < n; ++i) mx = x[i] > mx ? x[i] : mx;
  float sum = 0.0f;
  for (int i = 0; i < n; ++i) {
    x[i] = std::exp(x[i] - mx);
    sum += x[i];
  }
  const float inv = 1.0f / sum;
  for (int i = 0; i < n; ++i) x[i] *= inv;
}

void DepthwiseConv1d(const float* x, int t, int c, const float* w, int k,
                     int left_pad, int right_pad, float* out) {
  const int t_out = t + left_pad + right_pad - k + 1;
  std::memset(out, 0, static_cast<size_t>(t_out) * c * sizeof(float));
  for (int i = 0; i < t_out; ++i) {
    float* oi = out + static_cast<int64_t>(i) * c;
    for (int kk = 0; kk < k; ++kk) {
      const int src = i - left_pad + kk;
      if (src < 0 || src >= t) continue;
      const float* xi = x + static_cast<int64_t>(src) * c;
      const float* wk = w + static_cast<int64_t>(kk) * c;
      for (int j = 0; j < c; ++j) oi[j] += xi[j] * wk[j];
    }
  }
}

void Conv1d(const float* x, int t, int c_in, const WTensor& w, const float* bias,
            int left_pad, int right_pad, float* out) {
  // w shape (k, c_in, c_out)
  const int k = static_cast<int>(w.shape[0]);
  const int c_out = static_cast<int>(w.shape[2]);
  const int t_out = t + left_pad + right_pad - k + 1;
  for (int i = 0; i < t_out; ++i) {
    float* oi = out + static_cast<int64_t>(i) * c_out;
    if (bias) std::memcpy(oi, bias, c_out * sizeof(float));
    else std::memset(oi, 0, c_out * sizeof(float));
    for (int kk = 0; kk < k; ++kk) {
      const int src = i - left_pad + kk;
      if (src < 0 || src >= t) continue;
      const float* xi = x + static_cast<int64_t>(src) * c_in;
      const float* wk = RawF32(w, "conv1d weight") +
          static_cast<int64_t>(kk) * c_in * c_out;
      for (int ci = 0; ci < c_in; ++ci) {
        const float xv = xi[ci];
        if (xv == 0.0f) continue;
        const float* wr = wk + static_cast<int64_t>(ci) * c_out;
        for (int co = 0; co < c_out; ++co) oi[co] += xv * wr[co];
      }
    }
  }
}

void AddSinusoidalPe(float* x, int t, int d, int start_pos) {
  // FunASR SinusoidalPositionEncoder (embedding.py:396-420): sin||cos split.
  const int half = d / 2;
  const float log_inc = std::log(10000.0f) / (d / 2.0f - 1.0f);
  for (int i = 0; i < t; ++i) {
    const float pos = static_cast<float>(start_pos + i);
    float* row = x + static_cast<int64_t>(i) * d;
    for (int j = 0; j < half; ++j) {
      const float scaled = pos * std::exp(-log_inc * j);
      row[j] += std::sin(scaled);
      row[half + j] += std::cos(scaled);
    }
  }
}

}  // namespace funasr_tpu
