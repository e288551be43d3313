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

// Register-blocked axpy-style GEMM: 4 output rows share each streamed weight
// row, quartering the w-bandwidth (the bottleneck — w is k*n*4 bytes and the
// y rows stay L1-resident). Per-output accumulation order over kk is
// unchanged vs the naive loop, so results stay byte-identical to the
// reference JAX path the engines are parity-tested against.
void MatMul(const float* x, int m, int k, const WTensor& w, const float* bias,
            float* y) {
  const int n = static_cast<int>(w.cols());
  if (!w.quantized()) {
    const float* wd = w.f32.data();
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (static_cast<int64_t>(m) * k * n > 1 << 20)
#endif
    for (int i0 = 0; i0 < m; i0 += 4) {
      const int rows = m - i0 < 4 ? m - i0 : 4;
      for (int r = 0; r < rows; ++r) {
        float* yi = y + static_cast<int64_t>(i0 + r) * n;
        if (bias) std::memcpy(yi, bias, n * sizeof(float));
        else std::memset(yi, 0, n * sizeof(float));
      }
      if (rows == 4) {
        float* y0 = y + static_cast<int64_t>(i0) * n;
        float* y1 = y0 + n;
        float* y2 = y1 + n;
        float* y3 = y2 + n;
        const float* x0 = x + static_cast<int64_t>(i0) * k;
        for (int kk = 0; kk < k; ++kk) {
          const float a0 = x0[kk], a1 = x0[k + kk];
          const float a2 = x0[2 * k + kk], a3 = x0[3 * k + kk];
          if (a0 == 0.0f && a1 == 0.0f && a2 == 0.0f && a3 == 0.0f) continue;
          const float* wr = wd + static_cast<int64_t>(kk) * n;
          for (int j = 0; j < n; ++j) {
            const float wv = wr[j];
            y0[j] += a0 * wv;
            y1[j] += a1 * wv;
            y2[j] += a2 * wv;
            y3[j] += a3 * wv;
          }
        }
      } else {
        for (int r = 0; r < rows; ++r) {
          float* yi = y + static_cast<int64_t>(i0 + r) * n;
          const float* xi = x + static_cast<int64_t>(i0 + r) * k;
          for (int kk = 0; kk < k; ++kk) {
            const float xv = xi[kk];
            if (xv == 0.0f) continue;
            const float* wr = wd + static_cast<int64_t>(kk) * n;
            for (int j = 0; j < n; ++j) yi[j] += xv * wr[j];
          }
        }
      }
    }
  } else {
    const int8_t* wd = w.i8.data();
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (static_cast<int64_t>(m) * k * n > 1 << 20)
#endif
    for (int i0 = 0; i0 < m; i0 += 4) {
      const int rows = m - i0 < 4 ? m - i0 : 4;
      for (int r = 0; r < rows; ++r) {
        std::memset(y + static_cast<int64_t>(i0 + r) * n, 0,
                    n * sizeof(float));
      }
      if (rows == 4) {
        float* y0 = y + static_cast<int64_t>(i0) * n;
        float* y1 = y0 + n;
        float* y2 = y1 + n;
        float* y3 = y2 + n;
        const float* x0 = x + static_cast<int64_t>(i0) * k;
        for (int kk = 0; kk < k; ++kk) {
          const float a0 = x0[kk], a1 = x0[k + kk];
          const float a2 = x0[2 * k + kk], a3 = x0[3 * k + kk];
          if (a0 == 0.0f && a1 == 0.0f && a2 == 0.0f && a3 == 0.0f) continue;
          const int8_t* wr = wd + static_cast<int64_t>(kk) * n;
          for (int j = 0; j < n; ++j) {
            const float wv = static_cast<float>(wr[j]);
            y0[j] += a0 * wv;
            y1[j] += a1 * wv;
            y2[j] += a2 * wv;
            y3[j] += a3 * wv;
          }
        }
      } else {
        for (int r = 0; r < rows; ++r) {
          float* yi = y + static_cast<int64_t>(i0 + r) * n;
          const float* xi = x + static_cast<int64_t>(i0 + r) * k;
          for (int kk = 0; kk < k; ++kk) {
            const float xv = xi[kk];
            if (xv == 0.0f) continue;
            const int8_t* wr = wd + static_cast<int64_t>(kk) * n;
            for (int j = 0; j < n; ++j) yi[j] += xv * static_cast<float>(wr[j]);
          }
        }
      }
      for (int r = 0; r < rows; ++r) {
        float* yi = y + static_cast<int64_t>(i0 + r) * n;
        for (int j = 0; j < n; ++j) {
          yi[j] *= w.scales[j];
          if (bias) yi[j] += bias[j];
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
