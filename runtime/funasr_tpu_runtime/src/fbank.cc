#include "fbank.h"

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>

namespace funasr_tpu {

namespace {

constexpr float kLogFloor = 1.1920928955078125e-07f;  // float32 eps

double MelScale(double freq) { return 1127.0 * std::log1p(freq / 700.0); }

int NextPow2(int n) {
  int p = 1;
  while (p < n) p <<= 1;
  return p;
}

// iterative radix-2 FFT (real input padded into complex)
void Fft(std::vector<std::complex<double>>* a_ptr) {
  auto& a = *a_ptr;
  const int n = static_cast<int>(a.size());
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (int len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * M_PI / len;
    const std::complex<double> wl(std::cos(ang), std::sin(ang));
    for (int i = 0; i < n; i += len) {
      std::complex<double> w(1.0);
      for (int k = 0; k < len / 2; ++k) {
        std::complex<double> u = a[i + k];
        std::complex<double> v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wl;
      }
    }
  }
}

}  // namespace

Fbank::Fbank(const FbankOptions& opts) : opts_(opts) {
  nfft_ = NextPow2(opts.frame_length);
  // window
  const int n = opts.frame_length;
  window_.resize(n);
  const double a = 2.0 * M_PI / (n - 1);
  for (int i = 0; i < n; ++i) {
    if (opts.window == "hamming") {
      window_[i] = static_cast<float>(0.54 - 0.46 * std::cos(a * i));
    } else if (opts.window == "povey") {
      window_[i] = static_cast<float>(std::pow(0.5 - 0.5 * std::cos(a * i), 0.85));
    } else {  // hanning
      window_[i] = static_cast<float>(0.5 - 0.5 * std::cos(a * i));
    }
  }
  // mel banks (kaldi convention; see funasr_tpu/ops/fbank.py kaldi_mel_banks)
  const int num_fft_bins = nfft_ / 2;
  double high = opts.high_freq;
  if (high <= 0.0) high += 0.5 * opts.sample_rate;
  const double mel_low = MelScale(opts.low_freq);
  const double mel_high = MelScale(high);
  const double delta = (mel_high - mel_low) / (opts.n_mels + 1);
  const double bin_width = static_cast<double>(opts.sample_rate) / nfft_;
  mel_bins_.resize(opts.n_mels);
  for (int m = 0; m < opts.n_mels; ++m) {
    const double left = mel_low + m * delta;
    const double center = left + delta;
    const double right = center + delta;
    for (int i = 0; i < num_fft_bins; ++i) {
      const double mel = MelScale(bin_width * i);
      if (mel > left && mel < right) {
        const double w = mel <= center ? (mel - left) / (center - left)
                                       : (right - mel) / (right - center);
        mel_bins_[m].push_back({i, static_cast<float>(w)});
      }
    }
  }
}

std::vector<float> Fbank::Compute(const std::vector<float>& waveform,
                                  int* num_frames) const {
  const int n = static_cast<int>(waveform.size());
  const int flen = opts_.frame_length;
  const int fshift = opts_.frame_shift;
  const int t = n < flen ? 0 : 1 + (n - flen) / fshift;
  *num_frames = t;
  std::vector<float> out(static_cast<size_t>(t) * opts_.n_mels);
  std::vector<double> frame(flen);
  std::vector<std::complex<double>> fft_buf(nfft_);

  for (int fi = 0; fi < t; ++fi) {
    const float* src = waveform.data() + static_cast<size_t>(fi) * fshift;
    double mean = 0.0;
    for (int i = 0; i < flen; ++i) mean += src[i];
    mean /= flen;
    if (!opts_.remove_dc) mean = 0.0;
    // dc removal + preemphasis + window (preemph on dc-removed signal)
    frame[0] = (src[0] - mean) - opts_.preemph * (src[0] - mean);
    for (int i = flen - 1; i >= 1; --i) {
      frame[i] = (src[i] - mean) - opts_.preemph * (src[i - 1] - mean);
    }
    for (int i = 0; i < flen; ++i) frame[i] *= window_[i];

    std::fill(fft_buf.begin(), fft_buf.end(), std::complex<double>(0.0));
    for (int i = 0; i < flen; ++i) fft_buf[i] = frame[i];
    Fft(&fft_buf);

    float* dst = out.data() + static_cast<size_t>(fi) * opts_.n_mels;
    for (int m = 0; m < opts_.n_mels; ++m) {
      double acc = 0.0;
      for (const auto& [bin, w] : mel_bins_[m]) {
        acc += std::norm(fft_buf[bin]) * w;
      }
      dst[m] = std::log(std::max(static_cast<float>(acc), kLogFloor));
    }
  }
  return out;
}

std::vector<float> ApplyLfr(const std::vector<float>& feats, int t, int d,
                            int lfr_m, int lfr_n, int* out_t) {
  const int t_lfr = (t + lfr_n - 1) / lfr_n;
  *out_t = t_lfr;
  std::vector<float> out(static_cast<size_t>(t_lfr) * lfr_m * d);
  const int left = (lfr_m - 1) / 2;
  for (int i = 0; i < t_lfr; ++i) {
    for (int j = 0; j < lfr_m; ++j) {
      int src = i * lfr_n + j - left;
      src = std::max(0, std::min(src, t - 1));
      std::memcpy(out.data() + (static_cast<size_t>(i) * lfr_m + j) * d,
                  feats.data() + static_cast<size_t>(src) * d,
                  sizeof(float) * d);
    }
  }
  return out;
}

bool Cmvn::Load(const std::string& path) {
  std::ifstream f(path);
  if (!f.is_open()) return false;
  std::string line;
  auto parse_after = [&](const std::string& tag_line) -> std::vector<float> {
    std::istringstream iss(tag_line);
    std::string tok;
    std::vector<float> vals;
    bool in_brackets = false;
    while (iss >> tok) {
      if (tok == "[") { in_brackets = true; continue; }
      if (tok == "]") break;
      if (in_brackets) vals.push_back(std::stof(tok));
    }
    return vals;
  };
  while (std::getline(f, line)) {
    if (line.find("<AddShift>") != std::string::npos) {
      std::string next;
      if (std::getline(f, next) && next.find("<LearnRateCoef>") != std::string::npos)
        means = parse_after(next);
    } else if (line.find("<Rescale>") != std::string::npos) {
      std::string next;
      if (std::getline(f, next) && next.find("<LearnRateCoef>") != std::string::npos)
        istd = parse_after(next);
    }
  }
  return !means.empty() && !istd.empty();
}

void Cmvn::Apply(std::vector<float>* feats) const {
  const size_t d = means.size();
  if (d == 0) return;
  for (size_t i = 0; i < feats->size(); ++i) {
    const size_t j = i % d;
    (*feats)[i] = ((*feats)[i] + means[j]) * istd[j];
  }
}

}  // namespace funasr_tpu
