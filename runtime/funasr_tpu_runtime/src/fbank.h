// Kaldi-compatible fbank + LFR + CMVN (C++ DSP front of the native runtime).
// Bit-matches the Python/JAX pipeline (funasr_tpu/ops/fbank.py, ops/lfr.py) within
// float tolerance; golden-tested against it.

#ifndef FUNASR_TPU_FBANK_H_
#define FUNASR_TPU_FBANK_H_

#include <string>
#include <vector>

namespace funasr_tpu {

struct FbankOptions {
  int sample_rate = 16000;
  int n_mels = 80;
  int frame_length = 400;  // samples
  int frame_shift = 160;   // samples
  float low_freq = 20.0f;
  float high_freq = 0.0f;  // <=0: nyquist + high_freq
  float preemph = 0.97f;
  bool remove_dc = true;
  std::string window = "hamming";
};

class Fbank {
 public:
  explicit Fbank(const FbankOptions& opts);
  // waveform: float samples already scaled (e.g. *32768). Output row-major
  // (num_frames x n_mels).
  std::vector<float> Compute(const std::vector<float>& waveform,
                             int* num_frames) const;

 private:
  FbankOptions opts_;
  int nfft_;
  std::vector<float> window_;
  std::vector<std::vector<std::pair<int, float>>> mel_bins_;  // per mel: (fft_bin, w)
};

// LFR stacking: (T x D) -> (ceil(T/n) x m*D), replicate padding both ends.
std::vector<float> ApplyLfr(const std::vector<float>& feats, int t, int d,
                            int lfr_m, int lfr_n, int* out_t);

struct Cmvn {
  std::vector<float> means;  // AddShift
  std::vector<float> istd;   // Rescale
  bool Load(const std::string& path);    // Kaldi-format am.mvn
  void Apply(std::vector<float>* feats) const;
};

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_FBANK_H_
