// DSP test, two modes:
//  1. Golden parity (when golden_*.bin exist): compares the C++ fbank+LFR+CMVN
//     against vectors produced by the Python/JAX pipeline
//     (tests/test_cpp_runtime.py writes golden_*.bin before running this).
//  2. Standalone (fresh build, no goldens): self-contained invariants that need
//     no Python — mel peak-bin ordering across tones, CMVN affine algebra,
//     bitwise determinism, and the frame-count law — so `ctest` is meaningful
//     on a clean checkout.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "../include/funasr-tpu-runtime.h"
#include "../src/audio.h"
#include "../src/fbank.h"

namespace {

std::vector<float> ReadBin(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f.is_open()) return {};
  f.seekg(0, std::ios::end);
  const size_t n = static_cast<size_t>(f.tellg()) / sizeof(float);
  f.seekg(0);
  std::vector<float> out(n);
  f.read(reinterpret_cast<char*>(out.data()), n * sizeof(float));
  return out;
}

int Fail(const char* msg) {
  std::fprintf(stderr, "FAIL: %s\n", msg);
  return 1;
}

// Kaldi-format CMVN file with constant add/scale over 560 dims.
bool WriteMvn(const std::string& path, float add, float scale) {
  std::ofstream f(path);
  if (!f.is_open()) return false;
  f << "<Nnet>\n<Splice> 560 560\n[ 0 ]\n<AddShift> 560 560\n<LearnRateCoef> 0 [";
  for (int i = 0; i < 560; ++i) f << ' ' << add;
  f << " ]\n<Rescale> 560 560\n<LearnRateCoef> 0 [";
  for (int i = 0; i < 560; ++i) f << ' ' << scale;
  f << " ]\n</Nnet>\n";
  return true;
}

struct Feats {
  std::vector<float> data;
  int frames = 0;
  int dim = 0;
};

bool Extract(FUNASR_HANDLE h, const std::vector<int16_t>& pcm, Feats* out) {
  FUNASR_RESULT r = FunFrontendExtract(
      h, reinterpret_cast<const char*>(pcm.data()),
      static_cast<int>(pcm.size() * 2), 16000);
  if (r == nullptr) return false;
  out->frames = FunASRGetFeatureFrames(r);
  out->dim = FunASRGetFeatureDim(r);
  const float* p = FunASRGetFeatureData(r);
  out->data.assign(p, p + static_cast<size_t>(out->frames) * out->dim);
  FunASRFreeResult(r);
  return true;
}

std::vector<int16_t> Tone(double hz, int n, double amp = 0.3) {
  std::vector<int16_t> pcm(n);
  for (int i = 0; i < n; ++i) {
    pcm[i] = static_cast<int16_t>(
        std::lround(amp * 32767.0 * std::sin(2.0 * M_PI * hz * i / 16000.0)));
  }
  return pcm;
}

// Mean energy per raw mel bin (un-stacking LFR: dim = 80 * lfr_m), argmax bin.
int PeakBin(const Feats& f) {
  std::vector<double> acc(80, 0.0);
  for (size_t i = 0; i < f.data.size(); ++i) acc[i % 80] += f.data[i];
  int best = 0;
  for (int b = 1; b < 80; ++b)
    if (acc[b] > acc[best]) best = b;
  return best;
}

int Standalone() {
  const std::string tmp = "/tmp";
  const std::string mvn_id = tmp + "/funasr_tpu_dsp_id.mvn";
  const std::string mvn_sh = tmp + "/funasr_tpu_dsp_sh.mvn";
  if (!WriteMvn(mvn_id, 0.0f, 1.0f) || !WriteMvn(mvn_sh, 0.5f, 0.25f))
    return Fail("cannot write temp mvn files");

  FUNASR_HANDLE h_id = FunASRFrontendInit(mvn_id.c_str(), 80, 7, 6);
  FUNASR_HANDLE h_sh = FunASRFrontendInit(mvn_sh.c_str(), 80, 7, 6);
  if (h_id == nullptr || h_sh == nullptr) return Fail("frontend init failed");

  // 1. frame-count law: 1 s @16 kHz -> 98 raw frames (1+(16000-400)/160),
  //    LFR m=7 n=6 -> ceil(98/6) = 17 frames of dim 560.
  const auto pcm1k = Tone(1000.0, 16000);
  Feats a, a2, b;
  if (!Extract(h_id, pcm1k, &a)) return Fail("extract failed");
  if (a.dim != 560) return Fail("dim != 560");
  if (a.frames != 17) {
    std::fprintf(stderr, "frames=%d want 17\n", a.frames);
    return Fail("frame-count law violated (1s/16kHz/LFR7-6)");
  }

  // 2. determinism: same input -> bit-identical features (dither must be off).
  if (!Extract(h_id, pcm1k, &a2)) return Fail("extract failed");
  if (a.data != a2.data) return Fail("fbank not deterministic");

  // 3. CMVN algebra: shifted handle output == (identity output + 0.5) * 0.25.
  if (!Extract(h_sh, pcm1k, &b)) return Fail("extract failed");
  if (b.data.size() != a.data.size()) return Fail("cmvn changed shape");
  for (size_t i = 0; i < a.data.size(); ++i) {
    const float want = (a.data[i] + 0.5f) * 0.25f;
    if (std::fabs(b.data[i] - want) > 1e-5f) return Fail("cmvn affine mismatch");
  }

  // 4. mel peak ordering: higher tone -> higher argmax mel bin, interior bins.
  Feats lo, mid, hi;
  if (!Extract(h_id, Tone(500.0, 16000), &lo) ||
      !Extract(h_id, Tone(2000.0, 16000), &mid) ||
      !Extract(h_id, Tone(6000.0, 16000), &hi))
    return Fail("extract failed");
  const int p_lo = PeakBin(lo), p_mid = PeakBin(mid), p_hi = PeakBin(hi);
  std::printf("peak bins: 500Hz=%d 2kHz=%d 6kHz=%d\n", p_lo, p_mid, p_hi);
  if (!(0 < p_lo && p_lo < p_mid && p_mid < p_hi && p_hi < 79))
    return Fail("mel peak-bin ordering violated");

  FunASRUninit(h_id);
  FunASRUninit(h_sh);
  std::remove(mvn_id.c_str());
  std::remove(mvn_sh.c_str());
  std::printf("PASS (standalone invariants)\n");
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  const std::string dir = argc > 1 ? argv[1] : ".";
  const std::vector<float> wav = ReadBin(dir + "/golden_wave.bin");
  const std::vector<float> want = ReadBin(dir + "/golden_feats.bin");
  if (wav.empty() || want.empty()) {
    std::printf("golden files missing in %s; running standalone invariants\n",
                dir.c_str());
    return Standalone();
  }

  FUNASR_HANDLE h =
      FunASRFrontendInit((dir + "/golden_am.mvn").c_str(), 80, 7, 6);
  // feed as raw PCM16 bytes
  std::vector<int16_t> pcm(wav.size());
  for (size_t i = 0; i < wav.size(); ++i) {
    pcm[i] = static_cast<int16_t>(std::lround(wav[i] * 32767.0f));
  }
  FUNASR_RESULT r = FunFrontendExtract(
      h, reinterpret_cast<const char*>(pcm.data()),
      static_cast<int>(pcm.size() * 2), 16000);
  if (r == nullptr) return Fail("extract returned null");

  const int frames = FunASRGetFeatureFrames(r);
  const int dim = FunASRGetFeatureDim(r);
  if (static_cast<size_t>(frames) * dim != want.size()) {
    std::fprintf(stderr, "shape mismatch: %d x %d vs %zu\n", frames, dim,
                 want.size());
    return 1;
  }
  const float* got = FunASRGetFeatureData(r);
  double max_diff = 0.0;
  for (size_t i = 0; i < want.size(); ++i) {
    max_diff = std::max(max_diff, static_cast<double>(std::fabs(got[i] - want[i])));
  }
  std::printf("frames=%d dim=%d max_diff=%.6f\n", frames, dim, max_diff);
  FunASRFreeResult(r);
  FunASRUninit(h);
  if (max_diff > 2e-2) return Fail("feature mismatch vs golden");
  std::printf("PASS\n");
  return 0;
}
