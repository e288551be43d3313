// Pure-C++ FSMN-VAD engine (counterpart of FunASR
// runtime/onnxruntime/src/fsmn-vad.cpp): FSMN scoring network over
// fbank+LFR+CMVN features (weights from a funasr_tpu vad.ftr export) plus the
// windowed two-threshold endpoint state machine
// (funasr_tpu/models/fsmn_vad_streaming/model.py semantics).

#ifndef FUNASR_TPU_VAD_ENGINE_H_
#define FUNASR_TPU_VAD_ENGINE_H_

#include <string>
#include <utility>
#include <vector>

#include "fbank.h"
#include "ftr.h"

namespace funasr_tpu {

class FsmnVadEngine {
 public:
  // Loads model_dir/vad.ftr (or weights.ftr with meta model=FsmnVADStreaming)
  // + am.mvn. Returns false when absent.
  bool Load(const std::string& model_dir);

  // wav: mono float in [-1, 1] at 16 kHz -> [(start_ms, end_ms), ...];
  // optionally returns the per-frame silence scores (golden-test hook).
  std::vector<std::pair<int, int>> Segments(const std::vector<float>& wav,
                                            std::vector<float>* scores = nullptr);

  // silence-pdf score per frame (exposed for golden tests)
  std::vector<float> SilScores(const std::vector<float>& feats, int t);

  int max_end_silence_ms() const { return max_end_silence_ms_; }

  int lfr_m() const { return lfr_m_; }
  int lfr_n() const { return lfr_n_; }
  int n_mels() const { return n_mels_; }

 private:
  const WTensor& W(const std::string& name) const;
  FtrFile ftr_;
  Cmvn cmvn_;
  bool has_cmvn_ = false;
  // network config
  int input_dim_ = 400, affine_dim_ = 140, fsmn_layers_ = 4;
  int linear_dim_ = 250, proj_dim_ = 128, lorder_ = 20, rorder_ = 0;
  int out_affine_dim_ = 140, output_dim_ = 248;
  int n_mels_ = 80, lfr_m_ = 5, lfr_n_ = 1;
  // detector options (VADXOptions defaults, model.py:61-91)
  int window_size_ms_ = 200, frame_in_ms_ = 10, frame_length_ms_ = 25;
  int sil_to_speech_ms_ = 150, speech_to_sil_ms_ = 150;
  int max_end_silence_ms_ = 800, max_single_segment_ms_ = 60000;
  float speech_noise_thres_ = 0.6f, speech_2_noise_ratio_ = 1.0f;
  int sil_pdf_id_ = 0;
};

// Streaming wrapper (the fsmn-vad-online role, reference
// runtime/onnxruntime/src/fsmn-vad-online.cpp): accumulate audio, re-detect
// on the buffered window, and emit events incrementally —
// [beg, -1] when an utterance opens, [-1, end] when it closes (reference
// streaming protocol, funasr_tpu/models/fsmn_vad_streaming/model.py:867-887).
class FsmnVadStream {
 public:
  explicit FsmnVadStream(FsmnVadEngine* engine) : engine_(engine) {}

  // samples: mono float 16 kHz; returns the NEW events since the last call.
  std::vector<std::pair<int, int>> Accept(const float* samples, int n,
                                          bool is_final);

 private:
  FsmnVadEngine* engine_;
  std::vector<float> buf_;
  int emitted_beg_ms_ = -1;   // open segment start (absolute ms), -1 = closed
  int last_end_ms_ = 0;       // absolute end of the last emitted close
};

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_VAD_ENGINE_H_
