// Pure-C++ FSMN-VAD engine (counterpart of FunASR
// runtime/onnxruntime/src/fsmn-vad.cpp + fsmn-vad-online.cpp): FSMN scoring
// network over fbank+LFR+CMVN features (weights from a funasr_tpu vad.ftr
// export) plus the full VADX endpoint state machine (vadx.h — a 1:1 port of
// funasr_tpu/models/fsmn_vad_streaming/model.py, itself reference-faithful to
// funasr/models/fsmn_vad_streaming/model.py:825-1157).

#ifndef FUNASR_TPU_VAD_ENGINE_H_
#define FUNASR_TPU_VAD_ENGINE_H_

#include <cstdint>
#include <memory>
#include <string>
#include <utility>
#include <vector>

#include "fbank.h"
#include "ftr.h"
#include "vadx.h"

namespace funasr_tpu {

class FsmnVadEngine;

// Incremental fbank -> LFR -> CMVN -> FSMN scoring with carried caches:
// O(chunk) per call instead of rescoring the whole accumulated buffer
// (the reference keeps fixed-state streaming caches the same way,
// fsmn-vad-online.cpp; python twin: WavFrontendOnline + encoder caches).
// Produces byte-identical scores to the engine's batch scoring of the
// concatenated stream (causal FSMN: rorder == 0).
class VadScorer {
 public:
  explicit VadScorer(const FsmnVadEngine* engine);
  void Reset();
  // Feed mono float [-1,1] 16 kHz samples. Appends the per-frame
  // silence-pdf scores and decibels that became computable.
  void Process(const float* samples, int n, bool is_final,
               std::vector<float>* scores, std::vector<float>* decibels);

 private:
  const FsmnVadEngine* engine_;
  std::unique_ptr<Fbank> fbank_;
  std::vector<float> sample_tail_;   // scaled samples not yet fully framed
  std::vector<float> mel_rows_;      // rolling raw mel rows (base mel_base_)
  int64_t mel_base_ = 0;             // absolute index of mel_rows_[0]
  int64_t mel_count_ = 0;            // raw mel frames produced so far
  int64_t lfr_count_ = 0;            // LFR frames emitted so far
  std::vector<float> db_;            // decibel per raw mel frame (abs indexed
  int64_t db_base_ = 0;              //   from db_base_)
  std::vector<std::vector<float>> fsmn_cache_;  // per layer (lorder-1, proj)
};

class FsmnVadEngine {
 public:
  // Loads model_dir/vad.ftr (or weights.ftr with meta model=FsmnVADStreaming)
  // + am.mvn. Returns false when absent.
  bool Load(const std::string& model_dir);

  // Offline: mono float [-1,1] 16 kHz -> [(start_ms, end_ms), ...] via the
  // VADX machine, reproducing the python inference() chunk loop semantics
  // (60 s chunks + dynamic silence schedule; model.py:435-524). Optionally
  // returns the per-frame silence scores (golden-test hook).
  std::vector<std::pair<int, int>> Segments(
      const std::vector<float>& wav,
      std::vector<float>* scores = nullptr) const;

  // silence-pdf score per frame over prepared features (golden tests / batch)
  std::vector<float> SilScores(const std::vector<float>& feats, int t) const;

  VadxOptions MakeOptions() const;
  bool dynamic_silence() const { return dynamic_silence_; }

  int max_end_silence_ms() const { return opts_.max_end_silence_time; }
  int lfr_m() const { return lfr_m_; }
  int lfr_n() const { return lfr_n_; }
  int n_mels() const { return n_mels_; }

 private:
  friend class VadScorer;
  const WTensor& W(const std::string& name) const;

  FtrFile ftr_;
  Cmvn cmvn_;
  bool has_cmvn_ = false;
  // network config
  int input_dim_ = 400, affine_dim_ = 140, fsmn_layers_ = 4;
  int linear_dim_ = 250, proj_dim_ = 128, lorder_ = 20, rorder_ = 0;
  int out_affine_dim_ = 140, output_dim_ = 248;
  int n_mels_ = 80, lfr_m_ = 5, lfr_n_ = 1;
  int sil_pdf_id_ = 0;
  bool dynamic_silence_ = true;  // python inference() default schedule
  VadxOptions opts_;
};

// Streaming wrapper (the fsmn-vad-online role): incremental scoring + the
// VADX machine; emits [beg,-1] opens, [-1,end] closes, [beg,end] one-shot
// segments per the reference streaming protocol (model.py:867-887).
class FsmnVadStream {
 public:
  explicit FsmnVadStream(const FsmnVadEngine* engine);

  // samples: mono float 16 kHz; returns the NEW events since the last call.
  std::vector<std::pair<int, int>> Accept(const float* samples, int n,
                                          bool is_final);

 private:
  const FsmnVadEngine* engine_;
  VadScorer scorer_;
  VadStateMachine machine_;
  // dynamic silence schedule bookkeeping (model.py inference:465-515)
  int64_t accumulated_ms_ = 0;
  bool dyn_in_speech_ = false;
  int64_t samples_seen_ = 0;
};

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_VAD_ENGINE_H_
