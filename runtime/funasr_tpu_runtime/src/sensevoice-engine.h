// Pure-C++ SenseVoiceSmall inference engine (counterpart of FunASR
// runtime/onnxruntime/src/sensevoice-small.cpp): 4 query-embedding prompt
// frames (language / event / emo / textnorm) prepended to LFR features, SAN-M
// encoder with tp tail, CTC greedy decode over the rich-tag vocabulary.
// Weights from a funasr_tpu export (export_runtime.export_sensevoice_ftr).

#ifndef FUNASR_TPU_SENSEVOICE_ENGINE_H_
#define FUNASR_TPU_SENSEVOICE_ENGINE_H_

#include <memory>
#include <string>
#include <vector>

#include "ftr.h"
#include "sanm-encoder.h"
#include "vocab.h"

namespace funasr_tpu {

class SenseVoiceEngine {
 public:
  // model_dir must hold a weights.ftr with meta model=SenseVoiceSmall
  // + tokens.txt. Returns false otherwise.
  bool Load(const std::string& model_dir);
  // share an already-loaded weights.ftr arena (FunASRInit loads once)
  bool Load(std::shared_ptr<const FtrFile> ftr,
            const std::string& model_dir);
  bool loaded() const { return loaded_; }
  int lfr_m() const { return lfr_m_; }
  int lfr_n() const { return lfr_n_; }
  int n_mels() const { return n_mels_; }

  // feats (t, input_size) LFR+CMVN -> transcript with rich tags
  // (<|zh|><|HAPPY|>... pass through as vocabulary tokens).
  // language: "auto"|"zh"|"en"|"yue"|"ja"|"ko"|"nospeech"; use_itn picks the
  // withitn textnorm query (model.py LID_DICT / TEXTNORM_DICT).
  std::string Infer(const std::vector<float>& feats, int t,
                    const std::string& language = "auto",
                    bool use_itn = false);

 private:
  const WTensor& W(const std::string& name) const;

  std::shared_ptr<const FtrFile> ftr_;
  Vocab vocab_;
  SanmEncoder encoder_;
  bool loaded_ = false;
  int input_size_ = 560, d_ = 512, vocab_size_ = 0, blank_ = 0;
  int lfr_m_ = 7, lfr_n_ = 6, n_mels_ = 80;
};

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_SENSEVOICE_ENGINE_H_
