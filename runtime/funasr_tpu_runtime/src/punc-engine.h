// Pure-C++ CT-Transformer punctuation engine (counterpart of FunASR
// runtime/onnxruntime/src/ct-transformer.cpp AddPunc): embedding -> SAN-M
// encoder -> punc classifier over FTR-exported JAX weights
// (funasr_tpu/models/ct_transformer/model.py), with the 20-word mini-sentence
// sliding window and sentence-boundary cache carried between windows.

#ifndef FUNASR_TPU_PUNC_ENGINE_H_
#define FUNASR_TPU_PUNC_ENGINE_H_

#include <string>
#include <vector>

#include "ftr.h"
#include "sanm-encoder.h"
#include "vocab.h"

namespace funasr_tpu {

// Whitespace-split, then ASCII runs stay words and multi-byte UTF-8 chars
// split per char (funasr_tpu/models/ct_transformer/utils.py split_words).
std::vector<std::string> SplitWords(const std::string& text);

// Streaming punctuation cache (ct_transformer_streaming/model.py
// cache["pre_text"]): words after the last sentence end, carried between calls.
struct PuncCache {
  std::vector<std::string> pre_text;
};

class PuncEngine {
 public:
  // Loads model_dir/punc.ftr (export_runtime.export_punc_ftr) +
  // punc_tokens.txt. Returns false when absent.
  bool Load(const std::string& model_dir);
  bool loaded() const { return loaded_; }

  // Raw transcript -> punctuated text (model.py inference semantics).
  std::string AddPunc(const std::string& text) const;

  // Streaming call (ct-transformer-online role, reference
  // runtime/onnxruntime/src/ct-transformer-online.cpp): punctuates the new
  // words given the carried pre-text, withholding the trailing mark so the
  // next chunk can revise it. Requires a vad_encoder export
  // (CTTransformerStreaming); falls back to offline rules otherwise.
  std::string AddPuncStreaming(const std::string& text, PuncCache* cache) const;

  bool streaming() const { return vad_encoder_; }

  // (t, n_punc) logits for one window of token ids (golden-test hook);
  // vad_pos >= 0 selects the VAD-masked encoder path.
  std::vector<float> WindowLogits(const std::vector<int>& ids,
                                  int vad_pos = -1) const;

  int TokenId(const std::string& token) const { return vocab_.Token2Id(token); }

 private:
  const WTensor& W(const std::string& name) const;

  FtrFile ftr_;
  Vocab vocab_;
  SanmEncoder encoder_;
  bool loaded_ = false;
  int embed_unit_ = 256, att_unit_ = 256, n_punc_ = 6;
  int sentence_end_id_ = 3;
  int split_size_ = 20, cache_pop_trigger_limit_ = 200;
  bool vad_encoder_ = false;
  std::vector<std::string> punc_list_;
};

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_PUNC_ENGINE_H_
