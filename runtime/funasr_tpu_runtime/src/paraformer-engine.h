// Pure-C++ Paraformer inference engine over FTR-exported weights:
// SANM encoder -> CIF predictor -> SANM NAR decoder -> greedy decode.
// Role: the reference's python-free engines (onnxruntime paraformer.cpp:428
// Forward / ggml edge runtime), re-targeted at our JAX-exported weights.

#ifndef FUNASR_TPU_PARAFORMER_ENGINE_H_
#define FUNASR_TPU_PARAFORMER_ENGINE_H_

#include <memory>
#include <string>
#include <vector>

#include "ftr.h"
#include "sanm-encoder.h"
#include "vocab.h"

namespace funasr_tpu {

class ParaformerEngine {
 public:
  // model_dir must hold weights.ftr + tokens.txt (+ am.mvn consumed by the
  // caller's frontend).
  bool Load(const std::string& model_dir);
  // Share an already-loaded weights.ftr tensor arena (2pass setups load the
  // file once for the offline + streaming engines; ref note: the onnxruntime
  // runtime likewise keeps one session per model, funasrruntime.cpp).
  bool Load(std::shared_ptr<const FtrFile> ftr, const std::string& model_dir);
  const FtrFile* arena() const { return ftr_.get(); }
  bool loaded() const { return loaded_; }
  int lfr_m() const { return lfr_m_; }
  int lfr_n() const { return lfr_n_; }
  int n_mels() const { return n_mels_; }

  // feats: (t, feat_dim) LFR+CMVN features -> transcript. With a BiCif
  // (CifPredictorV3) export and stamp != nullptr, also writes per-token
  // [start_ms, end_ms] pairs as a JSON array string (reference
  // FunASRGetStamp role; timestamp_tools.ts_prediction_lfr6_standard logic).
  // With a hotword trie, the greedy argmax runs bias-aware: logits of tokens
  // extending a hotword prefix earn the trie's incremental boost before the
  // max (the lattice-free counterpart of the reference wfst-decoder +
  // bias-lm.cpp contextual biasing). With beam > 1 the selection runs a full
  // bias-LM beam search (BiasBeamDecode) so hotword paths whose first char
  // loses the local argmax still win on total path score.
  std::string Infer(const std::vector<float>& feats, int t,
                    std::string* stamp = nullptr,
                    const class HotwordTrie* hotwords = nullptr,
                    int beam = 1);

  bool has_timestamps() const { return upsample_times_ > 0; }

 private:
  // returns acoustic embeds (n_tok, d) via out; fires count as return value
  int Cif(const std::vector<float>& enc, int t, std::vector<float>* out);
  // BiCif upsample head: (t, d) encoder output -> (t*upsample_times,) alphas2
  // scaled to n_tokens total mass (cif_predictor.py get_upsample_timestamp)
  std::vector<float> UpsampleAlphas(const std::vector<float>& enc, int t,
                                    int n_tokens);
  std::vector<float> Decode(const std::vector<float>& enc, int t,
                            const std::vector<float>& embeds, int n_tok);

  void DecLayer(const std::string& prefix, std::vector<float>* x, int n_tok,
                const std::vector<float>& memory, int t_mem, bool has_self,
                bool has_src);
  void CrossAttention(const std::string& prefix, const std::vector<float>& x,
                      int n_tok, const std::vector<float>& memory, int t_mem,
                      std::vector<float>* out);

  const WTensor& W(const std::string& name) const;

  std::shared_ptr<const FtrFile> ftr_;
  Vocab vocab_;
  SanmEncoder encoder_;
  bool loaded_ = false;
  // config (from FTR meta)
  int input_size_ = 560, d_ = 512, heads_ = 4, ffn_ = 2048, blocks_ = 50;
  int kernel_ = 11, shift_ = 0;
  int dec_heads_ = 16, dec_ffn_ = 2048, dec_blocks_ = 16, dec_att_ = 16;
  int dec_kernel_ = 11, dec_shift_ = 0;
  int vocab_size_ = 0, blank_ = 0, sos_ = 1, eos_ = 2;
  int l_order_ = 1, r_order_ = 1;
  int lfr_m_ = 7, lfr_n_ = 6, n_mels_ = 80;
  float tail_threshold_ = 0.45f, smooth_factor_ = 1.0f, noise_threshold_ = 0.0f;
  // BiCif (CifPredictorV3) timestamp head
  int upsample_times_ = 0;  // 0 = plain Paraformer (no timestamps)
  bool upsample_blstm_ = false, use_cif1_cnn_ = true;
  float smooth_factor2_ = 1.0f, noise_threshold2_ = 0.0f;
};

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_PARAFORMER_ENGINE_H_
