// Shared pure-C++ SAN-M encoder over FTR-exported JAX weights
// (funasr_tpu/models/sanm/encoder.py semantics: x*sqrt(d) + sinusoidal PE,
// pre-norm self-attention with an FSMN memory branch, relu FFN, after_norm).
// Used by the Paraformer ASR engine and the CT-Transformer punctuation engine
// (reference runtime counterparts: onnxruntime paraformer.cpp / ct-transformer.cpp).

#ifndef FUNASR_TPU_SANM_ENCODER_H_
#define FUNASR_TPU_SANM_ENCODER_H_

#include <string>
#include <vector>

#include "ftr.h"

namespace funasr_tpu {

struct SanmEncoderCfg {
  int input_size = 560;
  int d = 512;       // output_size
  int heads = 4;
  int ffn = 2048;    // linear_units
  int blocks = 50;   // num_blocks
  int kernel = 11;   // fsmn kernel_size
  int shift = 0;     // sanm_shift
  // SenseVoice timestamp tail (models/sense_voice/model.py:58-79): extra
  // "tp_encoders.{i}" layers after after_norm, closed by "tp_norm".
  int tp_blocks = 0;
};

// fsmn pads (funasr_tpu/models/sanm/attention.py SANMAttentionConfig.fsmn_pads)
void FsmnPads(int kernel, int shift, int* left, int* right);

class SanmEncoder {
 public:
  void Init(const FtrFile* ftr, const std::string& prefix,
            const SanmEncoderCfg& cfg) {
    ftr_ = ftr;
    prefix_ = prefix;
    cfg_ = cfg;
  }

  // feats (t, input_size) -> (t, d): input scaling + PE, all blocks, after_norm.
  std::vector<float> Encode(const std::vector<float>& feats, int t) const;

  // SANMVadEncoder variant (ct_transformer_streaming/encoder.py): causal
  // attention everywhere except the last block, whose "VAD corner" mask keeps
  // pre-text queries (rows <= vad_pos-2) from attending to new text
  // (cols >= vad_pos). The FSMN branch is unmasked either way.
  std::vector<float> EncodeVad(const std::vector<float>& feats, int t,
                               int vad_pos) const;

  const SanmEncoderCfg& cfg() const { return cfg_; }

 private:
  enum class Mask { kFull, kCausal, kVadCorner };
  void EncLayer(const std::string& prefix, std::vector<float>* x, int t,
                int in_feat, Mask mask = Mask::kFull, int vad_pos = 0) const;
  void SelfAttention(const std::string& prefix, const std::vector<float>& x,
                     int t, int in_feat, std::vector<float>* out,
                     Mask mask = Mask::kFull, int vad_pos = 0) const;
  const WTensor& W(const std::string& name) const;

  const FtrFile* ftr_ = nullptr;
  std::string prefix_;
  SanmEncoderCfg cfg_;
};

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_SANM_ENCODER_H_
