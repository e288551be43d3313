#include "sensevoice-engine.h"

#include <memory>

#include <cstring>

#include "nn.h"

namespace funasr_tpu {

namespace {

// query-embedding ids (funasr_tpu/models/sense_voice/model.py LID_DICT /
// TEXTNORM_DICT class constants)
int LidQueryId(const std::string& language) {
  if (language == "zh") return 3;
  if (language == "en") return 4;
  if (language == "yue") return 7;
  if (language == "ja") return 11;
  if (language == "ko") return 12;
  if (language == "nospeech") return 13;
  return 0;  // auto
}

}  // namespace

const WTensor& SenseVoiceEngine::W(const std::string& name) const {
  const WTensor* t = ftr_->Find(name);
  static WTensor empty;
  return t ? *t : empty;
}

bool SenseVoiceEngine::Load(const std::string& model_dir) {
  auto ftr = std::make_shared<FtrFile>();
  if (!ftr->Load(model_dir + "/weights.ftr")) return false;
  return Load(std::move(ftr), model_dir);
}

bool SenseVoiceEngine::Load(std::shared_ptr<const FtrFile> ftr,
                            const std::string& model_dir) {
  ftr_ = std::move(ftr);
  if (ftr_->MetaStr("model", "") != "SenseVoiceSmall") return false;
  if (!vocab_.Load(model_dir + "/tokens.txt")) return false;
  input_size_ = ftr_->MetaInt("input_size", 560);
  d_ = ftr_->MetaInt("encoder.output_size", 512);
  vocab_size_ = ftr_->MetaInt("vocab_size", vocab_.Size());
  blank_ = ftr_->MetaInt("blank_id", 0);
  lfr_m_ = ftr_->MetaInt("lfr_m", 7);
  lfr_n_ = ftr_->MetaInt("lfr_n", 6);
  n_mels_ = ftr_->MetaInt("n_mels", 80);
  SanmEncoderCfg cfg;
  cfg.input_size = input_size_;
  cfg.d = d_;
  cfg.heads = ftr_->MetaInt("encoder.attention_heads", 4);
  cfg.ffn = ftr_->MetaInt("encoder.linear_units", 2048);
  cfg.blocks = ftr_->MetaInt("encoder.num_blocks", 50);
  cfg.kernel = ftr_->MetaInt("encoder.kernel_size", 11);
  cfg.shift = ftr_->MetaInt("encoder.sanm_shift", 0);
  cfg.tp_blocks = ftr_->MetaInt("encoder.tp_blocks", 0);
  encoder_.Init(ftr_.get(), "encoder", cfg);
  loaded_ = ftr_->Find("encoder/after_norm/scale") != nullptr &&
            ftr_->Find("ctc/ctc_lo/w") != nullptr &&
            ftr_->Find("embed/w") != nullptr;
  return loaded_;
}

std::string SenseVoiceEngine::Infer(const std::vector<float>& feats, int t,
                                    const std::string& language,
                                    bool use_itn) {
  if (!loaded_ || t <= 0) return "";
  // prepend [language | event | emo | textnorm] query frames
  // (model.py _with_prompt: event/emo queries are embedding rows 1 and 2)
  const WTensor& emb = W("embed/w");
  const int prompt_ids[4] = {LidQueryId(language), 1, 2,
                             use_itn ? 14 : 15};
  const int t_ext = t + 4;
  std::vector<float> x(static_cast<int64_t>(t_ext) * input_size_);
  for (int i = 0; i < 4; ++i) {
    std::memcpy(x.data() + static_cast<int64_t>(i) * input_size_,
                emb.f32.data() +
                    static_cast<int64_t>(prompt_ids[i]) * input_size_,
                input_size_ * sizeof(float));
  }
  std::memcpy(x.data() + 4LL * input_size_, feats.data(),
              static_cast<int64_t>(t) * input_size_ * sizeof(float));

  std::vector<float> enc = encoder_.Encode(x, t_ext);
  std::vector<float> logits(static_cast<int64_t>(t_ext) * vocab_size_);
  const WTensor& wo = W("ctc/ctc_lo/w");
  const WTensor* bo = ftr_->Find("ctc/ctc_lo/b");
  MatMul(enc.data(), t_ext, d_, wo, bo ? bo->f32.data() : nullptr,
         logits.data());

  // CTC greedy over all frames (prompt frames emit the rich tags)
  std::vector<int> ids;
  int prev = -1;
  for (int i = 0; i < t_ext; ++i) {
    const float* row = logits.data() + static_cast<int64_t>(i) * vocab_size_;
    int best = 0;
    for (int j = 1; j < vocab_size_; ++j) {
      if (row[j] > row[best]) best = j;
    }
    if (best != prev && best != blank_) ids.push_back(best);
    prev = best;
  }
  return vocab_.Decode(ids, blank_);
}

}  // namespace funasr_tpu
