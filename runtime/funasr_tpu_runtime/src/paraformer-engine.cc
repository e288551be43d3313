#include "paraformer-engine.h"

#include <cmath>
#include <cstring>

#include "nn.h"

namespace funasr_tpu {

namespace {

bool IsAsciiWord(const std::string& tok) {
  for (unsigned char c : tok) {
    if (c >= 0x80) return false;
  }
  return !tok.empty();
}

}  // namespace

const WTensor& ParaformerEngine::W(const std::string& name) const {
  const WTensor* t = ftr_.Find(name);
  static WTensor empty;
  return t ? *t : empty;
}

bool ParaformerEngine::Load(const std::string& model_dir) {
  if (!ftr_.Load(model_dir + "/weights.ftr")) return false;
  // other weights.ftr exports (e.g. SenseVoice) have their own engines
  if (ftr_.Find("predictor/cif_output/w") == nullptr) return false;
  if (!vocab_.Load(model_dir + "/tokens.txt")) return false;
  input_size_ = ftr_.MetaInt("input_size", 560);
  d_ = ftr_.MetaInt("encoder.output_size", 512);
  heads_ = ftr_.MetaInt("encoder.attention_heads", 4);
  ffn_ = ftr_.MetaInt("encoder.linear_units", 2048);
  blocks_ = ftr_.MetaInt("encoder.num_blocks", 50);
  kernel_ = ftr_.MetaInt("encoder.kernel_size", 11);
  shift_ = ftr_.MetaInt("encoder.sanm_shift", 0);
  dec_heads_ = ftr_.MetaInt("decoder.attention_heads", 16);
  dec_ffn_ = ftr_.MetaInt("decoder.linear_units", 2048);
  dec_blocks_ = ftr_.MetaInt("decoder.num_blocks", 16);
  dec_att_ = ftr_.MetaInt("decoder.att_layer_num", 16);
  dec_kernel_ = ftr_.MetaInt("decoder.kernel_size", 11);
  dec_shift_ = ftr_.MetaInt("decoder.sanm_shift", 0);
  vocab_size_ = ftr_.MetaInt("vocab_size", vocab_.Size());
  blank_ = ftr_.MetaInt("blank_id", 0);
  sos_ = ftr_.MetaInt("sos", 1);
  eos_ = ftr_.MetaInt("eos", 2);
  l_order_ = ftr_.MetaInt("predictor.l_order", 1);
  r_order_ = ftr_.MetaInt("predictor.r_order", 1);
  tail_threshold_ = ftr_.MetaFloat("predictor.tail_threshold", 0.45f);
  smooth_factor_ = ftr_.MetaFloat("predictor.smooth_factor", 1.0f);
  noise_threshold_ = ftr_.MetaFloat("predictor.noise_threshold", 0.0f);
  lfr_m_ = ftr_.MetaInt("lfr_m", 7);
  lfr_n_ = ftr_.MetaInt("lfr_n", 6);
  n_mels_ = ftr_.MetaInt("n_mels", 80);
  SanmEncoderCfg ecfg;
  ecfg.input_size = input_size_;
  ecfg.d = d_;
  ecfg.heads = heads_;
  ecfg.ffn = ffn_;
  ecfg.blocks = blocks_;
  ecfg.kernel = kernel_;
  ecfg.shift = shift_;
  encoder_.Init(&ftr_, "encoder", ecfg);
  loaded_ = ftr_.Find("encoder/after_norm/scale") != nullptr;
  return loaded_;
}

// ---------------------------------------------------------------------------
// attention blocks (encoder self-attention lives in sanm-encoder.cc)
// ---------------------------------------------------------------------------

void ParaformerEngine::CrossAttention(const std::string& prefix,
                                      const std::vector<float>& x, int n_tok,
                                      const std::vector<float>& memory,
                                      int t_mem, std::vector<float>* out) {
  const int d = d_, h = dec_heads_, dk = d / h;
  std::vector<float> q(static_cast<int64_t>(n_tok) * d);
  const WTensor& wq = W(prefix + "/linear_q/w");
  const WTensor* bq = ftr_.Find(prefix + "/linear_q/b");
  MatMul(x.data(), n_tok, d, wq, bq ? bq->f32.data() : nullptr, q.data());

  std::vector<float> kv(static_cast<int64_t>(t_mem) * 2 * d);
  const WTensor& wkv = W(prefix + "/linear_k_v/w");
  const WTensor* bkv = ftr_.Find(prefix + "/linear_k_v/b");
  MatMul(memory.data(), t_mem, d, wkv, bkv ? bkv->f32.data() : nullptr,
         kv.data());

  const float scale = 1.0f / std::sqrt(static_cast<float>(dk));
  std::vector<float> ctx(static_cast<int64_t>(n_tok) * d);
  std::vector<float> scores(t_mem);
  for (int hh = 0; hh < h; ++hh) {
    const int off = hh * dk;
    for (int i = 0; i < n_tok; ++i) {
      const float* qi = q.data() + static_cast<int64_t>(i) * d + off;
      for (int j = 0; j < t_mem; ++j) {
        const float* kj = kv.data() + static_cast<int64_t>(j) * 2 * d + off;
        float s = 0.0f;
        for (int z = 0; z < dk; ++z) s += qi[z] * kj[z];
        scores[j] = s * scale;
      }
      SoftmaxRow(scores.data(), t_mem);
      float* ci = ctx.data() + static_cast<int64_t>(i) * d + off;
      std::memset(ci, 0, dk * sizeof(float));
      for (int j = 0; j < t_mem; ++j) {
        const float a = scores[j];
        const float* vj =
            kv.data() + static_cast<int64_t>(j) * 2 * d + d + off;
        for (int z = 0; z < dk; ++z) ci[z] += a * vj[z];
      }
    }
  }
  out->assign(static_cast<int64_t>(n_tok) * d, 0.0f);
  const WTensor& wo = W(prefix + "/linear_out/w");
  const WTensor* bo = ftr_.Find(prefix + "/linear_out/b");
  MatMul(ctx.data(), n_tok, d, wo, bo ? bo->f32.data() : nullptr, out->data());
}

// ---------------------------------------------------------------------------
// CIF predictor (sequential integrate-and-fire; cif_predictor.py semantics)
// ---------------------------------------------------------------------------

int ParaformerEngine::Cif(const std::vector<float>& enc, int t,
                          std::vector<float>* out) {
  const int d = d_;
  // conv1d (l_order + r_order + 1 kernel) -> relu -> linear -> sigmoid
  std::vector<float> h(static_cast<int64_t>(t) * d);
  Conv1d(enc.data(), t, d, W("predictor/cif_conv1d/w"),
         W("predictor/cif_conv1d/b").f32.data(), l_order_, r_order_, h.data());
  Relu(h.data(), h.size());
  std::vector<float> alphas(t);
  {
    const WTensor& wo = W("predictor/cif_output/w");
    const WTensor* bo = ftr_.Find("predictor/cif_output/b");
    std::vector<float> a1(static_cast<int64_t>(t) * 1);
    MatMul(h.data(), t, d, wo, bo ? bo->f32.data() : nullptr, a1.data());
    for (int i = 0; i < t; ++i) alphas[i] = a1[i];
  }
  SigmoidV(alphas.data(), t);
  for (int i = 0; i < t; ++i) {
    float a = alphas[i] * smooth_factor_ - noise_threshold_;
    alphas[i] = a > 0.0f ? a : 0.0f;
  }

  // tail fire: one extra zero frame whose alpha is tail_threshold
  std::vector<float> hidden(enc);
  hidden.resize(static_cast<int64_t>(t + 1) * d, 0.0f);
  alphas.push_back(tail_threshold_);
  const int t_ext = t + 1;

  // sequential integrate & fire at threshold 1.0
  out->clear();
  std::vector<float> frame(d, 0.0f);
  float integrate = 0.0f;
  for (int i = 0; i < t_ext; ++i) {
    const float a = alphas[i];
    const float* hi = hidden.data() + static_cast<int64_t>(i) * d;
    if (integrate + a < 1.0f) {
      integrate += a;
      for (int j = 0; j < d; ++j) frame[j] += a * hi[j];
    } else {
      const float dist = 1.0f - integrate;
      for (int j = 0; j < d; ++j) frame[j] += dist * hi[j];
      out->insert(out->end(), frame.begin(), frame.end());
      integrate = a - dist;
      for (int j = 0; j < d; ++j) frame[j] = integrate * hi[j];
    }
  }
  return static_cast<int>(out->size() / d);
}

// ---------------------------------------------------------------------------
// decoder
// ---------------------------------------------------------------------------

void ParaformerEngine::DecLayer(const std::string& prefix,
                                std::vector<float>* x, int n_tok,
                                const std::vector<float>& memory, int t_mem,
                                bool has_self, bool has_src) {
  const int d = d_;
  // feed_forward first (decoder.py:_layer_apply): norm1 -> w_1 relu norm w_2
  std::vector<float> residual(*x);
  std::vector<float> h(*x);
  LayerNorm(h.data(), n_tok, d, W(prefix + "/norm1/scale").f32.data(),
            W(prefix + "/norm1/bias").f32.data());
  std::vector<float> mid(static_cast<int64_t>(n_tok) * dec_ffn_);
  MatMul(h.data(), n_tok, d, W(prefix + "/feed_forward/w_1/w"),
         W(prefix + "/feed_forward/w_1/b").f32.data(), mid.data());
  Relu(mid.data(), mid.size());
  LayerNorm(mid.data(), n_tok, dec_ffn_,
            W(prefix + "/feed_forward/norm/scale").f32.data(),
            W(prefix + "/feed_forward/norm/bias").f32.data());
  std::vector<float> ff(static_cast<int64_t>(n_tok) * d);
  MatMul(mid.data(), n_tok, dec_ffn_, W(prefix + "/feed_forward/w_2/w"),
         nullptr, ff.data());

  std::vector<float> cur = ff;
  if (has_self) {
    // norm2 -> FSMN (depthwise conv + residual)
    std::vector<float> h2(ff);
    LayerNorm(h2.data(), n_tok, d, W(prefix + "/norm2/scale").f32.data(),
              W(prefix + "/norm2/bias").f32.data());
    int left, right;
    FsmnPads(dec_kernel_, dec_shift_, &left, &right);
    std::vector<float> mem(static_cast<int64_t>(n_tok) * d);
    DepthwiseConv1d(h2.data(), n_tok, d,
                    W(prefix + "/self_attn/fsmn_block/w").f32.data(),
                    dec_kernel_, left, right, mem.data());
    for (int64_t i = 0; i < static_cast<int64_t>(n_tok) * d; ++i)
      mem[i] += h2[i];
    cur.resize(static_cast<int64_t>(n_tok) * d);
    for (int64_t i = 0; i < static_cast<int64_t>(n_tok) * d; ++i)
      cur[i] = residual[i] + mem[i];
  }
  if (has_src) {
    std::vector<float> h3(cur);
    LayerNorm(h3.data(), n_tok, d, W(prefix + "/norm3/scale").f32.data(),
              W(prefix + "/norm3/bias").f32.data());
    std::vector<float> att;
    CrossAttention(prefix + "/src_attn", h3, n_tok, memory, t_mem, &att);
    for (int64_t i = 0; i < static_cast<int64_t>(n_tok) * d; ++i)
      cur[i] += att[i];
  }
  *x = std::move(cur);
}

std::vector<float> ParaformerEngine::Decode(const std::vector<float>& enc,
                                            int t,
                                            const std::vector<float>& embeds,
                                            int n_tok) {
  std::vector<float> x(embeds);
  for (int l = 0; l < dec_att_; ++l) {
    DecLayer("decoder/decoders." + std::to_string(l), &x, n_tok, enc, t, true,
             true);
  }
  for (int l = 0; l < dec_blocks_ - dec_att_; ++l) {
    DecLayer("decoder/decoders2." + std::to_string(l), &x, n_tok, enc, t, true,
             false);
  }
  DecLayer("decoder/decoders3", &x, n_tok, enc, t, false, false);
  LayerNorm(x.data(), n_tok, d_, W("decoder/after_norm/scale").f32.data(),
            W("decoder/after_norm/bias").f32.data());
  std::vector<float> logits(static_cast<int64_t>(n_tok) * vocab_size_);
  const WTensor& wo = W("decoder/output_layer/w");
  const WTensor* bo = ftr_.Find("decoder/output_layer/b");
  MatMul(x.data(), n_tok, d_, wo, bo ? bo->f32.data() : nullptr, logits.data());
  return logits;
}

std::string ParaformerEngine::Infer(const std::vector<float>& feats, int t) {
  if (!loaded_ || t <= 0) return "";
  std::vector<float> enc = encoder_.Encode(feats, t);
  std::vector<float> embeds;
  const int n_tok = Cif(enc, t, &embeds);
  if (n_tok <= 0) return "";
  std::vector<float> logits = Decode(enc, t, embeds, n_tok);

  std::string text;
  bool prev_ascii = false;
  for (int i = 0; i < n_tok; ++i) {
    const float* row = logits.data() + static_cast<int64_t>(i) * vocab_size_;
    int best = 0;
    float best_v = row[0];
    for (int j = 1; j < vocab_size_; ++j) {
      if (row[j] > best_v) {
        best_v = row[j];
        best = j;
      }
    }
    if (best == blank_ || best == sos_ || best == eos_) continue;
    const std::string& tok = vocab_.Id2Token(best);
    if (tok == "<unk>") continue;
    const bool ascii = IsAsciiWord(tok);
    if (ascii && prev_ascii) text += " ";
    // BPE continuation pieces ("@@") glue to the previous token
    if (tok.size() > 2 && tok.substr(tok.size() - 2) == "@@") {
      text += tok.substr(0, tok.size() - 2);
      prev_ascii = false;
    } else {
      text += tok;
      prev_ascii = ascii;
    }
  }
  return text;
}

}  // namespace funasr_tpu
