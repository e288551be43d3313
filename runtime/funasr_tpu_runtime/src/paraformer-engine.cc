#include "paraformer-engine.h"

#include <cmath>
#include <memory>
#include <cstring>
#include <utility>

#include "hotword.h"
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
  const WTensor* t = ftr_->Find(name);
  static WTensor empty;
  return t ? *t : empty;
}

bool ParaformerEngine::Load(const std::string& model_dir) {
  auto ftr = std::make_shared<FtrFile>();
  if (!ftr->Load(model_dir + "/weights.ftr")) return false;
  return Load(std::move(ftr), model_dir);
}

bool ParaformerEngine::Load(std::shared_ptr<const FtrFile> ftr,
                            const std::string& model_dir) {
  ftr_ = std::move(ftr);
  // other weights.ftr exports (e.g. SenseVoice) have their own engines
  if (ftr_->Find("predictor/cif_output/w") == nullptr) return false;
  if (!vocab_.Load(model_dir + "/tokens.txt")) return false;
  input_size_ = ftr_->MetaInt("input_size", 560);
  d_ = ftr_->MetaInt("encoder.output_size", 512);
  heads_ = ftr_->MetaInt("encoder.attention_heads", 4);
  ffn_ = ftr_->MetaInt("encoder.linear_units", 2048);
  blocks_ = ftr_->MetaInt("encoder.num_blocks", 50);
  kernel_ = ftr_->MetaInt("encoder.kernel_size", 11);
  shift_ = ftr_->MetaInt("encoder.sanm_shift", 0);
  dec_heads_ = ftr_->MetaInt("decoder.attention_heads", 16);
  dec_ffn_ = ftr_->MetaInt("decoder.linear_units", 2048);
  dec_blocks_ = ftr_->MetaInt("decoder.num_blocks", 16);
  dec_att_ = ftr_->MetaInt("decoder.att_layer_num", 16);
  dec_kernel_ = ftr_->MetaInt("decoder.kernel_size", 11);
  dec_shift_ = ftr_->MetaInt("decoder.sanm_shift", 0);
  vocab_size_ = ftr_->MetaInt("vocab_size", vocab_.Size());
  blank_ = ftr_->MetaInt("blank_id", 0);
  sos_ = ftr_->MetaInt("sos", 1);
  eos_ = ftr_->MetaInt("eos", 2);
  l_order_ = ftr_->MetaInt("predictor.l_order", 1);
  r_order_ = ftr_->MetaInt("predictor.r_order", 1);
  tail_threshold_ = ftr_->MetaFloat("predictor.tail_threshold", 0.45f);
  smooth_factor_ = ftr_->MetaFloat("predictor.smooth_factor", 1.0f);
  noise_threshold_ = ftr_->MetaFloat("predictor.noise_threshold", 0.0f);
  lfr_m_ = ftr_->MetaInt("lfr_m", 7);
  lfr_n_ = ftr_->MetaInt("lfr_n", 6);
  n_mels_ = ftr_->MetaInt("n_mels", 80);
  upsample_times_ = ftr_->MetaInt("predictor.upsample_times", 0);
  upsample_blstm_ =
      ftr_->MetaStr("predictor.upsample_type", "cnn") == "cnn_blstm";
  use_cif1_cnn_ = ftr_->MetaInt("predictor.use_cif1_cnn", 1) != 0;
  smooth_factor2_ = ftr_->MetaFloat("predictor.smooth_factor2", 1.0f);
  noise_threshold2_ = ftr_->MetaFloat("predictor.noise_threshold2", 0.0f);
  if (ftr_->Find("predictor/upsample_cnn/w") == nullptr) upsample_times_ = 0;
  SanmEncoderCfg ecfg;
  ecfg.input_size = input_size_;
  ecfg.d = d_;
  ecfg.heads = heads_;
  ecfg.ffn = ffn_;
  ecfg.blocks = blocks_;
  ecfg.kernel = kernel_;
  ecfg.shift = shift_;
  encoder_.Init(ftr_.get(), "encoder", ecfg);
  loaded_ = ftr_->Find("encoder/after_norm/scale") != nullptr;
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
  const WTensor* bq = ftr_->Find(prefix + "/linear_q/b");
  MatMul(x.data(), n_tok, d, wq, bq ? bq->f32.data() : nullptr, q.data());

  std::vector<float> kv(static_cast<int64_t>(t_mem) * 2 * d);
  const WTensor& wkv = W(prefix + "/linear_k_v/w");
  const WTensor* bkv = ftr_->Find(prefix + "/linear_k_v/b");
  MatMul(memory.data(), t_mem, d, wkv, bkv ? bkv->f32.data() : nullptr,
         kv.data());

  // per-head attention as two GEMMs through the tiled fp32 core (see
  // sanm-encoder.cc SelfAttention): scores = Q_h @ K_h^T, ctx_h = A @ V_h
  const float scale = 1.0f / std::sqrt(static_cast<float>(dk));
  std::vector<float> ctx(static_cast<int64_t>(n_tok) * d);
  std::vector<float> qh(static_cast<int64_t>(n_tok) * dk);
  std::vector<float> kht(static_cast<int64_t>(dk) * t_mem);
  std::vector<float> vh(static_cast<int64_t>(t_mem) * dk);
  std::vector<float> scores(static_cast<int64_t>(n_tok) * t_mem), ch(qh.size());
  for (int hh = 0; hh < h; ++hh) {
    const int off = hh * dk;
    for (int i = 0; i < n_tok; ++i)
      std::memcpy(qh.data() + static_cast<int64_t>(i) * dk,
                  q.data() + static_cast<int64_t>(i) * d + off,
                  dk * sizeof(float));
    for (int j = 0; j < t_mem; ++j) {
      const float* kj = kv.data() + static_cast<int64_t>(j) * 2 * d + off;
      const float* vj = kv.data() + static_cast<int64_t>(j) * 2 * d + d + off;
      for (int z = 0; z < dk; ++z) kht[static_cast<int64_t>(z) * t_mem + j] = kj[z];
      std::memcpy(vh.data() + static_cast<int64_t>(j) * dk, vj,
                  dk * sizeof(float));
    }
    GemmF32(qh.data(), n_tok, dk, kht.data(), t_mem, nullptr, scores.data());
    for (int i = 0; i < n_tok; ++i) {
      float* srow = scores.data() + static_cast<int64_t>(i) * t_mem;
      for (int j = 0; j < t_mem; ++j) srow[j] *= scale;
      SoftmaxRow(srow, t_mem);
    }
    GemmF32(scores.data(), n_tok, t_mem, vh.data(), dk, nullptr, ch.data());
    for (int i = 0; i < n_tok; ++i)
      std::memcpy(ctx.data() + static_cast<int64_t>(i) * d + off,
                  ch.data() + static_cast<int64_t>(i) * dk,
                  dk * sizeof(float));
  }
  out->assign(static_cast<int64_t>(n_tok) * d, 0.0f);
  const WTensor& wo = W(prefix + "/linear_out/w");
  const WTensor* bo = ftr_->Find(prefix + "/linear_out/b");
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
    const WTensor* bo = ftr_->Find("predictor/cif_output/b");
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
                    RawF32(W(prefix + "/self_attn/fsmn_block/w"), "fsmn_block/w"),
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
  const WTensor* bo = ftr_->Find("decoder/output_layer/b");
  MatMul(x.data(), n_tok, d_, wo, bo ? bo->f32.data() : nullptr, logits.data());
  return logits;
}

namespace {

// single-layer LSTM, torch gate order (i, f, g, o); w_ih (in, 4h) row-major
void LstmPass(const float* x, int t, int in_dim, const funasr_tpu::WTensor& w_ih,
              const funasr_tpu::WTensor& w_hh, const float* b_ih,
              const float* b_hh, bool reverse, float* out /* (t, h) */) {
  const int h4 = static_cast<int>(w_ih.cols());
  const int hd = h4 / 4;
  std::vector<float> h(hd, 0.0f), c(hd, 0.0f), gates(h4);
  for (int step = 0; step < t; ++step) {
    const int i = reverse ? t - 1 - step : step;
    const float* xi = x + static_cast<int64_t>(i) * in_dim;
    for (int g = 0; g < h4; ++g) gates[g] = b_ih[g] + b_hh[g];
    for (int k = 0; k < in_dim; ++k) {
      const float xv = xi[k];
      if (xv == 0.0f) continue;
      const float* wr = RawF32(w_ih, "lstm w_ih") + static_cast<int64_t>(k) * h4;
      for (int g = 0; g < h4; ++g) gates[g] += xv * wr[g];
    }
    for (int k = 0; k < hd; ++k) {
      const float hv = h[k];
      if (hv == 0.0f) continue;
      const float* wr = RawF32(w_hh, "lstm w_hh") + static_cast<int64_t>(k) * h4;
      for (int g = 0; g < h4; ++g) gates[g] += hv * wr[g];
    }
    for (int k = 0; k < hd; ++k) {
      const float ig = 1.0f / (1.0f + std::exp(-gates[k]));
      const float fg = 1.0f / (1.0f + std::exp(-gates[hd + k]));
      const float gg = std::tanh(gates[2 * hd + k]);
      const float og = 1.0f / (1.0f + std::exp(-gates[3 * hd + k]));
      c[k] = fg * c[k] + ig * gg;
      h[k] = og * std::tanh(c[k]);
    }
    std::memcpy(out + static_cast<int64_t>(i) * hd, h.data(),
                hd * sizeof(float));
  }
}

}  // namespace

std::vector<float> ParaformerEngine::UpsampleAlphas(
    const std::vector<float>& enc, int t, int n_tokens) {
  const int d = d_, k = upsample_times_;
  // shared cif conv (+relu) as the upsample source (use_cif1_cnn)
  std::vector<float> src(static_cast<int64_t>(t) * d);
  if (use_cif1_cnn_) {
    Conv1d(enc.data(), t, d, W("predictor/cif_conv1d/w"),
           W("predictor/cif_conv1d/b").f32.data(), l_order_, r_order_,
           src.data());
    Relu(src.data(), src.size());
  } else {
    src = enc;
  }
  // ConvTranspose1d with stride == kernel: frame i emits k output frames
  // (core/layers.py conv_transpose1d_apply_stride_eq_kernel); torch weight
  // layout (C_in, C_out, K)
  const WTensor& wt = W("predictor/upsample_cnn/w");
  const float* wb = W("predictor/upsample_cnn/b").f32.data();
  const int c_out = static_cast<int>(wt.shape[1]);
  const int t_up = t * k;
  std::vector<float> up(static_cast<int64_t>(t_up) * c_out);
  for (int i = 0; i < t; ++i) {
    const float* si = src.data() + static_cast<int64_t>(i) * d;
    for (int kk = 0; kk < k; ++kk) {
      float* oi = up.data() + static_cast<int64_t>(i * k + kk) * c_out;
      for (int o = 0; o < c_out; ++o) oi[o] = wb[o];
      for (int ci = 0; ci < d; ++ci) {
        const float v = si[ci];
        if (v == 0.0f) continue;
        const float* wr = wt.f32.data() +
                          (static_cast<int64_t>(ci) * c_out) * k + kk;
        for (int o = 0; o < c_out; ++o) oi[o] += v * wr[static_cast<int64_t>(o) * k];
      }
    }
  }
  std::vector<float> head(up);
  int head_dim = c_out;
  if (upsample_blstm_) {
    const int hd = static_cast<int>(W("predictor/blstm_fw/w_hh").shape[0]);
    std::vector<float> fw(static_cast<int64_t>(t_up) * hd);
    std::vector<float> bw(fw.size());
    LstmPass(up.data(), t_up, c_out, W("predictor/blstm_fw/w_ih"),
             W("predictor/blstm_fw/w_hh"),
             W("predictor/blstm_fw/b_ih").f32.data(),
             W("predictor/blstm_fw/b_hh").f32.data(), false, fw.data());
    LstmPass(up.data(), t_up, c_out, W("predictor/blstm_bw/w_ih"),
             W("predictor/blstm_bw/w_hh"),
             W("predictor/blstm_bw/b_ih").f32.data(),
             W("predictor/blstm_bw/b_hh").f32.data(), true, bw.data());
    head_dim = hd * 2;
    head.assign(static_cast<int64_t>(t_up) * head_dim, 0.0f);
    for (int i = 0; i < t_up; ++i) {
      std::memcpy(head.data() + static_cast<int64_t>(i) * head_dim,
                  fw.data() + static_cast<int64_t>(i) * hd,
                  hd * sizeof(float));
      std::memcpy(head.data() + static_cast<int64_t>(i) * head_dim + hd,
                  bw.data() + static_cast<int64_t>(i) * hd,
                  hd * sizeof(float));
    }
  }
  std::vector<float> alphas(t_up);
  {
    const WTensor& wo = W("predictor/cif_output2/w");
    const WTensor* bo = ftr_->Find("predictor/cif_output2/b");
    MatMul(head.data(), t_up, head_dim, wo, bo ? bo->f32.data() : nullptr,
           alphas.data());
  }
  SigmoidV(alphas.data(), t_up);
  double total = 0.0;
  for (int i = 0; i < t_up; ++i) {
    float a = alphas[i] * smooth_factor2_ - noise_threshold2_;
    alphas[i] = a > 0.0f ? a : 0.0f;
    total += alphas[i];
  }
  if (n_tokens > 0 && total > 1e-9) {
    const float scale = static_cast<float>(n_tokens / total);
    for (float& a : alphas) a *= scale;
  }
  return alphas;
}

// ts_prediction_lfr6_standard (utils/timestamp_tools.py:31-82): fires ->
// per-token [start_s, end_s] with <sil> insertion; returns only real-token
// stamps in ms, aligned with the kept token count.
static std::vector<std::pair<long long, long long>> TsPrediction(
    std::vector<double> alphas, int n_chars, int upsample_rate) {
  std::vector<std::pair<long long, long long>> out;
  if (n_chars <= 0) return out;
  const int kStartEnd = 5, kMaxDur = 12;
  const double kTimeRate = 10.0 * 6 / 1000 / upsample_rate;
  const double thr = 1.0 - 1e-4;
  const int n = static_cast<int>(alphas.size());

  auto fire_places = [&](const std::vector<double>& a) {
    std::vector<double> fp;
    double integrate = 0.0;
    for (int i = 0; i < n; ++i) {
      integrate += a[i];
      if (integrate >= thr) {
        fp.push_back(i - 1.5);  // force_time_shift
        integrate -= thr;
      }
    }
    return fp;
  };

  std::vector<double> fp = fire_places(alphas);
  if (static_cast<int>(fp.size()) != n_chars + 1) {
    double total = 0.0;
    for (double a : alphas) total += a;
    if (total > 1e-12) {
      const double scale = (n_chars + 1) / total;
      for (double& a : alphas) a *= scale;
    }
    fp = fire_places(alphas);
  }

  std::vector<std::pair<double, double>> stamps;  // with <sil> entries
  std::vector<bool> is_sil;
  if (!fp.empty() && fp[0] > kStartEnd) {
    stamps.push_back({0.0, fp[0] * kTimeRate});
    is_sil.push_back(true);
  }
  for (int i = 0; i + 1 < static_cast<int>(fp.size()); ++i) {
    if (i >= n_chars) break;
    if (fp[i + 1] - fp[i] <= kMaxDur) {
      stamps.push_back({fp[i] * kTimeRate, fp[i + 1] * kTimeRate});
      is_sil.push_back(false);
    } else {
      const double split = fp[i] + kMaxDur;
      stamps.push_back({fp[i] * kTimeRate, split * kTimeRate});
      is_sil.push_back(false);
      stamps.push_back({split * kTimeRate, fp[i + 1] * kTimeRate});
      is_sil.push_back(true);
    }
  }
  if (!fp.empty() && n - fp.back() > kStartEnd) {
    const double end = (n + fp.back()) * 0.5;
    if (!stamps.empty()) stamps.back().second = end * kTimeRate;
    stamps.push_back({end * kTimeRate, n * kTimeRate});
    is_sil.push_back(true);
  } else if (!stamps.empty()) {
    stamps.back().second = n * kTimeRate;
  }
  for (size_t i = 0; i < stamps.size(); ++i) {
    if (is_sil[i]) continue;
    out.push_back({static_cast<long long>(std::lround(stamps[i].first * 1000)),
                   static_cast<long long>(std::lround(stamps[i].second * 1000))});
  }
  return out;
}

std::string ParaformerEngine::Infer(const std::vector<float>& feats, int t,
                                    std::string* stamp,
                                    const HotwordTrie* hotwords, int beam) {
  if (!loaded_ || t <= 0) return "";
  std::vector<float> enc = encoder_.Encode(feats, t);
  std::vector<float> embeds;
  const int n_tok = Cif(enc, t, &embeds);
  if (n_tok <= 0) return "";
  std::vector<float> logits = Decode(enc, t, embeds, n_tok);

  // token selection: bias-aware greedy argmax, or full bias-LM beam search
  // when beam > 1 (hypotheses whose first hotword char loses the local argmax
  // survive to collect the rest of the word — the reference wfst-decoder
  // lattice role)
  std::vector<int> ids;
  const bool use_hw = hotwords != nullptr && !hotwords->empty();
  if (beam > 1 && use_hw) {
    ids = BiasBeamDecode(logits.data(), n_tok, vocab_size_, hotwords, beam,
                         blank_, sos_, eos_);
  } else {
    ids.reserve(n_tok);
    int hw_state = 0;
    std::vector<std::pair<int, float>> hw_cands;
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
      if (use_hw) {
        // bias-aware argmax: a token continuing (or starting) a hotword beats
        // the plain argmax when its boosted logit wins
        hotwords->Candidates(hw_state, &hw_cands);
        for (const auto& [tok, boost] : hw_cands) {
          if (tok < vocab_size_ && row[tok] + boost > best_v) {
            best_v = row[tok] + boost;
            best = tok;
          }
        }
        // advance only over EMITTED symbols: a blank between hotword chars
        // must not reset the in-progress prefix (the reference bias-LM walks
        // output symbols, not frames)
        if (best != blank_ && best != sos_ && best != eos_) {
          float unused = 0.0f;
          hw_state = hotwords->Step(hw_state, best, &unused);
        }
      }
      ids.push_back(best);
    }
  }

  std::string text;
  bool prev_ascii = false;
  int n_chars = 0;  // tokens past blank/sos/eos (the ts_prediction char list)
  std::vector<bool> char_kept;  // false for <unk> (suppressed in the text)
  for (int best : ids) {
    if (best == blank_ || best == sos_ || best == eos_) continue;
    ++n_chars;
    const std::string& tok = vocab_.Id2Token(best);
    char_kept.push_back(tok != "<unk>");
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

  if (stamp != nullptr && upsample_times_ > 0 && n_chars > 0) {
    std::vector<float> alphas = UpsampleAlphas(enc, t, n_tok);
    std::vector<double> a64(alphas.begin(), alphas.end());
    const auto stamps = TsPrediction(std::move(a64), n_chars, upsample_times_);
    // drop the rows of <unk> tokens suppressed in the text so timestamps stay
    // aligned 1:1 with the words actually returned
    std::string js = "[";
    bool first = true;
    for (size_t i = 0; i < stamps.size(); ++i) {
      if (i < char_kept.size() && !char_kept[i]) continue;
      if (!first) js += ",";
      first = false;
      js += "[" + std::to_string(stamps[i].first) + "," +
            std::to_string(stamps[i].second) + "]";
    }
    js += "]";
    *stamp = js;
  }
  return text;
}

}  // namespace funasr_tpu
