#include "sanm-encoder.h"

#include <cmath>
#include <cstring>

#include "nn.h"

namespace funasr_tpu {

void FsmnPads(int kernel, int shift, int* left, int* right) {
  *left = (kernel - 1) / 2;
  if (shift > 0) *left += shift;
  *right = kernel - 1 - *left;
}

const WTensor& SanmEncoder::W(const std::string& name) const {
  const WTensor* t = ftr_->Find(name);
  static WTensor empty;
  return t ? *t : empty;
}

void SanmEncoder::SelfAttention(const std::string& prefix,
                                const std::vector<float>& x, int t,
                                int in_feat, std::vector<float>* out,
                                Mask mask, int vad_pos) const {
  const int d = cfg_.d, h = cfg_.heads, dk = d / h;
  // fused qkv
  std::vector<float> qkv(static_cast<int64_t>(t) * 3 * d);
  const WTensor& wqkv = W(prefix + "/linear_q_k_v/w");
  const WTensor* bq = ftr_->Find(prefix + "/linear_q_k_v/b");
  MatMul(x.data(), t, in_feat, wqkv, bq ? bq->f32.data() : nullptr, qkv.data());

  // split
  std::vector<float> q(static_cast<int64_t>(t) * d), k(q.size()), v(q.size());
  for (int i = 0; i < t; ++i) {
    std::memcpy(q.data() + i * d, qkv.data() + static_cast<int64_t>(i) * 3 * d,
                d * sizeof(float));
    std::memcpy(k.data() + i * d,
                qkv.data() + static_cast<int64_t>(i) * 3 * d + d,
                d * sizeof(float));
    std::memcpy(v.data() + i * d,
                qkv.data() + static_cast<int64_t>(i) * 3 * d + 2 * d,
                d * sizeof(float));
  }

  // FSMN memory branch over v (pre-head-split): conv + residual
  int left, right;
  FsmnPads(cfg_.kernel, cfg_.shift, &left, &right);
  std::vector<float> fsmn(static_cast<int64_t>(t) * d);
  DepthwiseConv1d(v.data(), t, d, RawF32(W(prefix + "/fsmn_block/w"), "fsmn_block/w"),
                  cfg_.kernel, left, right, fsmn.data());
  for (int64_t i = 0; i < static_cast<int64_t>(t) * d; ++i) fsmn[i] += v[i];

  // scaled dot attention per head, as two GEMMs through the tiled fp32 core
  // (scores = Q_h @ K_h^T, ctx = softmax(scores) @ V_h): the per-row scalar
  // dot products were the engine bottleneck once the weight matmuls were
  // tiled
  const float scale = 1.0f / std::sqrt(static_cast<float>(dk));
  std::vector<float> ctx(static_cast<int64_t>(t) * d);
  std::vector<float> qh(static_cast<int64_t>(t) * dk), vh(qh.size());
  std::vector<float> kht(static_cast<int64_t>(dk) * t);  // K_h^T (dk, t)
  std::vector<float> scores(static_cast<int64_t>(t) * t), ch(qh.size());
  for (int hh = 0; hh < h; ++hh) {
    const int off = hh * dk;
    for (int i = 0; i < t; ++i) {
      const float* qi = q.data() + static_cast<int64_t>(i) * d + off;
      const float* ki = k.data() + static_cast<int64_t>(i) * d + off;
      const float* vi = v.data() + static_cast<int64_t>(i) * d + off;
      std::memcpy(qh.data() + static_cast<int64_t>(i) * dk, qi,
                  dk * sizeof(float));
      std::memcpy(vh.data() + static_cast<int64_t>(i) * dk, vi,
                  dk * sizeof(float));
      for (int z = 0; z < dk; ++z) kht[static_cast<int64_t>(z) * t + i] = ki[z];
    }
    GemmF32(qh.data(), t, dk, kht.data(), t, nullptr, scores.data());
    for (int i = 0; i < t; ++i) {
      float* srow = scores.data() + static_cast<int64_t>(i) * t;
      for (int j = 0; j < t; ++j) {
        const bool blocked =
            (mask == Mask::kCausal && j > i) ||
            (mask == Mask::kVadCorner && i <= vad_pos - 2 && j >= vad_pos);
        srow[j] = blocked ? -1e30f : srow[j] * scale;
      }
      SoftmaxRow(srow, t);
    }
    GemmF32(scores.data(), t, t, vh.data(), dk, nullptr, ch.data());
    for (int i = 0; i < t; ++i)
      std::memcpy(ctx.data() + static_cast<int64_t>(i) * d + off,
                  ch.data() + static_cast<int64_t>(i) * dk,
                  dk * sizeof(float));
  }

  out->assign(static_cast<int64_t>(t) * d, 0.0f);
  const WTensor& wo = W(prefix + "/linear_out/w");
  const WTensor* bo = ftr_->Find(prefix + "/linear_out/b");
  MatMul(ctx.data(), t, d, wo, bo ? bo->f32.data() : nullptr, out->data());
  for (int64_t i = 0; i < static_cast<int64_t>(t) * d; ++i) (*out)[i] += fsmn[i];
}

void SanmEncoder::EncLayer(const std::string& prefix, std::vector<float>* x,
                           int t, int in_feat, Mask mask, int vad_pos) const {
  const int d = cfg_.d;
  // pre-norm attention; residual only when dims match (encoder.py:_layer_apply)
  std::vector<float> h(*x);
  LayerNorm(h.data(), t, in_feat, W(prefix + "/norm1/scale").f32.data(),
            W(prefix + "/norm1/bias").f32.data());
  std::vector<float> att;
  SelfAttention(prefix + "/self_attn", h, t, in_feat, &att, mask, vad_pos);
  std::vector<float> out(static_cast<int64_t>(t) * d);
  if (in_feat == d) {
    for (int64_t i = 0; i < static_cast<int64_t>(t) * d; ++i)
      out[i] = (*x)[i] + att[i];
  } else {
    out = att;
  }
  // FFN
  std::vector<float> h2(out);
  LayerNorm(h2.data(), t, d, W(prefix + "/norm2/scale").f32.data(),
            W(prefix + "/norm2/bias").f32.data());
  std::vector<float> mid(static_cast<int64_t>(t) * cfg_.ffn);
  MatMul(h2.data(), t, d, W(prefix + "/feed_forward/w_1/w"),
         W(prefix + "/feed_forward/w_1/b").f32.data(), mid.data());
  Relu(mid.data(), mid.size());
  std::vector<float> ff(static_cast<int64_t>(t) * d);
  MatMul(mid.data(), t, cfg_.ffn, W(prefix + "/feed_forward/w_2/w"),
         W(prefix + "/feed_forward/w_2/b").f32.data(), ff.data());
  for (int64_t i = 0; i < static_cast<int64_t>(t) * d; ++i) out[i] += ff[i];
  *x = std::move(out);
}

std::vector<float> SanmEncoder::Encode(const std::vector<float>& feats,
                                       int t) const {
  // x * sqrt(d) + sinusoidal pe (input_layer: pe)
  std::vector<float> x(feats);
  const float scale = std::sqrt(static_cast<float>(cfg_.d));
  for (float& v : x) v *= scale;
  AddSinusoidalPe(x.data(), t, cfg_.input_size);

  EncLayer(prefix_ + "/encoders0", &x, t, cfg_.input_size);
  for (int l = 0; l < cfg_.blocks - 1; ++l) {
    EncLayer(prefix_ + "/encoders." + std::to_string(l), &x, t, cfg_.d);
  }
  LayerNorm(x.data(), t, cfg_.d, W(prefix_ + "/after_norm/scale").f32.data(),
            W(prefix_ + "/after_norm/bias").f32.data());
  for (int l = 0; l < cfg_.tp_blocks; ++l) {
    EncLayer(prefix_ + "/tp_encoders." + std::to_string(l), &x, t, cfg_.d);
  }
  if (cfg_.tp_blocks > 0) {
    LayerNorm(x.data(), t, cfg_.d, W(prefix_ + "/tp_norm/scale").f32.data(),
              W(prefix_ + "/tp_norm/bias").f32.data());
  }
  return x;
}

std::vector<float> SanmEncoder::EncodeVad(const std::vector<float>& feats,
                                          int t, int vad_pos) const {
  std::vector<float> x(feats);
  const float scale = std::sqrt(static_cast<float>(cfg_.d));
  for (float& v : x) v *= scale;
  AddSinusoidalPe(x.data(), t, cfg_.input_size);

  EncLayer(prefix_ + "/encoders0", &x, t, cfg_.input_size, Mask::kCausal);
  for (int l = 0; l < cfg_.blocks - 2; ++l) {
    EncLayer(prefix_ + "/encoders." + std::to_string(l), &x, t, cfg_.d,
             Mask::kCausal);
  }
  if (cfg_.blocks > 1) {
    EncLayer(prefix_ + "/encoders." + std::to_string(cfg_.blocks - 2), &x, t,
             cfg_.d, Mask::kVadCorner, vad_pos);
  }
  LayerNorm(x.data(), t, cfg_.d, W(prefix_ + "/after_norm/scale").f32.data(),
            W(prefix_ + "/after_norm/bias").f32.data());
  return x;
}

}  // namespace funasr_tpu
