#include "streaming-engine.h"

#include <algorithm>
#include <cmath>
#include <memory>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "nn.h"
#include "sanm-encoder.h"

namespace funasr_tpu {

namespace {

int NumFrames(int64_t samples, int frame_length, int frame_shift) {
  if (samples < frame_length) return 0;
  return 1 + static_cast<int>((samples - frame_length) / frame_shift);
}

// FUNASR_STREAM_DEBUG=<dir>: dump per-stage float arrays for golden diffing
void DebugDump(const char* tag, const std::vector<float>& a) {
  const char* dir = std::getenv("FUNASR_STREAM_DEBUG");
  if (dir == nullptr) return;
  static int counter = 0;
  char path[512];
  std::snprintf(path, sizeof(path), "%s/%03d_%s.bin", dir, counter++, tag);
  FILE* f = std::fopen(path, "wb");
  if (f != nullptr) {
    std::fwrite(a.data(), sizeof(float), a.size(), f);
    std::fclose(f);
  }
}

}  // namespace

const WTensor& StreamingEngine::W(const std::string& name) const {
  const WTensor* t = ftr_->Find(name);
  static WTensor empty;
  return t ? *t : empty;
}

bool StreamingEngine::Load(const std::string& model_dir) {
  auto ftr = std::make_shared<FtrFile>();
  if (!ftr->Load(model_dir + "/weights.ftr")) return false;
  return Load(std::move(ftr), model_dir);
}

bool StreamingEngine::Load(std::shared_ptr<const FtrFile> ftr,
                           const std::string& model_dir) {
  ftr_ = std::move(ftr);
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
  pad_left_ = ftr_->MetaInt("chunk_pad_left", 0);
  stride_ = ftr_->MetaInt("chunk_stride", 10);
  lookahead_ = ftr_->MetaInt("chunk_lookahead", 5);
  enc_look_back_ = ftr_->MetaInt("encoder_chunk_look_back", 0);
  dec_look_back_ = ftr_->MetaInt("decoder_chunk_look_back", 0);
  FbankOptions opts;
  opts.n_mels = n_mels_;
  fbank_ = std::make_unique<Fbank>(opts);
  has_cmvn_ = cmvn_.Load(model_dir + "/am.mvn");
  loaded_ = ftr_->Find("encoder/after_norm/scale") != nullptr;
  return loaded_;
}

std::unique_ptr<StreamSession> StreamingEngine::NewSession() const {
  auto s = std::make_unique<StreamSession>();
  ResetSession(s.get());
  return s;
}

void StreamingEngine::ResetSession(StreamSession* s) const {
  s->prev_samples.clear();
  s->wave_buf.clear();
  s->lfr_ctx.clear();
  s->lfr_ctx_rows = 0;
  s->raw_frames = 0;
  s->lfr_out = 0;
  s->start_idx = 0;
  // model.py init_cache seeds the carry with ZERO rows, not an empty buffer
  s->carry_rows = pad_left_ + lookahead_;
  s->feats_carry.assign(
      static_cast<int64_t>(s->carry_rows) * input_size_, 0.0f);
  s->enc_kv.assign(blocks_, KvCache());
  s->tail_chunk = false;
  s->integrate = 0.0f;
  s->frame.assign(d_, 0.0f);
  s->dec_fsmn.assign(dec_blocks_,
                     std::vector<float>(
                         static_cast<int64_t>(dec_kernel_ - 1) * d_, 0.0f));
  s->dec_kv.assign(dec_att_, KvCache());
}

// ---------------------------------------------------------------------------
// streaming frontend (WavFrontendOnline.forward_streaming)
// ---------------------------------------------------------------------------

std::vector<float> StreamingEngine::FrontendChunk(StreamSession* s,
                                                  const float* chunk, int n,
                                                  bool is_final, int* t) const {
  *t = 0;
  std::vector<float> buf(s->wave_buf);
  buf.insert(buf.end(), chunk, chunk + n);
  const int t_raw = NumFrames(static_cast<int64_t>(buf.size()), frame_length_,
                              frame_shift_);
  if (t_raw == 0 && !is_final) {
    s->wave_buf = std::move(buf);
    return {};
  }
  std::vector<float> feats_new;
  if (t_raw > 0) {
    std::vector<float> scaled(buf);
    for (float& v : scaled) v *= 32768.0f;
    int got = 0;
    feats_new = fbank_->Compute(scaled, &got);
  }
  const int consumed = t_raw * frame_shift_;
  s->wave_buf.assign(buf.begin() + consumed, buf.end());

  // raw-frame stream: carried LFR context + new frames
  std::vector<float> stream(s->lfr_ctx);
  stream.insert(stream.end(), feats_new.begin(), feats_new.end());
  const int stream_rows = s->lfr_ctx_rows + t_raw;
  const int ctx_left = (lfr_m_ - 1) / 2;
  const int64_t abs_start = s->raw_frames - s->lfr_ctx_rows;
  const int64_t total_raw = s->raw_frames + t_raw;

  std::vector<float> out;
  int64_t i = s->lfr_out;
  while (true) {
    const int64_t w_beg = i * lfr_n_ - ctx_left;
    const int64_t w_end = w_beg + lfr_m_;
    if (w_end > total_raw && !is_final) break;
    if (is_final && i * lfr_n_ >= total_raw) break;
    if (stream_rows == 0) break;
    for (int64_t j = w_beg; j < w_end; ++j) {
      int64_t idx = std::min(std::max(j, int64_t{0}), total_raw - 1);
      int64_t rel = std::max(idx - abs_start, int64_t{0});
      rel = std::min(rel, static_cast<int64_t>(stream_rows - 1));
      out.insert(out.end(), stream.begin() + rel * n_mels_,
                 stream.begin() + (rel + 1) * n_mels_);
    }
    ++i;
  }
  *t = static_cast<int>(i - s->lfr_out);
  s->lfr_out = i;
  const int64_t next_need = i * lfr_n_ - ctx_left;
  const int64_t keep_from = std::max(next_need - abs_start, int64_t{0});
  s->lfr_ctx.assign(stream.begin() + std::min(keep_from,
                                              int64_t{stream_rows}) * n_mels_,
                    stream.end());
  s->lfr_ctx_rows = stream_rows - static_cast<int>(std::min(
                                      keep_from, int64_t{stream_rows}));
  s->raw_frames += t_raw;

  if (has_cmvn_ && !out.empty()) cmvn_.Apply(&out);
  return out;
}

// ---------------------------------------------------------------------------
// chunked encoder (scama/encoder.py forward_chunk)
// ---------------------------------------------------------------------------

void StreamingEngine::SelfAttentionChunk(const std::string& prefix,
                                         const std::vector<float>& x, int t,
                                         int in_feat, KvCache* cache,
                                         std::vector<float>* out) const {
  const int d = d_, h = heads_, dk = d / h;
  std::vector<float> qkv(static_cast<int64_t>(t) * 3 * d);
  const WTensor& wqkv = W(prefix + "/linear_q_k_v/w");
  const WTensor* bq = ftr_->Find(prefix + "/linear_q_k_v/b");
  MatMul(x.data(), t, in_feat, wqkv, bq ? bq->f32.data() : nullptr, qkv.data());

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

  // FSMN memory over the current chunk only (attention.py _fsmn, mask=None)
  int left, right;
  FsmnPads(kernel_, shift_, &left, &right);
  std::vector<float> fsmn(static_cast<int64_t>(t) * d);
  DepthwiseConv1d(v.data(), t, d, RawF32(W(prefix + "/fsmn_block/w"), "fsmn_block/w"),
                  kernel_, left, right, fsmn.data());
  for (int64_t i = 0; i < static_cast<int64_t>(t) * d; ++i) fsmn[i] += v[i];

  // attend over [cached kv | current chunk] (sanm_attention_apply_chunk)
  std::vector<float> k_full, v_full;
  const std::vector<float>* kp = &k;
  const std::vector<float>* vp = &v;
  int t_full = t;
  if (enc_look_back_ != 0) {
    const int la = lookahead_;
    const int t_stride = la > 0 ? std::max(t - la, 0) : t;
    if (cache->init) {
      k_full.assign(cache->k.begin(), cache->k.end());
      k_full.insert(k_full.end(), k.begin(), k.end());
      v_full.assign(cache->v.begin(), cache->v.end());
      v_full.insert(v_full.end(), v.begin(), v.end());
      t_full = cache->t + t;
      kp = &k_full;
      vp = &v_full;
      // new cache: old ++ current-minus-lookahead, trimmed to look_back*stride
      cache->k.insert(cache->k.end(), k.begin(),
                      k.begin() + static_cast<int64_t>(t_stride) * d);
      cache->v.insert(cache->v.end(), v.begin(),
                      v.begin() + static_cast<int64_t>(t_stride) * d);
      cache->t += t_stride;
      if (enc_look_back_ > 0) {
        const int keep = enc_look_back_ * stride_;
        if (cache->t > keep) {
          const int64_t drop = static_cast<int64_t>(cache->t - keep) * d;
          cache->k.erase(cache->k.begin(), cache->k.begin() + drop);
          cache->v.erase(cache->v.begin(), cache->v.begin() + drop);
          cache->t = keep;
        }
      }
    } else {
      cache->k.assign(k.begin(), k.begin() + static_cast<int64_t>(t_stride) * d);
      cache->v.assign(v.begin(), v.begin() + static_cast<int64_t>(t_stride) * d);
      cache->t = t_stride;
      cache->init = true;
    }
  }

  // per-head attention as two GEMMs through the tiled fp32 core (see
  // sanm-encoder.cc SelfAttention)
  const float scale = 1.0f / std::sqrt(static_cast<float>(dk));
  std::vector<float> ctx(static_cast<int64_t>(t) * d);
  std::vector<float> qh(static_cast<int64_t>(t) * dk);
  std::vector<float> kht(static_cast<int64_t>(dk) * t_full);
  std::vector<float> vh(static_cast<int64_t>(t_full) * dk);
  std::vector<float> scores(static_cast<int64_t>(t) * t_full), ch(qh.size());
  for (int hh = 0; hh < h; ++hh) {
    const int off = hh * dk;
    for (int i = 0; i < t; ++i)
      std::memcpy(qh.data() + static_cast<int64_t>(i) * dk,
                  q.data() + static_cast<int64_t>(i) * d + off,
                  dk * sizeof(float));
    for (int j = 0; j < t_full; ++j) {
      const float* kj = kp->data() + static_cast<int64_t>(j) * d + off;
      std::memcpy(vh.data() + static_cast<int64_t>(j) * dk,
                  vp->data() + static_cast<int64_t>(j) * d + off,
                  dk * sizeof(float));
      for (int z = 0; z < dk; ++z)
        kht[static_cast<int64_t>(z) * t_full + j] = kj[z];
    }
    GemmF32(qh.data(), t, dk, kht.data(), t_full, nullptr, scores.data());
    for (int i = 0; i < t; ++i) {
      float* srow = scores.data() + static_cast<int64_t>(i) * t_full;
      for (int j = 0; j < t_full; ++j) srow[j] *= scale;
      SoftmaxRow(srow, t_full);
    }
    GemmF32(scores.data(), t, t_full, vh.data(), dk, nullptr, ch.data());
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

void StreamingEngine::EncChunkLayer(const std::string& prefix,
                                    std::vector<float>* x, int t, int in_feat,
                                    KvCache* cache) const {
  const int d = d_;
  std::vector<float> h(*x);
  LayerNorm(h.data(), t, in_feat, W(prefix + "/norm1/scale").f32.data(),
            W(prefix + "/norm1/bias").f32.data());
  std::vector<float> att;
  SelfAttentionChunk(prefix + "/self_attn", h, t, in_feat, cache, &att);
  std::vector<float> out(static_cast<int64_t>(t) * d);
  if (in_feat == d) {
    for (int64_t i = 0; i < static_cast<int64_t>(t) * d; ++i)
      out[i] = (*x)[i] + att[i];
  } else {
    out = att;
  }
  std::vector<float> h2(out);
  LayerNorm(h2.data(), t, d, W(prefix + "/norm2/scale").f32.data(),
            W(prefix + "/norm2/bias").f32.data());
  std::vector<float> mid(static_cast<int64_t>(t) * ffn_);
  MatMul(h2.data(), t, d, W(prefix + "/feed_forward/w_1/w"),
         W(prefix + "/feed_forward/w_1/b").f32.data(), mid.data());
  Relu(mid.data(), mid.size());
  std::vector<float> ff(static_cast<int64_t>(t) * d);
  MatMul(mid.data(), t, ffn_, W(prefix + "/feed_forward/w_2/w"),
         W(prefix + "/feed_forward/w_2/b").f32.data(), ff.data());
  for (int64_t i = 0; i < static_cast<int64_t>(t) * d; ++i) out[i] += ff[i];
  *x = std::move(out);
}

std::vector<float> StreamingEngine::EncodeChunk(StreamSession* s,
                                                const std::vector<float>& feats,
                                                int t, int* t_out) const {
  // x * sqrt(d) + streaming PE from start_idx (scama forward_chunk)
  std::vector<float> x(feats);
  const float scale = std::sqrt(static_cast<float>(d_));
  for (float& v : x) v *= scale;
  AddSinusoidalPe(x.data(), t, input_size_, s->start_idx + 1);
  s->start_idx += t;

  if (s->tail_chunk) {
    x = s->feats_carry;
    t = s->carry_rows;
  } else {
    std::vector<float> overlap(s->feats_carry);
    overlap.insert(overlap.end(), x.begin(), x.end());
    const int rows = s->carry_rows + t;
    const int keep = std::min(pad_left_ + lookahead_, rows);
    s->feats_carry.assign(
        overlap.end() - static_cast<int64_t>(keep) * input_size_,
        overlap.end());
    s->carry_rows = keep;
    x = std::move(overlap);
    t = rows;
  }
  if (t == 0) {
    *t_out = 0;
    return {};
  }

  EncChunkLayer("encoder/encoders0", &x, t, input_size_, &s->enc_kv[0]);
  for (int l = 0; l < blocks_ - 1; ++l) {
    EncChunkLayer("encoder/encoders." + std::to_string(l), &x, t, d_,
                  &s->enc_kv[l + 1]);
  }
  LayerNorm(x.data(), t, d_, W("encoder/after_norm/scale").f32.data(),
            W("encoder/after_norm/bias").f32.data());
  *t_out = t;
  return x;
}

// ---------------------------------------------------------------------------
// chunked CIF (cif_predictor.py forward_chunk)
// ---------------------------------------------------------------------------

int StreamingEngine::CifChunk(StreamSession* s, const std::vector<float>& enc,
                              int t, bool is_final,
                              std::vector<float>* embeds) const {
  const int d = d_;
  std::vector<float> h(static_cast<int64_t>(t) * d);
  Conv1d(enc.data(), t, d, W("predictor/cif_conv1d/w"),
         W("predictor/cif_conv1d/b").f32.data(), l_order_, r_order_, h.data());
  Relu(h.data(), h.size());
  std::vector<float> alphas(t);
  {
    const WTensor& wo = W("predictor/cif_output/w");
    const WTensor* bo = ftr_->Find("predictor/cif_output/b");
    MatMul(h.data(), t, d, wo, bo ? bo->f32.data() : nullptr, alphas.data());
  }
  SigmoidV(alphas.data(), t);
  for (int i = 0; i < t; ++i) {
    float a = alphas[i] * smooth_factor_ - noise_threshold_;
    alphas[i] = a > 0.0f ? a : 0.0f;
    // alphas only in the stride region; lookahead frames re-arrive next chunk
    const bool keep = i >= pad_left_ &&
                      (is_final || i < pad_left_ + stride_);
    if (!keep) alphas[i] = 0.0f;
  }

  std::vector<float> hidden(enc);
  int t_ext = t;
  if (is_final) {
    alphas.push_back(tail_threshold_);
    hidden.resize(static_cast<int64_t>(t + 1) * d, 0.0f);
    t_ext = t + 1;
  }

  embeds->clear();
  int fired = 0;
  for (int i = 0; i < t_ext; ++i) {
    const float a = alphas[i];
    const float* hi = hidden.data() + static_cast<int64_t>(i) * d;
    if (s->integrate + a < 1.0f) {
      s->integrate += a;
      for (int j = 0; j < d; ++j) s->frame[j] += a * hi[j];
    } else {
      const float dist = 1.0f - s->integrate;
      for (int j = 0; j < d; ++j) s->frame[j] += dist * hi[j];
      embeds->insert(embeds->end(), s->frame.begin(), s->frame.end());
      ++fired;
      s->integrate = a - dist;
      for (int j = 0; j < d; ++j) s->frame[j] = s->integrate * hi[j];
    }
  }
  return fired;
}

// ---------------------------------------------------------------------------
// chunked decoder (decoder.py forward_chunk)
// ---------------------------------------------------------------------------

void StreamingEngine::CrossAttentionChunk(const std::string& prefix,
                                          const std::vector<float>& x,
                                          int n_tok,
                                          const std::vector<float>& memory,
                                          int t_mem, KvCache* cache,
                                          std::vector<float>* out) const {
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
  // split (t_mem, 2d) -> k (t_mem, d), v (t_mem, d)
  std::vector<float> k(static_cast<int64_t>(t_mem) * d), v(k.size());
  for (int i = 0; i < t_mem; ++i) {
    std::memcpy(k.data() + static_cast<int64_t>(i) * d,
                kv.data() + static_cast<int64_t>(i) * 2 * d,
                d * sizeof(float));
    std::memcpy(v.data() + static_cast<int64_t>(i) * d,
                kv.data() + static_cast<int64_t>(i) * 2 * d + d,
                d * sizeof(float));
  }

  std::vector<float> k_full, v_full;
  const std::vector<float>* kp = &k;
  const std::vector<float>* vp = &v;
  int t_full = t_mem;
  if (dec_look_back_ > 0) {
    // attend [cache | current memory]; keep trailing look_back*stride rows
    if (cache->init) {
      k_full.assign(cache->k.begin(), cache->k.end());
      k_full.insert(k_full.end(), k.begin(), k.end());
      v_full.assign(cache->v.begin(), cache->v.end());
      v_full.insert(v_full.end(), v.begin(), v.end());
      t_full = cache->t + t_mem;
      kp = &k_full;
      vp = &v_full;
    } else {
      k_full = k;
      v_full = v;
      kp = &k_full;
      vp = &v_full;
      cache->init = true;
    }
    const int keep = std::min(dec_look_back_ * stride_, t_full);
    cache->k.assign(kp->end() - static_cast<int64_t>(keep) * d, kp->end());
    cache->v.assign(vp->end() - static_cast<int64_t>(keep) * d, vp->end());
    cache->t = keep;
  }

  // per-head attention as two GEMMs through the tiled fp32 core (see
  // sanm-encoder.cc SelfAttention)
  const float scale = 1.0f / std::sqrt(static_cast<float>(dk));
  std::vector<float> ctx(static_cast<int64_t>(n_tok) * d);
  std::vector<float> qh(static_cast<int64_t>(n_tok) * dk);
  std::vector<float> kht(static_cast<int64_t>(dk) * t_full);
  std::vector<float> vh(static_cast<int64_t>(t_full) * dk);
  std::vector<float> scores(static_cast<int64_t>(n_tok) * t_full),
      ch(qh.size());
  for (int hh = 0; hh < h; ++hh) {
    const int off = hh * dk;
    for (int i = 0; i < n_tok; ++i)
      std::memcpy(qh.data() + static_cast<int64_t>(i) * dk,
                  q.data() + static_cast<int64_t>(i) * d + off,
                  dk * sizeof(float));
    for (int j = 0; j < t_full; ++j) {
      const float* kj = kp->data() + static_cast<int64_t>(j) * d + off;
      std::memcpy(vh.data() + static_cast<int64_t>(j) * dk,
                  vp->data() + static_cast<int64_t>(j) * d + off,
                  dk * sizeof(float));
      for (int z = 0; z < dk; ++z)
        kht[static_cast<int64_t>(z) * t_full + j] = kj[z];
    }
    GemmF32(qh.data(), n_tok, dk, kht.data(), t_full, nullptr, scores.data());
    for (int i = 0; i < n_tok; ++i) {
      float* srow = scores.data() + static_cast<int64_t>(i) * t_full;
      for (int j = 0; j < t_full; ++j) srow[j] *= scale;
      SoftmaxRow(srow, t_full);
    }
    GemmF32(scores.data(), n_tok, t_full, vh.data(), dk, nullptr, ch.data());
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

std::vector<float> StreamingEngine::DecodeChunk(StreamSession* s,
                                                const std::vector<float>& memory,
                                                int t_mem,
                                                const std::vector<float>& embeds,
                                                int n_tok) const {
  const int d = d_;
  std::vector<float> x(embeds);

  auto ffn_dec = [&](const std::string& prefix, const std::vector<float>& in,
                     std::vector<float>* out_ff) {
    std::vector<float> mid(static_cast<int64_t>(n_tok) * dec_ffn_);
    MatMul(in.data(), n_tok, d, W(prefix + "/feed_forward/w_1/w"),
           W(prefix + "/feed_forward/w_1/b").f32.data(), mid.data());
    Relu(mid.data(), mid.size());
    LayerNorm(mid.data(), n_tok, dec_ffn_,
              W(prefix + "/feed_forward/norm/scale").f32.data(),
              W(prefix + "/feed_forward/norm/bias").f32.data());
    out_ff->assign(static_cast<int64_t>(n_tok) * d, 0.0f);
    MatMul(mid.data(), n_tok, dec_ffn_, W(prefix + "/feed_forward/w_2/w"),
           nullptr, out_ff->data());
  };

  auto fsmn_step = [&](const std::string& prefix, std::vector<float>* x2,
                       std::vector<float>* fsmn_cache) {
    // rolling (k-1, d) cache; conv with no pads, own residual
    const int kc = dec_kernel_;
    std::vector<float> buf(*fsmn_cache);
    buf.insert(buf.end(), x2->begin(), x2->end());
    const int buf_rows = (kc - 1) + n_tok;
    std::vector<float> conv(static_cast<int64_t>(n_tok) * d);
    DepthwiseConv1d(buf.data(), buf_rows, d,
                    RawF32(W(prefix + "/self_attn/fsmn_block/w"), "fsmn_block/w"), kc, 0, 0,
                    conv.data());
    for (int64_t i = 0; i < static_cast<int64_t>(n_tok) * d; ++i)
      conv[i] += (*x2)[i];
    fsmn_cache->assign(buf.end() - static_cast<int64_t>(kc - 1) * d, buf.end());
    *x2 = std::move(conv);
  };

  for (int l = 0; l < dec_att_; ++l) {
    const std::string prefix = "decoder/decoders." + std::to_string(l);
    std::vector<float> residual(x);
    std::vector<float> h(x);
    LayerNorm(h.data(), n_tok, d, W(prefix + "/norm1/scale").f32.data(),
              W(prefix + "/norm1/bias").f32.data());
    std::vector<float> ff;
    ffn_dec(prefix, h, &ff);
    std::vector<float> x2(ff);
    LayerNorm(x2.data(), n_tok, d, W(prefix + "/norm2/scale").f32.data(),
              W(prefix + "/norm2/bias").f32.data());
    fsmn_step(prefix, &x2, &s->dec_fsmn[l]);
    for (int64_t i = 0; i < static_cast<int64_t>(n_tok) * d; ++i)
      x[i] = residual[i] + x2[i];

    residual = x;
    std::vector<float> h3(x);
    LayerNorm(h3.data(), n_tok, d, W(prefix + "/norm3/scale").f32.data(),
              W(prefix + "/norm3/bias").f32.data());
    std::vector<float> att;
    CrossAttentionChunk(prefix + "/src_attn", h3, n_tok, memory, t_mem,
                        &s->dec_kv[l], &att);
    for (int64_t i = 0; i < static_cast<int64_t>(n_tok) * d; ++i)
      x[i] = residual[i] + att[i];
  }

  for (int j = 0; j < dec_blocks_ - dec_att_; ++j) {
    const int l = dec_att_ + j;
    const std::string prefix = "decoder/decoders2." + std::to_string(j);
    std::vector<float> residual(x);
    std::vector<float> h(x);
    LayerNorm(h.data(), n_tok, d, W(prefix + "/norm1/scale").f32.data(),
              W(prefix + "/norm1/bias").f32.data());
    std::vector<float> ff;
    ffn_dec(prefix, h, &ff);
    std::vector<float> x2(ff);
    LayerNorm(x2.data(), n_tok, d, W(prefix + "/norm2/scale").f32.data(),
              W(prefix + "/norm2/bias").f32.data());
    fsmn_step(prefix, &x2, &s->dec_fsmn[l]);
    for (int64_t i = 0; i < static_cast<int64_t>(n_tok) * d; ++i)
      x[i] = residual[i] + x2[i];
  }

  {
    const std::string prefix = "decoder/decoders3";
    std::vector<float> h(x);
    LayerNorm(h.data(), n_tok, d, W(prefix + "/norm1/scale").f32.data(),
              W(prefix + "/norm1/bias").f32.data());
    ffn_dec(prefix, h, &x);
  }
  LayerNorm(x.data(), n_tok, d_, W("decoder/after_norm/scale").f32.data(),
            W("decoder/after_norm/bias").f32.data());
  std::vector<float> logits(static_cast<int64_t>(n_tok) * vocab_size_);
  const WTensor& wo = W("decoder/output_layer/w");
  const WTensor* bo = ftr_->Find("decoder/output_layer/b");
  MatMul(x.data(), n_tok, d_, wo, bo ? bo->f32.data() : nullptr, logits.data());
  return logits;
}

// ---------------------------------------------------------------------------
// stride loop (model.py inference)
// ---------------------------------------------------------------------------

std::string StreamingEngine::ProcessStride(StreamSession* s, const float* chunk,
                                           int n, bool is_final) const {
  std::vector<float> feats;
  int t = 0;
  if (is_final && n < lfr_n_ * frame_shift_) {
    // tail replay: reuse the carried post-PE encoder rows (model.py:270-274)
    s->tail_chunk = true;
  } else {
    feats = FrontendChunk(s, chunk, n, is_final, &t);
    if (t == 0 && !is_final) return "";
  }
  DebugDump("feats", feats);
  int t_enc = 0;
  std::vector<float> enc = EncodeChunk(s, feats, t, &t_enc);
  s->tail_chunk = false;
  if (t_enc == 0) return "";
  DebugDump("enc", enc);
  std::vector<float> embeds;
  const int fired = CifChunk(s, enc, t_enc, is_final, &embeds);
  if (fired < 1) return "";
  DebugDump("embeds", embeds);
  std::vector<float> logits = DecodeChunk(s, enc, t_enc, embeds, fired);
  DebugDump("logits", logits);
  std::vector<int> ids;
  for (int i = 0; i < fired; ++i) {
    const float* row = logits.data() + static_cast<int64_t>(i) * vocab_size_;
    int best = 0;
    for (int j = 1; j < vocab_size_; ++j) {
      if (row[j] > row[best]) best = j;
    }
    if (best != blank_ && best != sos_ && best != eos_) ids.push_back(best);
  }
  return vocab_.Decode(ids, blank_, sos_, eos_);
}

std::string StreamingEngine::Accept(StreamSession* s, const float* samples,
                                    int n, bool is_final) const {
  std::vector<float> audio(s->prev_samples);
  audio.insert(audio.end(), samples, samples + n);
  const int stride_samples = stride_ * lfr_n_ * frame_shift_;
  const int64_t total = static_cast<int64_t>(audio.size());
  const int n_chunks =
      static_cast<int>(total / stride_samples) + (is_final ? 1 : 0);
  const int64_t m = is_final ? 0 : total % stride_samples;

  std::string text;
  for (int i = 0; i < n_chunks; ++i) {
    const bool final_i = is_final && i == n_chunks - 1;
    const int64_t lo = static_cast<int64_t>(i) * stride_samples;
    const int64_t hi = std::min(lo + stride_samples, total);
    text += ProcessStride(s, audio.data() + lo, static_cast<int>(hi - lo),
                          final_i);
  }
  s->prev_samples.assign(audio.end() - m, audio.end());
  if (is_final) ResetSession(s);
  return text;
}

}  // namespace funasr_tpu
