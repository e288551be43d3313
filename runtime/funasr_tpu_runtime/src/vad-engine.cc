#include "vad-engine.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "nn.h"

namespace funasr_tpu {

namespace {

const float* BiasPtr(const WTensor& w) {
  return w.f32.empty() ? nullptr : w.f32.data();
}

// Dynamic silence threshold schedule (model.py DEFAULT_SILENCE_SCHEDULE):
// (accumulated_speech_ms_limit, silence_threshold_ms)
constexpr std::pair<int64_t, int> kDefaultSilenceSchedule[] = {
    {10000, 2000}, {20000, 1000}, {30000, 800},  {40000, 600},
    {50000, 400},  {60000, 200},  {INT64_MAX, 100},
};

}  // namespace

const WTensor& FsmnVadEngine::W(const std::string& name) const {
  const WTensor* t = ftr_.Find(name);
  static WTensor empty;
  return t ? *t : empty;
}

bool FsmnVadEngine::Load(const std::string& model_dir) {
  if (!ftr_.Load(model_dir + "/vad.ftr") &&
      !(ftr_.Load(model_dir + "/weights.ftr") &&
        ftr_.MetaStr("model", "") == "FsmnVADStreaming")) {
    return false;
  }
  has_cmvn_ = cmvn_.Load(model_dir + "/am.mvn");
  input_dim_ = ftr_.MetaInt("input_dim", 400);
  affine_dim_ = ftr_.MetaInt("input_affine_dim", 140);
  fsmn_layers_ = ftr_.MetaInt("fsmn_layers", 4);
  linear_dim_ = ftr_.MetaInt("linear_dim", 250);
  proj_dim_ = ftr_.MetaInt("proj_dim", 128);
  lorder_ = ftr_.MetaInt("lorder", 20);
  rorder_ = ftr_.MetaInt("rorder", 0);
  out_affine_dim_ = ftr_.MetaInt("output_affine_dim", 140);
  output_dim_ = ftr_.MetaInt("output_dim", 248);
  n_mels_ = ftr_.MetaInt("n_mels", 80);
  lfr_m_ = ftr_.MetaInt("lfr_m", 5);
  lfr_n_ = ftr_.MetaInt("lfr_n", 1);
  sil_pdf_id_ = ftr_.MetaInt("sil_pdf_id", 0);
  dynamic_silence_ = ftr_.MetaInt("dynamic_silence", 1) != 0;
  opts_.window_size_ms = ftr_.MetaInt("window_size_ms", 200);
  opts_.sil_to_speech_time_thres =
      ftr_.MetaInt("sil_to_speech_time_thres", 150);
  opts_.speech_to_sil_time_thres =
      ftr_.MetaInt("speech_to_sil_time_thres", 150);
  opts_.max_end_silence_time = ftr_.MetaInt("max_end_silence_time", 800);
  opts_.max_single_segment_time =
      ftr_.MetaInt("max_single_segment_time", 60000);
  opts_.speech_noise_thres = ftr_.MetaFloat("speech_noise_thres", 0.6f);
  opts_.speech_2_noise_ratio = ftr_.MetaFloat("speech_2_noise_ratio", 1.0f);
  opts_.detect_mode = ftr_.MetaInt("detect_mode", 1);
  opts_.max_start_silence_time = ftr_.MetaInt("max_start_silence_time", 3000);
  opts_.do_extend = ftr_.MetaInt("do_extend", 1);
  opts_.lookback_time_start_point =
      ftr_.MetaInt("lookback_time_start_point", 200);
  opts_.lookahead_time_end_point =
      ftr_.MetaInt("lookahead_time_end_point", 100);
  return true;
}

VadxOptions FsmnVadEngine::MakeOptions() const { return opts_; }

// FSMN scoring network (funasr_tpu/models/fsmn_vad_streaming/encoder.py:104):
// in_linear1 -> in_linear2 -> relu; per block: linear(no bias) -> causal
// depthwise conv (+ lookahead) residual -> affine -> relu; out linears ->
// softmax; return the silence-pdf probability per frame.
std::vector<float> FsmnVadEngine::SilScores(const std::vector<float>& feats,
                                            int t) const {
  std::vector<float> h(t * affine_dim_);
  MatMul(feats.data(), t, input_dim_, W("encoder/in_linear1/w"),
         BiasPtr(W("encoder/in_linear1/b")), h.data());
  std::vector<float> g(t * linear_dim_);
  MatMul(h.data(), t, affine_dim_, W("encoder/in_linear2/w"),
         BiasPtr(W("encoder/in_linear2/b")), g.data());
  Relu(g.data(), g.size());

  std::vector<float> proj(t * proj_dim_), conv(t * proj_dim_);
  for (int i = 0; i < fsmn_layers_; ++i) {
    const std::string p = "encoder/fsmn." + std::to_string(i) + "/";
    MatMul(g.data(), t, linear_dim_, W(p + "linear/w"), nullptr, proj.data());
    DepthwiseConv1d(proj.data(), t, proj_dim_,
                    RawF32(W(p + "conv_left/w"), "conv_left/w"), lorder_,
                    lorder_ - 1, 0, conv.data());
    for (size_t k = 0; k < conv.size(); ++k) conv[k] += proj[k];
    if (rorder_ > 0) {
      // lookahead conv over frames t+1 .. t+rorder (encoder.py:97-100)
      std::vector<float> right(t * proj_dim_, 0.0f);
      if (t > 1) {
        std::vector<float> shifted(proj.begin() + proj_dim_, proj.end());
        std::vector<float> rout((t - 1) * proj_dim_);
        DepthwiseConv1d(shifted.data(), t - 1, proj_dim_,
                        RawF32(W(p + "conv_right/w"), "conv_right/w"), rorder_,
                        0, rorder_, rout.data());
        std::copy(rout.begin(), rout.end(), right.begin());
      }
      for (size_t k = 0; k < conv.size(); ++k) conv[k] += right[k];
    }
    MatMul(conv.data(), t, proj_dim_, W(p + "affine/w"),
           BiasPtr(W(p + "affine/b")), g.data());
    Relu(g.data(), g.size());
  }
  MatMul(g.data(), t, linear_dim_, W("encoder/out_linear1/w"),
         BiasPtr(W("encoder/out_linear1/b")), h.data());
  std::vector<float> logits(t * output_dim_);
  MatMul(h.data(), t, out_affine_dim_, W("encoder/out_linear2/w"),
         BiasPtr(W("encoder/out_linear2/b")), logits.data());
  std::vector<float> sil(t);
  for (int i = 0; i < t; ++i) {
    SoftmaxRow(logits.data() + i * output_dim_, output_dim_);
    sil[i] = logits[i * output_dim_ + sil_pdf_id_];
  }
  return sil;
}

// ---------------------------------------------------------------------------
// incremental scorer
// ---------------------------------------------------------------------------

VadScorer::VadScorer(const FsmnVadEngine* engine) : engine_(engine) {
  FbankOptions fopts;
  fopts.n_mels = engine->n_mels_;
  fbank_ = std::make_unique<Fbank>(fopts);
  Reset();
}

void VadScorer::Reset() {
  sample_tail_.clear();
  mel_rows_.clear();
  mel_base_ = 0;
  mel_count_ = 0;
  lfr_count_ = 0;
  db_.clear();
  db_base_ = 0;
  fsmn_cache_.assign(
      engine_->fsmn_layers_,
      std::vector<float>(
          static_cast<size_t>(std::max(engine_->lorder_ - 1, 0)) *
              engine_->proj_dim_,
          0.0f));
}

void VadScorer::Process(const float* samples, int n, bool is_final,
                        std::vector<float>* scores,
                        std::vector<float>* decibels) {
  const FsmnVadEngine& e = *engine_;
  const int flen = 400, fshift = 160;  // 25 ms / 10 ms at 16 kHz
  sample_tail_.reserve(sample_tail_.size() + n);
  for (int i = 0; i < n; ++i) {
    sample_tail_.push_back(samples[i] * 32768.0f);  // kaldi scaling
  }

  // 1. new raw mel frames + their decibels (model.py forward:383-388)
  int t_new = 0;
  std::vector<float> mel = fbank_->Compute(sample_tail_, &t_new);
  if (t_new > 0) {
    for (int i = 0; i < t_new; ++i) {
      double energy = 0.0;
      const float* fr = sample_tail_.data() + static_cast<size_t>(i) * fshift;
      for (int k = 0; k < flen; ++k) energy += double(fr[k]) * fr[k];
      db_.push_back(static_cast<float>(10.0 * std::log10(energy + 1e-6)));
    }
    mel_rows_.insert(mel_rows_.end(), mel.begin(), mel.end());
    mel_count_ += t_new;
    sample_tail_.erase(sample_tail_.begin(),
                       sample_tail_.begin() + static_cast<size_t>(t_new) * fshift);
  }
  if (is_final) sample_tail_.clear();

  // 2. emit LFR rows whose right context is available (or clamp at final);
  //    matches ApplyLfr: src = clip(i*lfr_n + j - left, 0, T-1)
  const int m = e.lfr_m_, ln = e.lfr_n_, d = e.n_mels_;
  const int left = (m - 1) / 2, right = m - 1 - left;
  const int64_t lfr_total = (mel_count_ + ln - 1) / ln;
  std::vector<float> feats;
  int t_chunk = 0;
  while (lfr_count_ < lfr_total) {
    const int64_t i = lfr_count_;
    const int64_t need = i * ln + right;
    if (need > mel_count_ - 1 && !is_final) break;
    for (int j = 0; j < m; ++j) {
      int64_t src = i * ln + j - left;
      src = std::max<int64_t>(0, std::min(src, mel_count_ - 1));
      const float* row = mel_rows_.data() +
                         static_cast<size_t>(src - mel_base_) * d;
      feats.insert(feats.end(), row, row + d);
    }
    ++lfr_count_;
    ++t_chunk;
  }
  if (t_chunk > 0 && e.has_cmvn_) {
    e.cmvn_.Apply(&feats);
  }
  // trim mel rows no longer reachable (left context of the next LFR row)
  const int64_t keep_from = std::max<int64_t>(0, lfr_count_ * ln - left);
  if (keep_from > mel_base_) {
    mel_rows_.erase(mel_rows_.begin(),
                    mel_rows_.begin() +
                        static_cast<size_t>(keep_from - mel_base_) * d);
    mel_base_ = keep_from;
  }
  if (t_chunk == 0) return;

  // 3. FSMN forward with carried causal-conv caches. rorder>0 would need
  //    future rows; VAD exports are causal (rorder 0) — enforced here.
  if (e.rorder_ > 0) {
    std::fprintf(stderr,
                 "funasr_tpu: streaming VAD scorer requires rorder==0\n");
    std::abort();
  }
  const int t = t_chunk;
  std::vector<float> h(static_cast<size_t>(t) * e.affine_dim_);
  MatMul(feats.data(), t, e.input_dim_, e.W("encoder/in_linear1/w"),
         BiasPtr(e.W("encoder/in_linear1/b")), h.data());
  std::vector<float> g(static_cast<size_t>(t) * e.linear_dim_);
  MatMul(h.data(), t, e.affine_dim_, e.W("encoder/in_linear2/w"),
         BiasPtr(e.W("encoder/in_linear2/b")), g.data());
  Relu(g.data(), g.size());

  const int pd = e.proj_dim_;
  const int cache_rows = std::max(e.lorder_ - 1, 0);
  std::vector<float> proj(static_cast<size_t>(t) * pd);
  std::vector<float> conv(static_cast<size_t>(t) * pd);
  for (int i = 0; i < e.fsmn_layers_; ++i) {
    const std::string p = "encoder/fsmn." + std::to_string(i) + "/";
    MatMul(g.data(), t, e.linear_dim_, e.W(p + "linear/w"), nullptr,
           proj.data());
    // buf = [cache (lorder-1 rows, zeros initially = the left zero-pad) | proj]
    std::vector<float>& cache = fsmn_cache_[i];
    std::vector<float> buf;
    buf.reserve(cache.size() + proj.size());
    buf.insert(buf.end(), cache.begin(), cache.end());
    buf.insert(buf.end(), proj.begin(), proj.end());
    DepthwiseConv1d(buf.data(), cache_rows + t, pd,
                    RawF32(e.W(p + "conv_left/w"), "conv_left/w"), e.lorder_,
                    0, 0, conv.data());
    for (size_t k = 0; k < conv.size(); ++k) conv[k] += proj[k];
    // carry the last lorder-1 rows for the next chunk
    if (cache_rows > 0) {
      cache.assign(buf.end() - static_cast<size_t>(cache_rows) * pd,
                   buf.end());
    }
    MatMul(conv.data(), t, pd, e.W(p + "affine/w"),
           BiasPtr(e.W(p + "affine/b")), g.data());
    Relu(g.data(), g.size());
  }
  MatMul(g.data(), t, e.linear_dim_, e.W("encoder/out_linear1/w"),
         BiasPtr(e.W("encoder/out_linear1/b")), h.data());
  std::vector<float> logits(static_cast<size_t>(t) * e.output_dim_);
  MatMul(h.data(), t, e.out_affine_dim_, e.W("encoder/out_linear2/w"),
         BiasPtr(e.W("encoder/out_linear2/b")), logits.data());
  for (int i = 0; i < t; ++i) {
    SoftmaxRow(logits.data() + static_cast<size_t>(i) * e.output_dim_,
               e.output_dim_);
    scores->push_back(logits[static_cast<size_t>(i) * e.output_dim_ +
                             e.sil_pdf_id_]);
  }
  // decibel per score frame: with lfr_n==1 score frame j == raw frame j
  // (model.py forward computes db over w[j*fshift : j*fshift+flen])
  const int64_t first = lfr_count_ - t_chunk;
  for (int i = 0; i < t_chunk; ++i) {
    const int64_t raw = (first + i) * ln;
    const int64_t rel = raw - db_base_;
    decibels->push_back(
        rel >= 0 && rel < static_cast<int64_t>(db_.size())
            ? db_[static_cast<size_t>(rel)]
            : (db_.empty() ? -100.0f : db_.back()));
  }
  const int64_t db_keep = lfr_count_ * ln;
  if (db_keep > db_base_) {
    const int64_t drop =
        std::min<int64_t>(db_keep - db_base_, static_cast<int64_t>(db_.size()));
    db_.erase(db_.begin(), db_.begin() + drop);
    db_base_ += drop;
  }
}

// ---------------------------------------------------------------------------
// offline segmentation (python inference() chunk loop, model.py:435-524)
// ---------------------------------------------------------------------------

std::vector<std::pair<int, int>> FsmnVadEngine::Segments(
    const std::vector<float>& wav, std::vector<float>* scores) const {
  VadStateMachine machine(opts_);
  VadScorer scorer(this);
  const int chunk_ms = 60000;
  const int64_t stride = static_cast<int64_t>(chunk_ms) * 16;
  const int64_t n_chunks =
      static_cast<int64_t>(wav.size()) / stride + 1;  // is_final: +1 tail

  int64_t accumulated = 0;
  bool in_speech = false;
  std::vector<std::pair<int, int>> segs;
  for (int64_t ci = 0; ci < n_chunks; ++ci) {
    const bool final_i = ci == n_chunks - 1;
    const int64_t beg = ci * stride;
    const int64_t end = std::min<int64_t>(wav.size(), beg + stride);
    if (dynamic_silence_) {
      if (machine.in_speech() || in_speech) {
        accumulated += chunk_ms;
        in_speech = true;
      }
      for (const auto& [limit, sil_ms] : kDefaultSilenceSchedule) {
        if (accumulated <= limit) {
          machine.set_max_end_sil_thresh_ms(
              std::max(sil_ms - opts_.speech_to_sil_time_thres, 0));
          machine.set_speech_noise_thres(0.5);
          break;
        }
      }
    }
    std::vector<float> chunk_scores, chunk_db;
    scorer.Process(wav.data() + beg, static_cast<int>(end - beg), final_i,
                   &chunk_scores, &chunk_db);
    if (scores != nullptr) {
      scores->insert(scores->end(), chunk_scores.begin(), chunk_scores.end());
    }
    auto out = machine.Feed(chunk_scores.data(), chunk_db.data(),
                            static_cast<int>(chunk_scores.size()), final_i,
                            /*streaming_input=*/false);
    if (!out.empty()) {
      segs.insert(segs.end(), out.begin(), out.end());
      if (dynamic_silence_) {
        accumulated = 0;
        in_speech = false;
      }
    }
  }
  return segs;
}

// ---------------------------------------------------------------------------
// streaming wrapper (fsmn-vad-online role)
// ---------------------------------------------------------------------------

FsmnVadStream::FsmnVadStream(const FsmnVadEngine* engine)
    : engine_(engine), scorer_(engine), machine_(engine->MakeOptions()) {}

std::vector<std::pair<int, int>> FsmnVadStream::Accept(const float* samples,
                                                       int n, bool is_final) {
  // dynamic endpoint schedule: the STREAMING table + event-driven
  // bookkeeping, mirroring DynamicStreamingVAD (dynamic_vad.py:15-82) —
  // accumulate speech time per chunk only while an utterance is open, reset
  // only on CLOSE events (an open [beg,-1] partial must not loosen the
  // schedule back)
  static constexpr std::pair<int64_t, int> kStreamingSilenceSchedule[] = {
      {5000, 2000}, {10000, 1500}, {15000, 1000},
      {30000, 800}, {45000, 400},  {INT64_MAX, 100},
  };
  if (engine_->dynamic_silence() && n > 0) {
    if (dyn_in_speech_) accumulated_ms_ += n / 16;
    for (const auto& [limit, sil_ms] : kStreamingSilenceSchedule) {
      if (accumulated_ms_ <= limit) {
        machine_.set_max_end_sil_thresh_ms(sil_ms);
        machine_.set_speech_noise_thres(0.5);
        break;
      }
    }
  }
  samples_seen_ += std::max(n, 0);
  std::vector<float> scores, db;
  scorer_.Process(samples, n, is_final, &scores, &db);
  auto events = machine_.Feed(scores.data(), db.data(),
                              static_cast<int>(scores.size()), is_final,
                              /*streaming_input=*/true);
  for (const auto& ev : events) {
    if (ev.first != -1 && ev.second == -1) dyn_in_speech_ = true;
    if (ev.second != -1) {  // endpoint closed
      dyn_in_speech_ = false;
      accumulated_ms_ = 0;
    }
  }
  if (is_final) {
    scorer_.Reset();
    machine_.Reset();
    accumulated_ms_ = 0;
    dyn_in_speech_ = false;
    samples_seen_ = 0;
  }
  return events;
}

}  // namespace funasr_tpu
