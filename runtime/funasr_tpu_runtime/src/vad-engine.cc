#include "vad-engine.h"

#include <algorithm>
#include <cmath>
#include <cstring>

#include "nn.h"

namespace funasr_tpu {

const WTensor& FsmnVadEngine::W(const std::string& name) const {
  const WTensor* t = ftr_.Find(name);
  static WTensor empty;
  return t ? *t : empty;
}

namespace {
const float* BiasPtr(const WTensor& w) {
  return w.f32.empty() ? nullptr : w.f32.data();
}
}  // namespace

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
  window_size_ms_ = ftr_.MetaInt("window_size_ms", 200);
  sil_to_speech_ms_ = ftr_.MetaInt("sil_to_speech_time_thres", 150);
  speech_to_sil_ms_ = ftr_.MetaInt("speech_to_sil_time_thres", 150);
  max_end_silence_ms_ = ftr_.MetaInt("max_end_silence_time", 800);
  max_single_segment_ms_ = ftr_.MetaInt("max_single_segment_time", 60000);
  speech_noise_thres_ = ftr_.MetaFloat("speech_noise_thres", 0.6f);
  speech_2_noise_ratio_ = ftr_.MetaFloat("speech_2_noise_ratio", 1.0f);
  sil_pdf_id_ = ftr_.MetaInt("sil_pdf_id", 0);
  return true;
}

// FSMN scoring network (funasr_tpu/models/fsmn_vad_streaming/encoder.py:104):
// in_linear1 -> in_linear2 -> relu; per block: linear(no bias) -> causal
// depthwise conv (+ lookahead) residual -> affine -> relu; out linears ->
// softmax; return the silence-pdf probability per frame.
std::vector<float> FsmnVadEngine::SilScores(const std::vector<float>& feats,
                                            int t) {
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
    DepthwiseConv1d(proj.data(), t, proj_dim_, RawF32(W(p + "conv_left/w"), "conv_left/w"),
                    lorder_, lorder_ - 1, 0, conv.data());
    for (size_t k = 0; k < conv.size(); ++k) conv[k] += proj[k];
    if (rorder_ > 0) {
      // lookahead conv over frames t+1 .. t+rorder (encoder.py:97-100)
      std::vector<float> right(t * proj_dim_, 0.0f);
      if (t > 1) {
        std::vector<float> shifted(proj.begin() + proj_dim_, proj.end());
        std::vector<float> rout((t - 1) * proj_dim_);
        DepthwiseConv1d(shifted.data(), t - 1, proj_dim_,
                        RawF32(W(p + "conv_right/w"), "conv_right/w"), rorder_, 0, rorder_,
                        rout.data());
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

// Windowed two-threshold endpoint detection (model.py _frame_state /
// WindowDetector semantics; the reference's decibel/SNR gates use their
// permissive defaults -100 dB so the probability test dominates).
std::vector<std::pair<int, int>> FsmnVadEngine::Segments(
    const std::vector<float>& wav, std::vector<float>* scores) {
  std::vector<float> scaled(wav);
  for (float& v : scaled) v *= 32768.0f;
  FbankOptions opts;
  opts.n_mels = n_mels_;
  Fbank fbank(opts);
  int t = 0;
  std::vector<float> feats = fbank.Compute(scaled, &t);
  int t_lfr = t;
  if (lfr_m_ != 1 || lfr_n_ != 1) {
    feats = ApplyLfr(feats, t, n_mels_, lfr_m_, lfr_n_, &t_lfr);
  }
  if (has_cmvn_) cmvn_.Apply(&feats);
  std::vector<float> sil = SilScores(feats, t_lfr);
  if (scores != nullptr) *scores = sil;

  const int frame_ms = frame_in_ms_ * lfr_n_;
  const int win = std::max(window_size_ms_ / frame_ms, 1);
  const int sil2sp = sil_to_speech_ms_ / frame_ms;
  std::vector<int> ring(win, 0);
  int win_sum = 0, pos = 0;
  bool in_speech = false;
  int seg_start = -1;
  std::vector<std::pair<int, int>> segs;
  for (int i = 0; i < t_lfr; ++i) {
    float speech_score = 1.0f - sil[i];
    float noise_prob =
        std::log(std::max(sil[i], 1e-10f)) * speech_2_noise_ratio_;
    int state =
        speech_score >= std::exp(noise_prob) + speech_noise_thres_ ? 1 : 0;
    win_sum += state - ring[pos];
    ring[pos] = state;
    pos = (pos + 1) % win;
    int cur_ms = i * frame_ms;
    if (!in_speech) {
      if (win_sum * frame_ms >= sil_to_speech_ms_ && sil2sp > 0) {
        in_speech = true;
        seg_start = std::max(cur_ms - window_size_ms_, 0);
      }
    } else {
      bool force_split =
          cur_ms - seg_start >= max_single_segment_ms_;
      if ((win - win_sum) * frame_ms >= speech_to_sil_ms_ || force_split) {
        int end_ms = force_split ? cur_ms
                                 : std::max(cur_ms - window_size_ms_ +
                                                speech_to_sil_ms_,
                                            seg_start + frame_ms);
        segs.emplace_back(seg_start, end_ms);
        in_speech = force_split;
        seg_start = force_split ? cur_ms : -1;
        if (!force_split) {
          std::fill(ring.begin(), ring.end(), 0);
          win_sum = 0;
        }
      }
    }
  }
  if (in_speech && seg_start >= 0) {
    segs.emplace_back(seg_start, t_lfr * frame_ms);
  }
  return segs;
}

std::vector<std::pair<int, int>> FsmnVadStream::Accept(const float* samples,
                                                       int n, bool is_final) {
  buf_.insert(buf_.end(), samples, samples + n);
  std::vector<std::pair<int, int>> events;
  if (buf_.size() < 1600 && !is_final) return events;  // <100 ms: wait

  auto segs = engine_->Segments(buf_);
  const int total_ms = static_cast<int>(buf_.size()) / 16;
  const int guard = engine_->max_end_silence_ms() / 4;

  for (const auto& seg : segs) {
    const int s = seg.first, e = seg.second;
    if (e <= last_end_ms_) continue;  // already fully emitted
    const bool closed = is_final || e + guard < total_ms;
    if (emitted_beg_ms_ < 0 && s >= last_end_ms_) {
      events.push_back({s, -1});  // utterance opened
      emitted_beg_ms_ = s;
    }
    if (closed && emitted_beg_ms_ >= 0) {
      events.push_back({-1, e});  // utterance closed
      last_end_ms_ = e;
      emitted_beg_ms_ = -1;
    }
  }
  if (is_final) {
    if (emitted_beg_ms_ >= 0) {  // flush a dangling open segment
      events.push_back({-1, total_ms});
      emitted_beg_ms_ = -1;
    }
    buf_.clear();
    last_end_ms_ = 0;
  }
  return events;
}

}  // namespace funasr_tpu
