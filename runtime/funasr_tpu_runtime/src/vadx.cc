#include "vadx.h"

#include <algorithm>
#include <cmath>

namespace funasr_tpu {

VadStateMachine::VadStateMachine(const VadxOptions& opts) : opts_(opts) {
  speech_noise_thres_ = opts.speech_noise_thres;
  max_end_sil_thresh_ms_ =
      opts.max_end_silence_time - opts.speech_to_sil_time_thres;
  Reset();
}

void VadStateMachine::Reset() {
  WindowReset();
  frm_cnt_ = 0;
  buf_start_frame_ = 0;
  latest_speech_frame_ = 0;
  latest_silence_frame_ = -1;
  continous_silence_ = 0;
  state_ = kStartNotDetected;
  confirmed_start_ = -1;
  confirmed_end_ = -1;
  n_ends_ = 0;
  noise_avg_db_ = -100.0;
  segments_.clear();
  seg_offset_ = 0;
  next_seg_ = true;
  max_time_out_ = false;
  chunk_scores_.clear();
  chunk_db_.clear();
  chunk_base_ = 0;
}

// -- SlidingWindowDetector (model.py:99-127) --------------------------------

void VadStateMachine::WindowReset() {
  const int size =
      std::max(opts_.window_size_ms / opts_.frame_in_ms, 1);
  win_.assign(size, 0);
  win_pos_ = 0;
  win_total_ = 0;
  win_prev_ = kFrameSil;
}

VadStateMachine::Change VadStateMachine::WindowDetect(FrameState state) {
  const int sil2speech_thres =
      opts_.sil_to_speech_time_thres / opts_.frame_in_ms;
  const int speech2sil_thres =
      opts_.speech_to_sil_time_thres / opts_.frame_in_ms;
  const int val = state == kFrameSpeech ? 1 : 0;
  win_total_ += val - win_[win_pos_];
  win_[win_pos_] = val;
  win_pos_ = (win_pos_ + 1) % static_cast<int>(win_.size());
  if (win_prev_ == kFrameSil && win_total_ >= sil2speech_thres) {
    win_prev_ = kFrameSpeech;
    return kSil2Speech;
  }
  if (win_prev_ == kFrameSpeech && win_total_ <= speech2sil_thres) {
    win_prev_ = kFrameSil;
    return kSpeech2Sil;
  }
  return win_prev_ == kFrameSil ? kSil2Sil : kSpeech2Speech;
}

// -- _Tracker segment ops (model.py:164-216) --------------------------------

void VadStateMachine::PopTill(int frame) {
  buf_start_frame_ = std::max(buf_start_frame_, frame);
}

void VadStateMachine::ExtendSegment(int start_frm, bool new_seg, bool is_end) {
  const int ms = opts_.frame_in_ms;
  PopTill(start_frm);
  if (segments_.empty() || new_seg) {
    segments_.push_back({start_frm * ms, start_frm * ms, false, false});
  }
  Segment& seg = segments_.back();
  buf_start_frame_ += 1;
  seg.end_ms = (start_frm + 1) * ms;
  if (new_seg) seg.has_start = true;
  if (is_end) seg.has_end = true;
}

void VadStateMachine::OnSilence(int frame) {
  latest_silence_frame_ = frame;
  if (state_ == kStartNotDetected) PopTill(frame);
}

void VadStateMachine::OnVoice(int frame) {
  latest_speech_frame_ = frame;
  ExtendSegment(frame, false, false);
}

void VadStateMachine::OnVoiceStart(int frame, bool fake) {
  if (confirmed_start_ == -1) confirmed_start_ = frame;
  if (!fake && state_ == kStartNotDetected) {
    ExtendSegment(confirmed_start_, true, false);
  }
}

void VadStateMachine::OnVoiceEnd(int frame, bool fake, bool /*is_last*/) {
  for (int t = latest_speech_frame_ + 1; t < frame; ++t) OnVoice(t);
  if (confirmed_end_ == -1) confirmed_end_ = frame;
  if (!fake) ExtendSegment(confirmed_end_, false, true);
  ++n_ends_;
}

void VadStateMachine::ResetDetection() {
  continous_silence_ = 0;
  latest_speech_frame_ = 0;
  latest_silence_frame_ = -1;
  confirmed_start_ = -1;
  confirmed_end_ = -1;
  state_ = kStartNotDetected;
  WindowReset();
  if (!segments_.empty()) {
    PopTill(segments_.back().end_ms / opts_.frame_in_ms);
  }
}

// -- per-frame classification (_frame_state, model.py:256-277) --------------

VadStateMachine::FrameState VadStateMachine::ClassifyFrame(int t) {
  const int rel = t - chunk_base_;
  if (rel < 0 || rel >= static_cast<int>(chunk_db_.size())) return kFrameSil;
  const double cur_db = chunk_db_[rel];
  const double cur_snr = cur_db - noise_avg_db_;
  if (cur_db < opts_.decibel_thres) return kFrameSil;
  const double sil_score = chunk_scores_[rel];
  const double noise_prob =
      std::log(std::max(sil_score, 1e-10)) * opts_.speech_2_noise_ratio;
  const double speech_score = 1.0 - sil_score;
  if (speech_score >= std::exp(noise_prob) + speech_noise_thres_) {
    if (cur_snr >= opts_.snr_thres && cur_db >= opts_.decibel_thres) {
      return kFrameSpeech;
    }
    return kFrameSil;
  }
  // noise frame: update the noise decibel EMA
  if (noise_avg_db_ < -99.9) {
    noise_avg_db_ = cur_db;
  } else {
    const int n = opts_.noise_frame_num_used_for_snr;
    noise_avg_db_ = (cur_db + noise_avg_db_ * (n - 1)) / n;
  }
  return kFrameSil;
}

int VadStateMachine::LatencyFrames() const {
  int lat = opts_.window_size_ms / opts_.frame_in_ms;
  if (opts_.do_extend) {
    lat += opts_.lookback_time_start_point / opts_.frame_in_ms;
  }
  return lat;
}

// -- one-frame transition (_detect_one, model.py:288-370) -------------------

void VadStateMachine::DetectOne(FrameState state, int idx, bool is_final) {
  const Change change = WindowDetect(state);
  const int ms = opts_.frame_in_ms;
  const double max_seg_frames =
      static_cast<double>(opts_.max_single_segment_time) / ms;

  auto maybe_end_if_last = [&]() {
    if (is_final) {
      OnVoiceEnd(idx, false, true);
      state_ = kEndDetected;
    }
  };

  if (change == kSil2Speech) {
    continous_silence_ = 0;
    if (state_ == kStartNotDetected) {
      const int start = std::max(buf_start_frame_, idx - LatencyFrames());
      OnVoiceStart(start, false);
      state_ = kInSpeech;
      for (int t = start + 1; t <= idx; ++t) OnVoice(t);
    } else if (state_ == kInSpeech) {
      for (int t = latest_speech_frame_ + 1; t < idx; ++t) OnVoice(t);
      if (idx - confirmed_start_ + 1 > max_seg_frames) {
        OnVoiceEnd(idx, false, false);
        state_ = kEndDetected;
      } else if (!is_final) {
        OnVoice(idx);
      } else {
        maybe_end_if_last();
      }
    }
  } else if (change == kSpeech2Sil) {
    continous_silence_ = 0;
    if (state_ == kInSpeech) {
      if (idx - confirmed_start_ + 1 > max_seg_frames) {
        OnVoiceEnd(idx, false, false);
        state_ = kEndDetected;
      } else if (!is_final) {
        OnVoice(idx);
      } else {
        maybe_end_if_last();
      }
    }
  } else if (change == kSpeech2Speech) {
    continous_silence_ = 0;
    if (state_ == kInSpeech) {
      if (idx - confirmed_start_ + 1 > max_seg_frames) {
        max_time_out_ = true;
        OnVoiceEnd(idx, false, false);
        state_ = kEndDetected;
      } else if (!is_final) {
        OnVoice(idx);
      } else {
        maybe_end_if_last();
      }
    }
  } else {  // kSil2Sil
    continous_silence_ += 1;
    if (state_ == kStartNotDetected) {
      const bool single = opts_.detect_mode == 0;
      if ((single &&
           continous_silence_ * ms > opts_.max_start_silence_time) ||
          (is_final && n_ends_ == 0)) {
        for (int t = latest_silence_frame_ + 1; t < idx; ++t) OnSilence(t);
        OnVoiceStart(0, true);
        OnVoiceEnd(0, true, false);
        state_ = kEndDetected;
      } else if (idx >= LatencyFrames()) {
        OnSilence(idx - LatencyFrames());
      }
    } else if (state_ == kInSpeech) {
      if (continous_silence_ * ms >= max_end_sil_thresh_ms_) {
        int lookback = max_end_sil_thresh_ms_ / ms;
        if (opts_.do_extend) {
          lookback -= opts_.lookahead_time_end_point / ms;
          lookback = std::max(0, lookback - 1);
        }
        OnVoiceEnd(idx - lookback, false, false);
        state_ = kEndDetected;
      } else if (idx - confirmed_start_ + 1 > max_seg_frames) {
        OnVoiceEnd(idx, false, false);
        state_ = kEndDetected;
      } else if (opts_.do_extend && !is_final) {
        if (continous_silence_ <= opts_.lookahead_time_end_point / ms) {
          OnVoice(idx);
        }
      } else {
        maybe_end_if_last();
      }
    }
  }

  if (state_ == kEndDetected && opts_.detect_mode == 1) {
    ResetDetection();
  }
}

// -- chunk forward + emission (model.py forward:374-431) --------------------

std::vector<std::pair<int, int>> VadStateMachine::Feed(
    const float* sil_scores, const float* decibels, int n, bool is_final,
    bool streaming_input) {
  if (n > 0) {
    chunk_base_ = frm_cnt_;
    chunk_scores_.assign(sil_scores, sil_scores + n);
    chunk_db_.assign(decibels, decibels + n);
    frm_cnt_ += n;
    if (state_ != kEndDetected) {
      for (int i = n - 1; i >= 0; --i) {
        const int idx = frm_cnt_ - 1 - i;
        const FrameState fs = ClassifyFrame(idx);
        DetectOne(fs, idx, is_final && i == 0);
      }
    }
  } else if (is_final && state_ != kEndDetected) {
    const int idx = std::max(frm_cnt_ - 1, 0);
    const FrameState fs = ClassifyFrame(idx);
    DetectOne(fs, idx, true);
  }

  std::vector<std::pair<int, int>> out;
  for (int i = seg_offset_; i < static_cast<int>(segments_.size()); ++i) {
    const Segment& seg = segments_[i];
    if (streaming_input) {
      if (!seg.has_start) continue;
      if (!next_seg_ && !seg.has_end) continue;
      const int start_ms = next_seg_ ? seg.start_ms : -1;
      int end_ms;
      if (seg.has_end) {
        end_ms = seg.end_ms;
        next_seg_ = true;
        seg_offset_ += 1;
      } else {
        end_ms = -1;
        next_seg_ = false;
      }
      out.push_back({start_ms, end_ms});
    } else {
      if (!is_final && (!seg.has_start || !seg.has_end)) continue;
      out.push_back({seg.start_ms, seg.end_ms});
      seg_offset_ += 1;
    }
  }
  return out;
}

}  // namespace funasr_tpu
