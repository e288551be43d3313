// Full VADX endpoint state machine — a 1:1 port of the (reference-faithful)
// Python tracker in funasr_tpu/models/fsmn_vad_streaming/model.py
// (_Tracker / SlidingWindowDetector / _frame_state / _detect_one / forward
// emission), which itself rebuilds FunASR funasr/models/fsmn_vad_streaming/
// model.py:825-1157 + runtime/onnxruntime/src/fsmn-vad.cpp. The machine is
// driven by per-frame (silence-score, decibel) pairs so Python and C++ can be
// byte-compared on identical synthetic score traces.

#ifndef FUNASR_TPU_VADX_H_
#define FUNASR_TPU_VADX_H_

#include <utility>
#include <vector>

namespace funasr_tpu {

// VADXOptions (model.py:61-91), defaults identical to the reference.
struct VadxOptions {
  int detect_mode = 1;  // 0=single-utterance, 1=multiple-utterance
  int max_end_silence_time = 800;
  int max_start_silence_time = 3000;
  int window_size_ms = 200;
  int sil_to_speech_time_thres = 150;
  int speech_to_sil_time_thres = 150;
  double speech_2_noise_ratio = 1.0;
  int do_extend = 1;
  int lookback_time_start_point = 200;
  int lookahead_time_end_point = 100;
  int max_single_segment_time = 60000;
  double snr_thres = -100.0;
  int noise_frame_num_used_for_snr = 100;
  double decibel_thres = -100.0;
  double speech_noise_thres = 0.6;
  int frame_in_ms = 10;
  int frame_length_ms = 25;
};

class VadStateMachine {
 public:
  explicit VadStateMachine(const VadxOptions& opts);

  // init_cache role: full reset for a new utterance/stream.
  void Reset();

  // Dynamic silence schedule hooks (model.py inference:477-488): the caller
  // sets the end-silence budget (already reduced by speech_to_sil, i.e. the
  // max_end_sil_frame_cnt_thresh value) and the score threshold per chunk.
  void set_max_end_sil_thresh_ms(int ms) { max_end_sil_thresh_ms_ = ms; }
  void set_speech_noise_thres(double v) { speech_noise_thres_ = v; }
  bool in_speech() const { return state_ == kInSpeech; }
  int frame_count() const { return frm_cnt_; }

  // Feed one chunk of per-frame silence-pdf scores + decibels (model.py
  // forward). streaming_input=true emits [beg,-1] / [-1,end] / [beg,end]
  // partial events; false emits only completed [beg,end] segments.
  std::vector<std::pair<int, int>> Feed(const float* sil_scores,
                                        const float* decibels, int n,
                                        bool is_final, bool streaming_input);

 private:
  enum VadState { kStartNotDetected = 1, kInSpeech = 2, kEndDetected = 3 };
  enum FrameState { kFrameSil = 0, kFrameSpeech = 1 };
  enum Change { kSpeech2Speech = 0, kSpeech2Sil = 1, kSil2Sil = 2,
                kSil2Speech = 3 };

  struct Segment {
    int start_ms;
    int end_ms;
    bool has_start = false;
    bool has_end = false;
  };

  // SlidingWindowDetector (model.py:99-127)
  void WindowReset();
  Change WindowDetect(FrameState state);

  // _Tracker ops (model.py:138-216)
  void PopTill(int frame);
  void ExtendSegment(int start_frm, bool new_seg, bool is_end);
  void OnSilence(int frame);
  void OnVoice(int frame);
  void OnVoiceStart(int frame, bool fake);
  void OnVoiceEnd(int frame, bool fake, bool is_last);
  void ResetDetection();

  FrameState ClassifyFrame(int t);  // _frame_state (model.py:256-277)
  int LatencyFrames() const;        // _latency_frames (model.py:279-284)
  void DetectOne(FrameState state, int idx, bool is_final);  // _detect_one

  VadxOptions opts_;
  double speech_noise_thres_;
  int max_end_sil_thresh_ms_;

  // window detector
  std::vector<int> win_;
  int win_pos_ = 0;
  int win_total_ = 0;
  FrameState win_prev_ = kFrameSil;

  // tracker state
  int frm_cnt_ = 0;
  int buf_start_frame_ = 0;
  int latest_speech_frame_ = 0;
  int latest_silence_frame_ = -1;
  int continous_silence_ = 0;
  VadState state_ = kStartNotDetected;
  int confirmed_start_ = -1;
  int confirmed_end_ = -1;
  int n_ends_ = 0;
  double noise_avg_db_ = -100.0;
  std::vector<Segment> segments_;
  int seg_offset_ = 0;
  bool next_seg_ = true;
  bool max_time_out_ = false;

  // current chunk's scores/decibels (only the live chunk is ever indexed;
  // keeps memory O(chunk) instead of O(stream) — the Python tracker's
  // growing lists, minus the growth)
  std::vector<float> chunk_scores_;
  std::vector<float> chunk_db_;
  int chunk_base_ = 0;  // absolute frame index of chunk_scores_[0]
};

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_VADX_H_
