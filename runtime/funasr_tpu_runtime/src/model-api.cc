// Handle-based C API implementation (counterpart of FunASR
// runtime/onnxruntime/src/funasrruntime.cpp).
//
// Backends:
//  - DSP path (always available): audio decode -> fbank -> LFR -> CMVN; results
//    carry the feature tensor (this is the feature_extractor stage of the
//    reference's Triton BLS pipeline, runtime/triton_gpu/.../feature_extractor).
//  - Native neural path: when the model dir holds a weights.ftr export
//    (funasr_tpu.export_runtime.export_ftr), ParaformerEngine runs the full
//    SANM encoder -> CIF -> decoder in pure C++ (fp32 or weight-only int8) —
//    the role of the reference's onnxruntime/ggml engines
//    (runtime/onnxruntime/src/paraformer.cpp:428).

#include <memory>
#include <utility>
#include <string>
#include <vector>

#include "../include/funasr-tpu-runtime.h"
#include "audio.h"
#include "fbank.h"
#include "hotword.h"
#include "itn-grammar.h"
#include "paraformer-engine.h"
#include "vadx.h"
#include "punc-engine.h"
#include "sensevoice-engine.h"
#include "streaming-engine.h"
#include "vad-engine.h"
#include "vocab.h"

namespace {

using funasr_tpu::Cmvn;
using funasr_tpu::Fbank;
using funasr_tpu::FbankOptions;
using funasr_tpu::FsmnVadEngine;
using funasr_tpu::ParaformerEngine;
using funasr_tpu::PuncEngine;
using funasr_tpu::SenseVoiceEngine;
using funasr_tpu::StreamingEngine;
using funasr_tpu::StreamSession;
using funasr_tpu::Vocab;

struct Handle {
  std::unique_ptr<Fbank> fbank;
  Cmvn cmvn;
  bool has_cmvn = false;
  int lfr_m = 7;
  int lfr_n = 6;
  int n_mels = 80;
  Vocab vocab;
  bool has_vocab = false;
  std::string model_dir;
  std::unique_ptr<ParaformerEngine> engine;
  std::unique_ptr<SenseVoiceEngine> sv;
  std::unique_ptr<FsmnVadEngine> vad;
  std::unique_ptr<PuncEngine> punc;
  // Loaded eagerly in FunASRInit over the SAME FtrFile arena as the offline
  // engine (one weights.ftr in memory for 2pass; no lazy-init data race when
  // FunASRStreamCreate is called from concurrent connection threads).
  std::unique_ptr<StreamingEngine> stream_engine;
};

struct Stream {
  StreamingEngine* engine;
  std::unique_ptr<StreamSession> sess;
};

struct Result {
  std::vector<std::string> texts;
  std::vector<float> features;  // frames x dim
  int frames = 0;
  int dim = 0;
  std::vector<std::pair<int, int>> segments;  // VAD (start_ms, end_ms)
  std::string stamp;  // BiCif per-token [start_ms, end_ms] JSON
};

}  // namespace

extern "C" {

FUNASR_HANDLE FunASRInit(const char* model_dir, int /*thread_num*/) {
  auto* h = new Handle();
  h->model_dir = model_dir ? model_dir : "";
  if (!h->model_dir.empty()) {
    h->has_cmvn = h->cmvn.Load(h->model_dir + "/am.mvn");
    h->has_vocab = h->vocab.Load(h->model_dir + "/tokens.txt");
    // one weights.ftr read, shared (read-only) by every engine built from it
    auto ftr = std::make_shared<funasr_tpu::FtrFile>();
    const bool has_ftr = ftr->Load(h->model_dir + "/weights.ftr");
    auto engine = std::make_unique<ParaformerEngine>();
    if (has_ftr && engine->Load(ftr, h->model_dir)) {
      h->lfr_m = engine->lfr_m();
      h->lfr_n = engine->lfr_n();
      h->n_mels = engine->n_mels();
      h->engine = std::move(engine);
      auto stream = std::make_unique<StreamingEngine>();
      if (stream->Load(ftr, h->model_dir)) h->stream_engine = std::move(stream);
    } else if (has_ftr) {
      auto sv = std::make_unique<SenseVoiceEngine>();
      if (sv->Load(ftr, h->model_dir)) {
        h->lfr_m = sv->lfr_m();
        h->lfr_n = sv->lfr_n();
        h->n_mels = sv->n_mels();
        h->sv = std::move(sv);
      }
    }
    auto vad = std::make_unique<FsmnVadEngine>();
    if (vad->Load(h->model_dir)) {
      if (h->engine == nullptr) {
        h->lfr_m = vad->lfr_m();
        h->lfr_n = vad->lfr_n();
        h->n_mels = vad->n_mels();
      }
      h->vad = std::move(vad);
    }
    auto punc = std::make_unique<PuncEngine>();
    if (punc->Load(h->model_dir)) h->punc = std::move(punc);
  }
  FbankOptions opts;
  opts.n_mels = h->n_mels;
  h->fbank = std::make_unique<Fbank>(opts);
  return h;
}

FUNASR_HANDLE FunASRFrontendInit(const char* cmvn_file, int n_mels, int lfr_m,
                                 int lfr_n) {
  auto* h = new Handle();
  FbankOptions opts;
  opts.n_mels = n_mels;
  h->n_mels = n_mels;
  h->lfr_m = lfr_m;
  h->lfr_n = lfr_n;
  h->fbank = std::make_unique<Fbank>(opts);
  if (cmvn_file != nullptr && cmvn_file[0] != '\0') {
    h->has_cmvn = h->cmvn.Load(cmvn_file);
  }
  return h;
}

FUNASR_RESULT FunFrontendExtract(FUNASR_HANDLE handle, const char* data,
                                 int data_len, int sampling_rate) {
  auto* h = static_cast<Handle*>(handle);
  if (h == nullptr || data == nullptr || data_len <= 0) return nullptr;
  std::vector<float> wav;
  if (!funasr_tpu::DecodeAudio(data, data_len, sampling_rate, 16000, &wav)) {
    return nullptr;
  }
  for (float& v : wav) v *= 32768.0f;  // kaldi scaling (wav_frontend.py:169)
  int t = 0;
  std::vector<float> feats = h->fbank->Compute(wav, &t);
  int t_lfr = t;
  if (h->lfr_m != 1 || h->lfr_n != 1) {
    feats = funasr_tpu::ApplyLfr(feats, t, h->n_mels, h->lfr_m, h->lfr_n, &t_lfr);
  }
  if (h->has_cmvn) h->cmvn.Apply(&feats);
  auto* r = new Result();
  r->features = std::move(feats);
  r->frames = t_lfr;
  r->dim = h->n_mels * h->lfr_m;
  return r;
}

FUNASR_RESULT FunOfflineInferHotwordBeam(FUNASR_HANDLE handle,
                                         const char* data, int data_len,
                                         FUNASR_MODE /*mode*/,
                                         int sampling_rate, void* hotword_trie,
                                         int beam) {
  auto* h = static_cast<Handle*>(handle);
  auto* r = static_cast<Result*>(
      FunFrontendExtract(handle, data, data_len, sampling_rate));
  if (r == nullptr) return nullptr;
  if (h != nullptr && (h->engine != nullptr || h->sv != nullptr)) {
    std::string text =
        h->engine != nullptr
            ? h->engine->Infer(
                  r->features, r->frames, &r->stamp,
                  static_cast<funasr_tpu::HotwordTrie*>(hotword_trie), beam)
            : h->sv->Infer(r->features, r->frames);
    // restore punctuation when a punc.ftr sits in the model dir (the
    // reference offline-stream pipeline: ASR -> CT-Transformer punc)
    if (h->punc != nullptr && !text.empty()) text = h->punc->AddPunc(text);
    r->texts.push_back(text);
  } else {
    r->texts.push_back("");  // DSP-only handle: no weights.ftr in model dir
  }
  return r;
}

FUNASR_RESULT FunOfflineInferHotword(FUNASR_HANDLE handle, const char* data,
                                     int data_len, FUNASR_MODE mode,
                                     int sampling_rate, void* hotword_trie) {
  return FunOfflineInferHotwordBeam(handle, data, data_len, mode,
                                    sampling_rate, hotword_trie, 1);
}

FUNASR_RESULT FunOfflineInfer(FUNASR_HANDLE handle, const char* data,
                              int data_len, FUNASR_MODE mode,
                              int sampling_rate) {
  return FunOfflineInferHotword(handle, data, data_len, mode, sampling_rate,
                                nullptr);
}

FUNASR_RESULT FunPuncInfer(FUNASR_HANDLE handle, const char* text) {
  auto* h = static_cast<Handle*>(handle);
  if (h == nullptr || h->punc == nullptr || text == nullptr) return nullptr;
  auto* r = new Result();
  r->texts.push_back(h->punc->AddPunc(text));
  return r;
}

FUNASR_STREAM FunASRStreamCreate(FUNASR_HANDLE handle) {
  auto* h = static_cast<Handle*>(handle);
  // stream_engine is created eagerly in FunASRInit (immutable afterwards), so
  // concurrent per-connection threads only ever read it here.
  if (h == nullptr || h->stream_engine == nullptr) return nullptr;
  auto* s = new Stream();
  s->engine = h->stream_engine.get();
  s->sess = s->engine->NewSession();
  return s;
}

FUNASR_RESULT FunASRStreamInfer(FUNASR_STREAM stream, const char* data,
                                int data_len, int is_final,
                                int sampling_rate) {
  auto* s = static_cast<Stream*>(stream);
  if (s == nullptr) return nullptr;
  std::vector<float> wav;
  if (data != nullptr && data_len > 0) {
    if (!funasr_tpu::DecodeAudio(data, data_len, sampling_rate, 16000, &wav)) {
      return nullptr;
    }
  }
  auto* r = new Result();
  r->texts.push_back(s->engine->Accept(s->sess.get(), wav.data(),
                                       static_cast<int>(wav.size()),
                                       is_final != 0));
  return r;
}

void FunASRStreamFree(FUNASR_STREAM stream) {
  delete static_cast<Stream*>(stream);
}

int FunASRSharedWeights(FUNASR_HANDLE handle) {
  auto* h = static_cast<Handle*>(handle);
  return h != nullptr && h->engine != nullptr && h->stream_engine != nullptr &&
         h->engine->arena() == h->stream_engine->arena();
}

FUNASR_VADX FunVadXCreate(const char* config) {
  funasr_tpu::VadxOptions o;
  std::string cfg = config ? config : "";
  size_t pos = 0;
  while (pos < cfg.size()) {
    size_t sep = cfg.find(';', pos);
    if (sep == std::string::npos) sep = cfg.size();
    const std::string kv = cfg.substr(pos, sep - pos);
    pos = sep + 1;
    const size_t eq = kv.find('=');
    if (eq == std::string::npos) continue;
    const std::string k = kv.substr(0, eq);
    const double v = std::atof(kv.substr(eq + 1).c_str());
    if (k == "max_end_silence_time") o.max_end_silence_time = (int)v;
    else if (k == "max_start_silence_time") o.max_start_silence_time = (int)v;
    else if (k == "window_size_ms") o.window_size_ms = (int)v;
    else if (k == "sil_to_speech_time_thres") o.sil_to_speech_time_thres = (int)v;
    else if (k == "speech_to_sil_time_thres") o.speech_to_sil_time_thres = (int)v;
    else if (k == "speech_2_noise_ratio") o.speech_2_noise_ratio = v;
    else if (k == "do_extend") o.do_extend = (int)v;
    else if (k == "lookback_time_start_point") o.lookback_time_start_point = (int)v;
    else if (k == "lookahead_time_end_point") o.lookahead_time_end_point = (int)v;
    else if (k == "max_single_segment_time") o.max_single_segment_time = (int)v;
    else if (k == "speech_noise_thres") o.speech_noise_thres = v;
    else if (k == "detect_mode") o.detect_mode = (int)v;
    else if (k == "decibel_thres") o.decibel_thres = v;
    else if (k == "snr_thres") o.snr_thres = v;
  }
  return new funasr_tpu::VadStateMachine(o);
}

FUNASR_RESULT FunVadXFeed(FUNASR_VADX handle, const float* sil_scores,
                          const float* decibels, int n, int is_final,
                          int streaming) {
  auto* m = static_cast<funasr_tpu::VadStateMachine*>(handle);
  if (m == nullptr) return nullptr;
  auto* r = new Result();
  r->segments = m->Feed(sil_scores, decibels, n, is_final != 0,
                        streaming != 0);
  std::string json = "[";
  for (size_t i = 0; i < r->segments.size(); ++i) {
    if (i) json += ",";
    json += "[" + std::to_string(r->segments[i].first) + "," +
            std::to_string(r->segments[i].second) + "]";
  }
  json += "]";
  r->texts.push_back(json);
  return r;
}

void FunVadXSetMaxEndSilThresh(FUNASR_VADX handle, int ms) {
  auto* m = static_cast<funasr_tpu::VadStateMachine*>(handle);
  if (m != nullptr) m->set_max_end_sil_thresh_ms(ms);
}

void FunVadXSetSpeechNoiseThres(FUNASR_VADX handle, float v) {
  auto* m = static_cast<funasr_tpu::VadStateMachine*>(handle);
  if (m != nullptr) m->set_speech_noise_thres(v);
}

void FunVadXReset(FUNASR_VADX handle) {
  auto* m = static_cast<funasr_tpu::VadStateMachine*>(handle);
  if (m != nullptr) m->Reset();
}

void FunVadXFree(FUNASR_VADX handle) {
  delete static_cast<funasr_tpu::VadStateMachine*>(handle);
}

FUNASR_ITN_GRAMMAR FunItnGrammarLoad(const char* path) {
  if (path == nullptr) return nullptr;
  auto* g = new funasr_tpu::ItnGrammar();
  if (!g->Load(path)) {
    delete g;
    return nullptr;
  }
  return g;
}

FUNASR_RESULT FunItnGrammarApply(FUNASR_ITN_GRAMMAR grammar, const char* lang,
                                 const char* text) {
  auto* g = static_cast<funasr_tpu::ItnGrammar*>(grammar);
  if (g == nullptr || lang == nullptr || text == nullptr) return nullptr;
  auto* r = new Result();
  r->texts.push_back(g->Apply(lang, text));
  return r;
}

void FunItnGrammarFree(FUNASR_ITN_GRAMMAR grammar) {
  delete static_cast<funasr_tpu::ItnGrammar*>(grammar);
}

FUNASR_PUNC_CACHE FunPuncCacheCreate() { return new funasr_tpu::PuncCache(); }

void FunPuncCacheFree(FUNASR_PUNC_CACHE cache) {
  delete static_cast<funasr_tpu::PuncCache*>(cache);
}

FUNASR_RESULT FunPuncInferOnline(FUNASR_HANDLE handle, const char* text,
                                 FUNASR_PUNC_CACHE cache) {
  auto* h = static_cast<Handle*>(handle);
  if (h == nullptr || h->punc == nullptr || text == nullptr ||
      cache == nullptr) {
    return nullptr;
  }
  auto* r = new Result();
  r->texts.push_back(h->punc->AddPuncStreaming(
      text, static_cast<funasr_tpu::PuncCache*>(cache)));
  return r;
}

FUNASR_RESULT FunVadInfer(FUNASR_HANDLE handle, const char* data,
                          int data_len, int sampling_rate) {
  auto* h = static_cast<Handle*>(handle);
  if (h == nullptr || h->vad == nullptr || data == nullptr) return nullptr;
  std::vector<float> wav;
  if (!funasr_tpu::DecodeAudio(data, data_len, sampling_rate, 16000, &wav)) {
    return nullptr;
  }
  auto* r = new Result();
  std::vector<float> sil_scores;
  r->segments = h->vad->Segments(wav, &sil_scores);
  r->frames = static_cast<int>(sil_scores.size());
  r->dim = 1;
  r->features = std::move(sil_scores);
  std::string json = "[";
  for (size_t i = 0; i < r->segments.size(); ++i) {
    if (i) json += ",";
    json += "[" + std::to_string(r->segments[i].first) + "," +
            std::to_string(r->segments[i].second) + "]";
  }
  json += "]";
  r->texts.push_back(json);
  return r;
}

FUNASR_VAD_STREAM FunVadStreamCreate(FUNASR_HANDLE handle) {
  auto* h = static_cast<Handle*>(handle);
  if (h == nullptr || h->vad == nullptr) return nullptr;
  return new funasr_tpu::FsmnVadStream(h->vad.get());
}

FUNASR_RESULT FunVadStreamInfer(FUNASR_VAD_STREAM stream, const char* data,
                                int data_len, int is_final,
                                int sampling_rate) {
  auto* s = static_cast<funasr_tpu::FsmnVadStream*>(stream);
  if (s == nullptr) return nullptr;
  std::vector<float> wav;
  if (data != nullptr && data_len > 0) {
    if (!funasr_tpu::DecodeAudio(data, data_len, sampling_rate, 16000, &wav)) {
      return nullptr;
    }
  }
  auto* r = new Result();
  r->segments = s->Accept(wav.data(), static_cast<int>(wav.size()),
                          is_final != 0);
  std::string json = "[";
  for (size_t i = 0; i < r->segments.size(); ++i) {
    if (i) json += ",";
    json += "[" + std::to_string(r->segments[i].first) + "," +
            std::to_string(r->segments[i].second) + "]";
  }
  json += "]";
  r->texts.push_back(json);
  return r;
}

void FunVadStreamFree(FUNASR_VAD_STREAM stream) {
  delete static_cast<funasr_tpu::FsmnVadStream*>(stream);
}

const char* FunASRGetStamp(FUNASR_RESULT result) {
  auto* r = static_cast<Result*>(result);
  return r == nullptr ? "" : r->stamp.c_str();
}

int FunASRGetSegmentCount(FUNASR_RESULT result) {
  auto* r = static_cast<Result*>(result);
  return r == nullptr ? 0 : static_cast<int>(r->segments.size());
}

int FunASRGetSegmentStart(FUNASR_RESULT result, int index) {
  auto* r = static_cast<Result*>(result);
  if (r == nullptr || index < 0 ||
      index >= static_cast<int>(r->segments.size())) {
    return -1;
  }
  return r->segments[index].first;
}

int FunASRGetSegmentEnd(FUNASR_RESULT result, int index) {
  auto* r = static_cast<Result*>(result);
  if (r == nullptr || index < 0 ||
      index >= static_cast<int>(r->segments.size())) {
    return -1;
  }
  return r->segments[index].second;
}

const char* FunASRGetResult(FUNASR_RESULT result, int index) {
  auto* r = static_cast<Result*>(result);
  if (r == nullptr || index < 0 ||
      index >= static_cast<int>(r->texts.size())) {
    return nullptr;
  }
  return r->texts[index].c_str();
}

int FunASRGetRetNumber(FUNASR_RESULT result) {
  auto* r = static_cast<Result*>(result);
  return r == nullptr ? 0 : static_cast<int>(r->texts.size());
}

const float* FunASRGetFeatureData(FUNASR_RESULT result) {
  auto* r = static_cast<Result*>(result);
  return r == nullptr ? nullptr : r->features.data();
}

int FunASRGetFeatureFrames(FUNASR_RESULT result) {
  auto* r = static_cast<Result*>(result);
  return r == nullptr ? 0 : r->frames;
}

int FunASRGetFeatureDim(FUNASR_RESULT result) {
  auto* r = static_cast<Result*>(result);
  return r == nullptr ? 0 : r->dim;
}

void FunASRFreeResult(FUNASR_RESULT result) {
  delete static_cast<Result*>(result);
}

void FunASRUninit(FUNASR_HANDLE handle) { delete static_cast<Handle*>(handle); }

const char* FunASRVersion(void) { return "funasr-tpu-runtime 0.1.0"; }

}  // extern "C"
