// Pure-C++ streaming Paraformer engine (counterpart of FunASR
// runtime/onnxruntime/src/paraformer-online.cpp): true chunked low-latency
// decode with carried state — streaming fbank/LFR caches, chunk-overlap
// feature carry with streaming positional encoding, per-layer attention kv
// caches with look-back trimming, CIF integrate/frame carry, and decoder FSMN
// rolling caches. Mirrors funasr_tpu/models/paraformer_streaming/model.py
// (generate_chunk/inference) + scama/encoder.py forward_chunk +
// frontends/wav_frontend.py WavFrontendOnline over the same weights.ftr
// export the offline engine loads.

#ifndef FUNASR_TPU_STREAMING_ENGINE_H_
#define FUNASR_TPU_STREAMING_ENGINE_H_

#include <memory>
#include <string>
#include <vector>

#include "fbank.h"
#include "ftr.h"
#include "vocab.h"

namespace funasr_tpu {

struct KvCache {
  std::vector<float> k, v;  // row-major (t, d)
  int t = 0;
  bool init = false;
};

// Per-stream state (model.py init_cache + WavFrontendOnline.init_cache).
struct StreamSession {
  // raw sample buffer not yet consumed into strides (model.py prev_samples)
  std::vector<float> prev_samples;
  // frontend caches
  std::vector<float> wave_buf;       // samples not fully framed yet
  std::vector<float> lfr_ctx;        // raw fbank frames kept as LFR context
  int lfr_ctx_rows = 0;
  int64_t raw_frames = 0;            // raw fbank frames emitted so far
  int64_t lfr_out = 0;               // LFR frames emitted so far
  // encoder caches
  int start_idx = 0;
  std::vector<float> feats_carry;    // post-PE rows carried between chunks
  int carry_rows = 0;
  std::vector<KvCache> enc_kv;       // per encoder layer (look_back > 0)
  bool tail_chunk = false;
  // CIF carry
  float integrate = 0.0f;
  std::vector<float> frame;
  // decoder caches
  std::vector<std::vector<float>> dec_fsmn;  // per self layer, (k-1, d)
  std::vector<KvCache> dec_kv;               // per cross-attn layer
};

class StreamingEngine {
 public:
  // model_dir: same layout as the offline engine (weights.ftr + tokens.txt
  // + am.mvn). Chunk config from meta (chunk_pad_left/chunk_stride/
  // chunk_lookahead, encoder_chunk_look_back, decoder_chunk_look_back),
  // defaulting to [0, 10, 5] / 0 / 0 (model.py init_cache defaults).
  bool Load(const std::string& model_dir);
  // Share an already-loaded weights.ftr arena with the offline engine
  // (halves 2pass-server model memory vs each engine loading its own copy).
  bool Load(std::shared_ptr<const FtrFile> ftr, const std::string& model_dir);
  const FtrFile* arena() const { return ftr_.get(); }
  bool loaded() const { return loaded_; }

  std::unique_ptr<StreamSession> NewSession() const;

  // Feed float mono 16 kHz samples; returns the NEW tokens decoded by the
  // complete strides in the buffer (model.py inference stride loop).
  // is_final flushes the tail and resets the session for reuse.
  std::string Accept(StreamSession* sess, const float* samples, int n,
                     bool is_final) const;

 private:
  // one 600 ms stride: frontend -> encoder chunk -> CIF -> decoder chunk
  std::string ProcessStride(StreamSession* sess, const float* chunk, int n,
                            bool is_final) const;
  // streaming fbank+LFR+CMVN; returns LFR rows ((*t) x input_size_)
  std::vector<float> FrontendChunk(StreamSession* sess, const float* chunk,
                                   int n, bool is_final, int* t) const;
  std::vector<float> EncodeChunk(StreamSession* sess,
                                 const std::vector<float>& feats, int t,
                                 int* t_out) const;
  void EncChunkLayer(const std::string& prefix, std::vector<float>* x, int t,
                     int in_feat, KvCache* cache) const;
  void SelfAttentionChunk(const std::string& prefix,
                          const std::vector<float>& x, int t, int in_feat,
                          KvCache* cache, std::vector<float>* out) const;
  // fired acoustic embeds for this chunk ((n, d); n may be 0)
  int CifChunk(StreamSession* sess, const std::vector<float>& enc, int t,
               bool is_final, std::vector<float>* embeds) const;
  std::vector<float> DecodeChunk(StreamSession* sess,
                                 const std::vector<float>& memory, int t_mem,
                                 const std::vector<float>& embeds,
                                 int n_tok) const;
  void CrossAttentionChunk(const std::string& prefix,
                           const std::vector<float>& x, int n_tok,
                           const std::vector<float>& memory, int t_mem,
                           KvCache* cache, std::vector<float>* out) const;
  void ResetSession(StreamSession* sess) const;

  const WTensor& W(const std::string& name) const;

  std::shared_ptr<const FtrFile> ftr_;
  Vocab vocab_;
  std::unique_ptr<Fbank> fbank_;
  Cmvn cmvn_;
  bool has_cmvn_ = false;
  bool loaded_ = false;
  // dims (same meta as the offline engine)
  int input_size_ = 560, d_ = 512, heads_ = 4, ffn_ = 2048, blocks_ = 50;
  int kernel_ = 11, shift_ = 0;
  int dec_heads_ = 16, dec_ffn_ = 2048, dec_blocks_ = 16, dec_att_ = 16;
  int dec_kernel_ = 11;
  int vocab_size_ = 0, blank_ = 0, sos_ = 1, eos_ = 2;
  int l_order_ = 1, r_order_ = 1;
  int lfr_m_ = 7, lfr_n_ = 6, n_mels_ = 80;
  float tail_threshold_ = 0.45f, smooth_factor_ = 1.0f, noise_threshold_ = 0.0f;
  // streaming config
  int pad_left_ = 0, stride_ = 10, lookahead_ = 5;
  int enc_look_back_ = 0, dec_look_back_ = 0;
  int frame_length_ = 400, frame_shift_ = 160;
};

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_STREAMING_ENGINE_H_
