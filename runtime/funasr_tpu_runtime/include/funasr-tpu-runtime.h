/* funasr-tpu-runtime: C API for the native edge/server runtime.
 *
 * TPU-era counterpart of the reference C API (FunASR
 * runtime/onnxruntime/include/funasrruntime.h:60-120): the same handle-based
 * surface (init / infer-buffer / result accessors / uninit) over pure-C++
 * engines running `.ftr` weight exports. Name mapping for reference users
 * (the reference surface is C++ std::map-based; this one is plain C):
 *
 *   FunOfflineInit/FunTpassInit          -> FunASRInit(model_dir, threads)
 *   FunOfflineInferBuffer                -> FunOfflineInfer
 *   FunTpassOnlineInit                   -> FunASRStreamCreate
 *   FunTpassInferBuffer (online pass)    -> FunASRStreamInfer
 *   FsmnVad / FsmnVadOnline infer        -> FunVadInfer / FunVadStreamInfer
 *   CTTransformer AddPunc (offline/online) -> FunPuncInfer / FunPuncInferOnline
 *   FunOfflineUninit/FunTpassUninit      -> FunASRUninit / FunASRStreamFree
 */

#ifndef FUNASR_TPU_RUNTIME_H_
#define FUNASR_TPU_RUNTIME_H_

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef void* FUNASR_HANDLE;
typedef void* FUNASR_RESULT;

typedef enum {
  FUNASR_MODE_OFFLINE = 0,
  FUNASR_MODE_ONLINE = 1,
  FUNASR_MODE_2PASS = 2,
} FUNASR_MODE;

typedef enum {
  FUNASR_OK = 0,
  FUNASR_ERR_IO = 1,
  FUNASR_ERR_FORMAT = 2,
  FUNASR_ERR_BACKEND = 3,
  FUNASR_ERR_ARG = 4,
} FUNASR_STATUS;

/* Initialize an offline recognizer from an exported model directory
 * (export_manifest.json + *.stablehlo + config.yaml + tokens.txt + am.mvn). */
FUNASR_HANDLE FunASRInit(const char* model_dir, int thread_num);

/* Feature-only handle (DSP pipeline without a neural backend). */
FUNASR_HANDLE FunASRFrontendInit(const char* cmvn_file, int n_mels, int lfr_m,
                                 int lfr_n);

/* Offline inference over a whole audio buffer (16-bit PCM or wav bytes). */
FUNASR_RESULT FunOfflineInfer(FUNASR_HANDLE handle, const char* data,
                              int data_len, FUNASR_MODE mode,
                              int sampling_rate);

/* Run only the feature pipeline; returns a result holding fbank+LFR+CMVN
 * features (frames x dim float32). */
FUNASR_RESULT FunFrontendExtract(FUNASR_HANDLE handle, const char* data,
                                 int data_len, int sampling_rate);

/* VAD over a whole audio buffer: requires a model dir holding a vad.ftr
 * export (funasr_tpu.export_runtime.export_vad_ftr). The result's text is
 * the segment list as JSON "[[start_ms, end_ms], ...]"; the segment array
 * is also available via FunASRGetSegment*. */
FUNASR_RESULT FunVadInfer(FUNASR_HANDLE handle, const char* data, int data_len,
                          int sampling_rate);

/* Streaming VAD (fsmn-vad-online role): feed audio incrementally; each call
 * returns the NEW events as segments — [beg_ms, -1] when an utterance opens,
 * [-1, end_ms] when it closes (the reference streaming partial protocol).
 * is_final flushes and resets the stream. */
typedef void* FUNASR_VAD_STREAM;
FUNASR_VAD_STREAM FunVadStreamCreate(FUNASR_HANDLE handle);
FUNASR_RESULT FunVadStreamInfer(FUNASR_VAD_STREAM stream, const char* data,
                                int data_len, int is_final,
                                int sampling_rate);
void FunVadStreamFree(FUNASR_VAD_STREAM stream);

/* Punctuation restoration over a raw transcript: requires a model dir holding
 * a punc.ftr + punc_tokens.txt export
 * (funasr_tpu.export_runtime.export_punc_ftr). When present, FunOfflineInfer
 * also applies it to the ASR output automatically. */
FUNASR_RESULT FunPuncInfer(FUNASR_HANDLE handle, const char* text);

/* True streaming ASR (paraformer-online role): a stream carries the chunked
 * encoder/CIF/decoder caches; each FunASRStreamInfer call feeds PCM16 (or raw
 * float via WAV) and returns the NEW tokens decoded by the complete 600 ms
 * strides buffered so far. is_final flushes the tail and resets the stream.
 * The streaming engine is created eagerly in FunASRInit over the SAME
 * weights.ftr tensor arena as the offline engine (one copy in memory for
 * 2pass deployments; the reference ships separate online/offline ONNX graphs
 * and loads both). Streams from one handle share the engine and may be
 * created from concurrent threads; each stream itself is single-threaded. */
typedef void* FUNASR_STREAM;
FUNASR_STREAM FunASRStreamCreate(FUNASR_HANDLE handle);
FUNASR_RESULT FunASRStreamInfer(FUNASR_STREAM stream, const char* data,
                                int data_len, int is_final, int sampling_rate);
void FunASRStreamFree(FUNASR_STREAM stream);
/* 1 if the offline + streaming engines share one weights arena (diagnostic,
 * asserted by tests so the memory guarantee cannot silently regress). */
int FunASRSharedWeights(FUNASR_HANDLE handle);

/* Score-driven VADX state machine (the full endpoint machine of
 * funasr/models/fsmn_vad_streaming/model.py:825-1157, ported in vadx.h).
 * Drives the machine with raw per-frame (silence-score, decibel) pairs so
 * golden tests can byte-compare segmentation against the Python tracker.
 * config: "key=value;key=value" over the VADXOptions field names
 * (max_end_silence_time, window_size_ms, sil_to_speech_time_thres,
 * speech_to_sil_time_thres, max_single_segment_time, speech_noise_thres,
 * detect_mode, do_extend, lookback_time_start_point,
 * lookahead_time_end_point, max_start_silence_time); "" = defaults. */
typedef void* FUNASR_VADX;
FUNASR_VADX FunVadXCreate(const char* config);
/* Returns the new events as a JSON [[beg,end],...] string (FunASRGetResult);
 * streaming=1 emits [beg,-1]/[-1,end]/[beg,end] partials, 0 only complete
 * segments. */
FUNASR_RESULT FunVadXFeed(FUNASR_VADX handle, const float* sil_scores,
                          const float* decibels, int n, int is_final,
                          int streaming);
void FunVadXSetMaxEndSilThresh(FUNASR_VADX handle, int ms);
void FunVadXSetSpeechNoiseThres(FUNASR_VADX handle, float v);
void FunVadXReset(FUNASR_VADX handle);
void FunVadXFree(FUNASR_VADX handle);

/* ITN grammar archive (the FAR-consumer role): loads the JSON archive
 * exported by `funasr-tpu-data export_itn_grammar` and applies cardinal ITN
 * for the word-lexicon (de/es/fr/pt/ru/id/vi/tl) and CJK (zh/ja/ko)
 * languages. zh/en class grammars are natively embedded (itn.h). */
typedef void* FUNASR_ITN_GRAMMAR;
FUNASR_ITN_GRAMMAR FunItnGrammarLoad(const char* path);
FUNASR_RESULT FunItnGrammarApply(FUNASR_ITN_GRAMMAR grammar, const char* lang,
                                 const char* text);
void FunItnGrammarFree(FUNASR_ITN_GRAMMAR grammar);

/* Streaming punctuation (ct-transformer-online role): a cache carries the
 * unterminated sentence tail between calls; each call returns only the new
 * words, punctuated, with the trailing mark withheld for revision. Requires a
 * CTTransformerStreaming export (vad_encoder meta). */
typedef void* FUNASR_PUNC_CACHE;
FUNASR_PUNC_CACHE FunPuncCacheCreate();
void FunPuncCacheFree(FUNASR_PUNC_CACHE cache);
FUNASR_RESULT FunPuncInferOnline(FUNASR_HANDLE handle, const char* text,
                                 FUNASR_PUNC_CACHE cache);
int FunASRGetSegmentCount(FUNASR_RESULT result);
int FunASRGetSegmentStart(FUNASR_RESULT result, int index);
int FunASRGetSegmentEnd(FUNASR_RESULT result, int index);

const char* FunASRGetResult(FUNASR_RESULT result, int index);

/* BiCif per-token timestamps as JSON "[[start_ms, end_ms], ...]" — filled by
 * FunOfflineInfer when the weights.ftr carries the CifPredictorV3 upsample
 * head (export of a BiCifParaformer / SeacoParaformer); "" otherwise.
 * (reference funasrruntime.h FunASRGetStamp role) */
const char* FunASRGetStamp(FUNASR_RESULT result);
int FunASRGetRetNumber(FUNASR_RESULT result);
const float* FunASRGetFeatureData(FUNASR_RESULT result);
int FunASRGetFeatureFrames(FUNASR_RESULT result);
int FunASRGetFeatureDim(FUNASR_RESULT result);
void FunASRFreeResult(FUNASR_RESULT result);
void FunASRUninit(FUNASR_HANDLE handle);

const char* FunASRVersion(void);

/* Inverse text normalization (zh/en rules embedded; reference ITN runtime is
 * openfst FARs — runtime/onnxruntime/src/itn-processor.cpp). Returns a
 * malloc'd UTF-8 string; free with FunASRITNFree. */
char* FunASRITNNormalize(const char* text, const char* language);
void FunASRITNFree(char* s);

/* Hotword bias trie (reference CompileHotwordEmbedding counterpart; token-id
 * prefix trie with incremental boosts instead of openfst bias LM). Compile
 * from a space-separated hotword string + tokens file; Step advances the
 * decode-time state, accumulating the score delta. */
/* Offline inference with contextual hotword biasing: the greedy decode adds
 * the trie's incremental boosts to the logits (wfst-decoder/bias-lm role);
 * trie from FunASRHotwordCompile, shareable across calls/threads. */
FUNASR_RESULT FunOfflineInferHotword(FUNASR_HANDLE handle, const char* data,
                                     int data_len, FUNASR_MODE mode,
                                     int sampling_rate, void* hotword_trie);
/* Same, with a bias-LM beam search (beam > 1): hypotheses keep per-path trie
 * states and scores, so a hotword whose first char loses the local argmax can
 * still win on total path score — the reference wfst-decoder lattice role.
 * beam <= 1 is the bias-aware greedy decode of FunOfflineInferHotword. */
FUNASR_RESULT FunOfflineInferHotwordBeam(FUNASR_HANDLE handle,
                                         const char* data, int data_len,
                                         FUNASR_MODE mode, int sampling_rate,
                                         void* hotword_trie, int beam);
void* FunASRHotwordCompile(const char* hotwords, const char* tokens_file,
                           float boost);
int FunASRHotwordStep(void* trie, int state, int token, float* delta);
void FunASRHotwordFree(void* trie);
/* Pure bias-LM beam decode over NAR position logits (n_tok x vocab_size,
 * row-major float32): writes one chosen token id per position to out_ids
 * (length >= n_tok) and returns the count. Incomplete hotword prefixes give
 * back their pending boost at sentence end (bias-lm.cpp semantics). */
int FunASRBiasBeamDecode(const float* logits, int n_tok, int vocab_size,
                         void* trie, int beam, int blank, int sos, int eos,
                         int* out_ids);

#ifdef __cplusplus
}
#endif

#endif /* FUNASR_TPU_RUNTIME_H_ */
