// On-device speech recognition for iOS over the funasr_tpu native runtime.
//
// TPU-era counterpart of the reference iOS library (FunASR runtime/ios):
// the full pipeline — fbank/LFR/CMVN DSP, FTR int8/int4 Paraformer engines,
// FSMN-VAD, punctuation, ITN — runs inside the app process; no network.
//
// Build: ./build_xcframework.sh produces FunasrTpu.xcframework from the
// shared C++ runtime sources (runtime/funasr_tpu_runtime). The model
// directory ships in the app bundle (weights.ftr int4 recommended for
// install size, tokens.txt, am.mvn, optional vad.ftr/punc.ftr).

#import <Foundation/Foundation.h>

NS_ASSUME_NONNULL_BEGIN

/// A streaming decode session (600 ms chunked paraformer-online role).
/// Not thread-safe: feed from one audio queue.
@interface FunasrTpuStream : NSObject
/// Feeds PCM16 mono samples; returns the NEW tokens decoded from the
/// complete 600 ms strides buffered so far (empty while accumulating).
/// isFinal flushes the tail and resets the session.
- (NSString *)feedSamples:(const int16_t *)samples
                    count:(NSUInteger)count
                  isFinal:(BOOL)isFinal
               sampleRate:(int)sampleRate;
@end

@interface FunasrTpuRecognizer : NSObject

/// Loads a recognizer from an exported native model directory
/// (funasr-tpu-export --runtime native). Returns nil on failure.
+ (nullable instancetype)recognizerWithModelDir:(NSString *)modelDir
                                        threads:(int)threads;

/// Offline transcription of a whole utterance (PCM16 mono).
- (NSString *)recognizeSamples:(const int16_t *)samples
                         count:(NSUInteger)count
                    sampleRate:(int)sampleRate;

/// VAD segments as [start_ms, end_ms] pairs (NSNumber arrays).
- (NSArray<NSArray<NSNumber *> *> *)detectVoiceSamples:(const int16_t *)samples
                                                 count:(NSUInteger)count
                                            sampleRate:(int)sampleRate;

/// Opens a streaming session sharing this recognizer's weights arena.
- (nullable FunasrTpuStream *)openStream;

@end

NS_ASSUME_NONNULL_END
