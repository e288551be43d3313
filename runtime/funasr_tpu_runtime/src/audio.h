// Audio decode (RIFF/WAV, raw PCM16) + linear resampler.
// Counterpart of the reference runtime audio front (FunASR
// runtime/onnxruntime/src/audio.cpp, resample.cpp) without ffmpeg.

#ifndef FUNASR_TPU_AUDIO_H_
#define FUNASR_TPU_AUDIO_H_

#include <cstdint>
#include <vector>

namespace funasr_tpu {

// Parse wav bytes or raw PCM16 into float32 [-1, 1) mono at `sample_rate_out`.
// Returns false on malformed input.
bool DecodeAudio(const char* data, int len, int assumed_rate,
                 int sample_rate_out, std::vector<float>* out);

// Linear-interpolation resampler.
std::vector<float> Resample(const std::vector<float>& x, int from_rate,
                            int to_rate);

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_AUDIO_H_
