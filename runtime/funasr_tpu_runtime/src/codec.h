// Compressed-audio decode (mp3/flac/ogg/mp4/opus/...) via libav*, mono float32
// at target_rate. See codec.cc for the C API exported to Python.

#ifndef FUNASR_TPU_CODEC_H_
#define FUNASR_TPU_CODEC_H_

#include <cstdint>
#include <vector>

namespace funasr_tpu {

bool DecodeCompressedAudio(const uint8_t* data, int64_t len, int target_rate,
                           std::vector<float>* out);

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_CODEC_H_
