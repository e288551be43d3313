#include "audio.h"

#include <cstring>

namespace funasr_tpu {

namespace {

uint32_t ReadU32(const char* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

uint16_t ReadU16(const char* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

bool ParseWav(const char* data, int len, std::vector<float>* out, int* rate) {
  if (len < 44 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0) {
    return false;
  }
  int pos = 12;
  int channels = 1, bits = 16, fmt = 1;
  const char* pcm = nullptr;
  uint32_t pcm_len = 0;
  while (pos + 8 <= len) {
    const char* cid = data + pos;
    const uint32_t size = ReadU32(data + pos + 4);
    const char* body = data + pos + 8;
    if (pos + 8 + static_cast<int>(size) > len) break;
    if (std::memcmp(cid, "fmt ", 4) == 0 && size >= 16) {
      fmt = ReadU16(body);
      channels = ReadU16(body + 2);
      *rate = static_cast<int>(ReadU32(body + 4));
      bits = ReadU16(body + 14);
    } else if (std::memcmp(cid, "data", 4) == 0) {
      pcm = body;
      pcm_len = size;
    }
    pos += 8 + static_cast<int>(size) + (size & 1);
  }
  if (pcm == nullptr) return false;
  const int bytes = bits / 8;
  const int frames = static_cast<int>(pcm_len) / (bytes * channels);
  out->resize(frames);
  for (int i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const char* s = pcm + (static_cast<size_t>(i) * channels + c) * bytes;
      double v = 0.0;
      if (fmt == 3 && bits == 32) {  // float32
        float fv;
        std::memcpy(&fv, s, 4);
        v = fv;
      } else if (bits == 16) {
        int16_t iv;
        std::memcpy(&iv, s, 2);
        v = iv / 32768.0;
      } else if (bits == 32) {
        int32_t iv;
        std::memcpy(&iv, s, 4);
        v = iv / 2147483648.0;
      } else if (bits == 8) {
        v = (static_cast<unsigned char>(*s) - 128) / 128.0;
      }
      acc += v;
    }
    (*out)[i] = static_cast<float>(acc / channels);
  }
  return true;
}

}  // namespace

std::vector<float> Resample(const std::vector<float>& x, int from_rate,
                            int to_rate) {
  if (from_rate == to_rate || x.empty()) return x;
  const double ratio = static_cast<double>(from_rate) / to_rate;
  const int n_out = static_cast<int>(x.size() / ratio);
  std::vector<float> out(n_out);
  for (int i = 0; i < n_out; ++i) {
    const double src = i * ratio;
    const int i0 = static_cast<int>(src);
    const int i1 = std::min(i0 + 1, static_cast<int>(x.size()) - 1);
    const double frac = src - i0;
    out[i] = static_cast<float>(x[i0] * (1.0 - frac) + x[i1] * frac);
  }
  return out;
}

bool DecodeAudio(const char* data, int len, int assumed_rate,
                 int sample_rate_out, std::vector<float>* out) {
  int rate = assumed_rate;
  std::vector<float> wav;
  if (len >= 12 && std::memcmp(data, "RIFF", 4) == 0) {
    if (!ParseWav(data, len, &wav, &rate)) return false;
  } else {  // raw PCM16
    const int frames = len / 2;
    wav.resize(frames);
    for (int i = 0; i < frames; ++i) {
      int16_t v;
      std::memcpy(&v, data + 2 * i, 2);
      wav[i] = v / 32768.0f;
    }
  }
  *out = Resample(wav, rate, sample_rate_out);
  return true;
}

}  // namespace funasr_tpu
