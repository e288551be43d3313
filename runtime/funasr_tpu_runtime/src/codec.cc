// Compressed-audio decode via libavformat/libavcodec (mp3/flac/ogg/mp4/webm/
// opus...), the native-runtime counterpart of the reference's torchaudio/ffmpeg
// fallback chain (FunASR funasr/utils/load_utils.py:48,272-306 and
// runtime/onnxruntime/src/audio.cpp ffmpeg hooks). Output: mono float32 at the
// requested rate (swresample).

#include "codec.h"

#include <cstring>
#include <vector>

#ifdef FUNASR_TPU_HAVE_FFMPEG
extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/mem.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

namespace funasr_tpu {
namespace {

struct BytesReader {
  const uint8_t* data;
  int64_t size;
  int64_t pos;
};

int ReadPacket(void* opaque, uint8_t* buf, int buf_size) {
  BytesReader* r = static_cast<BytesReader*>(opaque);
  int64_t remain = r->size - r->pos;
  if (remain <= 0) return AVERROR_EOF;
  int n = static_cast<int>(remain < buf_size ? remain : buf_size);
  std::memcpy(buf, r->data + r->pos, n);
  r->pos += n;
  return n;
}

int64_t Seek(void* opaque, int64_t offset, int whence) {
  BytesReader* r = static_cast<BytesReader*>(opaque);
  if (whence == AVSEEK_SIZE) return r->size;
  int64_t base = (whence == SEEK_SET) ? 0 : (whence == SEEK_CUR) ? r->pos : r->size;
  int64_t target = base + offset;
  if (target < 0 || target > r->size) return AVERROR(EINVAL);
  r->pos = target;
  return target;
}

}  // namespace

bool DecodeCompressedAudio(const uint8_t* data, int64_t len, int target_rate,
                           std::vector<float>* out) {
  av_log_set_level(AV_LOG_ERROR);
  out->clear();
  constexpr int kBufSize = 1 << 15;
  BytesReader reader{data, len, 0};
  uint8_t* avio_buf = static_cast<uint8_t*>(av_malloc(kBufSize));
  if (!avio_buf) return false;
  AVIOContext* avio = avio_alloc_context(avio_buf, kBufSize, 0, &reader,
                                         ReadPacket, nullptr, Seek);
  if (!avio) {
    av_free(avio_buf);
    return false;
  }
  AVFormatContext* fmt = avformat_alloc_context();
  fmt->pb = avio;
  bool ok = false;
  AVCodecContext* cc = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int stream_idx = -1;

  do {
    if (avformat_open_input(&fmt, nullptr, nullptr, nullptr) < 0) {
      fmt = nullptr;  // freed by open_input on failure
      break;
    }
    if (avformat_find_stream_info(fmt, nullptr) < 0) break;
    const AVCodec* codec = nullptr;
    stream_idx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
    if (stream_idx < 0 || !codec) break;
    cc = avcodec_alloc_context3(codec);
    if (!cc) break;
    if (avcodec_parameters_to_context(cc, fmt->streams[stream_idx]->codecpar) < 0)
      break;
    if (avcodec_open2(cc, codec, nullptr) < 0) break;

    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    AVChannelLayout in_layout;
    if (cc->ch_layout.nb_channels > 0) {
      av_channel_layout_copy(&in_layout, &cc->ch_layout);
    } else {
      av_channel_layout_default(&in_layout, 1);
    }
    if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, target_rate,
                            &in_layout, cc->sample_fmt, cc->sample_rate,
                            0, nullptr) < 0)
      break;
    av_channel_layout_uninit(&in_layout);
    if (swr_init(swr) < 0) break;

    pkt = av_packet_alloc();
    frame = av_frame_alloc();
    std::vector<float> buf;
    auto drain = [&](const AVFrame* f) {
      int max_out = swr_get_out_samples(swr, f ? f->nb_samples : 0);
      if (max_out <= 0) return;
      buf.resize(max_out);
      uint8_t* outp = reinterpret_cast<uint8_t*>(buf.data());
      int n = swr_convert(swr, &outp, max_out,
                          f ? const_cast<const uint8_t**>(f->extended_data)
                            : nullptr,
                          f ? f->nb_samples : 0);
      if (n > 0) out->insert(out->end(), buf.begin(), buf.begin() + n);
    };

    int rc;
    while ((rc = av_read_frame(fmt, pkt)) >= 0) {
      if (pkt->stream_index == stream_idx &&
          avcodec_send_packet(cc, pkt) >= 0) {
        while (avcodec_receive_frame(cc, frame) >= 0) drain(frame);
      }
      av_packet_unref(pkt);
    }
    // flush decoder + resampler
    avcodec_send_packet(cc, nullptr);
    while (avcodec_receive_frame(cc, frame) >= 0) drain(frame);
    drain(nullptr);
    ok = !out->empty();
  } while (false);

  if (frame) av_frame_free(&frame);
  if (pkt) av_packet_free(&pkt);
  if (swr) swr_free(&swr);
  if (cc) avcodec_free_context(&cc);
  if (fmt) avformat_close_input(&fmt);
  if (avio) {
    av_free(avio->buffer);
    avio_context_free(&avio);
  }
  return ok;
}

}  // namespace funasr_tpu

#else  // !FUNASR_TPU_HAVE_FFMPEG

namespace funasr_tpu {
bool DecodeCompressedAudio(const uint8_t*, int64_t, int, std::vector<float>*) {
  return false;
}
}  // namespace funasr_tpu

#endif

// ---------------------------------------------------------------------------
// C API (consumed by funasr_tpu.utils.load_utils via ctypes)
// ---------------------------------------------------------------------------

extern "C" {

int FunASRDecodeAudio(const uint8_t* data, int64_t len, int target_rate,
                      float** out, int64_t* out_len) {
  std::vector<float> pcm;
  if (!funasr_tpu::DecodeCompressedAudio(data, len, target_rate, &pcm))
    return -1;
  *out = static_cast<float*>(std::malloc(pcm.size() * sizeof(float)));
  if (!*out) return -2;
  std::memcpy(*out, pcm.data(), pcm.size() * sizeof(float));
  *out_len = static_cast<int64_t>(pcm.size());
  return 0;
}

void FunASRFreeAudio(float* buf) { std::free(buf); }

int FunASRHasCodec(void) {
#ifdef FUNASR_TPU_HAVE_FFMPEG
  return 1;
#else
  return 0;
#endif
}

}  // extern "C"
