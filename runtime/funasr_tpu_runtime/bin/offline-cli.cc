// Offline transcription CLI over the native engine (role of the reference's
// funasr-onnx-offline binary): funasr-tpu-offline <model_dir> <wav>...
// With --streaming, feeds the wav through the chunked streaming engine in
// 600 ms strides and prints each partial (the funasr-onnx-online CLI role).
// model_dir: weights.ftr + tokens.txt + am.mvn (funasr_tpu.export_runtime
// .export_ftr output).

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <string>
#include <vector>

#include "../include/funasr-tpu-runtime.h"

static std::vector<char> ReadFile(const char* path) {
  std::vector<char> buf;
  FILE* f = std::fopen(path, "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  const long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf.resize(n);
  if (std::fread(buf.data(), 1, n, f) != static_cast<size_t>(n)) buf.clear();
  std::fclose(f);
  return buf;
}

int main(int argc, char** argv) {
  bool streaming = false, rtf = false;
  std::string hotword, itn_lang;
  int beam = 4;
  int argi = 1;
  while (argi < argc && argv[argi][0] == '-') {
    const std::string a = argv[argi];
    if (a == "--streaming") streaming = true;
    else if (a == "--rtf") rtf = true;  // funasr-onnx-offline-rtf role
    else if (a == "--hotword" && argi + 1 < argc) hotword = argv[++argi];
    else if (a == "--itn" && argi + 1 < argc) itn_lang = argv[++argi];
    else if (a == "--beam" && argi + 1 < argc) beam = std::atoi(argv[++argi]);
    else break;
    ++argi;
  }
  if (argc - argi < 2) {
    std::fprintf(stderr,
                 "usage: %s [--streaming] [--rtf] [--hotword <file|words>] "
                 "[--itn zh|en] [--beam N] <model_dir> <wav>...\n",
                 argv[0]);
    return 2;
  }
  FUNASR_HANDLE h = FunASRInit(argv[argi], 1);
  if (!h) {
    std::fprintf(stderr, "init failed for %s\n", argv[argi]);
    return 1;
  }
  // --hotword: a file of one hotword per line (funasr-onnx-offline --hotword
  // role) or an inline space-separated list
  void* trie = nullptr;
  if (!hotword.empty()) {
    std::string words = hotword;
    std::vector<char> hw_file = ReadFile(hotword.c_str());
    if (!hw_file.empty()) words.assign(hw_file.begin(), hw_file.end());
    const std::string tokens = std::string(argv[argi]) + "/tokens.txt";
    trie = FunASRHotwordCompile(words.c_str(), tokens.c_str(), 3.0f);
    if (!trie)
      std::fprintf(stderr, "warning: hotword compile failed (%s)\n",
                   tokens.c_str());
  }
  int rc = 0;
  for (int i = argi + 1; i < argc; ++i) {
    std::vector<char> wav = ReadFile(argv[i]);
    if (wav.empty()) {
      std::fprintf(stderr, "%s: read failed\n", argv[i]);
      rc = 1;
      continue;
    }
    if (streaming) {
      FUNASR_STREAM stream = FunASRStreamCreate(h);
      if (!stream) {
        std::fprintf(stderr, "streaming engine unavailable in %s\n",
                     argv[argi]);
        rc = 1;
        break;
      }
      // feed 600 ms PCM16 chunks (skip a RIFF header when present)
      size_t off = wav.size() >= 44 &&
                   std::string(wav.data(), 4) == "RIFF" ? 44 : 0;
      const size_t stride = 19200;  // 600 ms * 16 kHz * 2 bytes
      std::string full;
      std::vector<double> chunk_ms;
      double total_wall = 0.0, total_audio = 0.0;
      while (off < wav.size()) {
        const size_t n = std::min(stride, wav.size() - off);
        const int is_final = off + n >= wav.size();
        const auto c0 = std::chrono::steady_clock::now();
        FUNASR_RESULT r = FunASRStreamInfer(stream, wav.data() + off,
                                            static_cast<int>(n), is_final,
                                            16000);
        const double cw =
            std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                          c0)
                .count();
        chunk_ms.push_back(cw * 1000.0);
        total_wall += cw;
        total_audio += n / 2.0 / 16000.0;
        const char* text = r ? FunASRGetResult(r, 0) : nullptr;
        if (text && text[0]) {
          std::printf("%s\tpartial\t%s\n", argv[i], text);
          full += text;
        }
        if (r) FunASRFreeResult(r);
        off += n;
      }
      std::printf("%s\tfinal\t%s\n", argv[i], full.c_str());
      if (rtf && !chunk_ms.empty()) {
        std::sort(chunk_ms.begin(), chunk_ms.end());
        const double p50 = chunk_ms[chunk_ms.size() / 2];
        const double p95 = chunk_ms[static_cast<size_t>(
            (chunk_ms.size() - 1) * 0.95)];
        std::printf(
            "%s\tstreaming rtf=%.4f\trtfx=%.1f\tchunk_p50_ms=%.1f\t"
            "chunk_p95_ms=%.1f\taudio_s=%.2f\twall_s=%.3f\n",
            argv[i], total_wall / total_audio, total_audio / total_wall, p50,
            p95, total_audio, total_wall);
      }
      FunASRStreamFree(stream);
    } else {
      const auto t0 = std::chrono::steady_clock::now();
      FUNASR_RESULT r = FunOfflineInferHotwordBeam(
          h, wav.data(), static_cast<int>(wav.size()), FUNASR_MODE_OFFLINE,
          16000, trie, trie ? beam : 1);
      const double wall =
          std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
              .count();
      const char* text = r ? FunASRGetResult(r, 0) : nullptr;
      std::string itn_text;
      if (!itn_lang.empty() && text && text[0]) {
        char* norm = FunASRITNNormalize(text, itn_lang.c_str());
        if (norm) {
          itn_text = norm;
          FunASRITNFree(norm);
          text = itn_text.c_str();
        }
      }
      if (rtf) {
        // PCM16 bytes after a possible 44-byte RIFF header -> audio seconds
        const double audio_s =
            (wav.size() - (wav.size() > 44 ? 44 : 0)) / 2.0 / 16000.0;
        std::printf("%s\trtf=%.4f\trtfx=%.1f\taudio_s=%.2f\twall_s=%.3f\t%s\n",
                    argv[i], wall / audio_s, audio_s / wall, audio_s, wall,
                    text ? text : "");
      } else {
        std::printf("%s\t%s\n", argv[i], text ? text : "");
      }
      if (r) FunASRFreeResult(r);
    }
  }
  if (trie) FunASRHotwordFree(trie);
  FunASRUninit(h);
  return rc;
}
