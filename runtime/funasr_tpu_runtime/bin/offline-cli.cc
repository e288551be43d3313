// Offline transcription CLI over the native engine (role of the reference's
// funasr-onnx-offline binary): funasr-tpu-offline <model_dir> <wav>...
// model_dir: weights.ftr + tokens.txt + am.mvn (funasr_tpu.export_runtime
// .export_ftr output).

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
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <model_dir> <wav>...\n", argv[0]);
    return 2;
  }
  FUNASR_HANDLE h = FunASRInit(argv[1], 1);
  if (!h) {
    std::fprintf(stderr, "init failed for %s\n", argv[1]);
    return 1;
  }
  int rc = 0;
  for (int i = 2; i < argc; ++i) {
    std::vector<char> wav = ReadFile(argv[i]);
    if (wav.empty()) {
      std::fprintf(stderr, "%s: read failed\n", argv[i]);
      rc = 1;
      continue;
    }
    FUNASR_RESULT r = FunOfflineInfer(h, wav.data(),
                                      static_cast<int>(wav.size()),
                                      FUNASR_MODE_OFFLINE, 16000);
    const char* text = r ? FunASRGetResult(r, 0) : nullptr;
    std::printf("%s\t%s\n", argv[i], text ? text : "");
    if (r) FunASRFreeResult(r);
  }
  FunASRUninit(h);
  return rc;
}
