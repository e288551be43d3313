// funasr-tpu websocket ASR server (offline / online / 2pass wire protocol).
//
// TPU-era counterpart of the reference C++ server (FunASR
// runtime/websocket/websocket-server-2pass.cpp:9-11 — websocketpp+asio with an
// IO pool and a decoder pool). Same protocol as the Python
// funasr_tpu.bin.funasr_wss_server: the client sends one JSON config frame
//   {"mode":"offline"|"online"|"2pass","wav_name":...,"is_speaking":true,...}
// followed by binary 16 kHz PCM16 frames; "is_speaking": false closes the
// utterance. The server replies {"mode","wav_name","text","is_final"}.
//
// Design: one blocking IO thread per connection (dependency-free stand-in for
// the asio pool) + a fixed decoder thread pool consuming utterance tasks, so
// slow inference never blocks socket reads. Inference goes through the stable
// C API (FunASRInit/FunOfflineInfer) — DSP-only builds echo empty text;
// PJRT builds run the exported StableHLO model.
//
// Segmentation: when the model dir holds a vad.ftr (export_vad_ftr), the C++
// FSMN-VAD engine cuts utterances mid-stream (the reference 2pass server's
// fsmn-vad-online role): each VAD-closed segment is decoded offline and
// emitted as "2pass-offline" with is_final=false, and its audio is dropped
// from the buffer, so per-connection work stays O(segment), not O(session²).
// Online/2pass partials re-decode only the active (post-cut) buffer and are
// throttled to one per kPartialStrideMs of fresh audio (deliberate
// substitution for the reference's separate online encoder sessions; the
// Python server keeps true streaming caches).

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "../include/funasr-tpu-runtime.h"
#include "../src/ws/websocket.h"

namespace {

// ---- minimal flat-JSON helpers (config frames are shallow) ----------------

std::string JsonGetString(const std::string& js, const std::string& key,
                          const std::string& dflt) {
  std::string pat = "\"" + key + "\"";
  size_t p = js.find(pat);
  if (p == std::string::npos) return dflt;
  p = js.find(':', p + pat.size());
  if (p == std::string::npos) return dflt;
  p = js.find('"', p);
  if (p == std::string::npos) return dflt;
  size_t q = p + 1;
  std::string out;
  while (q < js.size() && js[q] != '"') {
    if (js[q] == '\\' && q + 1 < js.size()) ++q;
    out.push_back(js[q++]);
  }
  return out;
}

bool JsonGetBool(const std::string& js, const std::string& key, bool dflt) {
  std::string pat = "\"" + key + "\"";
  size_t p = js.find(pat);
  if (p == std::string::npos) return dflt;
  p = js.find(':', p + pat.size());
  if (p == std::string::npos) return dflt;
  while (p + 1 < js.size() && (js[p + 1] == ' ')) ++p;
  return js.compare(p + 1, 4, "true") == 0 ? true
         : js.compare(p + 1, 5, "false") == 0 ? false
                                              : dflt;
}

std::string JsonEscape(const std::string& s) {
  std::string out;
  for (char c : s) {
    if (c == '"' || c == '\\') { out.push_back('\\'); out.push_back(c); }
    else if (c == '\n') out += "\\n";
    else out.push_back(c);
  }
  return out;
}

// ---- decoder pool ----------------------------------------------------------

struct DecodeTask {
  std::shared_ptr<funasr_tpu::WsConnection> conn;
  std::string pcm;        // accumulated PCM16 bytes
  std::string mode;       // reply mode string ("offline", "2pass-offline", ...)
  std::string wav_name;
  bool is_final;
  std::shared_ptr<void> hotword_trie;  // per-session bias trie (may be null)
  bool itn = false;                    // apply inverse text normalization
  std::string itn_lang = "zh";
};

// The reference wire format sends hotwords as a JSON-object string
// ('{"阿里巴巴": 20}'); clients of the python server may also send plain
// space-separated words. Extract the words (and the first weight as the
// boost) into the whitespace form FunASRHotwordCompile takes.
std::string ParseHotwordsField(const std::string& field, float* boost) {
  if (field.empty() || field[0] != '{') return field;
  std::string words;
  size_t p = 0;
  bool have_boost = false;
  while ((p = field.find('"', p)) != std::string::npos) {
    size_t q = field.find('"', p + 1);
    if (q == std::string::npos) break;
    if (!words.empty()) words += ' ';
    words += field.substr(p + 1, q - p - 1);
    if (!have_boost) {
      const size_t c = field.find(':', q);
      if (c != std::string::npos) {
        const float w = std::strtof(field.c_str() + c + 1, nullptr);
        if (w > 0) { *boost = w; have_boost = true; }
      }
    }
    p = q + 1;
  }
  return words;
}

class DecoderPool {
 public:
  DecoderPool(FUNASR_HANDLE handle, int n_threads) : handle_(handle) {
    for (int i = 0; i < n_threads; ++i)
      workers_.emplace_back([this] { Loop(); });
  }
  ~DecoderPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void Submit(DecodeTask task) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      queue_.push_back(std::move(task));
    }
    cv_.notify_one();
  }

 private:
  void Loop() {
    while (true) {
      DecodeTask task;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_.wait(lock, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        task = std::move(queue_.front());
        queue_.pop_front();
      }
      std::string text;
      if (handle_ != nullptr && !task.pcm.empty()) {
        FUNASR_RESULT res = FunOfflineInferHotwordBeam(
            handle_, task.pcm.data(), static_cast<int>(task.pcm.size()),
            FUNASR_MODE_OFFLINE, 16000, task.hotword_trie.get(),
            task.hotword_trie ? 4 : 1);
        if (res != nullptr) {
          const char* t = FunASRGetResult(res, 0);
          if (t != nullptr) text = t;
          FunASRFreeResult(res);
        }
        if (task.itn && !text.empty()) {
          char* norm = FunASRITNNormalize(text.c_str(),
                                          task.itn_lang.c_str());
          if (norm != nullptr) {
            text = norm;
            FunASRITNFree(norm);
          }
        }
      }
      std::string reply = "{\"mode\": \"" + task.mode + "\", \"wav_name\": \"" +
                          JsonEscape(task.wav_name) + "\", \"text\": \"" +
                          JsonEscape(text) + "\", \"is_final\": " +
                          (task.is_final ? "true" : "false") + "}";
      task.conn->SendText(reply);
    }
  }

  FUNASR_HANDLE handle_;
  std::vector<std::thread> workers_;
  std::deque<DecodeTask> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

// ---- per-connection session -------------------------------------------------

constexpr int kBytesPerMs = 32;        // 16 kHz * 2 bytes
constexpr int kPartialStrideMs = 600;  // min fresh audio between partials

void ServeConnection(std::shared_ptr<funasr_tpu::WsConnection> conn,
                     DecoderPool* pool, FUNASR_HANDLE handle,
                     std::string tokens_path) {
  if (!conn->Handshake()) return;
  std::string mode = "2pass";
  std::string wav_name = "microphone";
  std::shared_ptr<void> hotword_trie;  // per-session contextual bias
  bool itn = true;  // reference 2pass protocol default
  std::string pcm_buf;        // active audio (already-cut segments dropped)
  size_t partial_anchor = 0;  // pcm_buf size at the last partial/VAD pass
  // true streaming partials (paraformer-online role) when the model dir
  // supports it; falls back to throttled prefix re-decode otherwise
  FUNASR_STREAM stream = handle ? FunASRStreamCreate(handle) : nullptr;
  std::string stream_text;  // accumulated online tokens this utterance
  // incremental VADX endpointing (fsmn-vad-online role): O(chunk) per feed
  // with the full endpoint machine's cut points, replacing the previous
  // whole-buffer re-scoring pass
  FUNASR_VAD_STREAM vstream = handle ? FunVadStreamCreate(handle) : nullptr;
  int64_t cut_base_ms = 0;  // absolute ms already erased from pcm_buf
  int open_beg_ms = -1;     // open VAD segment start (absolute ms)
  funasr_tpu::WsOp op;
  std::string payload;

  auto submit = [&](std::string pcm, const std::string& reply_mode,
                    bool is_final) {
    DecodeTask task;
    task.conn = conn;
    task.pcm = std::move(pcm);
    task.mode = reply_mode;
    task.wav_name = wav_name;
    task.is_final = is_final;
    task.hotword_trie = hotword_trie;  // shared: outlives the session safely
    task.itn = itn;
    pool->Submit(std::move(task));
  };

  while (conn->ReadMessage(&op, &payload)) {
    if (op == funasr_tpu::WsOp::kText) {
      mode = JsonGetString(payload, "mode", mode);
      wav_name = JsonGetString(payload, "wav_name", wav_name);
      itn = JsonGetBool(payload, "itn", itn);
      const std::string hw_field = JsonGetString(payload, "hotwords", "");
      if (!hw_field.empty() && !tokens_path.empty()) {
        float boost = 3.0f;
        const std::string words = ParseHotwordsField(hw_field, &boost);
        void* trie = words.empty()
                         ? nullptr
                         : FunASRHotwordCompile(words.c_str(),
                                                tokens_path.c_str(), boost);
        hotword_trie = trie ? std::shared_ptr<void>(trie, FunASRHotwordFree)
                            : nullptr;
      }
      if (!JsonGetBool(payload, "is_speaking", true)) {
        if (stream != nullptr) {  // flush the streaming tail + reset
          FUNASR_RESULT sr = FunASRStreamInfer(stream, nullptr, 0, 1, 16000);
          if (sr != nullptr) FunASRFreeResult(sr);
          stream_text.clear();
        }
        if (vstream != nullptr) {  // flush + reset the VAD machine
          FUNASR_RESULT vr = FunVadStreamInfer(vstream, nullptr, 0, 1, 16000);
          if (vr != nullptr) FunASRFreeResult(vr);
          cut_base_ms = 0;
          open_beg_ms = -1;
        }
        std::string rest;
        rest.swap(pcm_buf);
        partial_anchor = 0;
        submit(std::move(rest), mode == "2pass" ? "2pass-offline" : mode,
               true);
      }
    } else if (op == funasr_tpu::WsOp::kBinary) {
      pcm_buf.append(payload);
      if (stream != nullptr && mode != "offline") {
        FUNASR_RESULT sr = FunASRStreamInfer(stream, payload.data(),
                                             static_cast<int>(payload.size()),
                                             0, 16000);
        if (sr != nullptr) {
          const char* t = FunASRGetResult(sr, 0);
          if (t != nullptr && t[0] != '\0') {
            stream_text += t;
            // incremental partials (clients concatenate), matching the
            // python server and the reference 2pass protocol
            std::string reply =
                "{\"mode\": \"" +
                std::string(mode == "2pass" ? "2pass-online" : "online") +
                "\", \"wav_name\": \"" + JsonEscape(wav_name) +
                "\", \"text\": \"" + JsonEscape(t) +
                "\", \"is_final\": false}";
            conn->SendText(reply);
          }
          FunASRFreeResult(sr);
        }
      }
      // incremental VADX endpointing: each chunk advances the streaming VAD
      // machine; a closed [beg,end] segment is decoded offline and its audio
      // dropped from the buffer, so per-connection work stays O(segment)
      if (vstream != nullptr && mode != "offline") {
        FUNASR_RESULT vr = FunVadStreamInfer(vstream, payload.data(),
                                             static_cast<int>(payload.size()),
                                             0, 16000);
        if (vr != nullptr) {
          for (int i = 0; i < FunASRGetSegmentCount(vr); ++i) {
            const int b = FunASRGetSegmentStart(vr, i);
            const int e = FunASRGetSegmentEnd(vr, i);
            if (b >= 0) open_beg_ms = b;
            if (e < 0 || open_beg_ms < 0) continue;
            // closed segment [open_beg_ms, e] in absolute stream ms
            const int64_t total_ms =
                cut_base_ms + static_cast<int64_t>(pcm_buf.size()) / kBytesPerMs;
            const int64_t lb = std::max<int64_t>(open_beg_ms - cut_base_ms, 0);
            const int64_t le =
                std::min<int64_t>(e, total_ms) - cut_base_ms;
            if (le > lb) {
              submit(pcm_buf.substr(static_cast<size_t>(lb) * kBytesPerMs,
                                    static_cast<size_t>(le - lb) * kBytesPerMs),
                     mode == "2pass" ? "2pass-offline" : "offline", false);
              pcm_buf.erase(0, static_cast<size_t>(le) * kBytesPerMs);
              cut_base_ms += le;
              partial_anchor = pcm_buf.size();
            }
            open_beg_ms = -1;
          }
          FunASRFreeResult(vr);
        }
      }
      if (mode == "offline" ||
          pcm_buf.size() < partial_anchor + kPartialStrideMs * kBytesPerMs) {
        continue;
      }
      partial_anchor = pcm_buf.size();
      if (stream == nullptr && (mode == "online" || mode == "2pass")) {
        submit(pcm_buf,  // re-decode the active segment as the partial
               mode == "2pass" ? "2pass-online" : "online", false);
      }
    }
  }
  if (stream != nullptr) FunASRStreamFree(stream);
  if (vstream != nullptr) FunVadStreamFree(vstream);
}

}  // namespace

int main(int argc, char** argv) {
  int port = 10095;
  std::string model_dir;
  int decoder_threads = 4;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&](const char* flag) -> const char* {
      if (i + 1 >= argc) { std::fprintf(stderr, "%s needs a value\n", flag);
                           std::exit(2); }
      return argv[++i];
    };
    if (a == "--port") port = std::atoi(next("--port"));
    else if (a == "--model-dir") model_dir = next("--model-dir");
    else if (a == "--decoder-thread-num")
      decoder_threads = std::atoi(next("--decoder-thread-num"));
    else if (a == "--help" || a == "-h") {
      std::printf("usage: funasr-tpu-wss-server [--port N] [--model-dir DIR] "
                  "[--decoder-thread-num N]\n");
      return 0;
    }
  }

  FUNASR_HANDLE handle = nullptr;
  if (!model_dir.empty()) {
    handle = FunASRInit(model_dir.c_str(), decoder_threads);
    if (handle == nullptr) {
      std::fprintf(stderr, "failed to init model from %s\n", model_dir.c_str());
      return 1;
    }
  } else {
    std::fprintf(stderr,
                 "warning: no --model-dir; serving protocol with empty text\n");
  }
  DecoderPool pool(handle, decoder_threads);

  int server_fd = ::socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  ::setsockopt(server_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (::bind(server_fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0 ||
      ::listen(server_fd, 64) != 0) {
    std::perror("bind/listen");
    return 1;
  }
  std::printf("funasr-tpu websocket server listening on :%d\n", port);
  std::fflush(stdout);

  while (true) {
    int fd = ::accept(server_fd, nullptr, nullptr);
    if (fd < 0) continue;
    auto conn = std::make_shared<funasr_tpu::WsConnection>(fd);
    std::thread(ServeConnection, conn, &pool, handle,
                model_dir.empty() ? std::string()
                                  : model_dir + "/tokens.txt").detach();
  }
}
