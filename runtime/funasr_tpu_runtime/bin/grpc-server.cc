// funasr-tpu gRPC ASR server (dependency-free HTTP/2 cleartext).
//
// TPU-era counterpart of the reference gRPC service (FunASR
// runtime/grpc/paraformer-server.cc + runtime/python/grpc/proto/paraformer.proto):
// the same `paraformer.ASR/Recognize` bidirectional-streaming RPC —
//   Request  { DecodeMode mode=1; WavFormat wav_format=2; int32 sampling_rate=3;
//              repeated int32 chunk_size=4; bool is_final=5; bytes audio_data=6; }
//   Response { DecodeMode mode=1; string text=2; bool is_final=3; }
// with DecodeMode offline=0 / online=1 / two_pass=2.
//
// The build image carries no grpc++/protoc-gen-grpc, so instead of linking the
// gRPC library this binary speaks the wire protocol directly: a minimal h2c
// (HTTP/2 over cleartext TCP) server with the exact subset gRPC needs —
// SETTINGS/PING/WINDOW_UPDATE handling, HPACK-encoded response headers and
// grpc-status trailers, length-prefixed gRPC messages in DATA frames, and
// hand-rolled proto3 varint encode/decode for the two tiny messages above.
// Interop is proven against the real grpc-python client in
// tests/test_grpc_server.py (the client's HPACK/flow-control/settings machinery
// exercises this server end to end).
//
// Decode semantics mirror the reference GrpcEngine::DecodeThreadFunc
// (paraformer-server.cc:19-80): online partials stream back as mode=online
// while audio arrives; on is_final the online tail is flushed and — for
// offline/two_pass — the whole utterance is re-decoded by the offline engine
// (VAD+punc+ITN inside FunOfflineInfer) and returned as the final message.
//
//   funasr-tpu-grpc-server <model_dir> [port]

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <thread>
#include <vector>

#include "../include/funasr-tpu-runtime.h"

namespace {

// ---------------------------------------------------------------------------
// proto3 wire helpers (varint + length-delimited; RFC-free, spec-exact)

void PutVarint(std::string* out, uint64_t v) {
  while (v >= 0x80) {
    out->push_back(static_cast<char>((v & 0x7f) | 0x80));
    v >>= 7;
  }
  out->push_back(static_cast<char>(v));
}

bool GetVarint(const uint8_t* p, size_t n, size_t* pos, uint64_t* v) {
  uint64_t out = 0;
  int shift = 0;
  while (*pos < n && shift < 64) {
    const uint8_t b = p[(*pos)++];
    out |= static_cast<uint64_t>(b & 0x7f) << shift;
    if (!(b & 0x80)) {
      *v = out;
      return true;
    }
    shift += 7;
  }
  return false;
}

struct AsrRequest {
  // proto3 never serializes enum value 0, so an absent mode field means
  // offline (enum default) — matching the reference server's wire semantics.
  int mode = 0;
  int sampling_rate = 16000;
  bool is_final = false;
  bool has_mode = false;
  bool has_sampling_rate = false;
  std::string audio;
};

// Parse a paraformer.Request message (unknown fields skipped by wire type).
bool ParseRequest(const std::string& buf, AsrRequest* req) {
  const uint8_t* p = reinterpret_cast<const uint8_t*>(buf.data());
  const size_t n = buf.size();
  size_t pos = 0;
  while (pos < n) {
    uint64_t tag;
    if (!GetVarint(p, n, &pos, &tag)) return false;
    const int field = static_cast<int>(tag >> 3);
    const int wire = static_cast<int>(tag & 7);
    if (wire == 0) {  // varint
      uint64_t v;
      if (!GetVarint(p, n, &pos, &v)) return false;
      if (field == 1) {
        req->mode = static_cast<int>(v);
        req->has_mode = true;
      } else if (field == 3) {
        req->sampling_rate = static_cast<int>(v);
        req->has_sampling_rate = true;
      } else if (field == 5) {
        req->is_final = v != 0;
      }  // field 2 (wav_format=pcm) and stray varints: ignored
    } else if (wire == 2) {  // length-delimited
      uint64_t len;
      // `len > n - pos` cannot wrap (pos <= n), unlike `pos + len > n` which
      // overflows for a crafted ~2^64 length varint
      if (!GetVarint(p, n, &pos, &len) || len > n - pos) return false;
      if (field == 6) {
        req->audio.append(buf, pos, len);
      }  // field 4 packed chunk_size: decode cadence is engine-fixed; ignored
      pos += len;
    } else if (wire == 5) {
      pos += 4;
    } else if (wire == 1) {
      pos += 8;
    } else {
      return false;
    }
  }
  return true;
}

// Serialize a paraformer.Response. mode is emitted even at 0 (legal on the
// wire, keeps debugging dumps explicit).
std::string EncodeResponse(int mode, const std::string& text, bool is_final) {
  std::string out;
  out.push_back(0x08);  // field 1, varint
  PutVarint(&out, static_cast<uint64_t>(mode));
  out.push_back(0x12);  // field 2, bytes
  PutVarint(&out, text.size());
  out += text;
  out.push_back(0x18);  // field 3, varint
  out.push_back(is_final ? 1 : 0);
  return out;
}

// ---------------------------------------------------------------------------
// HTTP/2 framing (RFC 7540 subset) + HPACK response encoding (RFC 7541)

constexpr uint8_t kFrameData = 0x0;
constexpr uint8_t kFrameHeaders = 0x1;
constexpr uint8_t kFrameRstStream = 0x3;
constexpr uint8_t kFrameSettings = 0x4;
constexpr uint8_t kFramePing = 0x6;
constexpr uint8_t kFrameGoaway = 0x7;
constexpr uint8_t kFrameWindowUpdate = 0x8;

constexpr uint8_t kFlagEndStream = 0x1;
constexpr uint8_t kFlagAck = 0x1;
constexpr uint8_t kFlagEndHeaders = 0x4;
constexpr uint8_t kFlagPadded = 0x8;
constexpr uint8_t kFlagPriority = 0x20;

bool ReadExact(int fd, void* buf, size_t n) {
  char* c = static_cast<char*>(buf);
  size_t got = 0;
  while (got < n) {
    const ssize_t r = ::recv(fd, c + got, n - got, 0);
    if (r <= 0) return false;
    got += static_cast<size_t>(r);
  }
  return true;
}

bool SendAll(int fd, const std::string& data) {
  size_t sent = 0;
  while (sent < data.size()) {
    const ssize_t r = ::send(fd, data.data() + sent, data.size() - sent, 0);
    if (r <= 0) return false;
    sent += static_cast<size_t>(r);
  }
  return true;
}

std::string Frame(uint8_t type, uint8_t flags, uint32_t stream_id,
                  const std::string& payload) {
  std::string f;
  const uint32_t len = static_cast<uint32_t>(payload.size());
  f.push_back(static_cast<char>((len >> 16) & 0xff));
  f.push_back(static_cast<char>((len >> 8) & 0xff));
  f.push_back(static_cast<char>(len & 0xff));
  f.push_back(static_cast<char>(type));
  f.push_back(static_cast<char>(flags));
  f.push_back(static_cast<char>((stream_id >> 24) & 0x7f));
  f.push_back(static_cast<char>((stream_id >> 16) & 0xff));
  f.push_back(static_cast<char>((stream_id >> 8) & 0xff));
  f.push_back(static_cast<char>(stream_id & 0xff));
  f += payload;
  return f;
}

// HPACK "literal header field without indexing — new name", plain octets.
void HpackLiteral(std::string* out, const std::string& name,
                  const std::string& value) {
  out->push_back(0x00);
  out->push_back(static_cast<char>(name.size()));  // <127, no huffman
  *out += name;
  out->push_back(static_cast<char>(value.size()));
  *out += value;
}

// Response headers: `:status: 200` (static index 8) + content-type via the
// static-table name entry (index 31 > 4-bit prefix 15, so 0x0f + 16).
std::string ResponseHeaderBlock() {
  std::string h;
  h.push_back(static_cast<char>(0x88));  // indexed — :status: 200
  h.push_back(0x0f);
  h.push_back(0x10);  // literal w/o indexing, name = static 31 (content-type)
  const std::string ct = "application/grpc";
  h.push_back(static_cast<char>(ct.size()));
  h += ct;
  return h;
}

std::string TrailerBlock(int grpc_status, const std::string& message) {
  std::string t;
  HpackLiteral(&t, "grpc-status", std::to_string(grpc_status));
  if (!message.empty()) HpackLiteral(&t, "grpc-message", message);
  return t;
}

// ---------------------------------------------------------------------------
// Per-RPC decode state (the reference GrpcEngine role, run synchronously in
// the connection's read loop — gRPC DATA cadence already batches audio into
// the same step sizes the reference's polling thread consumed).

struct Rpc {
  bool headers_sent = false;
  bool done = false;
  bool trailer_pending = false;  // done, but DATA still queued on flow control
  int mode = 0;  // offline until the first request says otherwise (proto3 default)
  int sampling_rate = 16000;
  int32_t send_window = 65535;  // peer's per-stream receive window
  std::string grpc_buf;    // partially received length-prefixed messages
  std::string audio_all;   // full utterance for the offline/two_pass pass
  std::string online_acc;  // concatenated online partials (final online text)
  std::string pending;     // framed DATA bytes waiting on flow-control credit
  FUNASR_STREAM stream = nullptr;

  ~Rpc() {
    if (stream != nullptr) FunASRStreamFree(stream);
  }
};

class Connection {
 public:
  Connection(int fd, FUNASR_HANDLE handle) : fd_(fd), handle_(handle) {}

  void Run() {
    char preface[24];
    static const char kPreface[] = "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n";
    if (!ReadExact(fd_, preface, 24) || memcmp(preface, kPreface, 24) != 0) {
      ::close(fd_);
      return;
    }
    SendAll(fd_, Frame(kFrameSettings, 0, 0, ""));  // empty server SETTINGS
    uint8_t hdr[9];
    while (ReadExact(fd_, hdr, 9)) {
      const uint32_t len = (static_cast<uint32_t>(hdr[0]) << 16) |
                           (static_cast<uint32_t>(hdr[1]) << 8) | hdr[2];
      const uint8_t type = hdr[3];
      const uint8_t flags = hdr[4];
      const uint32_t sid = ((static_cast<uint32_t>(hdr[5]) & 0x7f) << 24) |
                           (static_cast<uint32_t>(hdr[6]) << 16) |
                           (static_cast<uint32_t>(hdr[7]) << 8) | hdr[8];
      std::string payload(len, '\0');
      if (len > 0 && !ReadExact(fd_, payload.data(), len)) break;
      if (!Dispatch(type, flags, sid, payload)) break;
    }
    ::close(fd_);
  }

 private:
  bool Dispatch(uint8_t type, uint8_t flags, uint32_t sid,
                std::string payload) {
    switch (type) {
      case kFrameSettings:
        if (!(flags & kFlagAck)) {
          // SETTINGS_INITIAL_WINDOW_SIZE (id 4) re-bases every stream's send
          // window by the delta (RFC 7540 §6.9.2); connection window unaffected.
          for (size_t off = 0; off + 6 <= payload.size(); off += 6) {
            const uint16_t id =
                (static_cast<uint16_t>(static_cast<uint8_t>(payload[off])) << 8) |
                static_cast<uint8_t>(payload[off + 1]);
            if (id == 4) {
              const uint32_t v =
                  (static_cast<uint32_t>(static_cast<uint8_t>(payload[off + 2])) << 24) |
                  (static_cast<uint32_t>(static_cast<uint8_t>(payload[off + 3])) << 16) |
                  (static_cast<uint32_t>(static_cast<uint8_t>(payload[off + 4])) << 8) |
                  static_cast<uint8_t>(payload[off + 5]);
              const int64_t delta =
                  static_cast<int64_t>(v) - initial_stream_window_;
              initial_stream_window_ = static_cast<int32_t>(v);
              for (auto& kv : rpcs_) {
                kv.second->send_window =
                    static_cast<int32_t>(kv.second->send_window + delta);
              }
            }
          }
          if (!SendAll(fd_, Frame(kFrameSettings, kFlagAck, 0, ""))) return false;
          return FlushAll();
        }
        return true;
      case kFramePing:
        if (!(flags & kFlagAck)) {
          return SendAll(fd_, Frame(kFramePing, kFlagAck, 0, payload));
        }
        return true;
      case kFrameHeaders: {
        // Single-method service: any HEADERS opens /paraformer.ASR/Recognize.
        // The client's HPACK block is not decoded (nothing in it changes the
        // route), so its dynamic-table state never needs tracking.
        rpcs_[sid] = std::make_unique<Rpc>();
        rpcs_[sid]->send_window = initial_stream_window_;
        if (flags & kFlagEndStream) FinishRpc(sid);
        return true;
      }
      case kFrameData: {
        // Credit the CONNECTION window for every DATA payload received — even
        // on unknown/closed streams (FinishRpc erases the RPC before the
        // client half-closes; its trailing audio must not drain the window).
        if (!payload.empty()) {
          const uint32_t inc = static_cast<uint32_t>(payload.size());
          std::string upd;
          upd.push_back(static_cast<char>((inc >> 24) & 0x7f));
          upd.push_back(static_cast<char>((inc >> 16) & 0xff));
          upd.push_back(static_cast<char>((inc >> 8) & 0xff));
          upd.push_back(static_cast<char>(inc & 0xff));
          if (!SendAll(fd_, Frame(kFrameWindowUpdate, 0, 0, upd))) return false;
          auto live = rpcs_.find(sid);
          if (live != rpcs_.end() &&
              !SendAll(fd_, Frame(kFrameWindowUpdate, 0, sid, upd))) {
            return false;
          }
        }
        auto it = rpcs_.find(sid);
        if (it == rpcs_.end()) return true;  // unknown stream: drop
        size_t off = 0, end = payload.size();
        if (flags & kFlagPadded) {
          const uint8_t pad = static_cast<uint8_t>(payload[0]);
          off = 1;
          end = end > pad ? end - pad : off;
        }
        if (flags & kFlagPriority) off += 5;
        if (off < end) {
          it->second->grpc_buf.append(payload, off, end - off);
        }
        PumpMessages(sid);
        if (flags & kFlagEndStream) FinishRpc(sid);
        return true;
      }
      case kFrameWindowUpdate: {
        if (payload.size() < 4) return true;
        const uint32_t inc =
            ((static_cast<uint32_t>(static_cast<uint8_t>(payload[0])) & 0x7f) << 24) |
            (static_cast<uint32_t>(static_cast<uint8_t>(payload[1])) << 16) |
            (static_cast<uint32_t>(static_cast<uint8_t>(payload[2])) << 8) |
            static_cast<uint8_t>(payload[3]);
        if (sid == 0) {
          conn_send_window_ += static_cast<int64_t>(inc);
        } else {
          auto it = rpcs_.find(sid);
          if (it != rpcs_.end()) {
            it->second->send_window =
                static_cast<int32_t>(it->second->send_window + inc);
          }
        }
        return FlushAll();
      }
      case kFrameRstStream:
        rpcs_.erase(sid);
        return true;
      case kFrameGoaway:
        return false;
      default:  // PRIORITY / CONTINUATION / unknown: ignore
        return true;
    }
  }

  // Drain complete length-prefixed gRPC messages from the stream buffer.
  // Re-finds the RPC each iteration: HandleRequest can finish (and erase) it.
  void PumpMessages(uint32_t sid) {
    while (true) {
      auto it = rpcs_.find(sid);
      if (it == rpcs_.end() || it->second->done) return;
      Rpc* rpc = it->second.get();
      if (rpc->grpc_buf.size() < 5) return;
      const uint8_t* p = reinterpret_cast<const uint8_t*>(rpc->grpc_buf.data());
      const uint32_t mlen = (static_cast<uint32_t>(p[1]) << 24) |
                            (static_cast<uint32_t>(p[2]) << 16) |
                            (static_cast<uint32_t>(p[3]) << 8) | p[4];
      if (rpc->grpc_buf.size() < 5u + mlen) return;
      AsrRequest req;
      const bool ok = ParseRequest(rpc->grpc_buf.substr(5, mlen), &req);
      rpc->grpc_buf.erase(0, 5u + mlen);
      if (!ok) continue;
      HandleRequest(sid, rpc, req);
    }
  }

  void HandleRequest(uint32_t sid, Rpc* rpc, const AsrRequest& req) {
    if (req.has_mode) rpc->mode = req.mode;
    // Stock clients send sampling_rate only in the first packet (and proto3
    // omits absent fields) — latch it only when actually present, or a later
    // packet would silently reset a non-16k RPC to the 16000 default.
    if (req.has_sampling_rate) rpc->sampling_rate = req.sampling_rate;
    if (!req.audio.empty()) {
      if (rpc->mode != 1) rpc->audio_all += req.audio;  // offline / two_pass
      if (rpc->mode != 0) {                             // online / two_pass
        if (rpc->stream == nullptr) rpc->stream = FunASRStreamCreate(handle_);
        if (rpc->stream != nullptr) {
          FUNASR_RESULT r = FunASRStreamInfer(
              rpc->stream, req.audio.data(),
              static_cast<int>(req.audio.size()), 0, rpc->sampling_rate);
          EmitOnline(sid, rpc, r, false);
        }
      }
    }
    if (req.is_final) FinishRpc(sid);
  }

  void EmitOnline(uint32_t sid, Rpc* rpc, FUNASR_RESULT r, bool is_final) {
    std::string text;
    if (r != nullptr) {
      const char* t = FunASRGetResult(r, 0);
      if (t != nullptr) text = t;
      FunASRFreeResult(r);
    }
    if (!text.empty() || is_final) {
      rpc->online_acc += text;
      // online finals close the RPC's text; two_pass onlines stay partial
      SendMessage(sid, rpc,
                  EncodeResponse(1, text, is_final && rpc->mode == 1));
    }
  }

  void FinishRpc(uint32_t sid) {
    auto it = rpcs_.find(sid);
    if (it == rpcs_.end() || it->second->done) return;
    Rpc* rpc = it->second.get();
    rpc->done = true;
    rpc->trailer_pending = true;
    if (rpc->stream != nullptr) {  // flush the online tail
      FUNASR_RESULT r =
          FunASRStreamInfer(rpc->stream, nullptr, 0, 1, rpc->sampling_rate);
      EmitOnline(sid, rpc, r, true);
    }
    if (rpc->mode != 1 && !rpc->audio_all.empty()) {
      FUNASR_RESULT r = FunOfflineInfer(
          handle_, rpc->audio_all.data(),
          static_cast<int>(rpc->audio_all.size()), FUNASR_MODE_OFFLINE,
          rpc->sampling_rate);
      std::string text;
      if (r != nullptr) {
        const char* t = FunASRGetResult(r, 0);
        if (t != nullptr) text = t;
        FunASRFreeResult(r);
      }
      SendMessage(sid, rpc, EncodeResponse(rpc->mode == 0 ? 0 : 2, text, true));
    }
    EnsureHeaders(sid, rpc);  // header-only RPCs still need :status 200
    MaybeTrailer(sid, rpc);   // trailer waits for queued DATA to drain
  }

  // Send the closing trailer once all flow-controlled DATA has been flushed,
  // then drop the RPC. Called from FinishRpc and after window credits.
  void MaybeTrailer(uint32_t sid, Rpc* rpc) {
    if (!rpc->trailer_pending || !rpc->pending.empty()) return;
    SendAll(fd_, Frame(kFrameHeaders, kFlagEndHeaders | kFlagEndStream, sid,
                       TrailerBlock(0, "")));
    rpcs_.erase(sid);
  }

  void EnsureHeaders(uint32_t sid, Rpc* rpc) {
    if (rpc->headers_sent) return;
    rpc->headers_sent = true;
    SendAll(fd_, Frame(kFrameHeaders, kFlagEndHeaders, sid,
                       ResponseHeaderBlock()));
  }

  void SendMessage(uint32_t sid, Rpc* rpc, const std::string& proto) {
    EnsureHeaders(sid, rpc);
    std::string msg;
    msg.push_back(0);  // uncompressed
    const uint32_t n = static_cast<uint32_t>(proto.size());
    msg.push_back(static_cast<char>((n >> 24) & 0xff));
    msg.push_back(static_cast<char>((n >> 16) & 0xff));
    msg.push_back(static_cast<char>((n >> 8) & 0xff));
    msg.push_back(static_cast<char>(n & 0xff));
    msg += proto;
    // DATA is flow-controlled: queue and send only what the peer's windows
    // allow, or a slow reader would see FLOW_CONTROL_ERROR on long streams.
    rpc->pending += msg;
    TryFlush(sid, rpc);
  }

  // Send as much queued DATA as the connection + stream windows permit.
  bool TryFlush(uint32_t sid, Rpc* rpc) {
    while (!rpc->pending.empty() && conn_send_window_ > 0 &&
           rpc->send_window > 0) {
      size_t n = rpc->pending.size();
      n = std::min(n, static_cast<size_t>(conn_send_window_));
      n = std::min(n, static_cast<size_t>(rpc->send_window));
      n = std::min(n, static_cast<size_t>(16384));  // default max frame size
      if (!SendAll(fd_, Frame(kFrameData, 0, sid, rpc->pending.substr(0, n))))
        return false;
      rpc->pending.erase(0, n);
      conn_send_window_ -= static_cast<int64_t>(n);
      rpc->send_window -= static_cast<int32_t>(n);
    }
    return true;
  }

  // Flush every stream with queued DATA after a window credit; release any
  // finished RPC whose queue just drained.
  bool FlushAll() {
    std::vector<uint32_t> sids;
    sids.reserve(rpcs_.size());
    for (auto& kv : rpcs_) sids.push_back(kv.first);
    for (uint32_t sid : sids) {
      auto it = rpcs_.find(sid);
      if (it == rpcs_.end()) continue;
      if (!TryFlush(sid, it->second.get())) return false;
      MaybeTrailer(sid, it->second.get());
    }
    return true;
  }

  int fd_;
  FUNASR_HANDLE handle_;
  int64_t conn_send_window_ = 65535;    // peer's connection receive window
  int32_t initial_stream_window_ = 65535;
  std::map<uint32_t, std::unique_ptr<Rpc>> rpcs_;
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <model_dir> [port]\n", argv[0]);
    return 2;
  }
  const int port = argc > 2 ? atoi(argv[2]) : 10095;
  FUNASR_HANDLE handle = FunASRInit(argv[1], 1);
  if (handle == nullptr) {
    fprintf(stderr, "failed to load model dir %s\n", argv[1]);
    return 1;
  }
  int srv = ::socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(srv, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0 ||
      listen(srv, 64) != 0) {
    fprintf(stderr, "bind/listen failed on port %d\n", port);
    return 1;
  }
  fprintf(stderr, "funasr-tpu-grpc-server listening on %d (h2c)\n", port);
  fflush(stderr);
  while (true) {
    const int fd = ::accept(srv, nullptr, nullptr);
    if (fd < 0) break;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    std::thread([fd, handle] {
      Connection(fd, handle).Run();
    }).detach();
  }
  FunASRUninit(handle);
  return 0;
}
