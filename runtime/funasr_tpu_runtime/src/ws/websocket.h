// Minimal RFC6455 websocket connection over a connected TCP fd.
//
// TPU-era counterpart of the reference's websocketpp usage
// (FunASR runtime/websocket/websocket-server-2pass.cpp:9-11 — two thread
// pools, asio). This runtime keeps the same wire protocol with zero
// third-party deps: blocking reads on an IO thread per connection, writes
// serialized by a per-connection mutex so decoder-pool threads can reply.
#pragma once

#include <cstdint>
#include <mutex>
#include <string>
#include <vector>

namespace funasr_tpu {

enum class WsOp : uint8_t {
  kContinuation = 0x0,
  kText = 0x1,
  kBinary = 0x2,
  kClose = 0x8,
  kPing = 0x9,
  kPong = 0xA,
};

class WsConnection {
 public:
  explicit WsConnection(int fd) : fd_(fd) {}
  ~WsConnection();

  // Performs the HTTP upgrade handshake. Returns false on malformed request.
  bool Handshake();

  // Blocking read of one complete (defragmented) message.
  // Returns false on EOF/close/error. Pings are answered internally.
  bool ReadMessage(WsOp* op, std::string* payload);

  // Thread-safe sends (server frames are unmasked per RFC6455).
  bool SendText(const std::string& payload) {
    return SendFrame(WsOp::kText, payload);
  }
  bool SendBinary(const std::string& payload) {
    return SendFrame(WsOp::kBinary, payload);
  }
  void SendClose();

  int fd() const { return fd_; }

 private:
  bool ReadExact(uint8_t* buf, size_t n);
  bool ReadFrame(WsOp* op, bool* fin, std::string* payload);
  bool SendFrame(WsOp op, const std::string& payload);

  int fd_;
  std::mutex write_mu_;
};

}  // namespace funasr_tpu
