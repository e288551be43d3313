#include "websocket.h"

#include <sys/socket.h>
#include <unistd.h>

#include <cstring>
#include <sstream>

#include "sha1.h"

namespace funasr_tpu {

WsConnection::~WsConnection() {
  if (fd_ >= 0) ::close(fd_);
}

bool WsConnection::ReadExact(uint8_t* buf, size_t n) {
  size_t got = 0;
  while (got < n) {
    ssize_t r = ::recv(fd_, buf + got, n - got, 0);
    if (r <= 0) return false;
    got += static_cast<size_t>(r);
  }
  return true;
}

bool WsConnection::Handshake() {
  std::string req;
  char c;
  // read until end of headers (bounded to 64 KiB)
  while (req.size() < 65536 &&
         req.find("\r\n\r\n") == std::string::npos) {
    ssize_t r = ::recv(fd_, &c, 1, 0);
    if (r <= 0) return false;
    req.push_back(c);
  }
  // extract Sec-WebSocket-Key (case-insensitive header match)
  std::string key;
  std::istringstream ss(req);
  std::string line;
  while (std::getline(ss, line)) {
    std::string lower(line);
    for (auto& ch : lower) ch = static_cast<char>(::tolower(ch));
    const std::string name = "sec-websocket-key:";
    if (lower.rfind(name, 0) == 0) {
      key = line.substr(name.size());
      while (!key.empty() && (key.front() == ' ')) key.erase(key.begin());
      while (!key.empty() && (key.back() == '\r' || key.back() == '\n' ||
                              key.back() == ' '))
        key.pop_back();
    }
  }
  if (key.empty()) return false;
  std::string resp =
      "HTTP/1.1 101 Switching Protocols\r\n"
      "Upgrade: websocket\r\n"
      "Connection: Upgrade\r\n"
      "Sec-WebSocket-Accept: " + ws_accept_key(key) + "\r\n\r\n";
  return ::send(fd_, resp.data(), resp.size(), MSG_NOSIGNAL) ==
         static_cast<ssize_t>(resp.size());
}

bool WsConnection::ReadFrame(WsOp* op, bool* fin, std::string* payload) {
  uint8_t hdr[2];
  if (!ReadExact(hdr, 2)) return false;
  *fin = (hdr[0] & 0x80) != 0;
  *op = static_cast<WsOp>(hdr[0] & 0x0F);
  bool masked = (hdr[1] & 0x80) != 0;
  uint64_t len = hdr[1] & 0x7F;
  if (len == 126) {
    uint8_t ext[2];
    if (!ReadExact(ext, 2)) return false;
    len = (static_cast<uint64_t>(ext[0]) << 8) | ext[1];
  } else if (len == 127) {
    uint8_t ext[8];
    if (!ReadExact(ext, 8)) return false;
    len = 0;
    for (int i = 0; i < 8; ++i) len = (len << 8) | ext[i];
  }
  if (len > (64ull << 20)) return false;  // 64 MiB frame cap
  uint8_t mask[4] = {0, 0, 0, 0};
  if (masked && !ReadExact(mask, 4)) return false;
  payload->resize(len);
  if (len && !ReadExact(reinterpret_cast<uint8_t*>(&(*payload)[0]), len))
    return false;
  if (masked)
    for (uint64_t i = 0; i < len; ++i)
      (*payload)[i] = static_cast<char>(
          static_cast<uint8_t>((*payload)[i]) ^ mask[i % 4]);
  return true;
}

bool WsConnection::ReadMessage(WsOp* op, std::string* payload) {
  payload->clear();
  WsOp first = WsOp::kContinuation;
  while (true) {
    WsOp frame_op;
    bool fin;
    std::string part;
    if (!ReadFrame(&frame_op, &fin, &part)) return false;
    if (frame_op == WsOp::kPing) {
      SendFrame(WsOp::kPong, part);
      continue;
    }
    if (frame_op == WsOp::kPong) continue;
    if (frame_op == WsOp::kClose) {
      SendClose();
      return false;
    }
    if (frame_op != WsOp::kContinuation) first = frame_op;
    payload->append(part);
    if (fin) break;
  }
  *op = first;
  return true;
}

bool WsConnection::SendFrame(WsOp op, const std::string& payload) {
  std::lock_guard<std::mutex> lock(write_mu_);
  std::string frame;
  frame.push_back(static_cast<char>(0x80 | static_cast<uint8_t>(op)));
  size_t n = payload.size();
  if (n < 126) {
    frame.push_back(static_cast<char>(n));
  } else if (n < 65536) {
    frame.push_back(126);
    frame.push_back(static_cast<char>((n >> 8) & 0xFF));
    frame.push_back(static_cast<char>(n & 0xFF));
  } else {
    frame.push_back(127);
    for (int i = 7; i >= 0; --i)
      frame.push_back(static_cast<char>((static_cast<uint64_t>(n) >> (8 * i)) &
                                        0xFF));
  }
  frame += payload;
  return ::send(fd_, frame.data(), frame.size(), MSG_NOSIGNAL) ==
         static_cast<ssize_t>(frame.size());
}

void WsConnection::SendClose() {
  std::lock_guard<std::mutex> lock(write_mu_);
  const char frame[2] = {static_cast<char>(0x88), 0x00};
  ::send(fd_, frame, 2, MSG_NOSIGNAL);
}

}  // namespace funasr_tpu
