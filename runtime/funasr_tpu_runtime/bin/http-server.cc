// funasr-tpu HTTP transcription server (dependency-free HTTP/1.1).
//
// TPU-era counterpart of the reference's C++ HTTP service (FunASR
// runtime/http/ — a libevent server fronting the same offline engines as the
// websocket binary). One blocking thread per connection; inference goes
// through the stable C API over a shared handle (engines are immutable after
// FunASRInit, so concurrent FunOfflineInfer calls are safe).
//
//   POST /recognize          multipart "file" field OR raw audio body
//     -> {"text": "...", "timestamp": [[ms,ms],...]?}
//   GET  /health             -> {"status": "ok"}
//
//   curl -F file=@a.wav http://host:port/recognize

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>

#include "../include/funasr-tpu-runtime.h"

namespace {

std::string JsonEscape(const std::string& s) {
  std::string out;
  for (char c : s) {
    if (c == '"' || c == '\\') { out.push_back('\\'); out.push_back(c); }
    else if (c == '\n') out += "\\n";
    else if (static_cast<unsigned char>(c) >= 0x20 || c < 0) out.push_back(c);
  }
  return out;
}

bool ReadExact(int fd, char* buf, size_t n) {
  size_t got = 0;
  while (got < n) {
    const ssize_t r = ::recv(fd, buf + got, n - got, 0);
    if (r <= 0) return false;
    got += static_cast<size_t>(r);
  }
  return true;
}

void SendResponse(int fd, const std::string& status,
                  const std::string& body) {
  std::string resp = "HTTP/1.1 " + status +
                     "\r\nContent-Type: application/json\r\n"
                     "Content-Length: " + std::to_string(body.size()) +
                     "\r\nConnection: close\r\n\r\n" + body;
  size_t sent = 0;
  while (sent < resp.size()) {
    const ssize_t r = ::send(fd, resp.data() + sent, resp.size() - sent, 0);
    if (r <= 0) return;
    sent += static_cast<size_t>(r);
  }
}

// Extract the `file` part (or the first file-bearing part) from a
// multipart/form-data body; falls back to the raw body for audio/* posts.
std::string ExtractAudio(const std::string& content_type,
                         const std::string& body) {
  const size_t bpos = content_type.find("boundary=");
  if (content_type.find("multipart/form-data") == std::string::npos ||
      bpos == std::string::npos) {
    return body;  // raw audio post
  }
  std::string boundary = content_type.substr(bpos + 9);
  if (!boundary.empty() && boundary.front() == '"') {
    boundary = boundary.substr(1, boundary.find('"', 1) - 1);
  } else {
    const size_t semi = boundary.find(';');
    if (semi != std::string::npos) boundary = boundary.substr(0, semi);
  }
  const std::string delim = "--" + boundary;
  size_t pos = 0;
  while ((pos = body.find(delim, pos)) != std::string::npos) {
    pos += delim.size();
    const size_t head_end = body.find("\r\n\r\n", pos);
    if (head_end == std::string::npos) break;
    const std::string head = body.substr(pos, head_end - pos);
    size_t data_beg = head_end + 4;
    size_t data_end = body.find(delim, data_beg);
    if (data_end == std::string::npos) data_end = body.size();
    while (data_end > data_beg &&
           (body[data_end - 1] == '\n' || body[data_end - 1] == '\r')) {
      --data_end;
    }
    if (head.find("name=\"file\"") != std::string::npos ||
        head.find("filename=") != std::string::npos) {
      return body.substr(data_beg, data_end - data_beg);
    }
    pos = data_end;
  }
  return "";
}

void HandleConnection(int fd, FUNASR_HANDLE handle) {
  // read the request head
  std::string head;
  char c;
  while (head.size() < (1u << 16) &&
         head.find("\r\n\r\n") == std::string::npos) {
    if (::recv(fd, &c, 1, 0) != 1) { ::close(fd); return; }
    head.push_back(c);
  }
  const size_t line_end = head.find("\r\n");
  const std::string req_line = head.substr(0, line_end);
  const bool is_post = req_line.compare(0, 5, "POST ") == 0;
  const bool is_get = req_line.compare(0, 4, "GET ") == 0;
  const size_t sp = req_line.find(' ');
  const size_t sp2 = req_line.find(' ', sp + 1);
  const std::string path =
      sp2 == std::string::npos ? "" : req_line.substr(sp + 1, sp2 - sp - 1);

  auto header = [&](const char* name) -> std::string {
    std::string lower_head;
    lower_head.reserve(head.size());
    for (char ch : head) lower_head.push_back(std::tolower(ch));
    std::string key = std::string("\r\n") + name + ":";
    const size_t p = lower_head.find(key);
    if (p == std::string::npos) return "";
    size_t v = p + key.size();
    const size_t e = head.find("\r\n", v);
    std::string val = head.substr(v, e - v);
    while (!val.empty() && val.front() == ' ') val.erase(val.begin());
    return val;
  };

  if (is_get && (path == "/health" || path == "/")) {
    SendResponse(fd, "200 OK", "{\"status\": \"ok\"}");
    ::close(fd);
    return;
  }
  if (!is_post || path != "/recognize") {
    SendResponse(fd, "404 Not Found", "{\"error\": \"no route\"}");
    ::close(fd);
    return;
  }
  const long length = std::atol(header("content-length").c_str());
  if (length <= 0 || length > (256 << 20)) {
    SendResponse(fd, "400 Bad Request", "{\"error\": \"bad content-length\"}");
    ::close(fd);
    return;
  }
  std::string body(static_cast<size_t>(length), '\0');
  if (!ReadExact(fd, body.data(), body.size())) { ::close(fd); return; }
  const std::string audio = ExtractAudio(header("content-type"), body);
  if (audio.empty()) {
    SendResponse(fd, "400 Bad Request", "{\"error\": \"missing audio\"}");
    ::close(fd);
    return;
  }

  std::string text, stamp;
  if (handle != nullptr) {
    FUNASR_RESULT res = FunOfflineInfer(handle, audio.data(),
                                        static_cast<int>(audio.size()),
                                        FUNASR_MODE_OFFLINE, 16000);
    if (res != nullptr) {
      const char* t = FunASRGetResult(res, 0);
      if (t != nullptr) text = t;
      const char* s = FunASRGetStamp(res);
      if (s != nullptr) stamp = s;
      FunASRFreeResult(res);
    }
  }
  std::string json = "{\"text\": \"" + JsonEscape(text) + "\"";
  if (!stamp.empty() && stamp != "[]") json += ", \"timestamp\": " + stamp;
  json += "}";
  SendResponse(fd, "200 OK", json);
  ::close(fd);
}

}  // namespace

int main(int argc, char** argv) {
  int port = 10096;
  std::string model_dir;
  int threads = 4;
  for (int i = 1; i < argc; ++i) {
    const std::string a = argv[i];
    auto next = [&](const char* flag) -> const char* {
      if (i + 1 >= argc) {
        std::fprintf(stderr, "%s needs a value\n", flag);
        std::exit(2);
      }
      return argv[++i];
    };
    if (a == "--port") port = std::atoi(next("--port"));
    else if (a == "--model-dir") model_dir = next("--model-dir");
    else if (a == "--decoder-thread-num") threads = std::atoi(next("-t"));
    else if (a == "--help" || a == "-h") {
      std::printf("usage: funasr-tpu-http-server [--port N] [--model-dir DIR] "
                  "[--decoder-thread-num N]\n");
      return 0;
    }
  }
  FUNASR_HANDLE handle = nullptr;
  if (!model_dir.empty()) {
    handle = FunASRInit(model_dir.c_str(), threads);
    if (handle == nullptr) {
      std::fprintf(stderr, "failed to init model from %s\n", model_dir.c_str());
      return 1;
    }
  } else {
    std::fprintf(stderr, "warning: no --model-dir; serving empty text\n");
  }

  const int server_fd = ::socket(AF_INET, SOCK_STREAM, 0);
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
  std::fprintf(stderr, "funasr-tpu-http-server listening on :%d\n", port);
  while (true) {
    const int fd = ::accept(server_fd, nullptr, nullptr);
    if (fd < 0) continue;
    std::thread(HandleConnection, fd, handle).detach();
  }
}
