// Minimal SHA-1 + base64 for the RFC6455 websocket handshake.
//
// TPU-era counterpart of the reference's websocketpp dependency
// (FunASR runtime/websocket uses websocketpp+asio; this runtime is
// dependency-free). Public-domain-style straightforward implementation.
#pragma once

#include <cstdint>
#include <cstring>
#include <string>

namespace funasr_tpu {

inline void sha1(const uint8_t* data, size_t len, uint8_t out[20]) {
  uint32_t h[5] = {0x67452301u, 0xEFCDAB89u, 0x98BADCFEu, 0x10325476u,
                   0xC3D2E1F0u};
  uint64_t total = static_cast<uint64_t>(len) * 8;
  // message + 0x80 + pad + 8-byte length, processed in 64-byte chunks
  size_t padded = ((len + 8) / 64 + 1) * 64;
  std::string buf(reinterpret_cast<const char*>(data), len);
  buf.push_back(static_cast<char>(0x80));
  buf.resize(padded, '\0');
  for (int i = 0; i < 8; ++i)
    buf[padded - 1 - i] = static_cast<char>((total >> (8 * i)) & 0xFF);

  for (size_t chunk = 0; chunk < padded; chunk += 64) {
    uint32_t w[80];
    for (int i = 0; i < 16; ++i) {
      w[i] = (static_cast<uint8_t>(buf[chunk + 4 * i]) << 24) |
             (static_cast<uint8_t>(buf[chunk + 4 * i + 1]) << 16) |
             (static_cast<uint8_t>(buf[chunk + 4 * i + 2]) << 8) |
             static_cast<uint8_t>(buf[chunk + 4 * i + 3]);
    }
    for (int i = 16; i < 80; ++i) {
      uint32_t v = w[i - 3] ^ w[i - 8] ^ w[i - 14] ^ w[i - 16];
      w[i] = (v << 1) | (v >> 31);
    }
    uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4];
    for (int i = 0; i < 80; ++i) {
      uint32_t f, k;
      if (i < 20) { f = (b & c) | (~b & d); k = 0x5A827999u; }
      else if (i < 40) { f = b ^ c ^ d; k = 0x6ED9EBA1u; }
      else if (i < 60) { f = (b & c) | (b & d) | (c & d); k = 0x8F1BBCDCu; }
      else { f = b ^ c ^ d; k = 0xCA62C1D6u; }
      uint32_t tmp = ((a << 5) | (a >> 27)) + f + e + k + w[i];
      e = d; d = c; c = (b << 30) | (b >> 2); b = a; a = tmp;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d; h[4] += e;
  }
  for (int i = 0; i < 5; ++i) {
    out[4 * i] = (h[i] >> 24) & 0xFF;
    out[4 * i + 1] = (h[i] >> 16) & 0xFF;
    out[4 * i + 2] = (h[i] >> 8) & 0xFF;
    out[4 * i + 3] = h[i] & 0xFF;
  }
}

inline std::string base64(const uint8_t* data, size_t len) {
  static const char tbl[] =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  std::string out;
  out.reserve((len + 2) / 3 * 4);
  for (size_t i = 0; i < len; i += 3) {
    uint32_t v = data[i] << 16;
    if (i + 1 < len) v |= data[i + 1] << 8;
    if (i + 2 < len) v |= data[i + 2];
    out.push_back(tbl[(v >> 18) & 63]);
    out.push_back(tbl[(v >> 12) & 63]);
    out.push_back(i + 1 < len ? tbl[(v >> 6) & 63] : '=');
    out.push_back(i + 2 < len ? tbl[v & 63] : '=');
  }
  return out;
}

inline std::string ws_accept_key(const std::string& client_key) {
  std::string magic = client_key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11";
  uint8_t digest[20];
  sha1(reinterpret_cast<const uint8_t*>(magic.data()), magic.size(), digest);
  return base64(digest, 20);
}

}  // namespace funasr_tpu
