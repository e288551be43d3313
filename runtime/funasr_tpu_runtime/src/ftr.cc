#include "ftr.h"

#include <cmath>
#include <cstdio>
#include <cstring>
#include <sstream>

namespace funasr_tpu {

namespace {

bool ReadExact(FILE* f, void* buf, size_t n) {
  return std::fread(buf, 1, n, f) == n;
}

bool EndsWith(const std::string& s, const char* suffix) {
  const size_t n = std::strlen(suffix);
  return s.size() >= n && s.compare(s.size() - n, n, suffix) == 0;
}

}  // namespace

bool FtrFile::Load(const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  char magic[4];
  if (!ReadExact(f, magic, 4) || std::memcmp(magic, "FTR1", 4) != 0) {
    std::fclose(f);
    return false;
  }
  uint32_t meta_len = 0;
  if (!ReadExact(f, &meta_len, 4)) { std::fclose(f); return false; }
  std::string meta_str(meta_len, '\0');
  if (!ReadExact(f, meta_str.data(), meta_len)) { std::fclose(f); return false; }
  std::istringstream ms(meta_str);
  std::string line;
  while (std::getline(ms, line)) {
    const size_t sp = line.find(' ');
    if (sp != std::string::npos) meta[line.substr(0, sp)] = line.substr(sp + 1);
  }
  uint32_t n_tensors = 0;
  if (!ReadExact(f, &n_tensors, 4)) { std::fclose(f); return false; }
  for (uint32_t i = 0; i < n_tensors; ++i) {
    uint32_t name_len = 0;
    if (!ReadExact(f, &name_len, 4)) break;
    std::string name(name_len, '\0');
    if (!ReadExact(f, name.data(), name_len)) break;
    uint8_t dtype = 0, ndim = 0;
    if (!ReadExact(f, &dtype, 1) || !ReadExact(f, &ndim, 1)) break;
    WTensor t;
    t.shape.resize(ndim);
    if (!ReadExact(f, t.shape.data(), ndim * sizeof(int64_t))) break;
    int64_t numel = 1;
    for (int64_t d : t.shape) numel *= d;
    bool ok = true;
    if (dtype == 1) {
      int64_t n_scales = 0;
      ok = ReadExact(f, &n_scales, 8);
      if (ok) {
        t.scales.resize(n_scales);
        ok = ReadExact(f, t.scales.data(), n_scales * sizeof(float));
      }
      if (ok) {
        t.i8.resize(numel);
        ok = ReadExact(f, t.i8.data(), numel);
      }
    } else if (dtype == 2) {
      // int4: nibble-packed pairs (low nibble = even flat index), values in
      // [-7, 7], per-output-channel scale absmax/7. Expand to int8 in memory
      // so the downstream int8 GEMM / AMX TMUL path is shared unchanged —
      // the dequant formula (q * scale) is identical, only the value range
      // narrows (ggml Q4 role; exporter funasr_tpu/export_runtime.py).
      int64_t n_scales = 0;
      ok = ReadExact(f, &n_scales, 8);
      if (ok) {
        t.scales.resize(n_scales);
        ok = ReadExact(f, t.scales.data(), n_scales * sizeof(float));
      }
      if (ok) {
        const int64_t n_packed = (numel + 1) / 2;
        std::vector<uint8_t> packed(n_packed);
        ok = ReadExact(f, packed.data(), n_packed);
        if (ok) {
          t.i8.resize(numel);
          for (int64_t j = 0; j < numel; ++j) {
            const uint8_t nib = (j & 1) ? (packed[j >> 1] >> 4)
                                        : (packed[j >> 1] & 0x0F);
            t.i8[j] = static_cast<int8_t>(((nib ^ 8) - 8));  // sign-extend
          }
        }
      }
    } else if (dtype == 3 || dtype == 4) {
      // group-wise sub-4-bit (exporter _write_ftr: 3 = int3 symmetric q in
      // [-3,3], 8 values per 3 bytes, groups of 64 (3.5 bpw); 4 = int2
      // asymmetric v ~= q*scale+min, q in [0,3], 4 per byte, groups of 128
      // (2.5 bpw)). Reconstruct f32 then REQUANTIZE per output column to the
      // shared int8 layout — the int8 rounding is negligible against the
      // 2-3 bit quantization error, and the downstream int8 GEMM / AMX TMUL
      // path stays unchanged (ggml Q2_K/Q3_K role: install-size play).
      const int64_t group = dtype == 3 ? 64 : 128;
      int64_t n_groups = 0;
      ok = ReadExact(f, &n_groups, 8);
      std::vector<float> scales(ok ? n_groups : 0), mins;
      if (ok) ok = ReadExact(f, scales.data(), n_groups * sizeof(float));
      if (ok && dtype == 4) {
        mins.resize(n_groups);
        ok = ReadExact(f, mins.data(), n_groups * sizeof(float));
      }
      const int64_t padded = (numel + group - 1) / group * group;
      std::vector<float> vals(ok ? padded : 0);
      if (ok && dtype == 3) {
        const int64_t n_words = padded / 8;
        std::vector<uint8_t> bytes(n_words * 3);
        ok = ReadExact(f, bytes.data(), bytes.size());
        if (ok) {
          for (int64_t wi = 0; wi < n_words; ++wi) {
            const uint32_t word =
                static_cast<uint32_t>(bytes[wi * 3]) |
                (static_cast<uint32_t>(bytes[wi * 3 + 1]) << 8) |
                (static_cast<uint32_t>(bytes[wi * 3 + 2]) << 16);
            for (int j = 0; j < 8; ++j) {
              const int64_t idx = wi * 8 + j;
              const int qv = static_cast<int>((word >> (3 * j)) & 0x7) - 3;
              vals[idx] = qv * scales[idx / group];
            }
          }
        }
      } else if (ok) {
        const int64_t n_bytes = padded / 4;
        std::vector<uint8_t> bytes(n_bytes);
        ok = ReadExact(f, bytes.data(), n_bytes);
        if (ok) {
          for (int64_t idx = 0; idx < padded; ++idx) {
            const int qv = (bytes[idx >> 2] >> (2 * (idx & 3))) & 0x3;
            vals[idx] = qv * scales[idx / group] + mins[idx / group];
          }
        }
      }
      if (ok) {
        const int64_t cols = t.shape.back();  // exporter quantizes 2-D only
        const int64_t rows = numel / cols;
        t.scales.assign(cols, 1e-12f);
        for (int64_t r = 0; r < rows; ++r)
          for (int64_t c = 0; c < cols; ++c)
            t.scales[c] = std::max(t.scales[c],
                                   std::fabs(vals[r * cols + c]));
        for (float& s : t.scales) s /= 127.0f;
        t.i8.resize(numel);
        for (int64_t r = 0; r < rows; ++r)
          for (int64_t c = 0; c < cols; ++c) {
            const float q = std::round(vals[r * cols + c] / t.scales[c]);
            t.i8[r * cols + c] = static_cast<int8_t>(
                std::max(-127.0f, std::min(127.0f, q)));
          }
      }
    } else {
      t.f32.resize(numel);
      ok = ReadExact(f, t.f32.data(), numel * sizeof(float));
    }
    if (!ok) break;
    // Depthwise-conv kernels are consumed raw via WTensor::f32 (not through
    // the int8-aware MatMul). Older exporters quantized them; dequantize at
    // load so those files still produce correct (int8-precision) kernels.
    if (!t.i8.empty() &&
        (EndsWith(name, "fsmn_block/w") || EndsWith(name, "conv_left/w") ||
         EndsWith(name, "conv_right/w"))) {
      const int64_t cols = t.cols();
      t.f32.resize(t.i8.size());
      for (size_t j = 0; j < t.i8.size(); ++j)
        t.f32[j] = static_cast<float>(t.i8[j]) *
                   t.scales[static_cast<int64_t>(j) % cols];
      t.i8.clear();
      t.scales.clear();
    }
    // repack matmul weights for the AMX TMUL unit when the host has one
    // (no-op otherwise); done at load so engines share one packed copy
    if (t.quantized()) {
      AmxPackWeight(t);
    } else {
      // opt-in bf16 repack (FUNASR_TPU_AMX_BF16=1) — matmul weights only:
      // embeddings are row-gathered and depthwise-conv kernels are consumed
      // raw (GetRawF32), the same exclusion set the int8 exporter applies
      // (funasr_tpu/export_runtime.py:229-239)
      const bool is_embed = name.rfind("embed/", 0) == 0 ||
                            name.find("/embed/") != std::string::npos;
      auto ends_with = [&name](const char* suf) {
        const size_t ls = std::strlen(suf);
        return name.size() >= ls &&
               name.compare(name.size() - ls, ls, suf) == 0;
      };
      if (!is_embed && !ends_with("fsmn_block/w") &&
          !ends_with("conv_left/w") && !ends_with("conv_right/w"))
        AmxPackWeightBf16(t);
    }
    tensors.emplace(std::move(name), std::move(t));
  }
  std::fclose(f);
  return n_tensors == tensors.size();
}

const WTensor* FtrFile::Find(const std::string& name) const {
  auto it = tensors.find(name);
  return it == tensors.end() ? nullptr : &it->second;
}

int FtrFile::MetaInt(const std::string& key, int dflt) const {
  auto it = meta.find(key);
  return it == meta.end() ? dflt : std::atoi(it->second.c_str());
}

float FtrFile::MetaFloat(const std::string& key, float dflt) const {
  auto it = meta.find(key);
  return it == meta.end() ? dflt : static_cast<float>(std::atof(it->second.c_str()));
}

std::string FtrFile::MetaStr(const std::string& key,
                             const std::string& dflt) const {
  auto it = meta.find(key);
  return it == meta.end() ? dflt : it->second;
}

}  // namespace funasr_tpu
