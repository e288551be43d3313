// Minimal fp32/int8 NN primitives for the pure-C++ SAN-M engine.
// The engine role mirrors the reference's python-free runtimes
// (FunASR runtime/onnxruntime/src/paraformer.cpp:428 Forward; ggml edge engine
// runtime/llama.cpp/DESIGN.md) with weights exported from the JAX param trees.

#ifndef FUNASR_TPU_NN_H_
#define FUNASR_TPU_NN_H_

#include <cstdint>
#include <map>
#include <string>
#include <vector>

namespace funasr_tpu {

// A weight tensor: fp32, or int8 with per-output-channel scales.
struct WTensor {
  std::vector<int64_t> shape;
  std::vector<float> f32;
  std::vector<int8_t> i8;
  std::vector<float> scales;  // int8: one per last-dim column
  // AMX backends (nn_amx.cc): VNNI B-tile repack, filled at FTR load when
  // the host TMUL unit is usable; empty otherwise. For int8 tensors the
  // bytes are s8 codes; for fp32 tensors (opt-in FUNASR_TPU_AMX_BF16=1)
  // they are bf16 pairs.
  std::vector<int8_t> amx_pack;
  int64_t amx_k_pad = 0, amx_n_pad = 0;
  bool amx_bf16 = false;
  bool quantized() const { return !i8.empty(); }
  int64_t rows() const {  // product of all dims but last
    int64_t r = 1;
    for (size_t i = 0; i + 1 < shape.size(); ++i) r *= shape[i];
    return r;
  }
  int64_t cols() const { return shape.empty() ? 0 : shape.back(); }
};

// y (m,n) = x (m,k) @ w (k,n) [+ bias (n)]; w may be int8 per-column quantized.
void MatMul(const float* x, int m, int k, const WTensor& w, const float* bias,
            float* y);

// Raw-pointer fp32 GEMM core (the cache-tiled path MatMul uses): y (m,n) =
// x (m,k) @ w (k,n row-major) [+ bias]. For activation-activation products
// (attention scores/context) where no WTensor exists.
void GemmF32(const float* x, int m, int k, const float* w, int n,
             const float* bias, float* y);

// AMX-INT8 backend (nn_amx.cc; stubs when the toolchain/host lacks AMX).
// AmxInt8Available: CPUID + Linux XTILEDATA permission, FUNASR_TPU_NO_AMX=1
// kill switch. AmxPackWeight fills WTensor::amx_pack. AmxMatMulInt8 runs the
// int8 GEMM with dynamic per-row activation quantization; returns false (and
// leaves y untouched) when the tensor is unpacked or shapes do not line up.
bool AmxInt8Available();
void AmxPackWeight(WTensor& w);
bool AmxMatMulInt8(const float* x, int m, int k, const WTensor& w,
                   const float* bias, float* y);

// AMX-BF16 backend for fp32 engines — OPT-IN via FUNASR_TPU_AMX_BF16=1
// (bf16's 8-bit mantissa breaks the 1e-4 C++<->JAX parity budget, so the
// default fp32 path is untouched; accumulation stays f32 in the TMUL).
// AmxPackWeightBf16 rounds fp32 weights to bf16 VNNI tiles at FTR load;
// AmxMatMulBf16 returns false when unpacked/unavailable.
bool AmxBf16Available();
void AmxPackWeightBf16(WTensor& w);
bool AmxMatMulBf16(const float* x, int m, int k, const WTensor& w,
                   const float* bias, float* y);
// activation x activation GEMM (attention scores/context) with per-call
// bf16 conversion of both operands; false when unavailable/too small
bool AmxGemmBf16Dynamic(const float* x, int m, int k, const float* w, int n,
                        const float* bias, float* y);

// Raw fp32 view for weights consumed outside MatMul (depthwise convs, LSTM
// gates). Aborts loudly if the tensor arrived int8-quantized — a silent
// empty-vector read here produced garbage transcripts before.
const float* RawF32(const WTensor& w, const char* what);

// x (t,c): per-row layer norm with eps 1e-12 (FunASR convention).
void LayerNorm(float* x, int t, int c, const float* scale, const float* bias);

void Relu(float* x, int64_t n);
void SigmoidV(float* x, int64_t n);
void SoftmaxRow(float* x, int n);  // in-place over one row

// Depthwise conv over time: x (t,c), kernel w (k,c), zero pads; out (t,c)
// where t_out = t + left + right - k + 1 == t for SAME-style pads.
void DepthwiseConv1d(const float* x, int t, int c, const float* w, int k,
                     int left_pad, int right_pad, float* out);

// Full conv1d: x (t,c_in), w (k,c_in,c_out) + bias, SAME-style pads -> (t,c_out).
void Conv1d(const float* x, int t, int c_in, const WTensor& w, const float* bias,
            int left_pad, int right_pad, float* out);

// FunASR SinusoidalPositionEncoder: x (t,d) += pe(positions start at 1).
void AddSinusoidalPe(float* x, int t, int d, int start_pos = 1);

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_NN_H_
