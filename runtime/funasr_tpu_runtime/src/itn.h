// Inverse text normalization (zh/en cardinals, percent, money) for the C++
// runtime.
//
// TPU-era counterpart of the reference's openfst ITN runtime
// (FunASR runtime/onnxruntime/src/itn-token-parser.cpp:157 /
// itn-processor.cpp:89, consuming FAR grammars exported from
// fun_text_processing). This runtime embeds the deterministic rules directly
// (the cardinal + percent subset of funasr_tpu/text/{zh_numbers,en_numbers}.py
// — dates/times/money stay Python-side) with no openfst dependency;
// byte-identical with the Python engine on that subset (tests/test_cpp_itn.py).
#pragma once

#include <string>

namespace funasr_tpu {

// language: "zh" or "en"; anything else returns the input unchanged.
std::string InverseNormalize(const std::string& text,
                             const std::string& language);

}  // namespace funasr_tpu
