// FTR: the runtime weight container written by funasr_tpu.export_runtime
// .export_ftr (flattened JAX param tree; fp32 or weight-only int8 with
// per-column scales). Layout:
//   magic "FTR1" | u32 meta_len | meta ("key value\n" lines) | u32 n_tensors
//   per tensor: u32 name_len | name | u8 dtype (0=f32,1=i8,2=i4-packed) | u8
//               ndim | i64 dims[ndim] | [i8/i4: i64 n_scales | f32 scales[]]
//               | data (i4: nibble pairs, low nibble = even flat index)
// The tensor-name convention is the JAX tree path with "/" separators and
// stacked layers unstacked to ".{i}" (e.g. "encoder/encoders.3/norm1/scale").

#ifndef FUNASR_TPU_FTR_H_
#define FUNASR_TPU_FTR_H_

#include <map>
#include <string>

#include "nn.h"

namespace funasr_tpu {

struct FtrFile {
  std::map<std::string, std::string> meta;
  std::map<std::string, WTensor> tensors;

  bool Load(const std::string& path);
  const WTensor* Find(const std::string& name) const;
  // meta accessors with defaults
  int MetaInt(const std::string& key, int dflt) const;
  float MetaFloat(const std::string& key, float dflt) const;
  std::string MetaStr(const std::string& key, const std::string& dflt) const;
};

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_FTR_H_
