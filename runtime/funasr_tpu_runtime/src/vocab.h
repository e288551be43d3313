// Vocabulary + greedy-decode helpers (counterpart of FunASR
// runtime/onnxruntime/src/vocab.cpp / tokenizer.cpp essentials).

#ifndef FUNASR_TPU_VOCAB_H_
#define FUNASR_TPU_VOCAB_H_

#include <map>
#include <string>
#include <vector>

namespace funasr_tpu {

class Vocab {
 public:
  bool Load(const std::string& tokens_file);  // one token per line (index = id)
  const std::string& Id2Token(int id) const;
  // token -> id; unknown tokens map to "<unk>"'s id (or 0 when absent).
  int Token2Id(const std::string& token) const;
  int Size() const { return static_cast<int>(tokens_.size()); }

  // Paraformer greedy tokens -> surface text (zh chars joined, latin spaced,
  // '@@' BPE merge) — mirrors funasr_tpu.utils.postprocess_utils basics.
  std::string Decode(const std::vector<int>& ids, int blank_id = 0, int sos = 1,
                     int eos = 2) const;

 private:
  std::vector<std::string> tokens_;
  std::map<std::string, int> token2id_;
  std::string unk_ = "<unk>";
};

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_VOCAB_H_
