// Hotword bias trie for decode-time keyword boosting.
//
// TPU-era counterpart of the reference's WFST hotword decoder
// (FunASR runtime/onnxruntime/src/bias-lm.cpp:180 builds an incremental bias
// LM over openfst; the C API entry is CompileHotwordEmbedding). This runtime
// uses a token-id prefix trie with per-step incremental scores: walking a
// hotword prefix earns +boost per matched token, and falling off a partial
// match refunds the accumulated bonus (the standard lattice-free contextual
// biasing recipe, equivalent to the reference's fst_inc_wts_ weights).
//
// State is a single int (trie node); the scorer is pure:
//   next_state, delta = Step(state, token_id)
// making it usable from the greedy/beam loops of the PJRT path and from
// host-side rescoring.
#ifndef FUNASR_TPU_HOTWORD_H_
#define FUNASR_TPU_HOTWORD_H_

#include <map>
#include <string>
#include <vector>

namespace funasr_tpu {

class Vocab;

class HotwordTrie {
 public:
  // hotwords: token-id sequences with an optional per-word boost.
  void Add(const std::vector<int>& token_ids, float boost = 3.0f);

  // Parse "词语 另一个词 word@@piece" against a vocab (greedy longest-match
  // per UTF-8 char / BPE piece). English words are first looked up in
  // seg_dict (word -> space-joined BPE pieces; the reference seg_dict.cpp
  // role) so they tokenize exactly as the acoustic model emits them.
  // Returns number of words compiled.
  int Compile(const std::string& hotwords, const Vocab& vocab,
              float boost = 3.0f,
              const std::map<std::string, std::string>* seg_dict = nullptr);

  // Load "word piece piece ..." lines (the reference seg_dict file format).
  static std::map<std::string, std::string> LoadSegDict(
      const std::string& path);

  // Build Aho-Corasick failure links (call once after the last Add/Compile;
  // Step() builds lazily if needed). Falling off a prefix follows the longest
  // proper-suffix state instead of resetting to the root, so overlapping
  // hotwords ("abx" active while "bcd" starts) keep their earned boost.
  void Build();

  // Advance from `state` with `token`. Returns the new state and adds the
  // incremental score to *delta: +boost on extending a hotword prefix,
  // +final bonus on completing one, minus the non-reusable part of the
  // accumulated partial bonus on falling back (suffix overlap is kept).
  int Step(int state, int token, float* delta) const;

  // Tokens whose Step() from `state` earns a positive delta, with that delta
  // (children of the state plus fresh hotword starts from the root). This is
  // what a greedy decoder adds to the logits before the argmax — the
  // lattice-free counterpart of the reference wfst-decoder's per-frame
  // bias-LM weights (bias-lm.cpp fst_inc_wts_).
  void Candidates(int state,
                  std::vector<std::pair<int, float>>* out) const;

  // Boost earned by the in-progress (incomplete) hotword prefix at `state`.
  // A beam decoder subtracts this at end of sequence so a hypothesis that
  // dies on a partial prefix returns its advance bonus — the reference
  // bias-lm.cpp sentence-end semantics (incremental weights are provisional
  // until the word completes).
  float Pending(int state) const;

  int NumStates() const { return static_cast<int>(nodes_.size()); }
  bool empty() const { return nodes_.size() <= 1; }

 private:
  struct Node {
    std::map<int, int> next;
    float accum = 0.0f;   // bonus earned to reach this node
    bool is_end = false;
    int fail = 0;         // Aho-Corasick failure link
  };
  std::vector<Node> nodes_{Node{}};
  bool built_ = false;
};

// Beam search over NAR per-position logits with bias-LM rescoring: each
// hypothesis carries a trie state; every expansion adds logit + incremental
// bias delta (refunds included), and incomplete prefixes give back their
// pending bonus at the end. This is the lattice counterpart of the greedy
// bias-aware argmax — hypotheses whose first hotword char loses the local
// argmax survive to collect the rest of the word (reference
// wfst-decoder.cpp beam + bias-lm.cpp roles). Returns one chosen token per
// position (blanks included; the caller's emission loop filters them).
std::vector<int> BiasBeamDecode(const float* logits, int n_tok, int vocab_size,
                                const HotwordTrie* trie, int beam, int blank,
                                int sos, int eos);

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_HOTWORD_H_
