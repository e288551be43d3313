#include "hotword.h"

#include <algorithm>
#include <cctype>
#include <cstring>
#include <fstream>
#include <sstream>

#include "vocab.h"

namespace funasr_tpu {

void HotwordTrie::Add(const std::vector<int>& token_ids, float boost) {
  if (token_ids.empty()) return;
  int node = 0;
  float accum = 0.0f;
  for (int tok : token_ids) {
    accum += boost;
    auto it = nodes_[node].next.find(tok);
    if (it == nodes_[node].next.end()) {
      nodes_.push_back(Node{});
      nodes_.back().accum = accum;
      nodes_[node].next[tok] = static_cast<int>(nodes_.size()) - 1;
      node = static_cast<int>(nodes_.size()) - 1;
    } else {
      node = it->second;
    }
  }
  nodes_[node].is_end = true;
}

std::map<std::string, std::string> HotwordTrie::LoadSegDict(
    const std::string& path) {
  std::map<std::string, std::string> out;
  std::ifstream f(path);
  std::string line;
  while (std::getline(f, line)) {
    const size_t sp = line.find_first_of(" \t");
    if (sp == std::string::npos) continue;
    const size_t val = line.find_first_not_of(" \t", sp);
    if (val == std::string::npos) continue;
    out[line.substr(0, sp)] = line.substr(val);
  }
  return out;
}

int HotwordTrie::Compile(const std::string& hotwords, const Vocab& vocab,
                         float boost,
                         const std::map<std::string, std::string>* seg_dict) {
  // token lookup table (vocab is small; linear build once)
  std::map<std::string, int> tok2id;
  for (int i = 0; i < vocab.Size(); ++i) tok2id[vocab.Id2Token(i)] = i;

  std::istringstream ss(hotwords);
  std::string word;
  int compiled = 0;
  while (ss >> word) {
    float w_boost = boost;
    size_t at = word.rfind("@@");
    // "word@@5" weight suffix (reference hotword file format "word weight")
    if (at != std::string::npos && at + 2 < word.size() &&
        word.find_first_not_of("0123456789.", at + 2) == std::string::npos) {
      w_boost = std::stof(word.substr(at + 2));
      word = word.substr(0, at);
    }
    // English words tokenize through seg_dict when available (reference
    // seg_dict.cpp: exact word -> BPE-piece mapping, lowercased)
    if (seg_dict != nullptr) {
      std::string lower = word;
      for (char& c : lower) c = std::tolower(static_cast<unsigned char>(c));
      auto sd = seg_dict->find(lower);
      if (sd != seg_dict->end()) {
        std::istringstream ps(sd->second);
        std::string piece;
        std::vector<int> ids;
        bool ok = true;
        while (ps >> piece) {
          auto it = tok2id.find(piece);
          if (it == tok2id.end()) { ok = false; break; }
          ids.push_back(it->second);
        }
        if (ok && !ids.empty()) {
          Add(ids, w_boost);
          ++compiled;
          continue;
        }
      }
    }
    // greedy longest-match tokenization over UTF-8
    std::vector<int> ids;
    size_t i = 0;
    bool ok = true;
    while (i < word.size()) {
      size_t best_len = 0;
      int best_id = -1;
      for (size_t len = word.size() - i; len >= 1; --len) {
        auto it = tok2id.find(word.substr(i, len));
        if (it != tok2id.end()) {
          best_len = len;
          best_id = it->second;
          break;
        }
      }
      if (best_id < 0) { ok = false; break; }
      ids.push_back(best_id);
      i += best_len;
    }
    if (ok && !ids.empty()) {
      Add(ids, w_boost);
      ++compiled;
    }
  }
  return compiled;
}

void HotwordTrie::Build() {
  // BFS Aho-Corasick failure links: fail(child of u via t) = the deepest
  // proper-suffix state reachable via t from fail(u)'s chain.
  std::vector<int> queue;
  nodes_[0].fail = 0;
  for (auto& kv : nodes_[0].next) {
    nodes_[kv.second].fail = 0;
    queue.push_back(kv.second);
  }
  for (size_t qi = 0; qi < queue.size(); ++qi) {
    int u = queue[qi];
    for (auto& kv : nodes_[u].next) {
      int tok = kv.first, child = kv.second;
      int f = nodes_[u].fail;
      while (f != 0 && !nodes_[f].next.count(tok)) f = nodes_[f].fail;
      auto it = nodes_[f].next.find(tok);
      nodes_[child].fail = (it != nodes_[f].next.end() && it->second != child)
                               ? it->second
                               : 0;
      queue.push_back(child);
    }
  }
  built_ = true;
}

int HotwordTrie::Step(int state, int token, float* delta) const {
  if (!built_) const_cast<HotwordTrie*>(this)->Build();
  if (state < 0 || state >= static_cast<int>(nodes_.size())) state = 0;
  int node = state;
  // follow failure links until a state with the transition (or the root);
  // refund only the boost of the prefix part that does NOT survive as the
  // fail state's suffix
  while (node != 0 && !nodes_[node].next.count(token)) {
    int f = nodes_[node].fail;
    *delta += nodes_[f].accum - nodes_[node].accum;
    node = f;
  }
  auto it = nodes_[node].next.find(token);
  if (it != nodes_[node].next.end()) {
    const Node& nxt = nodes_[it->second];
    *delta += nxt.accum - nodes_[node].accum;  // earn this step's boost
    if (nxt.is_end) return 0;                  // word completed: bonus kept
    return it->second;
  }
  return 0;
}

float HotwordTrie::Pending(int state) const {
  if (state < 0 || state >= static_cast<int>(nodes_.size())) return 0.0f;
  return nodes_[state].accum;
}

void HotwordTrie::Candidates(int state,
                             std::vector<std::pair<int, float>>* out) const {
  if (!built_) const_cast<HotwordTrie*>(this)->Build();
  if (state < 0 || state >= static_cast<int>(nodes_.size())) state = 0;
  out->clear();
  // walk the failure chain: transitions available from `state` (deepest
  // match wins; shallower duplicates are skipped)
  std::map<int, float> best;
  int node = state;
  float fall_refund = 0.0f;
  while (true) {
    for (const auto& kv : nodes_[node].next) {
      if (best.count(kv.first)) continue;
      const float delta =
          fall_refund + nodes_[kv.second].accum - nodes_[node].accum;
      if (delta > 0.0f) best[kv.first] = delta;
    }
    if (node == 0) break;
    const int f = nodes_[node].fail;
    fall_refund += nodes_[f].accum - nodes_[node].accum;
    node = f;
  }
  out->assign(best.begin(), best.end());
}

std::vector<int> BiasBeamDecode(const float* logits, int n_tok, int vocab_size,
                                const HotwordTrie* trie, int beam, int blank,
                                int sos, int eos) {
  struct Hyp {
    std::vector<int> ids;
    int state = 0;
    float score = 0.0f;
  };
  if (beam < 1) beam = 1;
  std::vector<Hyp> hyps{Hyp{}};
  std::vector<std::pair<int, float>> hw_cands;
  std::vector<int> plain;  // per-position acoustic top-K (shared by all hyps)
  const int top_k = std::max(beam, 4);
  for (int i = 0; i < n_tok; ++i) {
    const float* row = logits + static_cast<int64_t>(i) * vocab_size;
    plain.clear();
    for (int j = 0; j < vocab_size; ++j) {
      // insertion into a K-sized best list (vocab scan dominates anyway)
      if (static_cast<int>(plain.size()) < top_k) {
        plain.push_back(j);
        if (static_cast<int>(plain.size()) == top_k)
          std::sort(plain.begin(), plain.end(),
                    [&](int a, int b) { return row[a] > row[b]; });
      } else if (row[j] > row[plain.back()]) {
        plain.back() = j;
        for (size_t k = plain.size() - 1;
             k > 0 && row[plain[k]] > row[plain[k - 1]]; --k)
          std::swap(plain[k], plain[k - 1]);
      }
    }
    std::vector<Hyp> next;
    for (const Hyp& h : hyps) {
      // candidate set: acoustic top-K plus every bias-LM extension from the
      // hypothesis's trie state (so hotword chars outside the top-K survive)
      std::vector<int> cands(plain);
      if (trie != nullptr) {
        trie->Candidates(h.state, &hw_cands);
        for (const auto& [tok, _] : hw_cands)
          if (tok < vocab_size &&
              std::find(cands.begin(), cands.end(), tok) == cands.end())
            cands.push_back(tok);
      }
      for (int tok : cands) {
        Hyp nh;
        nh.ids = h.ids;
        nh.ids.push_back(tok);
        nh.state = h.state;
        float delta = 0.0f;
        if (trie != nullptr && tok != blank && tok != sos && tok != eos)
          nh.state = trie->Step(h.state, tok, &delta);
        nh.score = h.score + row[tok] + delta;
        next.push_back(std::move(nh));
      }
    }
    std::sort(next.begin(), next.end(),
              [](const Hyp& a, const Hyp& b) { return a.score > b.score; });
    if (static_cast<int>(next.size()) > beam) next.resize(beam);
    hyps = std::move(next);
  }
  // sentence end: refund the pending bonus of incomplete prefixes
  const Hyp* best = nullptr;
  float best_score = 0.0f;
  for (const Hyp& h : hyps) {
    const float s =
        h.score - (trie != nullptr ? trie->Pending(h.state) : 0.0f);
    if (best == nullptr || s > best_score) {
      best = &h;
      best_score = s;
    }
  }
  return best != nullptr ? best->ids : std::vector<int>();
}

// ---- C API -------------------------------------------------------------------

extern "C" {

void* FunASRHotwordCompile(const char* hotwords, const char* tokens_file,
                           float boost) {
  if (hotwords == nullptr || tokens_file == nullptr) return nullptr;
  auto* vocab = new Vocab();
  if (!vocab->Load(tokens_file)) {
    delete vocab;
    return nullptr;
  }
  // a seg_dict sibling of tokens.txt enables exact English-word BPE mapping
  std::string seg_path(tokens_file);
  const size_t slash = seg_path.find_last_of('/');
  seg_path = (slash == std::string::npos ? std::string()
                                         : seg_path.substr(0, slash + 1)) +
             "seg_dict";
  auto seg = HotwordTrie::LoadSegDict(seg_path);
  auto* trie = new HotwordTrie();
  trie->Compile(hotwords, *vocab, boost, seg.empty() ? nullptr : &seg);
  trie->Build();  // eager: Step() is then safe from concurrent decoders
  delete vocab;
  return trie;
}

int FunASRHotwordStep(void* trie, int state, int token, float* delta) {
  if (trie == nullptr) return 0;
  return static_cast<HotwordTrie*>(trie)->Step(state, token, delta);
}

void FunASRHotwordFree(void* trie) {
  delete static_cast<HotwordTrie*>(trie);
}

int FunASRBiasBeamDecode(const float* logits, int n_tok, int vocab_size,
                         void* trie, int beam, int blank, int sos, int eos,
                         int* out_ids) {
  if (logits == nullptr || out_ids == nullptr || n_tok <= 0) return 0;
  const auto ids =
      BiasBeamDecode(logits, n_tok, vocab_size,
                     static_cast<const HotwordTrie*>(trie), beam, blank, sos,
                     eos);
  for (size_t i = 0; i < ids.size(); ++i) out_ids[i] = ids[i];
  return static_cast<int>(ids.size());
}

}  // extern "C"

}  // namespace funasr_tpu
