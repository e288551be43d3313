#include "vocab.h"

#include <fstream>

namespace funasr_tpu {

namespace {

bool IsAsciiWord(const std::string& tok) {
  if (tok.empty()) return false;
  for (unsigned char c : tok) {
    if (c >= 0x80) return false;
    if (!std::isalpha(c) && c != '\'' && c != '@') return false;
  }
  return true;
}

}  // namespace

bool Vocab::Load(const std::string& tokens_file) {
  std::ifstream f(tokens_file);
  if (!f.is_open()) return false;
  std::string line;
  while (std::getline(f, line)) {
    while (!line.empty() && (line.back() == '\r' || line.back() == '\n')) {
      line.pop_back();
    }
    tokens_.push_back(line);
  }
  for (int i = 0; i < static_cast<int>(tokens_.size()); ++i) {
    token2id_.emplace(tokens_[i], i);  // first occurrence wins
  }
  return !tokens_.empty();
}

int Vocab::Token2Id(const std::string& token) const {
  auto it = token2id_.find(token);
  if (it != token2id_.end()) return it->second;
  it = token2id_.find(unk_);
  return it != token2id_.end() ? it->second : 0;
}

const std::string& Vocab::Id2Token(int id) const {
  if (id < 0 || id >= static_cast<int>(tokens_.size())) return unk_;
  return tokens_[id];
}

std::string Vocab::Decode(const std::vector<int>& ids, int blank_id, int sos,
                          int eos) const {
  std::string out;
  bool prev_ascii = false;
  std::string bpe_buffer;
  for (int id : ids) {
    if (id == blank_id || id == sos || id == eos) continue;
    const std::string& tok = Id2Token(id);
    if (tok == "<s>" || tok == "</s>" || tok == "<unk>" || tok == "<OOV>") continue;
    const bool ascii = IsAsciiWord(tok);
    if (tok.size() > 2 && tok.substr(tok.size() - 2) == "@@") {
      bpe_buffer += tok.substr(0, tok.size() - 2);
      continue;
    }
    std::string word = bpe_buffer + tok;
    bpe_buffer.clear();
    if (ascii && prev_ascii && !out.empty()) out += " ";
    out += word;
    prev_ascii = ascii;
  }
  if (!bpe_buffer.empty()) out += bpe_buffer;
  return out;
}

}  // namespace funasr_tpu
