#include "itn.h"
#include <cstdlib>
#include <cstring>

#include <cstdint>
#include <map>
#include <sstream>
#include <vector>

namespace funasr_tpu {
namespace {

// ---- UTF-8 helpers ----------------------------------------------------------

std::vector<std::string> Utf8Chars(const std::string& s) {
  std::vector<std::string> out;
  for (size_t i = 0; i < s.size();) {
    unsigned char c = s[i];
    size_t n = c < 0x80 ? 1 : (c >> 5) == 0x6 ? 2 : (c >> 4) == 0xE ? 3 : 4;
    out.push_back(s.substr(i, n));
    i += n;
  }
  return out;
}

// ---- Chinese cardinals ------------------------------------------------------

const std::map<std::string, int>& ZhDigits() {
  static const std::map<std::string, int> m = {
      {"零", 0}, {"〇", 0}, {"一", 1}, {"幺", 1}, {"二", 2}, {"两", 2},
      {"三", 3}, {"四", 4}, {"五", 5}, {"六", 6}, {"七", 7}, {"八", 8},
      {"九", 9}};
  return m;
}

const std::map<std::string, int64_t>& ZhUnits() {
  static const std::map<std::string, int64_t> m = {
      {"十", 10}, {"百", 100}, {"千", 1000}};
  return m;
}

const std::map<std::string, int64_t>& ZhBig() {
  static const std::map<std::string, int64_t> m = {
      {"万", 10000}, {"亿", 100000000LL}};
  return m;
}

bool IsZhNumChar(const std::string& ch) {
  return ZhDigits().count(ch) || ZhUnits().count(ch) || ZhBig().count(ch);
}

// Mirrors funasr_tpu/text/zh_numbers.py parse_cn_number (cardinal part).
bool ParseZhNumber(const std::vector<std::string>& chars, std::string* out) {
  if (chars.empty()) return false;
  bool all_digits = true;
  for (const auto& ch : chars)
    if (!ZhDigits().count(ch)) { all_digits = false; break; }
  if (all_digits) {
    std::string s;
    for (const auto& ch : chars) s += std::to_string(ZhDigits().at(ch));
    *out = s;
    return true;
  }
  int64_t total = 0, section = 0, current = 0;
  for (const auto& ch : chars) {
    auto d = ZhDigits().find(ch);
    if (d != ZhDigits().end()) {
      current = d->second;
      continue;
    }
    auto u = ZhUnits().find(ch);
    if (u != ZhUnits().end()) {
      section += (current ? current : 1) * u->second;
      current = 0;
      continue;
    }
    auto b = ZhBig().find(ch);
    if (b != ZhBig().end()) {
      int64_t contribution = section + current;
      if (contribution) total += contribution * b->second;
      else if (total) total *= b->second;  // stacked big units ("万亿")
      else total = b->second;
      section = current = 0;
      continue;
    }
    return false;
  }
  *out = std::to_string(total + section + current);
  return true;
}

std::string ItnZh(const std::string& text) {
  std::vector<std::string> chars = Utf8Chars(text);
  std::string out;
  size_t i = 0;
  while (i < chars.size()) {
    if (!IsZhNumChar(chars[i])) {
      out += chars[i++];
      continue;
    }
    size_t j = i;
    while (j < chars.size() && IsZhNumChar(chars[j])) ++j;
    std::vector<std::string> span(chars.begin() + i, chars.begin() + j);
    std::string val;
    // leave bare "一"/"两" alone ("一起", "两人") — matches the Python rule
    if (span.size() == 1 && (span[0] == "一" || span[0] == "两")) {
      out += span[0];
    } else if (ParseZhNumber(span, &val)) {
      // percent: "百分之N" was consumed as 百(100)分...? no — 分 is not a num
      // char, so the 百分之 prefix is handled here by lookbehind:
      out += val;
    } else {
      for (const auto& ch : span) out += ch;
    }
    i = j;
  }
  // percent pattern 百分之N -> N%  (run before? mirror python order is
  // percent-first; operating on the already-converted digits is equivalent:
  // "百分之五十" became "100分之50" above — undo that form here)
  const std::string k100fen = "100分之";
  size_t p;
  while ((p = out.find(k100fen)) != std::string::npos) {
    size_t q = p + k100fen.size();
    size_t e = q;
    while (e < out.size() &&
           ((out[e] >= '0' && out[e] <= '9') || out[e] == '.'))
      ++e;
    if (e > q)
      out = out.substr(0, p) + out.substr(q, e - q) + "%" + out.substr(e);
    else
      break;
  }
  return out;
}

// ---- English cardinals ------------------------------------------------------

const std::map<std::string, int>& EnOnes() {
  static const std::map<std::string, int> m = {
      {"zero", 0}, {"one", 1}, {"two", 2}, {"three", 3}, {"four", 4},
      {"five", 5}, {"six", 6}, {"seven", 7}, {"eight", 8}, {"nine", 9},
      {"ten", 10}, {"eleven", 11}, {"twelve", 12}, {"thirteen", 13},
      {"fourteen", 14}, {"fifteen", 15}, {"sixteen", 16}, {"seventeen", 17},
      {"eighteen", 18}, {"nineteen", 19}};
  return m;
}

const std::map<std::string, int>& EnTens() {
  static const std::map<std::string, int> m = {
      {"twenty", 20}, {"thirty", 30}, {"forty", 40}, {"fifty", 50},
      {"sixty", 60}, {"seventy", 70}, {"eighty", 80}, {"ninety", 90}};
  return m;
}

const std::map<std::string, int64_t>& EnScales() {
  static const std::map<std::string, int64_t> m = {
      {"hundred", 100}, {"thousand", 1000}, {"million", 1000000},
      {"billion", 1000000000LL}};
  return m;
}

std::string Lower(const std::string& s) {
  std::string out = s;
  for (auto& c : out)
    if (c >= 'A' && c <= 'Z') c += 32;
  return out;
}

std::string StripPunct(const std::string& s) {
  std::string out;
  for (char c : s)
    if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '\'' || (c & 0x80))
      out += c;
  return out;
}

bool IsEnNumWord(const std::string& w) {
  return EnOnes().count(w) || EnTens().count(w) || EnScales().count(w);
}

bool ParseEnNumber(const std::vector<std::string>& words, int64_t* out) {
  int64_t total = 0, current = 0;
  bool seen = false;
  for (const auto& w : words) {
    if (w == "and") continue;
    auto o = EnOnes().find(w);
    if (o != EnOnes().end()) { current += o->second; seen = true; continue; }
    auto t = EnTens().find(w);
    if (t != EnTens().end()) { current += t->second; seen = true; continue; }
    if (w == "hundred") {
      current = (current ? current : 1) * 100;
      seen = true;
      continue;
    }
    auto s = EnScales().find(w);
    if (s != EnScales().end()) {
      total += (current ? current : 1) * s->second;
      current = 0;
      seen = true;
      continue;
    }
    return false;
  }
  if (!seen) return false;
  *out = total + current;
  return true;
}

std::string ItnEn(const std::string& text) {
  std::vector<std::string> words;
  std::istringstream ss(text);
  std::string w;
  while (ss >> w) words.push_back(w);

  std::vector<std::string> out;
  size_t i = 0;
  while (i < words.size()) {
    std::string wi = Lower(StripPunct(words[i]));
    if (IsEnNumWord(wi)) {
      size_t j = i;
      std::vector<std::string> span;
      while (j < words.size()) {
        std::string wj = Lower(StripPunct(words[j]));
        if (wj == "and") {
          // "and" joins only after a scale word ("hundred and five")
          std::string prev = Lower(StripPunct(words[j - 1]));
          std::string nxt = j + 1 < words.size()
                                ? Lower(StripPunct(words[j + 1])) : "";
          if (EnScales().count(prev) && IsEnNumWord(nxt)) {
            span.push_back("and");
            ++j;
            continue;
          }
          break;
        }
        if (!IsEnNumWord(wj)) break;
        span.push_back(wj);
        ++j;
      }
      int64_t val;
      if (ParseEnNumber(span, &val)) {
        if (j < words.size() && Lower(words[j]).rfind("percent", 0) == 0) {
          out.push_back(std::to_string(val) + "%");
          ++j;
        } else {
          out.push_back(std::to_string(val));
        }
        i = j;
        continue;
      }
    }
    out.push_back(words[i]);
    ++i;
  }
  std::string joined;
  for (size_t k = 0; k < out.size(); ++k) {
    if (k) joined += " ";
    joined += out[k];
  }
  return joined;
}

}  // namespace

std::string InverseNormalize(const std::string& text,
                             const std::string& language) {
  if (language == "zh") return ItnZh(text);
  if (language == "en") return ItnEn(text);
  return text;
}

}  // namespace funasr_tpu

// ---- C API -------------------------------------------------------------------

extern "C" {

// Returns a malloc'd UTF-8 string; caller frees with FunASRITNFree.
char* FunASRITNNormalize(const char* text, const char* language) {
  if (text == nullptr) return nullptr;
  std::string out = funasr_tpu::InverseNormalize(
      text, language ? language : "zh");
  char* buf = static_cast<char*>(malloc(out.size() + 1));
  memcpy(buf, out.data(), out.size() + 1);
  return buf;
}

void FunASRITNFree(char* s) { free(s); }

}  // extern "C"
