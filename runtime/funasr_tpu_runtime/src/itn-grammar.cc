#include "itn-grammar.h"

#include <algorithm>
#include <cctype>
#include <cstdio>
#include <fstream>
#include <sstream>

namespace funasr_tpu {

namespace {

// ---- minimal JSON parser (objects/arrays/strings/ints; enough for the
// grammar archive, which holds only those) --------------------------------

struct JsonValue {
  enum Kind { kNull, kString, kNumber, kObject, kArray } kind = kNull;
  std::string str;
  long long num = 0;
  std::map<std::string, JsonValue> obj;
  std::vector<JsonValue> arr;
};

struct JsonParser {
  const std::string& s;
  size_t i = 0;
  bool ok = true;

  explicit JsonParser(const std::string& text) : s(text) {}

  void Skip() {
    while (i < s.size() && (s[i] == ' ' || s[i] == '\n' || s[i] == '\t' ||
                            s[i] == '\r')) {
      ++i;
    }
  }

  JsonValue Parse() {
    Skip();
    JsonValue v;
    if (i >= s.size()) { ok = false; return v; }
    const char c = s[i];
    if (c == '{') {
      v.kind = JsonValue::kObject;
      ++i;
      Skip();
      if (i < s.size() && s[i] == '}') { ++i; return v; }
      while (ok) {
        Skip();
        JsonValue key = Parse();
        Skip();
        if (i >= s.size() || s[i] != ':') { ok = false; break; }
        ++i;
        v.obj[key.str] = Parse();
        Skip();
        if (i < s.size() && s[i] == ',') { ++i; continue; }
        if (i < s.size() && s[i] == '}') { ++i; break; }
        ok = false;
      }
    } else if (c == '[') {
      v.kind = JsonValue::kArray;
      ++i;
      Skip();
      if (i < s.size() && s[i] == ']') { ++i; return v; }
      while (ok) {
        v.arr.push_back(Parse());
        Skip();
        if (i < s.size() && s[i] == ',') { ++i; continue; }
        if (i < s.size() && s[i] == ']') { ++i; break; }
        ok = false;
      }
    } else if (c == '"') {
      v.kind = JsonValue::kString;
      ++i;
      while (i < s.size() && s[i] != '"') {
        if (s[i] == '\\' && i + 1 < s.size()) {
          ++i;
          switch (s[i]) {
            case 'n': v.str += '\n'; break;
            case 't': v.str += '\t'; break;
            case 'u': {  // \uXXXX -> UTF-8 (BMP only; archive is ensure_ascii=False)
              if (i + 4 < s.size()) {
                unsigned cp = std::stoul(s.substr(i + 1, 4), nullptr, 16);
                if (cp < 0x80) { v.str += static_cast<char>(cp); }
                else if (cp < 0x800) {
                  v.str += static_cast<char>(0xC0 | (cp >> 6));
                  v.str += static_cast<char>(0x80 | (cp & 0x3F));
                } else {
                  v.str += static_cast<char>(0xE0 | (cp >> 12));
                  v.str += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
                  v.str += static_cast<char>(0x80 | (cp & 0x3F));
                }
                i += 4;
              }
              break;
            }
            default: v.str += s[i];
          }
        } else {
          v.str += s[i];
        }
        ++i;
      }
      if (i < s.size()) ++i;  // closing quote
      else ok = false;
    } else if (c == '-' || (c >= '0' && c <= '9')) {
      v.kind = JsonValue::kNumber;
      size_t j = i;
      while (j < s.size() && (s[j] == '-' || s[j] == '+' || s[j] == '.' ||
                              s[j] == 'e' || s[j] == 'E' ||
                              (s[j] >= '0' && s[j] <= '9'))) {
        ++j;
      }
      v.num = std::atoll(s.substr(i, j - i).c_str());
      i = j;
    } else if (s.compare(i, 4, "null") == 0) {
      i += 4;
    } else if (s.compare(i, 4, "true") == 0) {
      v.kind = JsonValue::kNumber;
      v.num = 1;
      i += 4;
    } else if (s.compare(i, 5, "false") == 0) {
      v.kind = JsonValue::kNumber;
      v.num = 0;
      i += 5;
    } else {
      ok = false;
    }
    return v;
  }
};

std::map<std::string, long long> ToMap(const JsonValue& v) {
  std::map<std::string, long long> out;
  for (const auto& kv : v.obj) out[kv.first] = kv.second.num;
  return out;
}

std::set<std::string> ToSet(const JsonValue& v) {
  std::set<std::string> out;
  for (const auto& e : v.arr) out.insert(e.str);
  return out;
}

// split UTF-8 text on whitespace
std::vector<std::string> SplitWs(const std::string& text) {
  std::vector<std::string> out;
  std::istringstream is(text);
  std::string w;
  while (is >> w) out.push_back(w);
  return out;
}

std::string AsciiLowerStrip(const std::string& raw) {
  std::string w = raw;
  const std::string punct = ",.!?;:";
  size_t b = 0, e = w.size();
  while (b < e && punct.find(w[b]) != std::string::npos) ++b;
  while (e > b && punct.find(w[e - 1]) != std::string::npos) --e;
  w = w.substr(b, e - b);
  for (char& c : w) {
    c = static_cast<char>(std::tolower(static_cast<unsigned char>(c)));
  }
  return w;
}

// multilingual.py _de_pre: greedy longest-vocab-piece compound split
bool DeCompoundSplit(const ItnLexicon& lex, const std::string& word,
                     std::vector<std::string>* out) {
  if (lex.vocab.count(word)) return false;
  std::vector<std::string> by_len(lex.vocab.begin(), lex.vocab.end());
  std::sort(by_len.begin(), by_len.end(),
            [](const std::string& a, const std::string& b) {
              return a.size() > b.size();
            });
  std::string rest = word;
  std::vector<std::string> pieces;
  while (!rest.empty()) {
    bool matched = false;
    for (const auto& v : by_len) {
      if (rest.compare(0, v.size(), v) == 0) {
        pieces.push_back(v);
        rest = rest.substr(v.size());
        matched = true;
        break;
      }
    }
    if (!matched) return false;
  }
  if (pieces.size() < 2) return false;
  *out = std::move(pieces);
  return true;
}

// _id_pre: tujuhbelas -> [tujuh, __belas__]
bool IdBelasSplit(const ItnLexicon& lex, const std::string& word,
                  std::vector<std::string>* out) {
  const std::string suf = "belas";
  if (word.size() > suf.size() &&
      word.compare(word.size() - suf.size(), suf.size(), suf) == 0) {
    const std::string head = word.substr(0, word.size() - suf.size());
    if (lex.ones.count(head)) {
      *out = {head, "__belas__"};
      return true;
    }
  }
  return false;
}

// multilingual.py _tl_pre: Tagalog teens labing-/labin-/labim- = sampu+base,
// and the 't ligature split (dalawampu't -> dalawampu + 't)
bool TlTeenSplit(const ItnLexicon& lex, const std::string& word,
                 std::vector<std::string>* out) {
  if (lex.vocab.count(word)) return false;
  if (word.size() > 2 && word.compare(word.size() - 2, 2, "'t") == 0) {
    const std::string head = word.substr(0, word.size() - 2);
    if (lex.vocab.count(head)) {
      *out = {head, "'t"};
      return true;
    }
  }
  for (const char* p : {"labing-", "labing", "labin", "labim"}) {
    const std::string pre(p);
    if (word.size() > pre.size() && word.compare(0, pre.size(), pre) == 0) {
      const std::string base = word.substr(pre.size());
      if (lex.ones.count(base)) {
        *out = {"sampu", base};
        return true;
      }
      for (char c : {'p', 'b'}) {  // nasal mutation: labimpito -> pito
        const std::string fix = std::string(1, c) + base.substr(1);
        if (lex.ones.count(fix)) {
          *out = {"sampu", fix};
          return true;
        }
      }
    }
  }
  return false;
}

// multilingual.py _parse_words (returns string; empty = not a number)
std::string ParseWords(const ItnLexicon& lex,
                       const std::vector<std::string>& tokens) {
  std::vector<std::string> toks;
  for (const auto& t : tokens) {
    if (!lex.joiners.count(t)) toks.push_back(t);
  }
  // digit-sequence reading: all single digits -> concatenate
  if (toks.size() > 1) {
    bool all_digits = true;
    std::string seq;
    for (const auto& t : toks) {
      auto it = lex.ones.find(t);
      if (it == lex.ones.end() || it->second > 9) { all_digits = false; break; }
      seq += std::to_string(it->second);
    }
    if (all_digits) return seq;
  }
  long long total = 0, current = 0;
  bool any = false;
  bool explicit_zero = false;  // "không trăm hai mươi" = 020, not 100+20
  for (const auto& t : toks) {
    if (lex.hundreds_direct.count(t)) {
      current += lex.hundreds_direct.at(t);
    } else if (lex.ones.count(t)) {
      current += lex.ones.at(t);
      explicit_zero = explicit_zero || lex.ones.at(t) == 0;
    } else if (lex.tens.count(t)) {
      current += lex.tens.at(t);
    } else if (lex.x10_words.count(t)) {
      current = (current || explicit_zero ? current : 1) * 10;
    } else if (lex.hundred_words.count(t)) {
      current = (current || explicit_zero ? current : 1) * 100;
    } else if (lex.scales.count(t)) {
      total += (current ? current : 1) * lex.scales.at(t);
      current = 0;
    } else {
      return "";
    }
    any = true;
  }
  return any ? std::to_string(total + current) : "";
}

std::string WordItn(const ItnLexicon& lex, const std::string& text) {
  std::vector<std::string> out;
  std::vector<std::string> span, span_raw;

  auto flush = [&]() {
    if (span_raw.empty()) return;
    const std::string val = ParseWords(lex, span);
    bool non_joiner = false;
    for (const auto& w : span) {
      if (!lex.joiners.count(w)) { non_joiner = true; break; }
    }
    if (!val.empty() && non_joiner) {
      out.push_back(val);
    } else {
      out.insert(out.end(), span_raw.begin(), span_raw.end());
    }
    span.clear();
    span_raw.clear();
  };

  for (const auto& raw : SplitWs(text)) {
    const std::string w = AsciiLowerStrip(raw);
    std::vector<std::string> toks;
    bool expanded = false;
    if (lex.pre == "de") expanded = DeCompoundSplit(lex, w, &toks);
    else if (lex.pre == "id") expanded = IdBelasSplit(lex, w, &toks);
    else if (lex.pre == "tl") expanded = TlTeenSplit(lex, w, &toks);
    if (!expanded) toks = {w};
    bool all_vocab = !toks.empty();
    for (const auto& t : toks) {
      if (!lex.vocab.count(t)) { all_vocab = false; break; }
    }
    if (all_vocab) {
      span.insert(span.end(), toks.begin(), toks.end());
      span_raw.push_back(raw);
    } else {
      flush();
      out.push_back(raw);
    }
  }
  flush();
  std::string joined;
  for (size_t i = 0; i < out.size(); ++i) {
    if (i) joined += " ";
    joined += out[i];
  }
  return joined;
}

// ---- CJK positional engine (multilingual.py _parse_cjk / _cjk_itn) --------

std::vector<std::string> Utf8Chars(const std::string& s) {
  std::vector<std::string> out;
  for (size_t i = 0; i < s.size();) {
    const unsigned char c = s[i];
    size_t len = c < 0x80 ? 1 : (c & 0xE0) == 0xC0 ? 2
                 : (c & 0xF0) == 0xE0 ? 3 : (c & 0xF8) == 0xF0 ? 4 : 1;
    len = std::min(len, s.size() - i);
    out.push_back(s.substr(i, len));
    i += len;
  }
  return out;
}

std::string ParseCjk(const ItnLexicon& lex,
                     const std::vector<std::string>& chars) {
  if (chars.empty()) return "";
  bool all_digits = true;
  for (const auto& ch : chars) {
    if (!lex.digits.count(ch)) { all_digits = false; break; }
  }
  if (all_digits) {
    if (chars.size() == 1) return std::to_string(lex.digits.at(chars[0]));
    std::string seq;
    for (const auto& ch : chars) seq += std::to_string(lex.digits.at(ch));
    return seq;
  }
  long long total = 0, section = 0, current = 0;
  for (const auto& ch : chars) {
    if (lex.digits.count(ch)) {
      current = lex.digits.at(ch);
    } else if (lex.units.count(ch)) {
      section += (current ? current : 1) * lex.units.at(ch);
      current = 0;
    } else if (lex.big.count(ch)) {
      const long long contribution = section + current;
      if (contribution) total += contribution * lex.big.at(ch);
      else if (total) total *= lex.big.at(ch);
      else total = lex.big.at(ch);
      section = current = 0;
    } else {
      return "";
    }
  }
  return std::to_string(total + section + current);
}

std::string CjkItn(const ItnLexicon& lex, const std::string& text) {
  // groups of number chars, possibly space-separated (Korean "삼만 오천")
  std::vector<std::string> chars = Utf8Chars(text);
  std::string out;
  size_t i = 0;
  while (i < chars.size()) {
    if (!lex.cjk_chars.count(chars[i])) {
      out += chars[i];
      ++i;
      continue;
    }
    // collect the maximal run incl. internal spaces between number groups
    std::vector<std::string> run;
    std::string raw;
    size_t j = i;
    while (j < chars.size()) {
      if (lex.cjk_chars.count(chars[j])) {
        run.push_back(chars[j]);
        raw += chars[j];
        ++j;
      } else if (chars[j] == " ") {
        // spaces join only when another number char follows
        size_t k = j;
        while (k < chars.size() && chars[k] == " ") ++k;
        if (k < chars.size() && lex.cjk_chars.count(chars[k])) {
          for (size_t z = j; z < k; ++z) raw += chars[z];
          j = k;
        } else {
          break;
        }
      } else {
        break;
      }
    }
    const std::string val = ParseCjk(lex, run);
    out += val.empty() ? raw : val;
    i = j;
  }
  return out;
}

// ---- post-cardinal class rules (multilingual_classes.py data subset) ------

bool IsDigits(const std::string& s) {
  if (s.empty()) return false;
  for (char c : s) {
    if (c < '0' || c > '9') return false;
  }
  return true;
}

// digits possibly followed by a decimal mark + digits ("5" / "5,20")
bool IsAmount(const std::string& s, const std::string& mark) {
  const size_t m = s.find(mark);
  if (m == std::string::npos) return IsDigits(s);
  return IsDigits(s.substr(0, m)) && IsDigits(s.substr(m + mark.size()));
}

std::string ApplyWordClasses(const ItnLexicon& lex, const std::string& text) {
  std::vector<std::string> toks = SplitWs(text);

  // ordinals: direct surface lookup (with punctuation kept around the core)
  for (auto& raw : toks) {
    const std::string core = AsciiLowerStrip(raw);
    auto it = lex.ordinals.find(core);
    if (it != lex.ordinals.end()) {
      const size_t pos = raw.find(core);
      if (pos != std::string::npos) raw.replace(pos, core.size(), it->second);
    }
  }

  // decimals: "3 <sep> 14" -> "3<mark>14" (spaced digit tails join)
  for (size_t i = 0; i + 2 < toks.size() + 1;) {
    bool applied = false;
    if (i + 2 < toks.size() + 1 && i + 2 <= toks.size() && IsDigits(toks[i])) {
      for (const auto& sep : lex.decimal_words) {
        if (i + 2 < toks.size() + 1 && i + 1 < toks.size() &&
            toks[i + 1] == sep && i + 2 < toks.size() &&
            IsDigits(toks[i + 2])) {
          std::string frac = toks[i + 2];
          size_t j = i + 3;
          while (j < toks.size() && IsDigits(toks[j])) {
            frac += toks[j];
            ++j;
          }
          toks[i] = toks[i] + lex.decimal_mark + frac;
          toks.erase(toks.begin() + i + 1, toks.begin() + j);
          applied = true;
          break;
        }
      }
    }
    if (!applied) ++i;
  }

  // money: "<amount> <currency phrase> [con|com] [<minor> [<minor_unit>]]"
  // — a currency may span several tokens ("đô la mỹ"); longest phrase wins,
  // matching the Python regex alternation's longest-first ordering
  for (size_t i = 0; i + 1 < toks.size();) {
    std::string cur_sym;
    size_t cur_len = 0;  // tokens consumed by the currency phrase
    if (IsAmount(toks[i], lex.decimal_mark)) {
      for (size_t len = 3; len >= 1; --len) {
        if (i + len >= toks.size()) continue;
        std::string phrase;
        for (size_t k = 1; k <= len; ++k) {
          if (k > 1) phrase += " ";
          phrase += AsciiLowerStrip(toks[i + k]);
        }
        auto cur = lex.currencies.find(phrase);
        if (cur != lex.currencies.end()) {
          cur_sym = cur->second;
          cur_len = len;
          break;
        }
      }
    }
    if (!cur_sym.empty()) {
      std::string amount = toks[i];
      size_t j = i + 1 + cur_len;
      if (j < toks.size() && (toks[j] == "con" || toks[j] == "com") &&
          j + 1 < toks.size() && IsDigits(toks[j + 1])) {
        ++j;
      }
      if (amount.find(lex.decimal_mark) == std::string::npos &&
          j < toks.size() && IsDigits(toks[j]) && toks[j].size() <= 2) {
        char buf[8];
        std::snprintf(buf, sizeof(buf), "%02d", std::atoi(toks[j].c_str()));
        amount += lex.decimal_mark + buf;
        ++j;
        if (j < toks.size()) {
          for (const auto& mu : lex.minor_units) {
            if (toks[j] == mu) { ++j; break; }
          }
        }
      }
      toks[i] = cur_sym + amount;
      toks.erase(toks.begin() + i + 1, toks.begin() + j);
    } else {
      ++i;
    }
  }

  // percent: "<digits> <words...>" -> "<digits> %" (multiword spans)
  for (size_t i = 0; i < toks.size();) {
    bool applied = false;
    if (IsDigits(toks[i])) {
      for (const auto& pw : lex.percent_words) {
        const std::vector<std::string> parts = SplitWs(pw);
        if (i + parts.size() < toks.size() + 1 &&
            i + parts.size() <= toks.size()) {
          bool match = !parts.empty();
          for (size_t k = 0; k < parts.size(); ++k) {
            if (i + 1 + k >= toks.size() || toks[i + 1 + k] != parts[k]) {
              match = false;
              break;
            }
          }
          if (match) {
            toks.erase(toks.begin() + i + 1,
                       toks.begin() + i + 1 + parts.size());
            toks.insert(toks.begin() + i + 1, "%");
            applied = true;
            break;
          }
        }
      }
    }
    i += applied ? 2 : 1;
  }

  std::string out;
  for (size_t i = 0; i < toks.size(); ++i) {
    if (i) out += " ";
    out += toks[i];
  }
  return out;
}

std::string ApplyCjkClasses(const ItnLexicon& lex, const std::string& text) {
  std::string out = text;
  // decimals: "<digits><sep><digits>" -> "<digits>.<digits>"
  for (const auto& sep : lex.decimal_words) {
    size_t pos = 0;
    while ((pos = out.find(sep, pos)) != std::string::npos) {
      const bool before = pos > 0 && out[pos - 1] >= '0' && out[pos - 1] <= '9';
      const size_t after = pos + sep.size();
      const bool next = after < out.size() && out[after] >= '0' &&
                        out[after] <= '9';
      if (before && next) {
        out = out.substr(0, pos) + lex.decimal_mark + out.substr(after);
        pos += lex.decimal_mark.size();
      } else {
        pos += sep.size();
      }
    }
  }
  // percent: "<digits><word>" -> "<digits>%"
  for (const auto& pw : lex.percent_words) {
    size_t pos = 0;
    while ((pos = out.find(pw, pos)) != std::string::npos) {
      if (pos > 0 && out[pos - 1] >= '0' && out[pos - 1] <= '9') {
        out = out.substr(0, pos) + "%" + out.substr(pos + pw.size());
        ++pos;
      } else {
        pos += pw.size();
      }
    }
  }
  return out;
}

// ---- electronic (email/url) + whitelist passes ----------------------------
// Word-for-word port of funasr_tpu/text/electronic.py so the same archive
// tables produce byte-identical output in both runtimes.

// split on single ' ' preserving empties (python str.split(" "))
std::vector<std::string> SplitSpace(const std::string& text) {
  std::vector<std::string> out;
  std::string cur;
  for (char c : text) {
    if (c == ' ') {
      out.push_back(cur);
      cur.clear();
    } else {
      cur += c;
    }
  }
  out.push_back(cur);
  return out;
}

std::string JoinSpace(const std::vector<std::string>& toks) {
  std::string out;
  for (size_t i = 0; i < toks.size(); ++i) {
    if (i) out += " ";
    out += toks[i];
  }
  return out;
}

std::string AsciiLower(const std::string& s) {
  std::string out = s;
  for (char& c : out) {
    if (c >= 'A' && c <= 'Z') c += 'a' - 'A';
  }
  return out;
}

bool AsciiAlnumTok(const std::string& tok) {
  if (tok.empty()) return false;
  for (char c : tok) {
    const unsigned char u = static_cast<unsigned char>(c);
    if (u >= 0x80 || !std::isalnum(u)) return false;
  }
  return true;
}

// electronic.py _wordy: nonempty ASCII-alnum token not itself an at/dot word
bool WordyTok(const std::string& tok, const std::set<std::string>& reserved) {
  return AsciiAlnumTok(tok) && !reserved.count(AsciiLower(tok));
}

// electronic.py _seg_end: a FINAL segment is EITHER a run of single-char
// spelled tokens OR exactly one multi-char word (middle segments, which
// terminate at an explicit dot word, are greedy — see ParseChain)
size_t SegEnd(const std::vector<std::string>& tokens, size_t k,
              const std::set<std::string>& reserved) {
  const size_t n = tokens.size();
  if (k >= n || !WordyTok(tokens[k], reserved)) return k;
  if (tokens[k].size() == 1) {
    size_t j = k;
    while (j < n && tokens[j].size() == 1 && WordyTok(tokens[j], reserved)) {
      ++j;
    }
    return j;
  }
  return k + 1;
}

std::string JoinLower(const std::vector<std::string>& tokens, size_t b,
                      size_t e) {
  std::string out;
  for (size_t i = b; i < e; ++i) out += AsciiLower(tokens[i]);
  return out;
}

// electronic.py _parse_chain: seg (DOT seg)+ with greedy middle segments and
// a conservative final segment; returns false when no "seg dot seg" core
// exists, else fills the last VALID (segments, end_index) state.
bool ParseChain(const std::vector<std::string>& tokens, size_t k,
                const std::set<std::string>& reserved,
                const std::set<std::string>& dot, bool allow_empty_first,
                std::vector<std::string>* best_segs, size_t* best_end) {
  const size_t n = tokens.size();
  std::vector<std::string> segs;
  bool have_best = false;
  int ndots = 0;
  bool first = true;
  while (true) {
    size_t j = k;
    while (j < n && WordyTok(tokens[j], reserved)) ++j;
    if (j == k && !(first && allow_empty_first && j < n &&
                    dot.count(AsciiLower(tokens[j])))) {
      break;
    }
    first = false;
    if (j < n && dot.count(AsciiLower(tokens[j]))) {
      if (j > k) {
        segs.push_back(JoinLower(tokens, k, j));
        if (ndots >= 1) {
          *best_segs = segs;
          *best_end = j;
          have_best = true;
        }
      }
      k = j + 1;
      ++ndots;
    } else {
      const size_t k2 = SegEnd(tokens, k, reserved);
      if (k2 > k) {
        segs.push_back(JoinLower(tokens, k, k2));
        if (ndots >= 1) {
          *best_segs = segs;
          *best_end = k2;
          have_best = true;
        }
      }
      break;
    }
  }
  return have_best;
}

std::string ElectronicSpaced(const std::string& text,
                             const std::vector<std::string>& at_words,
                             const std::vector<std::string>& dot_words) {
  std::set<std::string> at, dot;
  for (const auto& w : at_words) at.insert(AsciiLower(w));
  for (const auto& w : dot_words) dot.insert(AsciiLower(w));
  std::set<std::string> reserved = at;
  reserved.insert(dot.begin(), dot.end());

  const std::vector<std::string> tokens = SplitSpace(text);
  const size_t n = tokens.size();
  std::vector<std::string> out;
  size_t i = 0;
  while (i < n) {
    const std::string low = AsciiLower(tokens[i]);
    // email: ... user AT seg (DOT seg)+
    if (at.count(low)) {
      // username: run of single-char spelled tokens, else one word
      size_t j = out.size();
      while (j > 0 && out[j - 1].size() == 1 &&
             WordyTok(out[j - 1], reserved)) {
        --j;
      }
      if (j == out.size() && !out.empty() && WordyTok(out.back(), reserved)) {
        j = out.size() - 1;
      }
      const std::string user = JoinLower(out, j, out.size());
      std::vector<std::string> domain;
      size_t k = 0;
      if (!user.empty() &&
          ParseChain(tokens, i + 1, reserved, dot, false, &domain, &k)) {
        out.resize(j);
        std::string dom;
        for (size_t z = 0; z < domain.size(); ++z) {
          if (z) dom += ".";
          dom += domain[z];
        }
        out.push_back(user + "@" + dom);
        i = k;
        continue;
      }
    }
    // url: www [seg] (DOT seg)+
    if (low == "www") {
      std::vector<std::string> segs;
      size_t k = 0;
      if (ParseChain(tokens, i + 1, reserved, dot, true, &segs, &k)) {
        std::string url = "www";
        for (const auto& s : segs) url += "." + s;
        out.push_back(url);
        i = k;
        continue;
      }
    }
    out.push_back(tokens[i]);
    ++i;
  }
  return JoinSpace(out);
}

bool HasNonAscii(const std::string& s) {
  for (char c : s) {
    if (static_cast<unsigned char>(c) >= 0x80) return true;
  }
  return false;
}

std::string ReplaceAll(std::string s, const std::string& from,
                       const std::string& to) {
  if (from.empty()) return s;
  size_t pos = 0;
  while ((pos = s.find(from, pos)) != std::string::npos) {
    s.replace(pos, from.size(), to);
    pos += to.size();
  }
  return s;
}

// electronic.py _electronic_unspaced: CJK byte-literal shapes
// user AT domain (DOT seg)+ with latin segments
std::string ElectronicUnspaced(const std::string& text,
                               const std::vector<std::string>& at_words,
                               const std::vector<std::string>& dot_words) {
  std::string at_alt, dot_alt;
  for (const auto& w : at_words) {
    if (HasNonAscii(w)) at_alt += (at_alt.empty() ? "" : "|") + w;
  }
  for (const auto& w : dot_words) {
    if (HasNonAscii(w)) dot_alt += (dot_alt.empty() ? "" : "|") + w;
  }
  if (at_alt.empty() || dot_alt.empty()) return text;
  std::regex pat("([a-zA-Z0-9]+)(?:" + at_alt + ")([a-zA-Z0-9]+)"
                 "((?:(?:" + dot_alt + ")[a-zA-Z0-9]+)+)");
  std::string out;
  size_t last = 0;
  for (auto it = std::sregex_iterator(text.begin(), text.end(), pat);
       it != std::sregex_iterator(); ++it) {
    const std::smatch& m = *it;
    out += text.substr(last, m.position(0) - last);
    std::string tail = m[3].str();
    for (const auto& w : dot_words) tail = ReplaceAll(tail, w, ".");
    out += AsciiLower(m[1].str()) + "@" + AsciiLower(m[2].str()) +
           AsciiLower(tail);
    last = m.position(0) + m.length(0);
  }
  out += text.substr(last);
  return out;
}

size_t Utf8Len(const std::string& s) {
  size_t n = 0;
  for (char c : s) {
    if ((static_cast<unsigned char>(c) & 0xC0) != 0x80) ++n;
  }
  return n;
}

bool AsciiAlnumByte(char c) {
  const unsigned char u = static_cast<unsigned char>(c);
  return u < 0x80 && std::isalnum(u);
}

// ascii-case-insensitive byte prefix match of `pat` at s[pos]
bool MatchAtCi(const std::string& s, size_t pos, const std::string& pat) {
  if (pos + pat.size() > s.size()) return false;
  for (size_t i = 0; i < pat.size(); ++i) {
    char a = s[pos + i], b = pat[i];
    if (a >= 'A' && a <= 'Z') a += 'a' - 'A';
    if (b >= 'A' && b <= 'Z') b += 'a' - 'A';
    if (a != b) return false;
  }
  return true;
}

}  // namespace

std::string ApplyElectronicPass(const std::vector<std::string>& at_words,
                                const std::vector<std::string>& dot_words,
                                bool unspaced, const std::string& text) {
  if (at_words.empty() || dot_words.empty()) return text;
  // multi-word at/dot phrases ("a còng") become single tokens for the
  // token-level pass (same pre-join as apply_electronic)
  static const std::string kJoin = "\xE2\x96\x81";  // ▁ U+2581
  std::vector<std::string> at = at_words, dot = dot_words;
  std::string body = text;
  for (auto* bucket : {&at, &dot}) {
    for (auto& w : *bucket) {
      if (w.find(' ') != std::string::npos) {
        const std::string joined = ReplaceAll(w, " ", kJoin);
        body = ReplaceAll(body, w, joined);
        w = joined;
      }
    }
  }
  std::string out = ElectronicSpaced(body, at, dot);
  if (unspaced) out = ElectronicUnspaced(out, at, dot);
  return ReplaceAll(out, kJoin, " ");
}

std::string ApplyWhitelistPass(
    const std::map<std::string, std::string>& table, bool cjk,
    const std::string& text) {
  if (table.empty()) return text;
  std::vector<std::string> keys;
  for (const auto& kv : table) keys.push_back(kv.first);
  std::string out = text;
  if (cjk) {
    // python: sorted(table, key=lambda s: (-len(s), s))
    std::sort(keys.begin(), keys.end(),
              [](const std::string& a, const std::string& b) {
                const size_t la = Utf8Len(a), lb = Utf8Len(b);
                return la != lb ? la > lb : a < b;
              });
    for (const auto& k : keys) out = ReplaceAll(out, k, table.at(k));
    return out;
  }
  // python: sorted(table, key=lambda s: (-len(s.split()), -len(s), s))
  auto words = [](const std::string& s) {
    return std::count(s.begin(), s.end(), ' ') + 1;
  };
  std::sort(keys.begin(), keys.end(),
            [&](const std::string& a, const std::string& b) {
              const auto wa = words(a), wb = words(b);
              if (wa != wb) return wa > wb;
              const size_t la = Utf8Len(a), lb = Utf8Len(b);
              return la != lb ? la > lb : a < b;
            });
  for (const auto& k : keys) {
    // token-boundary replace, ascii-case-insensitive (the python pass is
    // re.IGNORECASE with (?<![A-Za-z0-9])...(?![A-Za-z0-9]) boundaries)
    std::string next;
    size_t i = 0;
    while (i < out.size()) {
      const bool lb_ok = i == 0 || !AsciiAlnumByte(out[i - 1]);
      if (lb_ok && MatchAtCi(out, i, k) &&
          (i + k.size() >= out.size() || !AsciiAlnumByte(out[i + k.size()]))) {
        next += table.at(k);
        i += k.size();
      } else {
        next += out[i];
        ++i;
      }
    }
    out = std::move(next);
  }
  return out;
}

bool ItnGrammar::Load(const std::string& path) {
  std::ifstream f(path);
  if (!f.is_open()) return false;
  std::stringstream ss;
  ss << f.rdbuf();
  return LoadString(ss.str());
}

bool ItnGrammar::LoadString(const std::string& json) {
  JsonParser p(json);
  JsonValue root = p.Parse();
  if (!p.ok || root.kind != JsonValue::kObject) return false;
  auto fmt = root.obj.find("format");
  if (fmt == root.obj.end() ||
      fmt->second.str != "funasr_tpu_itn_grammar") {
    return false;
  }
  auto langs = root.obj.find("languages");
  if (langs == root.obj.end()) return false;
  for (const auto& kv : langs->second.obj) {
    const JsonValue& g = kv.second;
    auto type = g.obj.find("type");
    if (type == g.obj.end()) continue;
    ItnLexicon lex;
    if (type->second.str == "word_lexicon") {
      if (kv.first == "en") continue;  // en has its own full grammar module
      auto get = [&](const char* k) {
        auto it = g.obj.find(k);
        return it == g.obj.end() ? JsonValue() : it->second;
      };
      lex.ones = ToMap(get("ones"));
      lex.tens = ToMap(get("tens"));
      lex.scales = ToMap(get("scales"));
      lex.hundreds_direct = ToMap(get("hundreds_direct"));
      lex.hundred_words = ToSet(get("hundred_words"));
      lex.joiners = ToSet(get("joiners"));
      lex.x10_words = ToSet(get("x10_words"));
      lex.pre = get("pre").str;
      for (const auto& m : {lex.ones, lex.tens, lex.scales,
                            lex.hundreds_direct}) {
        for (const auto& e : m) lex.vocab.insert(e.first);
      }
      for (const auto& s : {lex.hundred_words, lex.joiners, lex.x10_words}) {
        lex.vocab.insert(s.begin(), s.end());
      }
      if (lex.pre == "id") {
        lex.ones["__belas__"] = 10;
        lex.vocab.insert("__belas__");
      }
    } else if (type->second.str == "cjk") {
      lex.cjk = true;
      auto get = [&](const char* k) {
        auto it = g.obj.find(k);
        return it == g.obj.end() ? JsonValue() : it->second;
      };
      lex.digits = ToMap(get("digits"));
      lex.units = ToMap(get("units"));
      lex.big = ToMap(get("big"));
      for (const auto& m : {lex.digits, lex.units, lex.big}) {
        for (const auto& e : m) lex.cjk_chars.insert(e.first);
      }
    } else {
      continue;
    }
    auto cls = g.obj.find("classes");
    if (cls != g.obj.end() && cls->second.kind == JsonValue::kObject) {
      const auto& c = cls->second.obj;
      auto arr = [&](const char* k) {
        std::vector<std::string> out;
        auto it = c.find(k);
        if (it != c.end()) {
          for (const auto& e : it->second.arr) out.push_back(e.str);
        }
        return out;
      };
      lex.decimal_words = arr("decimal_words");
      lex.minor_units = arr("minor_units");
      lex.percent_words = arr("percent_words");
      auto mk = c.find("decimal_mark");
      if (mk != c.end()) lex.decimal_mark = mk->second.str;
      auto smap = [&](const char* k) {
        std::map<std::string, std::string> out;
        auto it = c.find(k);
        if (it != c.end()) {
          for (const auto& e : it->second.obj) out[e.first] = e.second.str;
        }
        return out;
      };
      lex.currencies = smap("currencies");
      lex.ordinals = smap("ordinals");
      // v4: declarative time/date regex rules
      auto td = c.find("timedate_rules");
      if (td != c.end() && td->second.kind == JsonValue::kArray) {
        for (const auto& r : td->second.arr) {
          auto pat = r.obj.find("pattern");
          auto tpl = r.obj.find("template");
          auto ic = r.obj.find("icase");
          if (pat == r.obj.end() || tpl == r.obj.end()) continue;
          auto flags = std::regex::ECMAScript;
          if (ic != r.obj.end() && ic->second.num) flags |= std::regex::icase;
          try {
            lex.timedate_rules.push_back(
                {std::regex(pat->second.str, flags), tpl->second.str});
          } catch (const std::regex_error&) {
            // a dialect mismatch must not take the whole archive down
          }
        }
      }
    }
    // v6: electronic + whitelist tables (language top level)
    auto elec = g.obj.find("electronic");
    if (elec != g.obj.end() && elec->second.kind == JsonValue::kObject) {
      auto a = elec->second.obj.find("at");
      auto d = elec->second.obj.find("dot");
      if (a != elec->second.obj.end()) {
        for (const auto& e : a->second.arr) lex.at_words.push_back(e.str);
      }
      if (d != elec->second.obj.end()) {
        for (const auto& e : d->second.arr) lex.dot_words.push_back(e.str);
      }
    }
    auto wl = g.obj.find("whitelist");
    if (wl != g.obj.end() && wl->second.kind == JsonValue::kObject) {
      for (const auto& e : wl->second.obj) {
        lex.whitelist[e.first] = e.second.str;
      }
    }
    langs_[kv.first] = std::move(lex);
  }
  auto maps = root.obj.find("maps");
  if (maps != root.obj.end() && maps->second.kind == JsonValue::kObject) {
    for (const auto& m : maps->second.obj) {
      for (const auto& e : m.second.obj) maps_[m.first][e.first] = e.second.str;
    }
  }
  return !langs_.empty();
}

namespace {

// render_template's grammar (multilingual_classes.py): {N} raw, {N:i} int,
// {N:02} zero-pad-2, {N:m1mod24} (n-1)%24, {N:map:NAME} lookup, [...] emitted
// only if every group inside matched non-empty.
std::string RenderTdTemplate(
    const std::string& tmpl, const std::smatch& m,
    const std::map<std::string, std::map<std::string, std::string>>& maps) {
  std::string out;
  size_t i = 0;
  auto group = [&](int n) -> std::string {
    return n < static_cast<int>(m.size()) && m[n].matched ? m[n].str() : "";
  };
  while (i < tmpl.size()) {
    const char c = tmpl[i];
    if (c == '[') {
      const size_t end = tmpl.find(']', i);
      if (end == std::string::npos) break;
      const std::string seg = tmpl.substr(i + 1, end - i - 1);
      bool all = true;
      for (size_t j = 0; j + 1 < seg.size(); ++j) {
        if (seg[j] == '{' && std::isdigit(seg[j + 1])) {
          if (group(std::atoi(seg.c_str() + j + 1)).empty()) all = false;
        }
      }
      if (all) out += RenderTdTemplate(seg, m, maps);
      i = end + 1;
    } else if (c == '{') {
      const size_t end = tmpl.find('}', i);
      if (end == std::string::npos) break;
      const std::string spec = tmpl.substr(i + 1, end - i - 1);
      const size_t colon = spec.find(':');
      const int n = std::atoi(spec.c_str());
      const std::string g = group(n);
      if (colon == std::string::npos) {
        out += g;
      } else {
        const std::string op = spec.substr(colon + 1);
        if (op == "i") {
          out += g.empty() ? "" : std::to_string(std::atoll(g.c_str()));
        } else if (op == "02") {
          if (!g.empty()) {
            const long long v = std::atoll(g.c_str());
            if (v < 10) out += "0";
            out += std::to_string(v);
          }
        } else if (op == "m1mod24") {
          if (!g.empty()) {
            out += std::to_string(((std::atoll(g.c_str()) - 1) % 24 + 24) % 24);
          }
        } else if (op == "sub60") {
          // minutes-to form (vi "kém"): 60 - m, zero-padded to 2
          if (!g.empty()) {
            const long long v = 60 - std::atoll(g.c_str());
            if (v < 10) out += "0";
            out += std::to_string(v);
          }
        } else if (op.compare(0, 4, "map:") == 0) {
          std::string key = g;
          for (char& ch : key) ch = std::tolower(static_cast<unsigned char>(ch));
          auto mit = maps.find(op.substr(4));
          if (mit != maps.end()) {
            auto e = mit->second.find(key);
            out += e != mit->second.end() ? e->second : g;
          } else {
            out += g;
          }
        } else {
          out += g;
        }
      }
      i = end + 1;
    } else {
      out += c;
      ++i;
    }
  }
  return out;
}

}  // namespace

std::string ItnGrammar::ApplyTimedateRules(const ItnLexicon& lex,
                                           const std::string& text) const {
  std::string out = text;
  for (const auto& rule : lex.timedate_rules) {
    std::string next;
    auto begin = std::sregex_iterator(out.begin(), out.end(), rule.pattern);
    auto end = std::sregex_iterator();
    size_t last = 0;
    for (auto it = begin; it != end; ++it) {
      const std::smatch& m = *it;
      next += out.substr(last, m.position(0) - last);
      next += RenderTdTemplate(rule.tmpl, m, maps_);
      last = m.position(0) + m.length(0);
    }
    next += out.substr(last);
    out = std::move(next);
  }
  return out;
}

std::string ItnGrammar::Apply(const std::string& lang,
                              const std::string& text) const {
  auto it = langs_.find(lang);
  if (it == langs_.end()) return text;
  const ItnLexicon& lex = it->second;
  std::string guarded = text;
  if (lang == "vi") {
    // "năm" is both 5 and the year marker: protect it in
    // "tháng <X> năm <number...>" (multilingual.py inverse_normalize_vi)
    std::vector<std::string> words = SplitWs(text);
    for (size_t j = 0; j + 1 < words.size(); ++j) {
      if (words[j] != "n\xC4\x83m") continue;
      bool near_month = false;
      for (size_t k = (j >= 3 ? j - 3 : 0); k < j; ++k) {
        if (words[k] == "th\xC3\xA1ng") { near_month = true; break; }
      }
      const std::string nxt = AsciiLowerStrip(words[j + 1]);
      bool nxt_digit = !nxt.empty();
      for (char c : nxt) {
        if (c < '0' || c > '9') { nxt_digit = false; break; }
      }
      if (near_month && (lex.vocab.count(nxt) || nxt_digit)) {
        words[j] = "\x01nam\x01";
      }
    }
    guarded.clear();
    for (size_t j = 0; j < words.size(); ++j) {
      if (j) guarded += " ";
      guarded += words[j];
    }
  }
  std::string out = lex.cjk ? CjkItn(lex, guarded) : WordItn(lex, guarded);
  if (lang == "vi") {
    const std::string sentinel = "\x01nam\x01";
    size_t pos = 0;
    while ((pos = out.find(sentinel, pos)) != std::string::npos) {
      out.replace(pos, sentinel.size(), "n\xC4\x83m");
      pos += 4;
    }
  }
  out = lex.cjk ? ApplyCjkClasses(lex, out) : ApplyWordClasses(lex, out);
  out = ApplyTimedateRules(lex, out);
  // v6: electronic (email/url) then whitelist, same order as apply_classes
  out = ApplyElectronicPass(lex.at_words, lex.dot_words, lex.cjk, out);
  out = ApplyWhitelistPass(lex.whitelist, lex.cjk, out);
  return out;
}

}  // namespace funasr_tpu
