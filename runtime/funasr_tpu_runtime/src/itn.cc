#include "itn.h"
#include "itn-grammar.h"
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
  // matches the python _NUM_CHARS class (digits + units + big units + 点)
  return ZhDigits().count(ch) || ZhUnits().count(ch) || ZhBig().count(ch) ||
         ch == "点";
}

bool IsZhNumCharNoDot(const std::string& ch) {
  return ZhDigits().count(ch) || ZhUnits().count(ch) || ZhBig().count(ch);
}

// Mirrors funasr_tpu/text/zh_numbers.py parse_cn_number (incl. 点 decimals).
bool ParseZhNumber(const std::vector<std::string>& chars, std::string* out) {
  if (chars.empty()) return false;
  // decimal: exactly one 点, fractional part digit chars only
  for (size_t p = 0; p < chars.size(); ++p) {
    if (chars[p] != "点") continue;
    std::vector<std::string> ip(chars.begin(), chars.begin() + p);
    std::string int_part = "0";
    if (!ip.empty() && !ParseZhNumber(ip, &int_part)) return false;
    std::string frac;
    for (size_t q = p + 1; q < chars.size(); ++q) {
      auto d = ZhDigits().find(chars[q]);
      if (d == ZhDigits().end()) return false;
      frac += std::to_string(d->second);
    }
    if (frac.empty()) return false;
    *out = int_part + "." + frac;
    return true;
  }
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

bool ParseZhInt(const std::vector<std::string>& chars, int64_t* v) {
  std::string s;
  if (!ParseZhNumber(chars, &s) || s.find('.') != std::string::npos)
    return false;
  *v = std::atoll(s.c_str());
  return true;
}

using Chars = std::vector<std::string>;

Chars ToChars(const std::string& s) { return Utf8Chars(s); }

std::string Join(const Chars& c, size_t b, size_t e) {
  std::string out;
  for (size_t i = b; i < e && i < c.size(); ++i) out += c[i];
  return out;
}

// take up to `maxn` num chars ending just before position `end` (exclusive),
// not crossing `floor` — the regex "[N]{1,maxn}X" left-to-right semantics
size_t SpanStartBefore(const Chars& c, size_t end, size_t maxn, size_t floor,
                       bool no_dot = true) {
  size_t b = end;
  while (b > floor && end - b < maxn &&
         (no_dot ? IsZhNumCharNoDot(c[b - 1]) : IsZhNumChar(c[b - 1])))
    --b;
  return b;
}

// 1. percent: 百分之 + num span -> "N%"
std::string PassZhPercent(const std::string& text) {
  Chars c = ToChars(text);
  std::string out;
  size_t i = 0;
  while (i < c.size()) {
    if (i + 2 < c.size() && c[i] == "百" && c[i + 1] == "分" &&
        c[i + 2] == "之") {
      size_t j = i + 3;
      while (j < c.size() && IsZhNumChar(c[j])) ++j;
      std::string val;
      if (j > i + 3 &&
          ParseZhNumber(Chars(c.begin() + i + 3, c.begin() + j), &val)) {
        out += val + "%";
        i = j;
        continue;
      }
    }
    out += c[i++];
  }
  return out;
}

// 2. date with year: digits{2,4} 年 [num{1,3} 月 [num{1,3} 日|号]]
std::string PassZhDate(const std::string& text) {
  Chars c = ToChars(text);
  std::string out;
  size_t i = 0, consumed = 0;
  while (i < c.size()) {
    if (c[i] == "年" && i > consumed) {
      size_t b = i;
      while (b > consumed && i - b < 4 && ZhDigits().count(c[b - 1])) --b;
      if (i - b >= 2) {
        std::string year;
        for (size_t k = b; k < i; ++k)
          year += std::to_string(ZhDigits().at(c[k]));
        out.resize(out.size() - Join(c, b, i).size());
        out += year + "年";
        size_t j = i + 1;
        // optional month
        size_t mb = j;
        while (j < c.size() && j - mb < 3 && IsZhNumChar(c[j])) ++j;
        int64_t mo;
        if (j < c.size() && j > mb && c[j] == "月" &&
            ParseZhInt(Chars(c.begin() + mb, c.begin() + j), &mo)) {
          out += std::to_string(mo) + "月";
          ++j;
          size_t db = j;
          while (j < c.size() && j - db < 3 && IsZhNumChar(c[j])) ++j;
          int64_t d;
          if (j < c.size() && j > db && (c[j] == "日" || c[j] == "号") &&
              ParseZhInt(Chars(c.begin() + db, c.begin() + j), &d)) {
            out += std::to_string(d) + "日";
            ++j;
          } else {
            j = db;
          }
        } else {
          j = mb;
        }
        i = consumed = j;
        continue;
      }
    }
    out += c[i++];
  }
  return out;
}

// 3. month-day without year: num{1,3} 月 [num{1,3} 日|号], 1..12 / 1..31
std::string PassZhMonthDay(const std::string& text) {
  Chars c = ToChars(text);
  std::string out;
  size_t i = 0, consumed = 0;
  while (i < c.size()) {
    if (c[i] == "月") {
      size_t b = SpanStartBefore(c, i, 3, consumed, false);
      int64_t mo;
      if (b < i && ParseZhInt(Chars(c.begin() + b, c.begin() + i), &mo) &&
          mo >= 1 && mo <= 12) {
        out.resize(out.size() - Join(c, b, i).size());
        std::string piece = std::to_string(mo) + "月";
        size_t j = i + 1;
        size_t db = j;
        while (j < c.size() && j - db < 3 && IsZhNumChar(c[j])) ++j;
        int64_t d;
        if (j < c.size() && j > db && (c[j] == "日" || c[j] == "号") &&
            ParseZhInt(Chars(c.begin() + db, c.begin() + j), &d) && d >= 1 &&
            d <= 31) {
          piece += std::to_string(d) + "日";
          ++j;
        } else {
          j = i + 1;
        }
        out += piece;
        i = consumed = j;
        continue;
      }
    }
    out += c[i++];
  }
  return out;
}

// 4. time: num{1,3} 点 [num{1,3} 分] [num{1,3} 秒] [半], hour <= 24
std::string PassZhTime(const std::string& text) {
  Chars c = ToChars(text);
  std::string out;
  size_t i = 0, consumed = 0;
  while (i < c.size()) {
    if (c[i] == "点") {
      size_t b = SpanStartBefore(c, i, 3, consumed);
      int64_t h;
      if (b < i && ParseZhInt(Chars(c.begin() + b, c.begin() + i), &h) &&
          h <= 24) {
        size_t j = i + 1;
        // optional minutes
        int64_t mi = -1, se = -1;
        size_t mb = j;
        while (j < c.size() && j - mb < 3 && IsZhNumChar(c[j])) ++j;
        if (j < c.size() && j > mb && c[j] == "分" &&
            ParseZhInt(Chars(c.begin() + mb, c.begin() + j), &mi)) {
          ++j;
        } else {
          j = mb;
          mi = -1;
        }
        size_t sb = j;
        while (j < c.size() && j - sb < 3 && IsZhNumChar(c[j])) ++j;
        if (j < c.size() && j > sb && c[j] == "秒" &&
            ParseZhInt(Chars(c.begin() + sb, c.begin() + j), &se)) {
          ++j;
        } else {
          j = sb;
          se = -1;
        }
        bool half = (mi < 0 && j < c.size() && c[j] == "半");
        if (half) ++j;
        // bare "N点" followed by digit chars is a spoken decimal ("三点一四"
        // = 3.14) — leave it for the number pass (mirrors zh_numbers.py tm)
        if (mi < 0 && se < 0 && !half && j < c.size() &&
            ZhDigits().count(c[j])) {
          out += c[i++];
          continue;
        }
        char buf[48];
        std::string piece;
        if (mi >= 0) {
          std::snprintf(buf, sizeof(buf), "%lld:%02lld",
                        static_cast<long long>(h), static_cast<long long>(mi));
          piece = buf;
        } else if (half) {
          piece = std::to_string(h) + ":30";
        } else {
          piece = std::to_string(h) + "点";
        }
        if (se >= 0 && piece.find(':') != std::string::npos) {
          std::snprintf(buf, sizeof(buf), ":%02lld",
                        static_cast<long long>(se));
          piece += buf;
        }
        out.resize(out.size() - Join(c, b, i).size());
        out += piece;
        i = consumed = j;
        continue;
      }
    }
    out += c[i++];
  }
  return out;
}

// 5. money: num span + (块钱|块|元|美元|欧元|英镑|日元)
std::string PassZhMoney(const std::string& text) {
  static const std::vector<Chars> kCurrencies = {
      ToChars("块钱"), ToChars("块"), ToChars("美元"), ToChars("欧元"),
      ToChars("英镑"), ToChars("日元"), ToChars("元")};
  Chars c = ToChars(text);
  std::string out;
  size_t i = 0;
  while (i < c.size()) {
    if (IsZhNumChar(c[i])) {
      size_t j = i;
      while (j < c.size() && IsZhNumChar(c[j])) ++j;
      // currency suffix?
      for (const auto& cur : kCurrencies) {
        size_t span_end = j;
        // "美元" etc: the last num-span char may be part of the currency —
        // currencies starting with a num char don't exist, but 元 alone is
        // not a num char, so the span boundary is clean.
        if (span_end + cur.size() <= c.size()) {
          bool match = true;
          for (size_t k = 0; k < cur.size(); ++k)
            if (c[span_end + k] != cur[k]) { match = false; break; }
          std::string val;
          if (match && span_end > i &&
              ParseZhNumber(Chars(c.begin() + i, c.begin() + span_end),
                            &val)) {
            out += val;
            for (const auto& ch : cur) out += ch;
            i = span_end + cur.size();
            goto next;
          }
        }
      }
      for (size_t k = i; k < j; ++k) out += c[k];
      i = j;
    next:;
      continue;
    }
    out += c[i++];
  }
  return out;
}

// 6. bare numbers (leave single 一/两 alone)
std::string PassZhNumber(const std::string& text) {
  Chars c = ToChars(text);
  std::string out;
  size_t i = 0;
  while (i < c.size()) {
    if (!IsZhNumChar(c[i])) {
      out += c[i++];
      continue;
    }
    size_t j = i;
    while (j < c.size() && IsZhNumChar(c[j])) ++j;
    Chars span(c.begin() + i, c.begin() + j);
    std::string val;
    if (span.size() == 1 && (span[0] == "一" || span[0] == "两")) {
      out += span[0];
    } else if (ParseZhNumber(span, &val)) {
      out += val;
    } else {
      for (const auto& ch : span) out += ch;
    }
    i = j;
  }
  return out;
}

std::string ItnZh(const std::string& text) {
  // same pass order as funasr_tpu/text/zh_numbers.py inverse_normalize_zh:
  // percent -> date -> month/day -> time -> money -> bare numbers
  std::string out = PassZhPercent(text);
  out = PassZhDate(out);
  out = PassZhMonthDay(out);
  out = PassZhTime(out);
  out = PassZhMoney(out);
  return PassZhNumber(out);
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

const std::map<std::string, int64_t>& EnOrdinals() {
  static const std::map<std::string, int64_t> m = {
      {"first", 1}, {"second", 2}, {"third", 3}, {"fourth", 4}, {"fifth", 5},
      {"sixth", 6}, {"seventh", 7}, {"eighth", 8}, {"ninth", 9}, {"tenth", 10},
      {"eleventh", 11}, {"twelfth", 12}, {"thirteenth", 13},
      {"fourteenth", 14}, {"fifteenth", 15}, {"sixteenth", 16},
      {"seventeenth", 17}, {"eighteenth", 18}, {"nineteenth", 19},
      {"twentieth", 20}, {"thirtieth", 30}, {"fortieth", 40}, {"fiftieth", 50},
      {"sixtieth", 60}, {"seventieth", 70}, {"eightieth", 80},
      {"ninetieth", 90}, {"hundredth", 100}, {"thousandth", 1000},
      {"millionth", 1000000}};
  return m;
}

const std::map<std::string, std::string>& EnCurrencies() {
  static const std::map<std::string, std::string> m = {
      {"dollar", "$"}, {"dollars", "$"}, {"buck", "$"}, {"bucks", "$"},
      {"euro", "\xe2\x82\xac"}, {"euros", "\xe2\x82\xac"},
      {"pound", "\xc2\xa3"}, {"pounds", "\xc2\xa3"}};
  return m;
}

std::string OrdinalSuffix(int64_t n) {
  int64_t h = n % 100;
  if (h == 11 || h == 12 || h == 13) return "th";
  switch (n % 10) {
    case 1: return "st";
    case 2: return "nd";
    case 3: return "rd";
    default: return "th";
  }
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

// maximal cardinal span starting at `start` ("and" joins only after a scale)
size_t EnSpanEnd(const std::vector<std::string>& words, size_t start) {
  size_t j = start;
  while (j < words.size()) {
    std::string wj = Lower(StripPunct(words[j]));
    if (wj == "and") {
      std::string prev = j > start ? Lower(StripPunct(words[j - 1])) : "";
      std::string nxt =
          j + 1 < words.size() ? Lower(StripPunct(words[j + 1])) : "";
      if (EnScales().count(prev) && IsEnNumWord(nxt)) {
        ++j;
        continue;
      }
      break;
    }
    if (!IsEnNumWord(wj)) break;
    ++j;
  }
  return j;
}

bool ParseEnSpan(const std::vector<std::string>& words, size_t b, size_t e,
                 int64_t* val) {
  if (e <= b) return false;
  std::vector<std::string> span;
  for (size_t k = b; k < e; ++k) span.push_back(Lower(StripPunct(words[k])));
  return ParseEnNumber(span, val);
}

// Mirrors funasr_tpu/text/en_numbers.py inverse_normalize_en: cardinals,
// percent, ordinals ("twenty first" -> "21st"), money ("three dollars fifty"
// -> "$3.50"), "fifty cents" -> "$0.50".
std::string ItnEn(const std::string& text) {
  std::vector<std::string> words;
  std::istringstream ss(text);
  std::string w;
  while (ss >> w) words.push_back(w);

  std::vector<std::string> out;
  size_t i = 0;
  char buf[64];
  while (i < words.size()) {
    std::string wi = Lower(StripPunct(words[i]));

    auto ord_alone = EnOrdinals().find(wi);
    if (ord_alone != EnOrdinals().end()) {
      out.push_back(std::to_string(ord_alone->second) +
                    OrdinalSuffix(ord_alone->second));
      ++i;
      continue;
    }

    if (IsEnNumWord(wi) && wi != "and") {
      size_t j = EnSpanEnd(words, i);
      int64_t val;
      if (ParseEnSpan(words, i, j, &val)) {
        std::string nxt = j < words.size() ? Lower(StripPunct(words[j])) : "";
        // ordinal-terminated span ("twenty first", "one hundred and first")
        size_t ord_j = j;
        std::string ord_w = nxt;
        if (nxt == "and" && j + 1 < words.size() &&
            EnOrdinals().count(Lower(StripPunct(words[j + 1])))) {
          ord_j = j + 1;
          ord_w = Lower(StripPunct(words[j + 1]));
        }
        auto oit = EnOrdinals().find(ord_w);
        if (oit != EnOrdinals().end()) {
          int64_t ov = oit->second;
          int64_t total = ov >= 100 ? val * ov : val + ov;
          out.push_back(std::to_string(total) + OrdinalSuffix(total));
          i = ord_j + 1;
          continue;
        }
        if (nxt.rfind("percent", 0) == 0) {
          out.push_back(std::to_string(val) + "%");
          i = j + 1;
          continue;
        }
        if ((nxt == "cent" || nxt == "cents") && val < 100) {
          std::snprintf(buf, sizeof(buf), "$0.%02lld",
                        static_cast<long long>(val));
          out.push_back(buf);
          i = j + 1;
          continue;
        }
        auto cit = EnCurrencies().find(nxt);
        if (cit != EnCurrencies().end()) {
          size_t k = j + 1;
          if (k < words.size() && Lower(StripPunct(words[k])) == "and") ++k;
          size_t k2 = EnSpanEnd(words, k);
          int64_t cents;
          if (k2 > k && ParseEnSpan(words, k, k2, &cents) && cents < 100) {
            std::string c2 =
                k2 < words.size() ? Lower(StripPunct(words[k2])) : "";
            if (c2 == "cent" || c2 == "cents") ++k2;
            std::snprintf(buf, sizeof(buf), "%s%lld.%02lld",
                          cit->second.c_str(), static_cast<long long>(val),
                          static_cast<long long>(cents));
            out.push_back(buf);
            i = k2;
          } else {
            out.push_back(cit->second + std::to_string(val));
            i = j + 1;
          }
          continue;
        }
        out.push_back(std::to_string(val));
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
  // electronic/whitelist tables mirror funasr_tpu/text/electronic.py
  // ELECTRONIC_WORDS["zh"/"en"] / WHITELIST["en"] so the native zh/en path
  // byte-matches inverse_normalize_zh/en (which append the same passes).
  if (language == "zh") {
    return ApplyElectronicPass({"\xE8\x89\xBE\xE7\x89\xB9", "at"},
                               {"\xE7\x82\xB9", "dot"}, true, ItnZh(text));
  }
  if (language == "en") {
    static const std::map<std::string, std::string> kEnWhitelist = {
        {"misses", "mrs."},       {"mister", "mr."},
        {"doctor", "dr."},        {"saint", "st."},
        {"for example", "e.g."},  {"seven eleven", "7-eleven"}};
    const std::string out =
        ApplyElectronicPass({"at"}, {"dot"}, false, ItnEn(text));
    return ApplyWhitelistPass(kEnWhitelist, false, out);
  }
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
