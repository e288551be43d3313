// ITN grammar-archive interpreter: loads the JSON grammar archive exported by
// funasr_tpu.text.export_grammar (the FAR-export role of the reference
// fun_text_processing export_models.py) and rebuilds runnable inverse-text-
// normalization for the word-lexicon languages (de/es/fr/pt/ru/id/vi/tl) and
// the CJK positional systems (ja/ko/zh) purely from the artifact — the C++
// counterpart of export_grammar.load_grammar.

#ifndef FUNASR_TPU_ITN_GRAMMAR_H_
#define FUNASR_TPU_ITN_GRAMMAR_H_

#include <map>
#include <regex>
#include <set>
#include <string>
#include <vector>

namespace funasr_tpu {

// Declarative time/date rule (multilingual_classes.py TIMEDATE_RULES):
// applied after the cardinal + class passes; pattern is in the Python-re ∩
// ECMAScript dialect, template per render_template's grammar.
struct TimedateRule {
  std::regex pattern;
  std::string tmpl;
};

struct ItnLexicon {
  bool cjk = false;
  // word-lexicon tables (multilingual.py _Lex)
  std::map<std::string, long long> ones, tens, scales, hundreds_direct;
  std::set<std::string> hundred_words, joiners, x10_words, vocab;
  std::string pre;  // "de" (compound split) | "id" (-belas) | "tl" | ""
  // cjk tables
  std::map<std::string, long long> digits, units, big;
  std::set<std::string> cjk_chars;
  // post-cardinal class rules (multilingual_classes.py LangClasses, exported
  // as data)
  std::vector<std::string> decimal_words, minor_units, percent_words;
  std::string decimal_mark = ",";
  std::map<std::string, std::string> currencies, ordinals;
  // v4 archives: time/date regex rules shared verbatim with Python
  std::vector<TimedateRule> timedate_rules;
  // v6 archives: electronic (email/url) at/dot word tables + whitelist
  // (spoken phrase -> written abbreviation)
  std::vector<std::string> at_words, dot_words;
  std::map<std::string, std::string> whitelist;
};

// Electronic (email/url) ITN pass — word-for-word identical to
// funasr_tpu.text.electronic.apply_electronic so python and C++ emit
// byte-identical output from the same at/dot word tables. ``unspaced``
// additionally runs the CJK byte-literal shapes (ja/ko/zh).
std::string ApplyElectronicPass(const std::vector<std::string>& at_words,
                                const std::vector<std::string>& dot_words,
                                bool unspaced, const std::string& text);

// Whitelist pass (spoken -> written abbreviation), identical to
// funasr_tpu.text.electronic.apply_whitelist. ``cjk`` switches to plain
// substring replacement (no token boundaries).
std::string ApplyWhitelistPass(
    const std::map<std::string, std::string>& table, bool cjk,
    const std::string& text);

class ItnGrammar {
 public:
  // Parses the JSON archive; false on malformed input or wrong format tag.
  bool Load(const std::string& path);
  bool LoadString(const std::string& json);

  bool HasLang(const std::string& lang) const {
    return langs_.count(lang) != 0;
  }
  // Replace maximal spoken-number spans with digit strings (load_grammar
  // semantics: cardinals only; class rules stay host-side).
  std::string Apply(const std::string& lang, const std::string& text) const;

 private:
  std::map<std::string, ItnLexicon> langs_;
  // template lookup tables (archive "maps": de_months, ko_hours, ...)
  std::map<std::string, std::map<std::string, std::string>> maps_;

  std::string ApplyTimedateRules(const ItnLexicon& lex,
                                 const std::string& text) const;
};

}  // namespace funasr_tpu

#endif  // FUNASR_TPU_ITN_GRAMMAR_H_
