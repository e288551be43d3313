#include "punc-engine.h"

#include <cctype>
#include <cmath>
#include <cstring>

#include "nn.h"

namespace funasr_tpu {

namespace {

bool IsAsciiFirst(const std::string& w) {
  return !w.empty() && static_cast<unsigned char>(w[0]) < 0x80;
}

// last UTF-8 character of s (empty when s is empty)
std::string LastUtf8Char(const std::string& s) {
  if (s.empty()) return "";
  size_t i = s.size() - 1;
  while (i > 0 && (static_cast<unsigned char>(s[i]) & 0xC0) == 0x80) --i;
  return s.substr(i);
}

std::string Capitalize(const std::string& w) {
  std::string out = w;
  if (!out.empty()) {
    out[0] = static_cast<char>(std::toupper(static_cast<unsigned char>(out[0])));
    for (size_t i = 1; i < out.size(); ++i) {
      out[i] = static_cast<char>(std::tolower(static_cast<unsigned char>(out[i])));
    }
  }
  return out;
}

}  // namespace

std::vector<std::string> SplitWords(const std::string& text) {
  std::vector<std::string> words;
  std::string current;
  auto flush = [&]() {
    if (!current.empty()) {
      words.push_back(current);
      current.clear();
    }
  };
  for (size_t i = 0; i < text.size();) {
    unsigned char c = text[i];
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
      flush();
      ++i;
    } else if (c < 0x80) {
      current += static_cast<char>(c);
      ++i;
    } else {
      flush();
      size_t len = (c & 0xE0) == 0xC0 ? 2 : (c & 0xF0) == 0xE0 ? 3
                   : (c & 0xF8) == 0xF0 ? 4 : 1;
      len = std::min(len, text.size() - i);
      words.push_back(text.substr(i, len));
      i += len;
    }
  }
  flush();
  return words;
}

const WTensor& PuncEngine::W(const std::string& name) const {
  const WTensor* t = ftr_.Find(name);
  static WTensor empty;
  return t ? *t : empty;
}

bool PuncEngine::Load(const std::string& model_dir) {
  if (!ftr_.Load(model_dir + "/punc.ftr")) return false;
  if (!vocab_.Load(model_dir + "/punc_tokens.txt")) return false;
  embed_unit_ = ftr_.MetaInt("embed_unit", 256);
  att_unit_ = ftr_.MetaInt("att_unit", 256);
  n_punc_ = ftr_.MetaInt("n_punc", 6);
  sentence_end_id_ = ftr_.MetaInt("sentence_end_id", 3);
  split_size_ = ftr_.MetaInt("split_size", 20);
  vad_encoder_ = ftr_.MetaInt("vad_encoder", 0) != 0;
  punc_list_.clear();
  for (int i = 0; i < n_punc_; ++i) {
    punc_list_.push_back(ftr_.MetaStr("punc_" + std::to_string(i), "_"));
  }
  SanmEncoderCfg cfg;
  cfg.input_size = embed_unit_;
  cfg.d = att_unit_;
  cfg.heads = ftr_.MetaInt("encoder.attention_heads", 8);
  cfg.ffn = ftr_.MetaInt("encoder.linear_units", 1024);
  cfg.blocks = ftr_.MetaInt("encoder.num_blocks", 4);
  cfg.kernel = ftr_.MetaInt("encoder.kernel_size", 11);
  cfg.shift = ftr_.MetaInt("encoder.sanm_shift", 0);
  encoder_.Init(&ftr_, "encoder", cfg);
  loaded_ = ftr_.Find("encoder/after_norm/scale") != nullptr &&
            ftr_.Find("embed/w") != nullptr;
  return loaded_;
}

std::vector<float> PuncEngine::WindowLogits(const std::vector<int>& ids,
                                            int vad_pos) const {
  const int t = static_cast<int>(ids.size());
  const WTensor& emb = W("embed/w");
  std::vector<float> x(static_cast<int64_t>(t) * embed_unit_, 0.0f);
  const int vocab = static_cast<int>(emb.rows());
  for (int i = 0; i < t; ++i) {
    int id = ids[i] >= 0 && ids[i] < vocab ? ids[i] : 0;
    std::memcpy(x.data() + static_cast<int64_t>(i) * embed_unit_,
                emb.f32.data() + static_cast<int64_t>(id) * embed_unit_,
                embed_unit_ * sizeof(float));
  }
  std::vector<float> h = vad_encoder_
                             ? encoder_.EncodeVad(x, t, vad_pos < 0 ? 0 : vad_pos)
                             : encoder_.Encode(x, t);
  std::vector<float> logits(static_cast<int64_t>(t) * n_punc_);
  const WTensor& wo = W("decoder/w");
  const WTensor* bo = ftr_.Find("decoder/b");
  MatMul(h.data(), t, att_unit_, wo, bo ? bo->f32.data() : nullptr,
         logits.data());
  return logits;
}

// Mirrors funasr_tpu/models/ct_transformer/model.py inference (itself the
// reference ct_transformer inference:290+ / runtime ct-transformer.cpp AddPunc
// mini-sentence algorithm).
std::string PuncEngine::AddPunc(const std::string& text) const {
  if (!loaded_ || text.empty()) return text;
  std::vector<std::string> words = SplitWords(text);
  if (words.empty()) return "";
  std::vector<int> ids(words.size());
  for (size_t i = 0; i < words.size(); ++i) ids[i] = vocab_.Token2Id(words[i]);

  const size_t n_mini =
      words.size() <= static_cast<size_t>(split_size_)
          ? 1
          : (words.size() / split_size_ + (words.size() % split_size_ ? 1 : 0));
  std::vector<std::string> cache_words;
  std::vector<int> cache_ids;
  std::string out;

  for (size_t si = 0; si < n_mini; ++si) {
    const size_t lo = si * split_size_;
    const size_t hi = std::min(lo + split_size_, words.size());
    std::vector<std::string> sent(cache_words);
    sent.insert(sent.end(), words.begin() + lo, words.begin() + hi);
    std::vector<int> sent_ids(cache_ids);
    sent_ids.insert(sent_ids.end(), ids.begin() + lo, ids.begin() + hi);

    std::vector<float> logits = WindowLogits(sent_ids);
    const int n = static_cast<int>(sent.size());
    std::vector<int> puncs(n);
    for (int i = 0; i < n; ++i) {
      const float* row = logits.data() + static_cast<int64_t>(i) * n_punc_;
      int best = 0;
      for (int j = 1; j < n_punc_; ++j) {
        if (row[j] > row[best]) best = j;
      }
      puncs[i] = best;
    }

    int keep = n;  // tokens emitted this window; the rest carries over
    if (si + 1 < n_mini) {
      int sentence_end = -1, last_comma = -1;
      for (int i = n - 2; i > 1; --i) {
        const std::string& p = punc_list_[puncs[i]];
        if (p == "\xE3\x80\x82" || p == "\xEF\xBC\x9F") {  // 。 ？
          sentence_end = i;
          break;
        }
        if (last_comma < 0 && p == "\xEF\xBC\x8C") last_comma = i;  // ，
      }
      if (sentence_end < 0 && n > cache_pop_trigger_limit_ && last_comma >= 0) {
        sentence_end = last_comma;
        puncs[sentence_end] = sentence_end_id_;
      }
      cache_words.assign(sent.begin() + sentence_end + 1, sent.end());
      cache_ids.assign(sent_ids.begin() + sentence_end + 1, sent_ids.end());
      keep = sentence_end + 1;
    }

    for (int i = 0; i < keep; ++i) {
      std::string w = sent[i];
      const bool ascii = IsAsciiFirst(sent[i]);
      if ((i == 0 || punc_list_[puncs[i - 1]] == "\xE3\x80\x82" ||
           punc_list_[puncs[i - 1]] == "\xEF\xBC\x9F") &&
          ascii) {
        w = Capitalize(w);
      }
      if (ascii && (i == 0 || IsAsciiFirst(sent[i - 1]))) w = " " + w;
      out += w;
      std::string p = punc_list_[puncs[i]];
      if (p != "_") {
        if (ascii) {
          if (p == "\xEF\xBC\x8C") p = ",";
          else if (p == "\xE3\x80\x82") p = ".";
          else if (p == "\xEF\xBC\x9F") p = "?";
        }
        out += p;
      }
    }

    if (si + 1 == n_mini && !out.empty()) {
      // force a sentence end at the very end (model.py inference tail)
      const std::string last = LastUtf8Char(out);
      if (last == "\xEF\xBC\x8C" || last == "\xE3\x80\x81") {  // ， 、
        out.resize(out.size() - last.size());
        out += "\xE3\x80\x82";
      } else if (last == ",") {
        out.resize(out.size() - 1);
        out += ".";
      } else if (last != "\xE3\x80\x82" && last != "\xEF\xBC\x9F" &&
                 last.size() != 1) {
        out += "\xE3\x80\x82";
      } else if (last != "." && last != "?" && last.size() == 1) {
        out += ".";
      }
    }
  }
  return out;
}

// Mirrors funasr_tpu/models/ct_transformer_streaming/model.py inference: the
// carried pre-text is prepended (and attention-fenced via the VAD corner
// mask), only new words are emitted, and a trailing mark is withheld so the
// next chunk can revise it.
std::string PuncEngine::AddPuncStreaming(const std::string& text,
                                         PuncCache* cache) const {
  if (!loaded_ || cache == nullptr) return text;
  std::string full;
  for (const auto& w : cache->pre_text) full += w;
  full += " " + text;
  const int vad_pos = static_cast<int>(cache->pre_text.size());

  std::vector<std::string> all_words = SplitWords(full);
  if (all_words.empty()) return "";
  std::vector<int> all_ids(all_words.size());
  for (size_t i = 0; i < all_words.size(); ++i) {
    all_ids[i] = vocab_.Token2Id(all_words[i]);
  }

  const size_t n_mini =
      all_words.size() <= static_cast<size_t>(split_size_)
          ? 1
          : (all_words.size() / split_size_ +
             (all_words.size() % split_size_ ? 1 : 0));
  std::vector<std::string> cache_words, words;
  std::vector<int> cache_ids;
  std::vector<std::string> punc_strs;

  for (size_t si = 0; si < n_mini; ++si) {
    const size_t lo = si * split_size_;
    const size_t hi = std::min(lo + split_size_, all_words.size());
    std::vector<std::string> sent(cache_words);
    sent.insert(sent.end(), all_words.begin() + lo, all_words.begin() + hi);
    std::vector<int> sent_ids(cache_ids);
    sent_ids.insert(sent_ids.end(), all_ids.begin() + lo, all_ids.begin() + hi);

    std::vector<float> logits = WindowLogits(sent_ids, vad_pos);
    const int n = static_cast<int>(sent.size());
    std::vector<int> puncs(n);
    for (int i = 0; i < n; ++i) {
      const float* row = logits.data() + static_cast<int64_t>(i) * n_punc_;
      int best = 0;
      for (int j = 1; j < n_punc_; ++j) {
        if (row[j] > row[best]) best = j;
      }
      puncs[i] = best;
    }

    int keep = n;
    if (si + 1 < n_mini) {
      int sentence_end = -1, last_comma = -1;
      for (int i = n - 2; i > 1; --i) {
        const std::string& p = punc_list_[puncs[i]];
        if (p == "\xE3\x80\x82" || p == "\xEF\xBC\x9F") {
          sentence_end = i;
          break;
        }
        if (last_comma < 0 && p == "\xEF\xBC\x8C") last_comma = i;
      }
      if (sentence_end < 0 && n > cache_pop_trigger_limit_ && last_comma >= 0) {
        sentence_end = last_comma;
        puncs[sentence_end] = sentence_end_id_;
      }
      cache_words.assign(sent.begin() + sentence_end + 1, sent.end());
      cache_ids.assign(sent_ids.begin() + sentence_end + 1, sent_ids.end());
      keep = sentence_end + 1;
    }
    for (int i = 0; i < keep; ++i) {
      words.push_back(sent[i]);
      punc_strs.push_back(punc_list_[puncs[i]]);
    }
  }

  // emit only the words past the carried pre-text, with their punctuation
  std::string out;
  std::vector<std::string> emitted;
  int skip = 0;
  for (size_t i = 0; i < words.size(); ++i) {
    if (i > 0 && !words[i].empty() &&
        static_cast<unsigned char>(words[i][0]) < 0x80 &&
        !words[i - 1].empty() &&
        static_cast<unsigned char>(words[i - 1].back()) < 0x80) {
      words[i] = " " + words[i];
    }
    if (skip < vad_pos) {
      ++skip;
    } else {
      out += words[i];
    }
    if (skip >= vad_pos) {
      emitted.push_back(punc_strs[i]);
      if (punc_strs[i] != "_") out += punc_strs[i];
    }
  }

  // carry words after the last full stop into the next call
  int sentence_end = -1;
  for (int i = static_cast<int>(punc_strs.size()) - 2; i > 1; --i) {
    if (punc_strs[i] == "\xE3\x80\x82" || punc_strs[i] == "\xEF\xBC\x9F") {
      sentence_end = i;
      break;
    }
  }
  cache->pre_text.assign(words.begin() + sentence_end + 1, words.end());

  // withhold the trailing mark so the next chunk can revise it
  if (!out.empty()) {
    const std::string last = LastUtf8Char(out);
    for (const auto& p : punc_list_) {
      if (p == last) {
        out.resize(out.size() - last.size());
        break;
      }
    }
  }
  return out;
}

}  // namespace funasr_tpu
