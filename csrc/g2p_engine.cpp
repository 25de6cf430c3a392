// Native grapheme-to-phoneme rule engine.
//
// Plays the role eSpeak-NG's C core plays for the reference frontend
// (zonos/conditioning.py:212-292): the hot letter-to-sound loop for
// out-of-lexicon words.  The engine is data-driven — Python hands it the
// rule table (one rule per line: "grapheme\tleft\tright\tphones") so the
// single source of truth stays in zonos_tpu/text/g2p_rules_en.py; C++ owns
// the context matcher and the per-word scan.
//
// Context pattern atoms (mirrors the Python matcher in zonos_tpu/text/g2p.py):
//   '#' one or more vowels      '^' one consonant      ':' zero+ consonants
//   '.' one voiced consonant    ' ' word boundary      other: literal
//
// C ABI:
//   void* g2p_create(const char* rules_text);
//   int   g2p_apply(void* h, const char* word, char* out, int cap);
//   void  g2p_destroy(void* h);

#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Rule {
  std::string grapheme;
  std::string left;
  std::string right;
  std::string phones;
};

struct Engine {
  // rules bucketed by first grapheme char, original order preserved
  std::unordered_map<char, std::vector<Rule>> rules;
};

inline bool is_vowel(char c) { return std::strchr("aeiouy", c) != nullptr; }
inline bool is_alpha(char c) { return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '\''; }
inline bool is_voiced(char c) { return std::strchr("bdgjlmnrvwz", c) != nullptr; }

char char_at(const std::string& w, long i) {
  if (i < 0 || i >= (long)w.size()) return ' ';
  return w[(size_t)i];
}

// Match a context pattern outward from `start` (exclusive of the grapheme).
bool match_context(const std::string& pat, const std::string& word, long start,
                   bool forward) {
  long i = start;
  long step = forward ? 1 : -1;
  std::string atoms = pat;
  if (!forward) {
    atoms.assign(pat.rbegin(), pat.rend());
  }
  for (char atom : atoms) {
    char ch = char_at(word, i);
    switch (atom) {
      case '#': {
        if (!is_vowel(ch)) return false;
        while (is_vowel(char_at(word, i + step))) i += step;
        break;
      }
      case '^':
        if (!is_alpha(ch) || is_vowel(ch)) return false;
        break;
      case ':': {
        while (is_alpha(char_at(word, i)) && !is_vowel(char_at(word, i))) i += step;
        i -= step;  // consumed zero-or-more; compensate the loop's advance
        break;
      }
      case '.':
        if (!is_voiced(ch)) return false;
        break;
      case '@': {
        // consonant cluster after which long u reads /u/ (t s r d l z n j th ch sh)
        static const char* kClusters[] = {"th", "ch", "sh", "t", "s", "r",
                                          "d",  "l",  "z",  "n", "j"};
        bool ok = false;
        for (const char* c : kClusters) {
          size_t n = std::strlen(c);
          long lo = forward ? i : i - (long)n + 1;
          if (lo < 0 || lo + (long)n > (long)word.size()) continue;
          if (word.compare((size_t)lo, n, c) == 0) {
            ok = true;
            break;
          }
        }
        if (!ok) return false;
        break;
      }
      case ' ':
        if (is_alpha(ch)) return false;
        break;
      default:
        if (ch != atom) return false;
    }
    i += step;
  }
  return true;
}

}  // namespace

extern "C" {

void* g2p_create(const char* rules_text) {
  auto* e = new Engine();
  const char* p = rules_text;
  while (*p) {
    const char* nl = std::strchr(p, '\n');
    size_t len = nl ? (size_t)(nl - p) : std::strlen(p);
    std::string line(p, len);
    p = nl ? nl + 1 : p + len;
    if (line.empty()) continue;
    // split on tabs: grapheme \t left \t right \t phones
    Rule r;
    size_t a = line.find('\t');
    if (a == std::string::npos) continue;
    size_t b = line.find('\t', a + 1);
    size_t c = (b == std::string::npos) ? std::string::npos : line.find('\t', b + 1);
    r.grapheme = line.substr(0, a);
    r.left = (b == std::string::npos) ? "" : line.substr(a + 1, b - a - 1);
    r.right = (c == std::string::npos) ? "" : line.substr(b + 1, c - b - 1);
    r.phones = (c == std::string::npos) ? "" : line.substr(c + 1);
    if (!r.grapheme.empty()) e->rules[r.grapheme[0]].push_back(r);
  }
  return e;
}

int g2p_apply(void* handle, const char* word_c, char* out, int cap) {
  auto* e = static_cast<Engine*>(handle);
  std::string word(word_c);
  std::string result;
  size_t i = 0;
  while (i < word.size()) {
    char ch = word[i];
    auto it = e->rules.find(ch);
    bool matched = false;
    if (it != e->rules.end()) {
      for (const Rule& r : it->second) {  // ordered: first match wins
        if (word.compare(i, r.grapheme.size(), r.grapheme) != 0) continue;
        if (!r.left.empty() &&
            !match_context(r.left, word, (long)i - 1, /*forward=*/false))
          continue;
        if (!r.right.empty() &&
            !match_context(r.right, word, (long)(i + r.grapheme.size()),
                           /*forward=*/true))
          continue;
        if (!r.phones.empty()) {
          if (!result.empty()) result += ' ';
          result += r.phones;
        }
        i += r.grapheme.size();
        matched = true;
        break;
      }
    }
    if (!matched) i += 1;  // unmappable character: drop
  }
  if ((int)result.size() + 1 > cap) return -(int)result.size() - 1;
  std::memcpy(out, result.c_str(), result.size() + 1);
  return (int)result.size();
}

void g2p_destroy(void* handle) { delete static_cast<Engine*>(handle); }

}  // extern "C"
