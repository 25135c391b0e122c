// Native WordPiece tokenizer for the MOSEI text path.
//
// The reference tokenizes every batch with the Python HF BertTokenizer
// inside the DataLoader collate (src/dataset.py:40-55) — a per-batch host-CPU
// hot spot on the training critical path (SURVEY.md §3.1).  This C++
// implementation performs the same uncased basic-tokenize + greedy
// longest-match WordPiece and writes input_ids/attention_mask directly into
// caller-provided buffers; the Python side (tokenizer_native.py) batches
// calls through ctypes.
//
// Scope: ASCII fast path (MOSEI transcripts are CTC outputs: A-Z and
// apostrophes).  Texts containing non-ASCII bytes are REJECTED (return -1)
// and the caller falls back to the Python tokenizer, which handles full
// unicode NFD accent stripping.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> token_to_id;
  int32_t cls_id = -1;
  int32_t sep_id = -1;
  int32_t unk_id = -1;
  int32_t pad_id = 0;
  int32_t max_chars_per_word = 100;
};

std::vector<Vocab*> g_vocabs;

inline bool is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

// Greedy longest-match WordPiece of one lowercased word.
// Appends ids; returns false on [UNK]-collapse per HF semantics
// (the whole word becomes one UNK when any piece fails).
void wordpiece(const Vocab& v, const std::string& word,
               std::vector<int32_t>* out) {
  if ((int32_t)word.size() > v.max_chars_per_word) {
    out->push_back(v.unk_id);
    return;
  }
  std::vector<int32_t> ids;
  size_t start = 0;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t cur = -1;
    while (start < end) {
      std::string sub = word.substr(start, end - start);
      if (start > 0) sub = "##" + sub;
      auto it = v.token_to_id.find(sub);
      if (it != v.token_to_id.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      out->push_back(v.unk_id);
      return;
    }
    ids.push_back(cur);
    start = end;
  }
  out->insert(out->end(), ids.begin(), ids.end());
}

}  // namespace

extern "C" {

// Build a vocab from a buffer of newline-separated tokens.
// Returns a handle (index), or -1 on failure.
int32_t wp_load_vocab(const char* data, int64_t len) {
  Vocab* v = new Vocab();
  int32_t id = 0;
  const char* p = data;
  const char* endp = data + len;
  while (p < endp) {
    const char* nl = (const char*)memchr(p, '\n', endp - p);
    size_t n = nl ? (size_t)(nl - p) : (size_t)(endp - p);
    // strip trailing \r
    while (n > 0 && (p[n - 1] == '\r')) --n;
    std::string tok(p, n);
    v->token_to_id.emplace(std::move(tok), id);
    ++id;
    if (!nl) break;
    p = nl + 1;
  }
  auto find = [&](const char* t) -> int32_t {
    auto it = v->token_to_id.find(t);
    return it == v->token_to_id.end() ? -1 : it->second;
  };
  v->cls_id = find("[CLS]");
  v->sep_id = find("[SEP]");
  v->unk_id = find("[UNK]");
  int32_t pad = find("[PAD]");
  v->pad_id = pad >= 0 ? pad : 0;
  if (v->cls_id < 0 || v->sep_id < 0 || v->unk_id < 0) {
    delete v;
    return -1;
  }
  g_vocabs.push_back(v);
  return (int32_t)(g_vocabs.size() - 1);
}

// Encode a batch: texts = concatenated UTF-8, offsets[i]..offsets[i+1] spans
// text i (n+1 offsets).  Writes ids and attention masks into
// out_ids/out_attn, each [n, max_length] row-major int32.  token_type_ids
// are all zero (single-segment), left to the caller.
// Returns 0 on success, -1 if any text contains non-ASCII bytes (caller
// falls back to Python), -2 on bad handle.
int32_t wp_encode_batch(int32_t handle, const char* texts,
                        const int64_t* offsets, int64_t n,
                        int32_t max_length, int32_t* out_ids,
                        int32_t* out_attn) {
  if (handle < 0 || handle >= (int32_t)g_vocabs.size()) return -2;
  if (max_length < 2) return -2;  // need room for [CLS] + [SEP]; smaller
  //                                 would overflow the caller's row buffer /
  //                                 wrap body to a huge size_t
  const Vocab& v = *g_vocabs[handle];
  for (int64_t i = 0; i < n; ++i) {
    const char* s = texts + offsets[i];
    const int64_t len = offsets[i + 1] - offsets[i];
    for (int64_t j = 0; j < len; ++j) {
      if ((unsigned char)s[j] >= 128) return -1;
    }
    std::vector<int32_t> ids;
    ids.reserve(max_length);
    std::string word;
    auto flush_word = [&]() {
      if (!word.empty()) {
        wordpiece(v, word, &ids);
        word.clear();
      }
    };
    for (int64_t j = 0; j < len; ++j) {
      unsigned char c = (unsigned char)s[j];
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        flush_word();
      } else if (is_ascii_punct(c)) {
        flush_word();
        std::string p(1, (char)c);
        wordpiece(v, p, &ids);
      } else {
        word.push_back((char)(c >= 'A' && c <= 'Z' ? c + 32 : c));
      }
    }
    flush_word();

    const int32_t body = max_length - 2;
    if ((int32_t)ids.size() > body) ids.resize(body);
    int32_t* row_ids = out_ids + i * max_length;
    int32_t* row_attn = out_attn + i * max_length;
    int32_t k = 0;
    row_ids[k] = v.cls_id;
    row_attn[k++] = 1;
    for (int32_t t : ids) {
      row_ids[k] = t;
      row_attn[k++] = 1;
    }
    row_ids[k] = v.sep_id;
    row_attn[k++] = 1;
    for (; k < max_length; ++k) {
      row_ids[k] = v.pad_id;
      row_attn[k] = 0;
    }
  }
  return 0;
}

void wp_free(int32_t handle) {
  if (handle >= 0 && handle < (int32_t)g_vocabs.size() && g_vocabs[handle]) {
    delete g_vocabs[handle];
    g_vocabs[handle] = nullptr;
  }
}

}  // extern "C"
