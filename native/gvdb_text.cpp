// gvdb_text — native BM25 tokenizer hot loop (ASCII fast path).
//
// The write-path profile puts per-document tokenization + term counting among
// the top Python costs of `batch_add_documents` (docs/benchmarks.md serving
// section). This implements EXACTLY the SimpleTokenizer semantics for
// pure-ASCII text (engine/sparse.py): lowercase [a-z0-9_]+ runs, English
// stopword removal, term -> count map. Non-ASCII text falls back to the
// Python path on the binding side (Unicode lowercasing and the CJK scan stay
// single-sourced in Python), so the two implementations can never disagree on
// the inputs this one accepts.
//
// C ABI (ctypes; pybind11 is not in this image):
//   gvdb_tokenize_counts(text, len, out, cap, &total) -> n_unique | -needed
// Output records: [u16 token_len][token bytes][u32 count], tightly packed.

#include <climits>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>

namespace {

const std::unordered_set<std::string>& stopwords() {
    // keep in lockstep with engine/sparse.py::_EN_STOPWORDS
    static const std::unordered_set<std::string> s = {
        "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
        "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
        "to", "was", "were", "will", "with", "this", "but", "they", "have",
        "had", "what", "when", "where", "who", "which", "why", "how", "or",
        "not", "no", "so", "if", "than", "then",
    };
    return s;
}

}  // namespace

extern "C" {

// Tokenize ASCII text; returns the number of unique terms written to `out`,
// or -(bytes needed) when `cap` is too small (caller retries with a bigger
// buffer). `total` receives the total token count (BM25 doc length).
int32_t gvdb_tokenize_counts(const char* text, int32_t n, char* out,
                             int32_t cap, int32_t* total) {
    const auto& stop = stopwords();
    std::unordered_map<std::string, uint32_t> counts;
    counts.reserve(64);
    int32_t tot = 0;
    std::string tok;
    tok.reserve(24);
    for (int32_t i = 0; i <= n; ++i) {
        char c = (i < n) ? text[i] : ' ';
        if (c >= 'A' && c <= 'Z') c = static_cast<char>(c - 'A' + 'a');
        const bool in_token =
            (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_';
        if (in_token) {
            tok.push_back(c);
            continue;
        }
        if (!tok.empty()) {
            if (stop.find(tok) == stop.end()) {
                ++counts[tok];
                ++tot;
            }
            tok.clear();
        }
    }
    int64_t need = 0;
    for (const auto& kv : counts) {
        if (kv.first.size() > 0xFFFF) {
            // token exceeds the u16 record header — signal the binding to
            // fall back to the Python path (INT32_MIN sentinel)
            return INT32_MIN;
        }
        need += 2 + static_cast<int64_t>(kv.first.size()) + 4;
    }
    if (need > cap) return static_cast<int32_t>(-need);
    char* p = out;
    for (const auto& kv : counts) {
        const uint16_t l = static_cast<uint16_t>(kv.first.size());
        std::memcpy(p, &l, 2);
        p += 2;
        std::memcpy(p, kv.first.data(), l);
        p += l;
        const uint32_t cnum = kv.second;
        std::memcpy(p, &cnum, 4);
        p += 4;
    }
    if (total != nullptr) *total = tot;
    return static_cast<int32_t>(counts.size());
}

}  // extern "C"
