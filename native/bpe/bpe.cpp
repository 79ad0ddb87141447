// First-party BPE merge engine: the native core behind the framework's
// GPT-2/CLIP byte-level BPE tokenizers (the reference's tokenizer chain rides
// HF `tokenizers`, a Rust library; /root/reference/src/utils.py:94-104).
//
// Scope: the per-word merge loop + vocab lookup — the hot part of byte-level
// BPE.  Pre-tokenization (the unicode regex) stays in Python where the exact
// published pattern is applied; words arrive here already mapped through the
// bytes→unicode table (so symbols are unicode codepoints ≤ U+014F, 1-2 byte
// UTF-8).  An internal word→ids cache makes repeated words O(1).
//
// C ABI (ctypes binding: gpt2_image_captioning_tpu/data/native_bpe.py):
//   bpe_create / bpe_free
//   bpe_add_token(handle, utf8, len, id)
//   bpe_add_merge(handle, l, llen, r, rlen, rank)
//   bpe_encode_word(handle, utf8, len, out_ids, max_out) -> n (or -1 overflow,
//                                                             -2 unknown token)

#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct BPE {
    std::unordered_map<std::string, int64_t> vocab;
    std::unordered_map<std::string, int64_t> ranks;  // "left\x01right" -> rank
    std::unordered_map<std::string, std::vector<int64_t>> cache;
    std::string end_suffix;  // CLIP-style word-end marker appended to the
                             // last symbol before merging (e.g. "</w>")

    static std::string pair_key(const std::string& a, const std::string& b) {
        std::string k;
        k.reserve(a.size() + b.size() + 1);
        k += a;
        k += '\x01';
        k += b;
        return k;
    }

    // split UTF-8 into codepoint-sized symbol strings
    static std::vector<std::string> utf8_symbols(const char* s, size_t n) {
        std::vector<std::string> out;
        size_t i = 0;
        while (i < n) {
            unsigned char c = (unsigned char)s[i];
            size_t len = c < 0x80 ? 1 : c < 0xE0 ? 2 : c < 0xF0 ? 3 : 4;
            if (i + len > n) len = 1;  // tolerate malformed tails
            out.emplace_back(s + i, len);
            i += len;
        }
        return out;
    }

    // encode one pre-token (already byte-level-mapped); returns false if a
    // final symbol is missing from the vocab
    bool encode_word(const std::string& word, std::vector<int64_t>& out) {
        auto it = cache.find(word);
        if (it != cache.end()) {
            out = it->second;
            return true;
        }
        std::vector<std::string> sym = utf8_symbols(word.data(), word.size());
        if (sym.empty()) {
            out.clear();
            return true;
        }
        if (!end_suffix.empty()) sym.back() += end_suffix;
        while (sym.size() > 1) {
            // find the lowest-rank adjacent pair (ties: first occurrence —
            // matches Python's min() over a set ordered by rank only, since
            // ranks are unique)
            int64_t best_rank = std::numeric_limits<int64_t>::max();
            size_t best_i = 0;
            for (size_t i = 0; i + 1 < sym.size(); ++i) {
                auto r = ranks.find(pair_key(sym[i], sym[i + 1]));
                if (r != ranks.end() && r->second < best_rank) {
                    best_rank = r->second;
                    best_i = i;
                }
            }
            if (best_rank == std::numeric_limits<int64_t>::max()) break;
            // merge ALL occurrences of that pair left-to-right (GPT-2 BPE
            // semantics: the chosen bigram is merged everywhere in the word)
            const std::string left = sym[best_i], right = sym[best_i + 1];
            std::vector<std::string> merged;
            merged.reserve(sym.size());
            for (size_t i = 0; i < sym.size();) {
                if (i + 1 < sym.size() && sym[i] == left && sym[i + 1] == right) {
                    merged.emplace_back(left + right);
                    i += 2;
                } else {
                    merged.emplace_back(sym[i]);
                    i += 1;
                }
            }
            sym.swap(merged);
        }
        out.clear();
        out.reserve(sym.size());
        for (auto& t : sym) {
            auto v = vocab.find(t);
            if (v == vocab.end()) return false;
            out.push_back(v->second);
        }
        cache.emplace(word, out);
        return true;
    }
};

}  // namespace

extern "C" {

void* bpe_create() { return new BPE(); }
void bpe_free(void* p) { delete (BPE*)p; }

void bpe_set_end_suffix(void* p, const char* s, int64_t n) {
    ((BPE*)p)->end_suffix.assign(s, (size_t)n);
}

void bpe_add_token(void* p, const char* s, int64_t n, int64_t id) {
    ((BPE*)p)->vocab.emplace(std::string(s, (size_t)n), id);
}

void bpe_add_merge(void* p, const char* l, int64_t ln, const char* r, int64_t rn,
                   int64_t rank) {
    auto* b = (BPE*)p;
    b->ranks.emplace(BPE::pair_key(std::string(l, (size_t)ln), std::string(r, (size_t)rn)),
                     rank);
}

int64_t bpe_encode_word(void* p, const char* s, int64_t n, int64_t* out,
                        int64_t max_out) {
    auto* b = (BPE*)p;
    std::vector<int64_t> ids;
    if (!b->encode_word(std::string(s, (size_t)n), ids)) return -2;
    if ((int64_t)ids.size() > max_out) return -1;
    std::memcpy(out, ids.data(), ids.size() * sizeof(int64_t));
    return (int64_t)ids.size();
}

}  // extern "C"

extern "C" {

// Batched variant: `words` = concatenation of all pre-tokens; `offsets` =
// n_words+1 byte offsets into it.  Output ids are concatenated into out
// (capacity max_out); returns total id count, or -1 (overflow) / -2
// (unknown token).  One call per text amortizes the FFI round trip.
int64_t bpe_encode_words(void* p, const char* words, const int64_t* offsets,
                         int64_t n_words, int64_t* out, int64_t max_out) {
    auto* b = (BPE*)p;
    int64_t total = 0;
    std::vector<int64_t> ids;
    for (int64_t w = 0; w < n_words; ++w) {
        std::string word(words + offsets[w], (size_t)(offsets[w + 1] - offsets[w]));
        if (!b->encode_word(word, ids)) return -2;
        if (total + (int64_t)ids.size() > max_out) return -1;
        std::memcpy(out + total, ids.data(), ids.size() * sizeof(int64_t));
        total += (int64_t)ids.size();
    }
    return total;
}

}  // extern "C"
