// qwen3_host — native host-side runtime kernels (C ABI, loaded via ctypes).
//
// The reference implements its whole runtime in C++; the TPU port keeps the
// compute path in XLA/Pallas but implements the host-side hot paths natively
// too: Q8_0 block dequantization (model load), byte-level BPE encoding
// (tokenization of long transcripts for forced alignment), and the O(n^2)
// LIS timestamp repair. Python fallbacks exist for every entry point
// (qwen3_asr_tpu/runtime/native.py).
//
// Build: make -C native   ->  libqwen3_host.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Q8_0 dequantization: blocks of (f16 scale, 32x int8) -> float32
// ---------------------------------------------------------------------------

static inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {
            // subnormal: normalize
            int shift = 0;
            while (!(mant & 0x400)) { mant <<= 1; ++shift; }
            mant &= 0x3FF;
            bits = sign | ((127 - 15 - shift) << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

void q8_0_dequant(const uint8_t* raw, int64_t n_blocks, float* out) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* blk = raw + b * 34;
        uint16_t h;
        std::memcpy(&h, blk, 2);
        const float d = f16_to_f32(h);
        const int8_t* q = reinterpret_cast<const int8_t*>(blk + 2);
        float* o = out + b * 32;
        for (int i = 0; i < 32; ++i) o[i] = q[i] * d;
    }
}

// ---------------------------------------------------------------------------
// LIS timestamp repair.
//
// Semantics contract: qwen3_asr_tpu/text/timestamps.py::fix_timestamp_classes_py
// (the oracle; mirrors reference forced_aligner.cpp:1183-1265). This native
// version is an independent O(n log n) patience-sorting design rather than the
// oracle's O(n^2) DP; the tie-breaking is made to agree with the DP exactly:
//
//  * the DP sets parent[i] = the SMALLEST j < i with data[j] <= data[i] and
//    dp[j] = dp[i]-1, and starts reconstruction at the FIRST index of maximal
//    dp. Within one patience level, values are strictly decreasing as index
//    grows (two non-decreasing same-level elements would chain, contradicting
//    equal level), so "smallest valid j" is the first element of the suffix
//    of that level whose value is <= data[i] — found by binary search — and
//    "first maximal-dp index" is the first element ever placed on the top
//    level.
//
// Repair of anomaly runs (values off the kept subsequence) uses the same
// rules as the oracle: runs of <= 2 snap to the nearer surviving neighbor
// (ties toward the left), longer runs interpolate linearly between anchors.
// ---------------------------------------------------------------------------

namespace {

// One element placed on a patience level: its index in `data`.
// levels[l] is ordered by placement (= increasing index, decreasing value).
struct Levels {
    std::vector<std::vector<int32_t>> by_level;
};

// Mark the reconstructed non-decreasing subsequence in `keep`.
static void mark_kept_subsequence(const int32_t* data, int32_t n,
                                  std::vector<uint8_t>& keep) {
    Levels lv;
    std::vector<int32_t> tops;  // tops[l] = value of last element placed on level l
    for (int32_t i = 0; i < n; ++i) {
        const int32_t v = data[i];
        // First level whose top is > v  ==  the level this element extends
        // (non-decreasing LIS: an element goes on the first level whose top
        // exceeds it; equal tops allow chaining so we search with >).
        size_t lo = 0, hi = tops.size();
        while (lo < hi) {
            size_t mid = (lo + hi) / 2;
            if (tops[mid] > v) hi = mid; else lo = mid + 1;
        }
        if (lo == tops.size()) {
            tops.push_back(v);
            lv.by_level.emplace_back();
        } else {
            tops[lo] = v;
        }
        lv.by_level[lo].push_back(i);
    }

    // Walk back from the FIRST element of the top level, at each step taking
    // the earliest same-or-lower-valued element of the level below.
    int32_t cur = lv.by_level.back().front();
    keep[cur] = 1;
    for (size_t l = lv.by_level.size() - 1; l > 0; --l) {
        const std::vector<int32_t>& below = lv.by_level[l - 1];
        const int32_t limit = data[cur];
        // Values along `below` strictly decrease; the indices with
        // value <= limit form a suffix. Binary-search its start.
        size_t lo = 0, hi = below.size();
        while (lo < hi) {
            size_t mid = (lo + hi) / 2;
            if (data[below[mid]] <= limit) hi = mid; else lo = mid + 1;
        }
        cur = below[lo];
        keep[cur] = 1;
    }
}

}  // namespace

void lis_repair(const int32_t* data, int32_t n, int32_t* result) {
    if (n <= 0) return;
    std::vector<uint8_t> keep(n, 0);
    mark_kept_subsequence(data, n, keep);

    std::memcpy(result, data, n * sizeof(int32_t));

    // Precompute nearest kept neighbor on each side in two sweeps.
    std::vector<int32_t> prev_keep(n), next_keep(n);
    for (int32_t i = 0, last = -1; i < n; ++i) {
        if (keep[i]) last = i;
        prev_keep[i] = last;
    }
    for (int32_t i = n - 1, nxt = n; i >= 0; --i) {
        if (keep[i]) nxt = i;
        next_keep[i] = nxt;
    }

    for (int32_t i = 0; i < n;) {
        if (keep[i]) { ++i; continue; }
        const int32_t j = next_keep[i];          // first kept index at/after run (n if none)
        const int32_t run_end = (j < n) ? j : n; // run is [i, run_end)
        const int32_t L = prev_keep[i];          // kept index before run (-1 if none)
        const int32_t left_val = (L >= 0) ? data[L] : -1;
        const int32_t right_val = (j < n) ? data[j] : -1;
        const int32_t count = run_end - i;

        if (count <= 2) {
            for (int32_t k = i; k < run_end; ++k) {
                if (left_val < 0) result[k] = right_val;
                else if (right_val < 0) result[k] = left_val;
                else result[k] = ((k - (i - 1)) <= (run_end - k)) ? left_val : right_val;
            }
        } else if (left_val >= 0 && right_val >= 0) {
            const float step = (float)(right_val - left_val) / (count + 1);
            for (int32_t k = i; k < run_end; ++k)
                result[k] = (int32_t)(left_val + step * (k - i + 1));
        } else if (left_val >= 0 || right_val >= 0) {
            const int32_t fill = (left_val >= 0) ? left_val : right_val;
            for (int32_t k = i; k < run_end; ++k) result[k] = fill;
        }
        i = run_end;
    }
}

// ---------------------------------------------------------------------------
// Byte-level BPE encoder.
//
// Vocabulary/merges are loaded once into an opaque context. Input text is
// a single pre-split piece (the Python layer handles whitespace splitting
// and the space prefix). Symbols are managed as UTF-8 strings; the merge
// loop picks the lowest-rank adjacent pair per iteration (greedy, same as
// text_decoder.cpp:911-949).
// ---------------------------------------------------------------------------

struct BpeCtx {
    std::unordered_map<std::string, int32_t> token_to_id;
    std::unordered_map<std::string, int32_t> ranks;  // "sym1 sym2" -> rank
    std::string byte_to_unicode[256];
};

static void fill_byte_tables(BpeCtx* ctx) {
    // GPT-2 bytes_to_unicode
    bool assigned[256] = {false};
    int byte_to_cp[256];
    auto mark = [&](int lo, int hi) {
        for (int b = lo; b <= hi; ++b) { byte_to_cp[b] = b; assigned[b] = true; }
    };
    mark(0x21, 0x7E); mark(0xA1, 0xAC); mark(0xAE, 0xFF);
    int n = 0;
    for (int b = 0; b < 256; ++b)
        if (!assigned[b]) byte_to_cp[b] = 256 + n++;
    for (int b = 0; b < 256; ++b) {
        int cp = byte_to_cp[b];
        std::string s;
        if (cp < 0x80) s += (char)cp;
        else if (cp < 0x800) {
            s += (char)(0xC0 | (cp >> 6));
            s += (char)(0x80 | (cp & 0x3F));
        } else {
            s += (char)(0xE0 | (cp >> 12));
            s += (char)(0x80 | ((cp >> 6) & 0x3F));
            s += (char)(0x80 | (cp & 0x3F));
        }
        ctx->byte_to_unicode[b] = s;
    }
}

// vocab_blob / merges_blob: '\n'-joined UTF-8 entries.
void* bpe_create(const char* vocab_blob, int64_t vocab_len,
                 const char* merges_blob, int64_t merges_len) {
    BpeCtx* ctx = new BpeCtx();
    fill_byte_tables(ctx);
    {
        int32_t id = 0;
        const char* p = vocab_blob;
        const char* end = vocab_blob + vocab_len;
        while (p < end) {
            const char* nl = (const char*)memchr(p, '\n', end - p);
            size_t len = nl ? (size_t)(nl - p) : (size_t)(end - p);
            ctx->token_to_id.emplace(std::string(p, len), id++);
            p += len + 1;
        }
    }
    {
        int32_t rank = 0;
        const char* p = merges_blob;
        const char* end = merges_blob + merges_len;
        while (p < end) {
            const char* nl = (const char*)memchr(p, '\n', end - p);
            size_t len = nl ? (size_t)(nl - p) : (size_t)(end - p);
            ctx->ranks.emplace(std::string(p, len), rank++);
            p += len + 1;
        }
    }
    return ctx;
}

void bpe_destroy(void* handle) { delete static_cast<BpeCtx*>(handle); }

// Encode one piece (raw UTF-8 bytes). Returns count written to out
// (capacity out_cap); unknown subwords are dropped (reference behavior).
int32_t bpe_encode_piece(void* handle, const char* text, int64_t text_len,
                         int32_t* out, int32_t out_cap) {
    BpeCtx* ctx = static_cast<BpeCtx*>(handle);

    // bytes -> byte-level unicode string, split into initial symbols
    std::string mapped;
    mapped.reserve(text_len * 2);
    std::vector<uint32_t> sym_start;  // offsets into `mapped`
    for (int64_t i = 0; i < text_len; ++i) {
        sym_start.push_back((uint32_t)mapped.size());
        mapped += ctx->byte_to_unicode[(unsigned char)text[i]];
    }
    sym_start.push_back((uint32_t)mapped.size());

    // symbols as (start, len) pairs over `mapped`
    std::vector<std::pair<uint32_t, uint32_t>> syms;
    for (size_t i = 0; i + 1 < sym_start.size(); ++i)
        syms.emplace_back(sym_start[i], sym_start[i + 1] - sym_start[i]);

    std::string key;
    while (syms.size() > 1) {
        int32_t best_rank = INT32_MAX;
        size_t best_pos = 0;
        for (size_t i = 0; i + 1 < syms.size(); ++i) {
            key.assign(mapped, syms[i].first, syms[i].second);
            key += ' ';
            key.append(mapped, syms[i + 1].first, syms[i + 1].second);
            auto it = ctx->ranks.find(key);
            if (it != ctx->ranks.end() && it->second < best_rank) {
                best_rank = it->second;
                best_pos = i;
            }
        }
        if (best_rank == INT32_MAX) break;
        syms[best_pos].second += syms[best_pos + 1].second;
        syms.erase(syms.begin() + best_pos + 1);
    }

    int32_t n_out = 0;
    for (auto& s : syms) {
        key.assign(mapped, s.first, s.second);
        auto it = ctx->token_to_id.find(key);
        if (it != ctx->token_to_id.end() && n_out < out_cap)
            out[n_out++] = it->second;
    }
    return n_out;
}

}  // extern "C"
