// Native q10/q11 optimal-parse command generation for the C ABI.
//
// This is the C++ analog of encode/zopfli.zopfli_segment (reference
// BrotliCreateHqZopfliBackwardReferences, src/enc/backward_references/
// hq.rs:1237): deep all-matches collection, dictionary candidates,
// sliding-window literal costs, then the cost-model refinement loop
// around the shared native DP (zopfli_dp_cands_native) with
// context-conditional literal/distance pricing between iterations.
//
// Matches the Python pipeline's architecture piece for piece: the
// exact sorted (word x transform) dictionary index is built here from
// the embedded tables (the Python side reuses it), and the caller
// (capi.cpp) runs the same per-metablock NPOSTFIX/NDIRECT search.
// Output is byte-count-equal to the Python q11 on text and within
// ~0.01% on binaries (tiny literal-cost rounding differences).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <atomic>
#include <mutex>
#include <vector>

// ---------------------------------------------------------------------------
// imports from the sibling translation units (one shared .so)
// ---------------------------------------------------------------------------

struct ZCand {                      // must match hotloops.cpp
    int32_t len;
    int32_t wire;
    int32_t dist;
    int16_t sym;
    uint8_t nbits;
    uint8_t flags;
};
static_assert(sizeof(ZCand) == 16, "ZCand layout drifted");

extern "C" {
int64_t collect_matches_native(
    const uint8_t* data, int64_t n, int64_t dict_len,
    int64_t window_size, int64_t k, int64_t bucket_bits,
    int64_t k8, int64_t bucket_bits8, int64_t min_len,
    int64_t max_per_pos,
    int64_t* out_pos, int64_t* out_len, int64_t* out_dist, int64_t cap);

int64_t zopfli_cands_dense_native(
    const int64_t* d_len, const int64_t* d_dist, const uint8_t* d_isdict,
    const int64_t* d_wire, int64_t n_rows,
    const int64_t* x_pos, const int64_t* x_len, const int64_t* x_dist,
    const uint8_t* x_isdict, const int64_t* x_wire, int64_t xm,
    const int64_t* y_pos, const int64_t* y_len, const int64_t* y_dist,
    const uint8_t* y_isdict, const int64_t* y_wire, int64_t ym,
    int64_t n, int64_t npostfix, int64_t ndirect, int64_t k_win,
    int64_t k_dict, int64_t ladder_top,
    int64_t* cand_off, ZCand* out);

void zopfli_dp_cands_native(
    int64_t n, int64_t n_starts, int64_t cand_cap,
    int64_t max_zopfli_len, const double* lcp, const double* cost_cmd,
    const double* cost_dist_short, const double* cost_dist,
    int64_t dist_alpha, const int64_t* cand_off, const ZCand* cands,
    const int64_t* ins_code_tab, const int64_t* ins_extra_tab,
    const int64_t* cmd_sym_tab, const int64_t* cmd_sym_last_tab,
    const uint8_t* data, int64_t total_len, int64_t dict_len,
    int64_t window_size, const int64_t* initial_cache,
    float* cost, int32_t* prev_start, int32_t* prev_len,
    int32_t* prev_wire, int32_t* prev_dist, int32_t* node_cache);

void resolve_commands_native(
    const int64_t* insert_len, const int64_t* copy_len,
    const int64_t* distance, const int64_t* wire_copy, int64_t n,
    int64_t npostfix, int64_t ndirect,
    int64_t* cache_io, int64_t pos_offset, int64_t window_size,
    int64_t* out_code, int64_t* out_extra, int64_t* out_extra_bits,
    uint8_t* out_use_last, int64_t* out_cmd_sym);

void est_lit_native(const uint8_t* data, int64_t n, const uint8_t* cls,
                    int64_t half, int utf8_ramp, double bias,
                    double* cost);

void dict_sorted_init_native(const uint8_t* sb, const int64_t* sl,
                             int64_t m, int32_t* lpf, uint8_t* bloom,
                             uint64_t* key8, int32_t* range16);

int64_t collect_dict_sorted_native(
    const uint8_t* data, int64_t n, int64_t dict_len, int64_t window_size,
    const uint8_t* sb, const int64_t* sl, const int64_t* swire,
    const int64_t* swid, const int32_t* lpf, int64_t m,
    const uint8_t* bloom, const uint64_t* key8, const int32_t* range16,
    int64_t* out_pos, int64_t* out_len, int64_t* out_dist,
    int64_t* out_wire, int64_t cap, int64_t* progress);
}

namespace zhq {

// ---------------------------------------------------------------------------
// static code tables (mirrors constants.py; see also hotloops.cpp
// kInsBaseT/combine_codes — duplicated here because those are static)
// ---------------------------------------------------------------------------

static const int64_t kInsBase[24] = {
    0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194,
    322, 578, 1090, 2114, 6210, 22594};
static const int64_t kInsExtra[24] = {
    0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10,
    12, 14, 24};

static inline int64_t combine_codes(int64_t ic, int64_t cc,
                                    bool use_last) {
    int64_t bits64 = (cc & 7) | ((ic & 7) << 3);
    if (use_last && ic < 8 && cc < 16)
        return bits64 + (cc < 8 ? 0 : 64);
    int64_t sub = 2 * ((cc >> 3) + 3 * (ic >> 3));
    int64_t offset = (sub << 5) + 0x40 + ((0x520D40 >> sub) & 0xC0);
    return offset | bits64;
}

struct DpTables {
    std::vector<int64_t> ins_code;      // [65536]
    int64_t cmd_sym[24 * 24];
    int64_t cmd_sym_last[24 * 24];
    DpTables() {
        ins_code.resize(65536);
        int64_t c = 0;
        for (int64_t v = 0; v < 65536; v++) {
            while (c < 23 && kInsBase[c + 1] <= v) c++;
            ins_code[v] = c;
        }
        for (int i = 0; i < 24; i++)
            for (int j = 0; j < 24; j++) {
                cmd_sym[i * 24 + j] = combine_codes(i, j, false);
                cmd_sym_last[i * 24 + j] =
                    (i < 8 && j < 16) ? combine_codes(i, j, true) : 0;
            }
    }
};
static const DpTables& dp_tables() {
    static DpTables t;
    return t;
}

// ---------------------------------------------------------------------------
// literal-cost estimate (mirrors zopfli.estimate_literal_costs:
// UTF8-vs-binary decision + context classes, then the shared native
// sliding-histogram walk)
// ---------------------------------------------------------------------------

static bool mostly_utf8(const uint8_t* d, int64_t n) {
    // bytes covered by valid UTF-8 sequences > 75% (the Python side's
    // decode(errors="ignore") length check)
    int64_t ok = 0, i = 0;
    while (i < n) {
        uint8_t b = d[i];
        int need = b < 0x80 ? 0
                 : (b & 0xE0) == 0xC0 ? 1
                 : (b & 0xF0) == 0xE0 ? 2
                 : (b & 0xF8) == 0xF0 ? 3 : -1;
        if (need < 0 || i + need >= n) { i++; continue; }
        bool good = true;
        for (int j = 1; j <= need; j++)
            if ((d[i + j] & 0xC0) != 0x80) { good = false; break; }
        if (good) { ok += need + 1; i += need + 1; }
        else i++;
    }
    return ok > (3 * n) / 4;
}

static void literal_costs(const uint8_t* region, int64_t n,
                          std::vector<double>& cost) {
    cost.resize(n);
    if (!n) return;
    if (mostly_utf8(region, n)) {
        // context class from bytes i-1 / i-2 (literal_cost.rs:8),
        // clamped by the sampled multibyte level
        std::vector<uint8_t> cls(n);
        int64_t c1 = 0, c2 = 0;
        for (int64_t i = 0; i < n; i++) {
            int64_t c = i >= 1 ? region[i - 1] : 0;
            int64_t last = i >= 2 ? region[i - 2] : 0;
            int v = c < 128 ? 0 : (c >= 192 ? 1 : (last < 0xE0 ? 0 : 2));
            cls[i] = (uint8_t)v;
            if (v == 1) c1++;
            if (v == 2) c2++;
        }
        int max_utf8 = (c1 + c2 < 25) ? 0 : (c2 < 500 ? 1 : 2);
        if (max_utf8 == 0) {
            est_lit_native(region, n, nullptr, 495, 1, 0.02905,
                           cost.data());
        } else {
            for (int64_t i = 0; i < n; i++)
                if (cls[i] > max_utf8) cls[i] = (uint8_t)max_utf8;
            est_lit_native(region, n, cls.data(), 495, 1, 0.02905,
                           cost.data());
        }
    } else {
        est_lit_native(region, n, nullptr, 2000, 0, 0.029, cost.data());
    }
}

// ---------------------------------------------------------------------------
// exact sorted-output dictionary index (the C++ build of
// static_dict.sorted_dict_index + the shared predecessor-search probe:
// every unique (word x transform) output, lexicographically sorted,
// deduped to the cheapest wid).  Built once, lazily, from the embedded
// dictionary tables (~1.4M entries, ~70MB, ~1s).
// ---------------------------------------------------------------------------

static const int64_t kExtMaxOut = 38;   // DICT_SORTED_W

struct DictIdx {
    const uint8_t* data = nullptr;       // raw dictionary bytes
    const int64_t* offsets = nullptr;    // [25]
    const int64_t* size_bits = nullptr;  // [25]
    const int64_t* t_type = nullptr;     // [121]
    const uint8_t* t_prefix = nullptr;   // [121 * 16]
    const int64_t* t_prefix_len = nullptr;
    const uint8_t* t_suffix = nullptr;   // [121 * 16]
    const int64_t* t_suffix_len = nullptr;
    int64_t n_transforms = 0;
    bool have_tables = false;
    // sorted index (built on first q10+ use)
    std::vector<uint8_t> sb;             // [m * 38], 0-padded
    std::vector<int64_t> s_len, s_wire, s_wid;
    std::vector<int32_t> lpf, range16;
    std::vector<uint8_t> bloom;
    std::vector<uint64_t> key8;
    int64_t m = 0;
    std::atomic<bool> built{false};
};
static DictIdx g_dict;
static std::mutex g_dict_mtx;

// reference RFC 7932 transform application (mirrors
// decoder.cpp transform_word / core/dictionary.apply_transform)
static int64_t ferment(uint8_t* buf, int64_t len, int64_t i) {
    uint8_t c = buf[i];
    if (c < 192) {
        if (c >= 'a' && c <= 'z') buf[i] = c ^ 32;
        return 1;
    }
    if (c < 224) {
        if (i + 1 < len) buf[i + 1] ^= 32;
        return 2;
    }
    if (i + 2 < len) buf[i + 2] ^= 5;
    return 3;
}

static int64_t apply_transform(const DictIdx& D, const uint8_t* w,
                               int64_t word_len, int64_t transform,
                               uint8_t* out) {
    int64_t ty = D.t_type[transform];
    int64_t start = 0, len = word_len;
    if (ty >= 12 && ty <= 20) {        // omit first 1..9
        int64_t k = ty - 11;
        start = std::min(k, len);
        len -= start;
    } else if (ty >= 1 && ty <= 9) {   // omit last 1..9
        len = len > ty ? len - ty : 0;
    }
    int64_t o = 0;
    const uint8_t* pre = D.t_prefix + transform * 16;
    for (int64_t j = 0; j < D.t_prefix_len[transform]; j++)
        out[o++] = pre[j];
    int64_t body = o;
    for (int64_t j = 0; j < len; j++) out[o++] = w[start + j];
    if (ty == 10) {                    // uppercase first
        if (len > 0) ferment(out + body, len, 0);
    } else if (ty == 11) {             // uppercase all
        int64_t i = 0;
        while (i < len) i += ferment(out + body, len, i);
    }
    const uint8_t* suf = D.t_suffix + transform * 16;
    for (int64_t j = 0; j < D.t_suffix_len[transform]; j++)
        out[o++] = suf[j];
    return o;
}

void dict_init(const uint8_t* data, const int64_t* offsets,
               const int64_t* size_bits, const int64_t* t_type,
               const uint8_t* t_prefix, const int64_t* t_prefix_len,
               const uint8_t* t_suffix, const int64_t* t_suffix_len,
               int64_t n_transforms) {
    std::lock_guard<std::mutex> lk(g_dict_mtx);
    if (g_dict.have_tables) return;
    g_dict.data = data;
    g_dict.offsets = offsets;
    g_dict.size_bits = size_bits;
    g_dict.t_type = t_type;
    g_dict.t_prefix = t_prefix;
    g_dict.t_prefix_len = t_prefix_len;
    g_dict.t_suffix = t_suffix;
    g_dict.t_suffix_len = t_suffix_len;
    g_dict.n_transforms = n_transforms;
    g_dict.have_tables = true;
}

static void build_sorted_index() {
    std::lock_guard<std::mutex> lk(g_dict_mtx);
    DictIdx& D = g_dict;
    if (D.built || !D.have_tables) return;
    // expand every (word x transform) output of length 4..38
    struct Entry { uint8_t key[kExtMaxOut + 1]; int64_t wire, wid; };
    std::vector<Entry> entries;
    entries.reserve(1700000);
    uint8_t buf[64];
    for (int64_t L = 4; L <= 24; L++) {
        int64_t bits = D.size_bits[L];
        int64_t nwords = bits ? (int64_t(1) << bits) : 0;
        for (int64_t i = 0; i < nwords; i++) {
            const uint8_t* w = D.data + D.offsets[L] + i * L;
            for (int64_t t = 0; t < D.n_transforms; t++) {
                int64_t lo = apply_transform(D, w, L, t, buf);
                if (lo < 4 || lo > kExtMaxOut) continue;
                entries.push_back(Entry());
                Entry& e = entries.back();
                std::memset(e.key, 0, sizeof(e.key));
                std::memcpy(e.key, buf, (size_t)lo);
                e.key[kExtMaxOut] = (uint8_t)lo;  // length tiebreak
                e.wire = L;
                e.wid = (t << bits) | i;
            }
        }
    }
    // lexicographic sort (0-padded key + length byte), wid tiebreak
    std::sort(entries.begin(), entries.end(),
              [](const Entry& a, const Entry& b) {
                  int c = std::memcmp(a.key, b.key, kExtMaxOut + 1);
                  return c != 0 ? c < 0 : a.wid < b.wid;
              });
    // dedupe: keep the min-wid representative per unique output
    int64_t m = 0;
    for (size_t i = 0; i < entries.size(); i++)
        if (i == 0 || std::memcmp(entries[i].key, entries[i - 1].key,
                                  kExtMaxOut + 1))
            entries[m++] = entries[i];
    D.m = m;
    D.sb.resize((size_t)m * kExtMaxOut);
    D.s_len.resize(m);
    D.s_wire.resize(m);
    D.s_wid.resize(m);
    for (int64_t i = 0; i < m; i++) {
        std::memcpy(&D.sb[(size_t)i * kExtMaxOut], entries[i].key,
                    kExtMaxOut);
        D.s_len[i] = entries[i].key[kExtMaxOut];
        D.s_wire[i] = entries[i].wire;
        D.s_wid[i] = entries[i].wid;
    }
    entries.clear();
    entries.shrink_to_fit();
    D.lpf.resize(m);
    D.bloom.resize(int64_t(1) << 21);
    D.key8.resize(m);
    D.range16.resize(65537);
    dict_sorted_init_native(D.sb.data(), D.s_len.data(), m,
                            D.lpf.data(), D.bloom.data(),
                            D.key8.data(), D.range16.data());
    D.built.store(true, std::memory_order_release);
}

static void dict_candidates(const uint8_t* base, int64_t total_len,
                            int64_t dict_len, int64_t window,
                            std::vector<int64_t>& yp,
                            std::vector<int64_t>& yl,
                            std::vector<int64_t>& yd,
                            std::vector<int64_t>& yw) {
    if (!g_dict.built.load(std::memory_order_acquire))
        build_sorted_index();
    const DictIdx& D = g_dict;
    if (!D.built.load(std::memory_order_acquire)) return;
    int64_t cap = (total_len - dict_len) * 6 + 64;
    yp.resize(cap); yl.resize(cap); yd.resize(cap); yw.resize(cap);
    int64_t cnt;
    for (;;) {
        cnt = collect_dict_sorted_native(
            base, total_len, dict_len, window, D.sb.data(),
            D.s_len.data(), D.s_wire.data(), D.s_wid.data(),
            D.lpf.data(), D.m, D.bloom.data(), D.key8.data(),
            D.range16.data(), yp.data(), yl.data(), yd.data(),
            yw.data(), cap, nullptr);
        if (cnt >= 0) break;
        cap *= 2;
        yp.resize(cap); yl.resize(cap); yd.resize(cap); yw.resize(cap);
    }
    yp.resize(cnt); yl.resize(cnt); yd.resize(cnt); yw.resize(cnt);
}

// ---------------------------------------------------------------------------
// cost models (mirrors zopfli._set_cost / _context_literal_costs /
// _context_distance_costs)
// ---------------------------------------------------------------------------

static void set_cost(const int64_t* h, int n, bool literal,
                     double* out) {
    double s = 0;
    int miss_n = 0;
    for (int i = 0; i < n; i++) { s += h[i]; if (!h[i]) miss_n++; }
    if (s == 0) {
        for (int i = 0; i < n; i++) out[i] = 2.0;
        return;
    }
    double miss = literal ? s : s + miss_n;
    double ls = std::log2(s), lm = std::log2(miss) + 2.0;
    for (int i = 0; i < n; i++)
        out[i] = h[i] > 0
            ? std::max(ls - std::log2((double)h[i]), 1.0)
            : lm;
}

struct Cmds {
    std::vector<int64_t> ins, cps, dst, adv;   // raw parse output
    std::vector<int64_t> code, extra, ebits, sym;
    std::vector<uint8_t> use_last;
    int64_t n = 0;
};

static void resolve(Cmds& c, int64_t dict_len, int64_t window,
                    const int64_t* initial_cache) {
    int64_t cache[4] = {initial_cache[0], initial_cache[1],
                        initial_cache[2], initial_cache[3]};
    c.code.resize(c.n); c.extra.resize(c.n); c.ebits.resize(c.n);
    c.sym.resize(c.n); c.use_last.resize(c.n);
    resolve_commands_native(c.ins.data(), c.adv.data(), c.dst.data(),
                            c.cps.data(), c.n, 0, 0, cache, dict_len,
                            window, c.code.data(), c.extra.data(),
                            c.ebits.data(), c.use_last.data(),
                            c.sym.data());
}

static void histograms(const uint8_t* region, const Cmds& c,
                       int64_t dist_alpha, std::vector<int64_t>& lh,
                       std::vector<int64_t>& ch,
                       std::vector<int64_t>& dh) {
    lh.assign(256, 0); ch.assign(704, 0); dh.assign(dist_alpha, 0);
    int64_t pos = 0;
    for (int64_t i = 0; i < c.n; i++) {
        for (int64_t j = 0; j < c.ins[i]; j++) lh[region[pos + j]]++;
        pos += c.ins[i] + c.adv[i];
        ch[c.sym[i]]++;
        if (c.cps[i] > 0 && c.sym[i] >= 128) dh[c.code[i]]++;
    }
}

// [4][alpha] distance costs conditioned on the RFC copy-length
// context, smoothed toward the global distribution (beta=32)
static void context_distance_costs(const Cmds& c, int64_t dist_alpha,
                                   std::vector<double>& out) {
    out.assign(4 * dist_alpha, 0.0);
    std::vector<double> h(4 * dist_alpha, 0.0);
    std::vector<double> g(dist_alpha, 0.0);
    double rowsum[4] = {0, 0, 0, 0};
    for (int64_t i = 0; i < c.n; i++) {
        if (c.cps[i] <= 0 || c.sym[i] < 128) continue;
        int64_t cl = c.cps[i];
        int ctx = (int)(cl < 5 ? (cl < 2 ? 0 : cl - 2) : 3);
        h[ctx * dist_alpha + c.code[i]] += 1.0;
        g[c.code[i]] += 1.0;
        rowsum[ctx] += 1.0;
    }
    double gs = 0;
    for (int64_t j = 0; j < dist_alpha; j++) gs += g[j];
    if (gs < 1.0) gs = 1.0;
    const double beta = 32.0;
    for (int ctx = 0; ctx < 4; ctx++)
        for (int64_t j = 0; j < dist_alpha; j++) {
            double p = (h[ctx * dist_alpha + j] + beta * g[j] / gs +
                        1e-12) / (rowsum[ctx] + beta);
            out[ctx * dist_alpha + j] = std::max(-std::log2(p), 1.0);
        }
}

// per-position literal cost conditioned on the RFC literal context
// (UTF8 mode LUTs), from the previous parse's literals (alpha=64,
// bias=0.4; see zopfli._context_literal_costs for the rationale)
static void context_literal_costs(const uint8_t* base, int64_t dict_len,
                                  const uint8_t* region, int64_t n,
                                  const Cmds& c, const uint8_t* lut0,
                                  const uint8_t* lut1,
                                  std::vector<double>& out) {
    std::vector<double> hist(64 * 256, 0.0);
    double ctx_tot[64] = {0};
    std::vector<double> g(256, 0.0);
    int64_t pos = 0;
    for (int64_t i = 0; i < c.n; i++) {
        for (int64_t j = 0; j < c.ins[i]; j++) {
            int64_t p = pos + j;
            int64_t a = dict_len + p;
            uint8_t p1 = a >= 1 ? base[a - 1] : 0;
            uint8_t p2 = a >= 2 ? base[a - 2] : 0;
            int ctx = lut0[p1] | lut1[p2];
            hist[ctx * 256 + region[p]] += 1.0;
            ctx_tot[ctx] += 1.0;
            g[region[p]] += 1.0;
        }
        pos += c.ins[i] + c.adv[i];
    }
    double gs = 0;
    for (int j = 0; j < 256; j++) gs += g[j];
    if (gs < 1.0) gs = 1.0;
    const double alpha = 64.0, bias = 0.4;
    std::vector<double> tab(64 * 256);
    for (int ctx = 0; ctx < 64; ctx++)
        for (int j = 0; j < 256; j++) {
            double p = (hist[ctx * 256 + j] + alpha * g[j] / gs + 1e-9)
                       / (ctx_tot[ctx] + alpha);
            tab[ctx * 256 + j] = std::max(-std::log2(p), 1.0);
        }
    out.resize(n);
    for (int64_t i = 0; i < n; i++) {
        int64_t a = dict_len + i;
        uint8_t p1 = a >= 1 ? base[a - 1] : 0;
        uint8_t p2 = a >= 2 ? base[a - 2] : 0;
        int ctx = lut0[p1] | lut1[p2];
        out[i] = tab[ctx * 256 + region[i]] + bias;
    }
}

// backtrack over the DP's float/int32 node arrays (the shared
// zopfli_backtrack_native takes the Python path's double/int64 form)
static void backtrack(int64_t n, const double* lcp, const float* cost,
                      const int32_t* prev_start, const int32_t* prev_len,
                      const int32_t* prev_wire, const int32_t* prev_dist,
                      Cmds& out) {
    double best_adj = 1e300;
    int64_t best_u = 0;
    for (int64_t u = 0; u < n; u++)
        if (cost[u] < 1e29f) {
            double a = (double)cost[u] - lcp[u];
            if (a < best_adj) { best_adj = a; best_u = u; }
        }
    out.ins.clear(); out.cps.clear(); out.dst.clear(); out.adv.clear();
    int64_t pos = n;
    double end_from_u = best_adj + lcp[n];
    if (cost[n] >= 1e29f || end_from_u < (double)cost[n]) {
        out.ins.push_back(n - best_u);
        out.cps.push_back(0);
        out.dst.push_back(0);
        out.adv.push_back(0);
        pos = best_u;
    }
    while (pos > 0) {
        int64_t u = prev_start[pos];
        int64_t l = prev_len[pos];
        out.ins.push_back(pos - l - u);
        out.cps.push_back(prev_wire[pos]);
        out.dst.push_back(prev_dist[pos]);
        out.adv.push_back(l);
        pos = u;
    }
    std::reverse(out.ins.begin(), out.ins.end());
    std::reverse(out.cps.begin(), out.cps.end());
    std::reverse(out.dst.begin(), out.dst.end());
    std::reverse(out.adv.begin(), out.adv.end());
    out.n = (int64_t)out.ins.size();
}

}  // namespace zhq

// ---------------------------------------------------------------------------
// entry point (called by capi.cpp's c_encode for quality >= 10)
// ---------------------------------------------------------------------------

extern "C" void zopfli_hq_dict_init(
    const uint8_t* data, const int64_t* offsets, const int64_t* size_bits,
    const int64_t* t_type, const uint8_t* t_prefix,
    const int64_t* t_prefix_len, const uint8_t* t_suffix,
    const int64_t* t_suffix_len, int64_t n_transforms) {
    zhq::dict_init(data, offsets, size_bits, t_type, t_prefix,
                   t_prefix_len, t_suffix, t_suffix_len, n_transforms);
}

// direct access to the built index (the Python side reuses it instead
// of its ~10x slower numpy builder; pointers stay valid for the
// process lifetime)
extern "C" int64_t zopfli_hq_sorted_index(
    const uint8_t** sb, const int64_t** s_len, const int64_t** s_wire,
    const int64_t** s_wid) {
    if (!zhq::g_dict.built.load(std::memory_order_acquire))
        zhq::build_sorted_index();
    if (!zhq::g_dict.built.load(std::memory_order_acquire)) return -1;
    *sb = zhq::g_dict.sb.data();
    *s_len = zhq::g_dict.s_len.data();
    *s_wire = zhq::g_dict.s_wire.data();
    *s_wid = zhq::g_dict.s_wid.data();
    return zhq::g_dict.m;
}

namespace zhq {

// cache-independent candidate collection (prefetchable one metablock
// ahead, like the Python pipeline's zopfli_collect)
struct Collected {
    std::vector<int64_t> cand_off;
    std::vector<ZCand> cands;
    std::vector<double> lcp;
    bool ok = false;
};

static void hq_collect(const uint8_t* base, int64_t dict_len, int64_t n,
                       int64_t window, int64_t use_dictionary,
                       Collected& out) {
    int64_t total_len = dict_len + n;
    const uint8_t* region = base + dict_len;
    int64_t cm_cap = n * 8 + 1024;
    std::vector<int64_t> xp(cm_cap), xl(cm_cap), xd(cm_cap);
    int64_t xm = collect_matches_native(base, total_len, dict_len,
                                        window, 96, 17, 48, 18, 4, 16,
                                        xp.data(), xl.data(), xd.data(),
                                        cm_cap);
    if (xm < 0) return;
    std::vector<uint8_t> xisd(xm, 0);
    std::vector<int64_t> yp, yl, yd, yw;
    if (use_dictionary)
        dict_candidates(base, total_len, dict_len, window, yp, yl, yd,
                        yw);
    std::vector<uint8_t> yisd(yp.size(), 1);
    out.cand_off.resize(n + 1);
    out.cands.resize((size_t)(xm + (int64_t)yp.size()));
    int64_t nc = zopfli_cands_dense_native(
        nullptr, nullptr, nullptr, nullptr, 0,
        xp.data(), xl.data(), xd.data(), xisd.data(), xl.data(), xm,
        yp.data(), yl.data(), yd.data(), yisd.data(), yw.data(),
        (int64_t)yp.size(),
        n, 0, 0, 12, 4, 4, out.cand_off.data(), out.cands.data());
    if (nc < 0) return;
    std::vector<double> lit_cost;
    literal_costs(region, n, lit_cost);
    out.lcp.resize(n + 1);
    out.lcp[0] = 0.0;
    for (int64_t i = 0; i < n; i++)
        out.lcp[i + 1] = out.lcp[i] + lit_cost[i];
    out.ok = true;
}

}  // namespace zhq

extern "C" int64_t zopfli_hq_parse_pre_native(
    const uint8_t*, int64_t, int64_t, int64_t, int64_t, int64_t,
    const int64_t*, const uint8_t*, const uint8_t*, void*,
    int64_t*, int64_t*, int64_t*, int64_t*, int64_t);

// prefetch handle: collect for a region on the calling thread (the
// caller runs it under std::async/thread)
extern "C" void* zopfli_hq_collect_native(
    const uint8_t* base, int64_t dict_len, int64_t n, int64_t window,
    int64_t use_dictionary) {
    auto* c = new zhq::Collected();
    zhq::hq_collect(base, dict_len, n, window, use_dictionary, *c);
    return c;
}

extern "C" void zopfli_hq_collect_free(void* c) {
    delete (zhq::Collected*)c;
}

extern "C" int64_t zopfli_hq_parse_native(
    const uint8_t* base, int64_t dict_len, int64_t n /* region */,
    int64_t window, int64_t quality, int64_t use_dictionary,
    const int64_t* initial_cache, const uint8_t* ctx_lut0_utf8,
    const uint8_t* ctx_lut1_utf8,
    int64_t* out_ins, int64_t* out_cps, int64_t* out_dst,
    int64_t* out_adv, int64_t cap)
{
    return zopfli_hq_parse_pre_native(
        base, dict_len, n, window, quality, use_dictionary,
        initial_cache, ctx_lut0_utf8, ctx_lut1_utf8, nullptr,
        out_ins, out_cps, out_dst, out_adv, cap);
}

extern "C" int64_t zopfli_hq_parse_pre_native(
    const uint8_t* base, int64_t dict_len, int64_t n /* region */,
    int64_t window, int64_t quality, int64_t use_dictionary,
    const int64_t* initial_cache, const uint8_t* ctx_lut0_utf8,
    const uint8_t* ctx_lut1_utf8, void* precollected /* consumed */,
    int64_t* out_ins, int64_t* out_cps, int64_t* out_dst,
    int64_t* out_adv, int64_t cap)
{
    using namespace zhq;
    if (n <= 0) {
        zopfli_hq_collect_free(precollected);
        return 0;
    }
    int64_t total_len = dict_len + n;
    const uint8_t* region = base + dict_len;
    const int64_t dist_alpha = 16 + 0 + (24 << 1);  // npostfix/ndirect 0

    Collected own;
    Collected* col;
    if (precollected) {
        col = (Collected*)precollected;
    } else {
        hq_collect(base, dict_len, n, window, use_dictionary, own);
        col = &own;
    }
    if (!col->ok) {
        if (precollected) zopfli_hq_collect_free(precollected);
        return -1;
    }
    std::vector<int64_t>& cand_off = col->cand_off;
    std::vector<ZCand>& cands = col->cands;
    std::vector<double>& lcp = col->lcp;

    // ---- refinement loop (zopfli_segment's schedule: q10 = 2
    // iterations, q11 = 5 with cost-convergence early promote) ----
    const DpTables& T = dp_tables();
    // depth 3 mirrors encode/zopfli.Q11_ITERS (round-5 trade: the
    // depth-5 search bought ~0.07% size for ~40% wall time)
    int iters = quality >= 11 ? 3 : 2;
    int last_it = iters - 1;
    int64_t max_zopfli_len = quality <= 10 ? 150 : 325;

    std::vector<float> cost(n + 1);
    std::vector<int32_t> ps(n + 1), pl(n + 1), pw(n + 1), pd(n + 1);
    std::vector<int32_t> node_cache(4 * (n + 1));
    std::vector<double> cost_cmd(704), cost_dist(4 * dist_alpha);
    double cds[16];
    Cmds cur, prev;
    std::vector<int64_t> lh, ch, dh;
    double prev_end = 1e300;
    bool have_prev_end = false;

    for (int it = 0; it <= last_it; it++) {
        if (it == 0) {
            for (int i = 0; i < 704; i++)
                cost_cmd[i] = std::log2(11.0 + i);
            for (int64_t j = 0; j < dist_alpha; j++) {
                double v = std::log2(20.0 + (double)j);
                for (int r = 0; r < 4; r++)
                    cost_dist[r * dist_alpha + j] = v;
            }
        } else {
            set_cost(ch.data(), 704, false, cost_cmd.data());
            // iterations >= 1 price literals and distances from the
            // previous parse, context-conditioned
            std::vector<double> clc;
            context_literal_costs(base, dict_len, region, n, cur,
                                  ctx_lut0_utf8, ctx_lut1_utf8, clc);
            lcp[0] = 0.0;
            for (int64_t i = 0; i < n; i++) lcp[i + 1] = lcp[i] + clc[i];
            context_distance_costs(cur, dist_alpha, cost_dist);
        }
        for (int j = 0; j < 16; j++)
            cds[j] = cost_dist[3 * dist_alpha + j];

        zopfli_dp_cands_native(
            n, it == last_it ? 5 : 2, it == last_it ? 0 : 6,
            max_zopfli_len, lcp.data(), cost_cmd.data(), cds,
            cost_dist.data(), dist_alpha, cand_off.data(), cands.data(),
            T.ins_code.data(), kInsExtra, T.cmd_sym, T.cmd_sym_last,
            base, total_len, dict_len, window, initial_cache,
            cost.data(), ps.data(), pl.data(), pw.data(), pd.data(),
            node_cache.data());

        prev = cur;
        backtrack(n, lcp.data(), cost.data(), ps.data(), pl.data(),
                  pw.data(), pd.data(), cur);
        if (prev.n == cur.n && prev.n &&
            !std::memcmp(prev.ins.data(), cur.ins.data(),
                         prev.n * sizeof(int64_t)) &&
            !std::memcmp(prev.cps.data(), cur.cps.data(),
                         prev.n * sizeof(int64_t)) &&
            !std::memcmp(prev.dst.data(), cur.dst.data(),
                         prev.n * sizeof(int64_t)) &&
            !std::memcmp(prev.adv.data(), cur.adv.data(),
                         prev.n * sizeof(int64_t)))
            break;
        if (it < last_it) {
            double end_cost = (double)cost[n];
            double best_adj = 1e300;
            for (int64_t u = 0; u < n; u++)
                if (cost[u] < 1e29f)
                    best_adj = std::min(best_adj,
                                        (double)cost[u] - lcp[u]);
            end_cost = std::min(end_cost, best_adj + lcp[n]);
            if (have_prev_end &&
                prev_end - end_cost <= 2e-4 * std::fabs(end_cost))
                last_it = it + 1;   // converged: one wide final pass
            prev_end = end_cost;
            have_prev_end = true;
            resolve(cur, dict_len, window, initial_cache);
            histograms(region, cur, dist_alpha, lh, ch, dh);
        }
    }

    if (precollected) zopfli_hq_collect_free(precollected);
    if (cur.n > cap) return -1;
    std::memcpy(out_ins, cur.ins.data(), cur.n * sizeof(int64_t));
    std::memcpy(out_cps, cur.cps.data(), cur.n * sizeof(int64_t));
    std::memcpy(out_dst, cur.dst.data(), cur.n * sizeof(int64_t));
    std::memcpy(out_adv, cur.adv.data(), cur.n * sizeof(int64_t));
    return cur.n;
}
