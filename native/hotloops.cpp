// Native runtime for tpu-brotli: the encoder's serial hot loops.
//
// The TPU (JAX/XLA) side owns the batched passes (hashing, candidate
// search, match lengths, bit packing); these are the loops that are
// inherently sequential — the greedy lazy walk with distance-cache
// probes (reference src/enc/backward_references/mod.rs:2376-2552), the
// distance-cache short-code resolution (src/enc/command.rs:48-69), and
// the Zopfli shortest-path relaxation (src/enc/backward_references/
// hq.rs:644-830).  Exported with a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC hotloops.cpp -o libbrotli_tpu_native.so

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <algorithm>
#include <vector>
#include <mutex>
#include <thread>
#include <atomic>
#include <new>
#include <type_traits>

extern "C" {

// ---------------------------------------------------------------------------
// helpers
// ---------------------------------------------------------------------------

static inline int64_t probe_len(const uint8_t* data, int64_t src,
                                int64_t dst, int64_t limit) {
    if (limit <= 0 || data[src] != data[dst]) return 0;
    int64_t l = 0;
    while (l + 8 <= limit) {
        uint64_t a, b;
        std::memcpy(&a, data + src + l, 8);
        std::memcpy(&b, data + dst + l, 8);
        uint64_t x = a ^ b;
        if (x) return l + (__builtin_ctzll(x) >> 3);
        l += 8;
    }
    while (l < limit && data[src + l] == data[dst + l]) l++;
    return l;
}

static inline uint32_t load32(const uint8_t* p) {
    uint32_t v; std::memcpy(&v, p, 4); return v;
}

// bucket id for the primary table: 4-byte hash (hash_len 4) or the
// reference AdvHasher's 5-byte hash (hash_len 5, H5/H6 hash_len=5,
// mod.rs:932) — more selective buckets on text, at the cost of
// missing length-4 table candidates (the distance cache still finds
// short continuation matches)
static inline uint32_t bucket_hash(const uint8_t* p, int64_t hash_len,
                                   uint32_t shift) {
    if (hash_len == 5) {
        uint64_t v;
        std::memcpy(&v, p, 8);
        return (uint32_t)(((v << 24) * 0x1FE35A7BD3579BD3ull)
                          >> (32 + shift));
    }
    uint32_t v;
    std::memcpy(&v, p, 4);
    return (v * 0x1E35A7BDu) >> shift;
}

static inline uint64_t load64(const uint8_t* p) {
    uint64_t v; std::memcpy(&v, p, 8); return v;
}

// the 16 short-code distance candidates (RFC 7932 4: cache[idx]+delta)
static const int kSCIdx[16] = {0, 1, 2, 3, 0, 0, 0, 0, 0, 0, 1, 1, 1,
                               1, 1, 1};
static const int kSCDelta[16] = {0, 0, 0, 0, -1, 1, -2, 2, -3, 3, -1,
                                 1, -2, 2, -3, 3};

static inline int64_t cache_penalty(int64_t i) {
    return 39 + ((0x1CA10u >> (i & 0x0E)) & 0x0E);
}

static inline int64_t log2floor(int64_t v) {
    return v > 0 ? 63 - __builtin_clzll((uint64_t)v) : 0;
}

// ---------------------------------------------------------------------------
// greedy lazy walk with distance-cache probes
// (mirrors brotli_tpu/encode/match.py greedy_parse — that host path is
// the oracle; tests assert byte-identical command output)
// ---------------------------------------------------------------------------

int64_t greedy_parse_native(
    const uint8_t* data, int64_t total_len, int64_t dict_len,
    const int64_t* best_len, const int64_t* best_dist,
    const int64_t* best_score, const uint8_t* best_isdict,
    const int64_t* best_wire,
    const int64_t* mpos, int64_t nm,
    const int64_t* boundaries, int64_t n_boundaries, int64_t pos0,
    const int64_t* initial_cache, int64_t window_size,
    int64_t match_cap, int64_t min_score, int64_t cost_diff_lazy,
    int64_t last_dist_bonus, int64_t cache_probe_span, int64_t lbs,
    int64_t* out_insert, int64_t* out_copy, int64_t* out_dist,
    int64_t* out_adv, int64_t* out_seg_counts, int64_t max_cmds)
{
    int64_t n = total_len - dict_len;
    int64_t cache[4] = {initial_cache[0], initial_cache[1],
                        initial_cache[2], initial_cache[3]};
    int64_t mp = 0;
    int64_t pos = pos0;
    int64_t insert_start = pos0;
    int64_t n_out = 0;

    // cache_probe_span carries the short-code candidate count (4 for
    // speed tiers, 16 for quality tiers — reference H9
    // kNumLastDistancesToCheck, mod.rs:598)
    int n_cache = (int)std::max<int64_t>(
        1, std::min<int64_t>(cache_probe_span, 16));
    auto cached_match = [&](int64_t q, int64_t boundary,
                            int64_t* lc_out, int64_t* dc_out) -> int64_t {
        int64_t limit = std::min(boundary, n) - q;
        int64_t bl2 = 0, bd2 = 0, bs2 = 0;
        for (int i = 0; i < n_cache; i++) {
            int64_t d = cache[kSCIdx[i]] + kSCDelta[i];
            if (d <= 0 || d > dict_len + q || d > window_size) continue;
            int64_t lc = probe_len(data, dict_len + q - d, dict_len + q,
                                   limit);
            if (lc >= 4) {
                int64_t sc = lbs * lc + last_dist_bonus;
                if (i != 0) sc -= cache_penalty(i);
                if (sc > bs2) { bs2 = sc; bl2 = lc; bd2 = d; }
            }
        }
        *lc_out = bl2; *dc_out = bd2;
        return bs2;
    };

    for (int64_t bi = 0; bi < n_boundaries; bi++) {
        int64_t boundary = boundaries[bi];
        int64_t seg_start_count = n_out;

        auto emit = [&](int64_t p, int64_t l, int64_t d,
                        int64_t wire) {
            if (n_out >= max_cmds) return;
            out_insert[n_out] = p - insert_start;
            out_copy[n_out] = wire;
            out_dist[n_out] = d;
            out_adv[n_out] = l;
            n_out++;
            pos = p + l;
            insert_start = pos;
            int64_t max_distance = std::min(dict_len + p, window_size);
            if (d <= max_distance && d != cache[0]) {
                cache[3] = cache[2]; cache[2] = cache[1];
                cache[1] = cache[0]; cache[0] = d;
            }
        };

        // same loop shape as combined_parse_native: at every walk
        // position the candidate is max(precomputed table best, live
        // distance-cache probe) — the cache is probed EVERYWHERE, not
        // just near copies (this closed a ~1% ratio gap vs the
        // in-line-search walk)
        auto candidate = [&](int64_t q, int64_t* l_out, int64_t* d_out,
                             int64_t* w_out, bool* dict_out) -> int64_t {
            int64_t lc, dc;
            int64_t csc = cached_match(q, boundary, &lc, &dc);
            int64_t tsc = best_score[q];
            if (csc >= tsc && csc > 0) {
                *l_out = lc; *d_out = dc; *w_out = lc;
                *dict_out = false;
                return csc;
            }
            *l_out = best_len[q];
            *d_out = best_dist[q];
            *w_out = best_wire[q];
            *dict_out = best_isdict[q] != 0;
            return tsc;
        };
        int64_t misses = 0;
        while (pos + 2 <= boundary) {
            int64_t l, d, wire;
            bool dict_ref;
            int64_t s = candidate(pos, &l, &d, &wire, &dict_ref);
            if (s <= min_score) {
                int64_t step = 1;
                if (misses > 512) step = 4;
                else if (misses > 64) step = 2;
                misses++;
                pos += step;
                continue;
            }
            int defers = 0;
            while (defers < 4 && pos + 1 + 4 <= boundary) {
                int64_t l2, d2, w2;
                bool dr2;
                int64_t s2 = candidate(pos + 1, &l2, &d2, &w2, &dr2);
                if (s2 > s + cost_diff_lazy) {
                    pos++;
                    s = s2; l = l2; d = d2; wire = w2; dict_ref = dr2;
                    defers++;
                } else break;
            }
            misses = 0;
            if (!dict_ref && l >= match_cap) {
                l += probe_len(data, dict_len + pos - d + l,
                               dict_len + pos + l, n - pos - l);
                wire = l;
            }
            if (pos + l > boundary) {
                if (dict_ref) { pos++; continue; }
                l = boundary - pos;
                wire = l;
                if (l < 2) { pos++; continue; }
            }
            emit(pos, l, d, dict_ref ? wire : l);
        }

        if (boundary > insert_start ||
            n_out == seg_start_count) {
            if (n_out < max_cmds) {
                out_insert[n_out] = boundary - insert_start;
                out_copy[n_out] = 0;
                out_dist[n_out] = 0;
                out_adv[n_out] = 0;
                n_out++;
            }
        }
        insert_start = boundary;
        if (pos < boundary) pos = boundary;
        out_seg_counts[bi] = n_out - seg_start_count;
    }
    return n_out;
}

// ---------------------------------------------------------------------------
// distance-cache resolution (reference ComputeDistanceCode)
// ---------------------------------------------------------------------------

// insert/copy length code bases (RFC 7932 5; reference command.rs:71-133)
static const int64_t kInsBaseT[24] = {
    0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194,
    322, 578, 1090, 2114, 6210, 22594};
static const int64_t kCpyBaseT[24] = {
    2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102,
    134, 198, 326, 582, 1094, 2118};

// code-of-length lookup: direct u8 table below 1024 (covers nearly
// every command), linear fallback above
struct LenCodeLut {
    uint8_t t[1024];
    LenCodeLut(const int64_t* base) {
        int64_t c = 0;
        for (int64_t v = 0; v < 1024; v++) {
            while (c < 23 && base[c + 1] <= v) c++;
            t[v] = (uint8_t)c;
        }
    }
};

static inline int64_t len_code_of(const int64_t* base, int64_t v) {
    static const LenCodeLut ins_lut(kInsBaseT);
    static const LenCodeLut cpy_lut(kCpyBaseT);
    if (v < 1024)
        return (base == kInsBaseT ? ins_lut : cpy_lut).t[v];
    int64_t c = 23;
    while (c > 0 && base[c] > v) c--;
    return c;
}

// (insert code, copy code, dist0?) -> 704-symbol command alphabet
// (inverse of the RFC command-code cell layout; mirrors
// constants.combine_length_codes)
static inline int64_t combine_codes(int64_t ic, int64_t cc,
                                    bool use_last) {
    int64_t bits64 = (cc & 7) | ((ic & 7) << 3);
    if (use_last && ic < 8 && cc < 16)
        return bits64 + (cc < 8 ? 0 : 64);
    int64_t sub = 2 * ((cc >> 3) + 3 * (ic >> 3));
    int64_t offset = (sub << 5) + 0x40 + ((0x520D40 >> sub) & 0xC0);
    return offset | bits64;
}

void resolve_commands_native(
    const int64_t* insert_len, const int64_t* copy_len,
    const int64_t* distance, const int64_t* wire_copy, int64_t n,
    int64_t npostfix, int64_t ndirect,
    int64_t* cache_io, int64_t pos_offset, int64_t window_size,
    int64_t* out_code, int64_t* out_extra, int64_t* out_extra_bits,
    uint8_t* out_use_last, int64_t* out_cmd_sym)
{
    int64_t cache[4] = {cache_io[0], cache_io[1], cache_io[2],
                        cache_io[3]};
    int64_t pos = pos_offset;
    for (int64_t i = 0; i < n; i++) {
        pos += insert_len[i];
        int64_t c = copy_len[i];
        int64_t d = distance[i];
        out_extra[i] = 0; out_extra_bits[i] = 0; out_use_last[i] = 0;
        if (c == 0) {
            out_code[i] = 0; out_use_last[i] = 1;
            int64_t ic = len_code_of(kInsBaseT, insert_len[i]);
            bool ul = ic < 8;  // copy code of wire length 4 is 2 (<16)
            out_use_last[i] = ul ? 1 : 0;
            out_cmd_sym[i] = combine_codes(
                ic, len_code_of(kCpyBaseT, 4), ul);
            continue;
        }
        int64_t max_distance = std::min(pos, window_size);
        int64_t sc = -1;
        if (d <= max_distance) {
            if (d == cache[0]) sc = 0;
            else if (d == cache[1]) sc = 1;
            else if (d == cache[2]) sc = 2;
            else if (d == cache[3]) sc = 3;
            else {
                int64_t k = d - cache[0] + 3;
                static const int64_t m0[7] = {8, 6, 4, -1, 5, 7, 9};
                static const int64_t m1[7] = {14, 12, 10, -1, 11, 13, 15};
                if (k >= 0 && k <= 6 && k != 3) sc = m0[k];
                else {
                    k = d - cache[1] + 3;
                    if (k >= 0 && k <= 6 && k != 3) sc = m1[k];
                }
            }
        }
        bool update = false;
        if (sc == 0) {
            out_code[i] = 0; out_use_last[i] = 1;
        } else if (sc > 0) {
            out_code[i] = sc; update = true;
        } else if (d <= ndirect) {
            // direct code; dictionary pseudo-distances (beyond
            // max_distance) never enter the decoder's cache
            out_code[i] = 15 + d;
            update = d <= max_distance;
        } else {
            int64_t dd = d - ndirect - 1;
            int64_t lcode = dd & ((1 << npostfix) - 1);
            int64_t dp = dd >> npostfix;
            int64_t nb = log2floor(dp + 4) - 1;
            int64_t prefix = (dp + 4) >> nb & 1;
            int64_t extra = dp + 4 - ((2 + prefix) << nb);
            int64_t hcode = 2 * (nb - 1) + prefix;
            out_code[i] = 16 + ndirect + ((hcode << npostfix) | lcode);
            out_extra[i] = extra;
            out_extra_bits[i] = nb;
            if (d <= max_distance) update = true;
        }
        if (update) {
            cache[3] = cache[2]; cache[2] = cache[1];
            cache[1] = cache[0]; cache[0] = d;
        }
        pos += c;
        // command alphabet symbol, fused into the same pass (wire copy
        // length selects the copy code; a trailing insert-only command
        // encodes wire copy 4 + dist0)
        int64_t wc = wire_copy[i] == 0 ? 4 : wire_copy[i];
        int64_t ic = len_code_of(kInsBaseT, insert_len[i]);
        int64_t cc = len_code_of(kCpyBaseT, wc);
        bool ul = out_use_last[i] && ic < 8 && cc < 16;
        out_use_last[i] = ul ? 1 : 0;
        out_cmd_sym[i] = combine_codes(ic, cc, ul);
    }
    cache_io[0] = cache[0]; cache_io[1] = cache[1];
    cache_io[2] = cache[2]; cache_io[3] = cache[3];
}

// ---------------------------------------------------------------------------
// Zopfli shortest-path relaxation (reference hq.rs UpdateNodes core)
// edges are pre-sorted by source position: edge_off[p]..edge_off[p+1]
// ---------------------------------------------------------------------------

void zopfli_dp_native(
    int64_t n, const double* lcp, const double* cost_cmd,
    const int64_t* edge_off,
    const int64_t* e_len, const int64_t* e_wire,
    const int64_t* e_dist,
    const int64_t* e_ccode, const double* e_base,
    const int64_t* ins_code_tab, const int64_t* ins_extra_tab,
    const int64_t* cmd_sym_tab /* [24*24] */,
    double* cost, int64_t* prev_start, int64_t* prev_len,
    int64_t* prev_wire, int64_t* prev_dist)
{
    const double INF = 1e30;
    for (int64_t i = 0; i <= n; i++) {
        cost[i] = INF; prev_start[i] = 0; prev_len[i] = 0;
        prev_wire[i] = 0; prev_dist[i] = 0;
    }
    cost[0] = 0.0;
    double best_adj = INF;
    int64_t best_u = 0;
    for (int64_t p = 0; p < n; p++) {
        double c = cost[p];
        if (c < INF) {
            double adj = c - lcp[p];
            if (adj < best_adj) { best_adj = adj; best_u = p; }
        }
        int64_t e0 = edge_off[p], e1 = edge_off[p + 1];
        if (e0 == e1) continue;
        double lp = lcp[p];
        for (int64_t e = e0; e < e1; e++) {
            int64_t ll = e_len[e];
            int64_t tgt = p + ll;
            if (tgt > n) continue;
            int64_t ccode = e_ccode[e];
            double base = e_base[e];
            double ct = cost[tgt];
            int64_t il = p - best_u;
            int64_t ic = il < 65536 ? ins_code_tab[il] : 23;
            double t = best_adj + lp + base + ins_extra_tab[ic] +
                       cost_cmd[cmd_sym_tab[ic * 24 + ccode]];
            if (t < ct) {
                cost[tgt] = ct = t;
                prev_start[tgt] = best_u;
                prev_len[tgt] = ll;
                prev_wire[tgt] = e_wire[e];
                prev_dist[tgt] = e_dist[e];
            }
            if (c < INF && best_u != p) {
                t = c + base + cost_cmd[cmd_sym_tab[ccode]];
                if (t < ct) {
                    cost[tgt] = t;
                    prev_start[tgt] = p;
                    prev_len[tgt] = ll;
                    prev_wire[tgt] = e_wire[e];
                    prev_dist[tgt] = e_dist[e];
                }
            }
        }
    }
}

// ---------------------------------------------------------------------------
// all-matches collection for the optimal parser (the H10
// hash-to-binary-tree analog, reference StoreAndFindMatchesH10,
// hash_to_binary_tree.rs:437: return EVERY useful match per position,
// with the long-match skip-ahead of hq.rs:1339)
// ---------------------------------------------------------------------------

int64_t collect_matches_native(
    const uint8_t* data, int64_t n, int64_t dict_len,
    int64_t window_size, int64_t k, int64_t bucket_bits,
    int64_t k8, int64_t bucket_bits8, int64_t min_len,
    int64_t max_per_pos,
    int64_t* out_pos, int64_t* out_len, int64_t* out_dist,
    int64_t cap)
{
    int64_t nb4 = int64_t(1) << bucket_bits;
    int64_t nb8 = int64_t(1) << bucket_bits8;
    // entries pack (first-4-bytes << 32 | position) like the parse
    // session rings: the 4-byte gate reads the ring row sequentially.
    // Buffers come from a one-deep global pool — the deep rings are
    // ~100MB at the q11 geometry, and the caller runs this on a fresh
    // pool thread per compress call, so thread_local would re-fault
    // the pages every time
    struct CollectBufs {
        std::vector<uint64_t> ring4, ring8;
        std::vector<int32_t> cnt4, cnt8;
    };
    static std::mutex bufs_mtx;
    static CollectBufs* bufs_spare = nullptr;
    CollectBufs* bufs;
    {
        std::lock_guard<std::mutex> lk(bufs_mtx);
        bufs = bufs_spare;
        bufs_spare = nullptr;
    }
    if (!bufs) bufs = new CollectBufs();
    auto fit = [](auto& v, int64_t need) {
        if ((int64_t)v.size() < need) v.resize(need);
        return v.data();
    };
    uint64_t* ring4 = fit(bufs->ring4, nb4 * k);
    int32_t* cnt4 = fit(bufs->cnt4, nb4);
    std::memset(cnt4, 0, nb4 * sizeof(int32_t));
    uint64_t* ring8 = k8 ? fit(bufs->ring8, nb8 * k8) : nullptr;
    int32_t* cnt8 = k8 ? fit(bufs->cnt8, nb8) : nullptr;
    if (k8) std::memset(cnt8, 0, nb8 * sizeof(int32_t));
    struct BufsReturner {
        std::mutex& mtx; CollectBufs*& spare; CollectBufs* b;
        ~BufsReturner() {
            std::lock_guard<std::mutex> lk(mtx);
            if (spare) delete b; else spare = b;
        }
    } returner{bufs_mtx, bufs_spare, bufs};
    uint32_t shift4 = (uint32_t)(32 - bucket_bits);
    uint32_t shift8 = (uint32_t)(64 - bucket_bits8);

    int64_t m = 0;
    int64_t skip_until = 0;
    int64_t ins_pos = 0;

    auto insert_upto = [&](int64_t stop) {
        for (int64_t i = ins_pos; i < stop; i++) {
            if (i + 4 <= n) {
                uint32_t v = load32(data + i);
                uint64_t e = ((uint64_t)v << 32) | (uint32_t)i;
                uint32_t h = (v * 0x1E35A7BDu) >> shift4;
                ring4[h * k + (cnt4[h] % k)] = e;
                cnt4[h]++;
                if (k8 && i + 8 <= n) {
                    uint64_t v8 = load64(data + i);
                    uint32_t h8 = (uint32_t)(
                        (v8 * 0x1FE35A7BD3579BD3ull) >> shift8);
                    ring8[h8 * k8 + (cnt8[h8] % k8)] = e;
                    cnt8[h8]++;
                }
            }
        }
        if (stop > ins_pos) ins_pos = stop;
    };

    int64_t dists_seen[128];
    for (int64_t i = dict_len; i + 4 <= n; i++) {
        insert_upto(i);
        if (i < skip_until) continue;
        int64_t limit = n - i;
        uint32_t v4 = load32(data + i);
        int per = 0;
        int64_t longest = 0;

        auto emit = [&](uint64_t e) {
            int64_t cand = (int64_t)(uint32_t)e;
            int64_t dist = i - cand;
            if (dist > window_size) return;
            if ((uint32_t)(e >> 32) != v4) return;
            // candidates arrive nearest-first: a match that cannot
            // extend past the longest already found is dominated
            // (longer distance, no extra length) — one byte compare
            // prunes the probe (reference H10 keeps only strictly
            // increasing lengths, backward_references/hash_to_binary
            // tree shape)
            if (longest >= limit ||
                data[cand + longest] != data[i + longest])
                return;
            for (int d = 0; d < per; d++)
                if (dists_seen[d] == dist) return;
            int64_t ml = probe_len(data, cand, i, limit);
            if (ml < min_len || ml <= longest) return;
            if (per < max_per_pos && m < cap) {
                dists_seen[per++] = dist;
                out_pos[m] = i - dict_len;
                out_len[m] = ml;
                out_dist[m] = dist;
                m++;
                longest = std::max(longest, ml);
            }
        };

        // two-pass row scans (same trick as find_matches_native): a
        // branch-free gate pass in storage order builds a hit
        // bitmask, probes then walk only hits in recency order;
        // k <= 128 always holds for the collection geometries
        // (q11: 96/48), guarded anyway
        auto scan_row = [&](const uint64_t* row, int32_t c,
                            int64_t kcap) {
            int32_t kk = (int32_t)std::min<int64_t>(c, kcap);
            if (kcap > 128) {
                for (int32_t j = 0; j < kk && per < max_per_pos; j++)
                    emit(row[((c - 1 - j) % kcap + kcap) % kcap]);
                return;
            }
            int32_t valid = c < (int32_t)kcap ? c : (int32_t)kcap;
            uint64_t gm[2] = {0, 0};
            for (int32_t s = 0; s < valid; s++) {
                uint64_t e = row[s];
                uint64_t hit = ((uint32_t)(e >> 32) == v4) &
                    ((uint64_t)(i - (int64_t)(uint32_t)e) <=
                     (uint64_t)window_size);
                gm[s >> 6] |= hit << (s & 63);
            }
            if (!(gm[0] | gm[1])) return;
            for (int32_t j = 0; j < kk && per < max_per_pos; j++) {
                int32_t s = (int32_t)(((c - 1 - j) % (int32_t)kcap
                                       + (int32_t)kcap)
                                      % (int32_t)kcap);
                if (!((gm[s >> 6] >> (s & 63)) & 1)) continue;
                emit(row[s]);
            }
        };
        {
            uint32_t h = (v4 * 0x1E35A7BDu) >> shift4;
            scan_row(ring4 + (int64_t)h * k, cnt4[h], k);
        }
        if (k8 && i + 8 <= n) {
            uint64_t v8 = load64(data + i);
            uint32_t h8 = (uint32_t)((v8 * 0x1FE35A7BD3579BD3ull)
                                     >> shift8);
            scan_row(ring8 + (int64_t)h8 * k8, cnt8[h8], k8);
        }
        // long-match skip-ahead (matches stay in the tables via
        // insert_upto; reference hq.rs:1339 skips after >325 matches)
        if (longest > 325)
            skip_until = i + longest - 64;
    }
    return m;
}

// ---------------------------------------------------------------------------
// amortized exact-length extension for cap-hit matches (mirrors the
// numpy loop in zopfli_segment: inside a span already covered by a
// longer extended match the capped length is kept, bounding total
// probe work to O(n) on runs)
// ---------------------------------------------------------------------------

void extend_caps_native(
    const uint8_t* data, int64_t total_len, int64_t dict_len,
    const int64_t* pos, const int64_t* dist, const int64_t* len,
    int64_t nhits, int64_t* out_len)
{
    int64_t n = total_len - dict_len;
    int64_t last_end = -1;
    extern void extend_caps_range_native(
        const uint8_t*, int64_t, int64_t, const int64_t*,
        const int64_t*, const int64_t*, int64_t, int64_t*, int64_t*);
    extend_caps_range_native(data, total_len, dict_len, pos, dist,
                             len, nhits, out_len, &last_end);
    (void)n;
}

// chunked form: the amortized-skip state (last_end) carries across
// calls so per-chunk extension matches the one-shot walk exactly
void extend_caps_range_native(
    const uint8_t* data, int64_t total_len, int64_t dict_len,
    const int64_t* pos, const int64_t* dist, const int64_t* len,
    int64_t nhits, int64_t* out_len, int64_t* last_end_io)
{
    int64_t n = total_len - dict_len;
    int64_t last_end = last_end_io ? *last_end_io : -1;
    for (int64_t h = 0; h < nhits; h++) {
        int64_t p = pos[h], d = dist[h], l = len[h];
        if (p < last_end - 32) { out_len[h] = l; continue; }
        int64_t ext = l + probe_len(data, dict_len + p - d + l,
                                    dict_len + p + l, n - p - l);
        out_len[h] = ext;
        if (p + ext > last_end) last_end = p + ext;
    }
    if (last_end_io) *last_end_io = last_end;
}

// ---------------------------------------------------------------------------
// Zopfli candidate preparation: counting-sort the concatenated match
// sources by position, dedupe per (position, distance) keeping the
// longest, cap per position (window / dictionary budgeted separately),
// precompute distance symbol + extra bits (mirrors the numpy pipeline
// in zopfli._prepare_edges — that path is the oracle)
// ---------------------------------------------------------------------------

static inline void prefix_encode_dist(int64_t dist, int64_t npostfix,
                                      int64_t ndirect, int64_t* sym,
                                      int64_t* nbits) {
    if (dist <= ndirect) {
        *sym = 15 + dist;
        *nbits = 0;
        return;
    }
    int64_t d = dist - ndirect - 1;
    int64_t lcode = d & ((1 << npostfix) - 1);
    int64_t dp = d >> npostfix;
    int64_t nb = log2floor(dp + 4) - 1;
    int64_t prefix = ((dp + 4) >> nb) & 1;
    int64_t hcode = 2 * (nb - 1) + prefix;
    *sym = 16 + ndirect + ((hcode << npostfix) | lcode);
    *nbits = nb;
}

// packed per-position Zopfli candidate record (16 bytes).  One struct
// instead of six parallel int64 arrays: the DP's inner edge loop and
// the prep's per-position sort touch one cache line per candidate.
struct ZCand {
    int32_t len;
    int32_t wire;
    int32_t dist;
    int16_t sym;
    uint8_t nbits;
    uint8_t flags;  // bit0 isdict, bit1 laddered
};
static_assert(sizeof(ZCand) == 16, "ZCand must pack to 16 bytes");

int64_t zopfli_cands_native(
    const int64_t* pos, const int64_t* len, const int64_t* dist,
    const uint8_t* isdict, const int64_t* wire, int64_t m, int64_t n,
    int64_t npostfix, int64_t ndirect, int64_t k_win, int64_t k_dict,
    int64_t ladder_top,
    int64_t* cand_off /* [n+1] */, ZCand* out /* [m] */)
{
    // The input is a concatenation of match sources that are each
    // already non-decreasing in position (table rows, all-matches
    // collector, dictionary probe).  Detect those runs and k-way merge
    // them: every array is read exactly once, sequentially, and the
    // packed output is written sequentially — no position scatter.
    // Inputs with many descents (not produced by in-tree callers) fall
    // back to a counting-sort scatter pass.
    constexpr int kMaxRuns = 64;
    int64_t run_head[kMaxRuns];
    int64_t run_end[kMaxRuns];
    int n_runs = 0;
    bool merged = true;
    {
        int64_t start = 0;
        for (int64_t i = 1; i <= m; i++) {
            if (i == m || pos[i] < pos[i - 1]) {
                if (n_runs == kMaxRuns) { merged = false; break; }
                run_head[n_runs] = start;
                run_end[n_runs] = i;
                n_runs++;
                start = i;
            }
        }
    }
    int64_t* cnt = nullptr;
    ZCand* tmp = nullptr;
    if (!merged) {
        cnt = new int64_t[n + 1]();
        for (int64_t i = 0; i < m; i++) cnt[pos[i] + 1]++;
        for (int64_t i = 0; i < n; i++) cnt[i + 1] += cnt[i];
        tmp = new ZCand[m];
        int64_t* fill = new int64_t[n];
        std::memcpy(fill, cnt, n * sizeof(int64_t));
        for (int64_t i = 0; i < m; i++) {
            int64_t s = fill[pos[i]]++;
            ZCand& c = tmp[s];
            c.len = (int32_t)len[i];
            c.wire = (int32_t)wire[i];
            c.dist = (int32_t)dist[i];
            c.sym = 0;
            c.nbits = 0;
            c.flags = isdict[i] ? 1 : 0;
        }
        delete[] fill;
    }
    int64_t out_n = 0;
    ZCand loc[160];
    for (int64_t p = 0; p < n; p++) {
        cand_off[p] = out_n;
        int k = 0;
        if (merged) {
            for (int r = 0; r < n_runs; r++) {
                int64_t h = run_head[r], e = run_end[r];
                while (h < e && pos[h] == p) {
                    if (k < 160) {
                        ZCand& c = loc[k++];
                        c.len = (int32_t)len[h];
                        c.wire = (int32_t)wire[h];
                        c.dist = (int32_t)dist[h];
                        c.sym = 0;
                        c.nbits = 0;
                        c.flags = isdict[h] ? 1 : 0;
                    }
                    h++;
                }
                run_head[r] = h;
            }
        } else {
            int64_t g0 = cnt[p], g1 = cnt[p + 1];
            k = (int)std::min<int64_t>(g1 - g0, 160);
            if (k) std::memcpy(loc, tmp + g0, (size_t)k * sizeof(ZCand));
        }
        if (k == 0) continue;
        for (int j = 1; j < k; j++) {
            ZCand v = loc[j];
            int64_t kv = ((int64_t)(v.flags & 1) << 32) - v.len;
            int t = j - 1;
            while (t >= 0 &&
                   (((int64_t)(loc[t].flags & 1) << 32) - loc[t].len)
                       > kv) {
                loc[t + 1] = loc[t];
                t--;
            }
            loc[t + 1] = v;
        }
        int nw = 0, nd = 0;
        for (int j = 0; j < k; j++) {
            ZCand v = loc[j];
            bool dic = (v.flags & 1) != 0;
            if (dic ? nd >= k_dict : nw >= k_win) continue;
            bool dup = false;
            for (int64_t t = cand_off[p]; t < out_n; t++)
                if (out[t].dist == v.dist) { dup = true; break; }
            if (dup) continue;
            int64_t sym, nbits;
            prefix_encode_dist(v.dist, npostfix, ndirect, &sym, &nbits);
            v.sym = (int16_t)sym;
            v.nbits = (uint8_t)nbits;
            v.flags = (dic ? 1 : 0) |
                      ((!dic && nw < ladder_top) ? 2 : 0);
            out[out_n++] = v;
            if (dic) nd++; else nw++;
        }
    }
    cand_off[n] = out_n;
    delete[] cnt;
    delete[] tmp;
    return out_n;
}

// dense-row variant: the per-position top-K tables arrive as row-major
// [n_rows, n] arrays (at most one candidate per row per position) plus
// sparse extra sources (all-matches collector, dictionary) — skips the
// caller's nonzero/fancy-index/concatenate round entirely.
int64_t zopfli_cands_dense_range_native(
    const int64_t* d_len, const int64_t* d_dist, const uint8_t* d_isdict,
    const int64_t* d_wire, int64_t n_rows,
    const int64_t* x_pos, const int64_t* x_len, const int64_t* x_dist,
    const uint8_t* x_isdict, const int64_t* x_wire, int64_t xm,
    const int64_t* y_pos, const int64_t* y_len, const int64_t* y_dist,
    const uint8_t* y_isdict, const int64_t* y_wire, int64_t ym,
    int64_t n, int64_t npostfix, int64_t ndirect, int64_t k_win,
    int64_t k_dict, int64_t ladder_top,
    int64_t* cand_off /* [n+1] */, ZCand* out,
    int64_t p_start, int64_t p_end)
{
    // two independent sorted-run sources (window matches + dictionary
    // matches), k-way merged per position — the Python side never
    // materializes a concatenated edge list
    constexpr int kMaxRuns = 64;
    int64_t run_head[2][kMaxRuns];
    int64_t run_end[2][kMaxRuns];
    int n_runs[2] = {0, 0};
    const int64_t* s_pos[2] = {x_pos, y_pos};
    const int64_t* s_len[2] = {x_len, y_len};
    const int64_t* s_dist[2] = {x_dist, y_dist};
    const uint8_t* s_isdict[2] = {x_isdict, y_isdict};
    const int64_t* s_wire[2] = {x_wire, y_wire};
    int64_t s_m[2] = {xm, ym};
    for (int s = 0; s < 2; s++) {
        int64_t start = 0;
        for (int64_t i = 1; i <= s_m[s]; i++) {
            if (i == s_m[s] || s_pos[s][i] < s_pos[s][i - 1]) {
                if (n_runs[s] == kMaxRuns) return -1;  // caller falls
                run_head[s][n_runs[s]] = start;
                run_end[s][n_runs[s]] = i;
                n_runs[s]++;
                start = i;
            }
        }
    }
    // chunked form (p_start > 0): resume offsets from the previous
    // chunk's trailing cand_off and binary-search each ascending run
    // past the already-consumed prefix
    if (p_start > 0) {
        for (int s = 0; s < 2; s++)
            for (int r = 0; r < n_runs[s]; r++) {
                int64_t lo = run_head[s][r], hi = run_end[s][r];
                while (lo < hi) {
                    int64_t mid = (lo + hi) >> 1;
                    if (s_pos[s][mid] < p_start) lo = mid + 1;
                    else hi = mid;
                }
                run_head[s][r] = lo;
            }
    }
    int64_t out_n = p_start > 0 ? cand_off[p_start] : 0;
    ZCand loc[224];
    for (int64_t p = p_start; p < p_end; p++) {
        cand_off[p] = out_n;
        int k = 0;
        for (int64_t r = 0; r < n_rows; r++) {
            int64_t o = r * n + p;
            int64_t L = d_len[o];
            if (L < 2) continue;
            ZCand& c = loc[k++];
            c.len = (int32_t)L;
            c.wire = (int32_t)d_wire[o];
            c.dist = (int32_t)d_dist[o];
            c.sym = 0;
            c.nbits = 0;
            c.flags = d_isdict[o] ? 1 : 0;
        }
        for (int s = 0; s < 2; s++) {
            for (int r = 0; r < n_runs[s]; r++) {
                int64_t h = run_head[s][r], e = run_end[s][r];
                while (h < e && s_pos[s][h] == p) {
                    if (k < 224 && s_len[s][h] >= 2) {
                        ZCand& c = loc[k++];
                        c.len = (int32_t)s_len[s][h];
                        c.wire = (int32_t)s_wire[s][h];
                        c.dist = (int32_t)s_dist[s][h];
                        c.sym = 0;
                        c.nbits = 0;
                        c.flags = s_isdict[s][h] ? 1 : 0;
                    }
                    h++;
                }
                run_head[s][r] = h;
            }
        }
        if (k == 0) continue;
        for (int j = 1; j < k; j++) {
            ZCand v = loc[j];
            int64_t kv = ((int64_t)(v.flags & 1) << 32) - v.len;
            int t = j - 1;
            while (t >= 0 &&
                   (((int64_t)(loc[t].flags & 1) << 32) - loc[t].len)
                       > kv) {
                loc[t + 1] = loc[t];
                t--;
            }
            loc[t + 1] = v;
        }
        int nw = 0, nd = 0;
        for (int j = 0; j < k; j++) {
            ZCand v = loc[j];
            bool dic = (v.flags & 1) != 0;
            if (dic ? nd >= k_dict : nw >= k_win) continue;
            bool dup = false;
            for (int64_t t = cand_off[p]; t < out_n; t++)
                if (out[t].dist == v.dist) { dup = true; break; }
            if (dup) continue;
            int64_t sym, nbits;
            prefix_encode_dist(v.dist, npostfix, ndirect, &sym, &nbits);
            v.sym = (int16_t)sym;
            v.nbits = (uint8_t)nbits;
            v.flags = (dic ? 1 : 0) |
                      ((!dic && nw < ladder_top) ? 2 : 0);
            out[out_n++] = v;
            if (dic) nd++; else nw++;
        }
    }
    cand_off[p_end] = out_n;
    return out_n;
}

int64_t zopfli_cands_dense_native(
    const int64_t* d_len, const int64_t* d_dist, const uint8_t* d_isdict,
    const int64_t* d_wire, int64_t n_rows,
    const int64_t* x_pos, const int64_t* x_len, const int64_t* x_dist,
    const uint8_t* x_isdict, const int64_t* x_wire, int64_t xm,
    const int64_t* y_pos, const int64_t* y_len, const int64_t* y_dist,
    const uint8_t* y_isdict, const int64_t* y_wire, int64_t ym,
    int64_t n, int64_t npostfix, int64_t ndirect, int64_t k_win,
    int64_t k_dict, int64_t ladder_top,
    int64_t* cand_off /* [n+1] */, ZCand* out)
{
    return zopfli_cands_dense_range_native(
        d_len, d_dist, d_isdict, d_wire, n_rows,
        x_pos, x_len, x_dist, x_isdict, x_wire, xm,
        y_pos, y_len, y_dist, y_isdict, y_wire, ym,
        n, npostfix, ndirect, k_win, k_dict, ladder_top,
        cand_off, out, 0, n);
}

// ---------------------------------------------------------------------------
// sliding-window literal cost estimate (mirrors
// zopfli.estimate_literal_costs — reference
// BrotliEstimateBitCostsForLiterals, literal_cost.rs:179).  Exact
// O(n) add/remove histogram walk over the +-half window, per UTF8
// context class when cls is provided.
// ---------------------------------------------------------------------------

void est_lit_native(const uint8_t* data, int64_t n, const uint8_t* cls,
                    int64_t half, int utf8_ramp, double bias,
                    double* cost)
{
    int32_t hist[3 * 256] = {0};
    int32_t clscnt[3] = {0, 0, 0};
    auto cls_of = [&](int64_t i) -> int { return cls ? cls[i] : 0; };
    int64_t lo = 0, hi = -1;  // inclusive added range
    for (int64_t i = 0; i < n; i++) {
        int64_t want_lo = i - half + 1 > 0 ? i - half + 1 : 0;
        int64_t want_hi = i + half < n - 1 ? i + half : n - 1;
        while (hi < want_hi) {
            hi++;
            int c = cls_of(hi);
            hist[c * 256 + data[hi]]++;
            clscnt[c]++;
        }
        while (lo < want_lo) {
            int c = cls_of(lo);
            hist[c * 256 + data[lo]]--;
            clscnt[c]--;
            lo++;
        }
        int c = cls_of(i);
        int32_t cnt = hist[c * 256 + data[i]];
        int32_t W = cls ? clscnt[c]
                        : (int32_t)(want_hi - want_lo + 1);
        double v = std::log2((double)(W > 1 ? W : 1))
                   - std::log2((double)(cnt > 1 ? cnt : 1)) + bias;
        if (v < 1.0) v = v * 0.5 + 0.5;
        if (utf8_ramp && i < 2000)
            v += 0.7 - (double)(2000 - i) / 2000.0 * 0.35;
        cost[i] = v;
    }
}

// ---------------------------------------------------------------------------
// q0/q1 fragment parse (reference compress_fragment.rs shape:
// BrotliCompressFragmentFast — one direct-mapped table, greedy, an
// unbounded miss-skip stride, sparse hashing inside match bodies).
// Emits per-metablock command arrays for the fused native store; copies
// are capped at metablock boundaries.
// ---------------------------------------------------------------------------

// per-segment form with a persistent direct-mapped table: the caller
// parses one metablock at a time from a single worker thread (the
// thread_local table carries cross-segment match state), overlapping
// parse(g+1) with serialization(g) exactly like the generic parse
// session.  reset != 0 clears the table (new stream).
int64_t fragment_parse_seg_native(
    const uint8_t* data, int64_t n, int64_t pos0, int64_t window,
    int64_t table_bits, int64_t bound, int64_t reset,
    int64_t* out_ins, int64_t* out_cps, int64_t* out_dst,
    int64_t* out_adv, int64_t cap)
{
    int64_t tsize = int64_t(1) << table_bits;
    static thread_local std::vector<int32_t> seg_table;
    if (reset || (int64_t)seg_table.size() != tsize)
        seg_table.assign(tsize, 0);
    int32_t* table = seg_table.data();
    int64_t bounds1[1] = {bound};
    int64_t segc1[1] = {0};
    // shares the walk below via a one-bound call on the same table
    extern int64_t fragment_parse_core(
        const uint8_t*, int64_t, int64_t, int64_t, int64_t, int32_t*,
        const int64_t*, int64_t, int64_t*, int64_t*, int64_t*,
        int64_t*, int64_t*, int64_t);
    return fragment_parse_core(data, n, pos0, window, table_bits, table,
                               bounds1, 1, out_ins, out_cps, out_dst,
                               out_adv, segc1, cap);
}

int64_t fragment_parse_core(
    const uint8_t* data, int64_t n, int64_t pos0, int64_t window,
    int64_t table_bits, int32_t* table,
    const int64_t* bounds, int64_t n_bounds,
    int64_t* out_ins, int64_t* out_cps, int64_t* out_dst,
    int64_t* out_adv, int64_t* seg_counts, int64_t cap)
{
    const uint64_t kMul = 0x1FE35A7BD3579BD3ull;
    uint32_t shift = (uint32_t)(64 - table_bits);
    auto hash5 = [&](int64_t i) -> uint32_t {
        uint64_t v;
        std::memcpy(&v, data + i, 8);
        return (uint32_t)(((v << 24) * kMul) >> shift);
    };
    int64_t m = 0;
    int64_t prev = pos0;
    for (int64_t b = 0; b < n_bounds; b++) {
        int64_t bound = bounds[b];
        int64_t m0 = m;
        int64_t ip = prev;
        int64_t last_insert = prev;
        int64_t skip = 0;
        while (ip + 8 <= bound) {
            uint32_t h = hash5(ip);
            int64_t cand = (int64_t)table[h] - 1;
            table[h] = (int32_t)(ip + 1);
            if (cand >= 0 && ip - cand <= window &&
                load32(data + cand) == load32(data + ip)) {
                int64_t len = probe_len(data, cand, ip, bound - ip);
                if (len >= 4) {
                    if (m >= cap) return -1;
                    out_ins[m] = ip - last_insert;
                    out_cps[m] = len;
                    out_dst[m] = ip - cand;
                    out_adv[m] = len;
                    m++;
                    // sparse interior hashing (the reference hashes a
                    // couple of positions per emitted copy)
                    int64_t stop = ip + len;
                    for (int64_t i = ip + 1; i + 8 <= stop && i + 8 <= n;
                         i += 4) {
                        uint32_t h2 = hash5(i);
                        table[h2] = (int32_t)(i + 1);
                    }
                    if (stop >= 2 && stop + 8 <= n) {
                        uint32_t h2 = hash5(stop - 2);
                        table[h2] = (int32_t)(stop - 1);
                    }
                    ip = stop;
                    last_insert = ip;
                    skip = 0;
                    continue;
                }
            }
            ip += 1 + (skip++ >> 5);
        }
        if (bound > last_insert) {
            if (m >= cap) return -1;
            out_ins[m] = bound - last_insert;
            out_cps[m] = 0;
            out_dst[m] = 0;
            out_adv[m] = 0;
            m++;
        }
        seg_counts[b] = m - m0;
        prev = bound;
    }
    return m;
}

int64_t fragment_parse_native(
    const uint8_t* data, int64_t n, int64_t pos0, int64_t window,
    int64_t table_bits, const int64_t* bounds, int64_t n_bounds,
    int64_t* out_ins, int64_t* out_cps, int64_t* out_dst,
    int64_t* out_adv, int64_t* seg_counts /* [n_bounds] */, int64_t cap)
{
    int64_t tsize = int64_t(1) << table_bits;
    static thread_local std::vector<int32_t> table_v;
    table_v.assign(tsize, 0);  // stores pos+1; 0 = empty
    return fragment_parse_core(data, n, pos0, window, table_bits,
                               table_v.data(), bounds, n_bounds,
                               out_ins, out_cps, out_dst, out_adv,
                               seg_counts, cap);
}

// ---------------------------------------------------------------------------
// transform-aware static-dictionary matching against the prebuilt
// expanded (word x transform) index (mirrors
// static_dict.collect_dict_matches — that Python path is the oracle)
// ---------------------------------------------------------------------------

int64_t collect_dict_native(
    const uint8_t* data, int64_t n, int64_t dict_len,
    int64_t window_size,
    const uint8_t* entry_bytes, int64_t entry_stride,
    const int64_t* e_out, const int64_t* e_wire, const int64_t* e_wid,
    const int32_t* table, int64_t hash_bits, int64_t slots,
    int64_t* out_pos, int64_t* out_len, int64_t* out_dist,
    int64_t* out_wire, int64_t cap)
{
    uint32_t shift = (uint32_t)(32 - hash_bits);
    int64_t m = 0;
    for (int64_t i = dict_len; i + 4 <= n; i++) {
        uint32_t v = load32(data + i);
        uint32_t h = (v * 0x1E35A7BDu) >> shift;
        const int32_t* bucket = table + (int64_t)h * slots;
        for (int64_t s = 0; s < slots; s++) {
            int32_t e = bucket[s];
            if (e < 0) break;
            int64_t lo = e_out[e];
            if (i + lo > n) continue;
            const uint8_t* w = entry_bytes + (int64_t)e * entry_stride;
            if (load32(w) != v) continue;
            int64_t l = 4;
            while (l < lo && data[i + l] == w[l]) l++;
            if (l < lo) continue;
            if (m >= cap) return m;
            int64_t max_dist = i < window_size ? i : window_size;
            out_pos[m] = i - dict_len;
            out_len[m] = lo;
            out_dist[m] = max_dist + 1 + e_wid[e];
            out_wire[m] = e_wire[e];
            m++;
        }
    }
    return m;
}

// ---------------------------------------------------------------------------
// Sorted-output static dictionary probe.
//
// Entries are every unique (word x transform) output, lexicographically
// sorted by 0-padded bytes with shorter-first length tiebreak.  lpf[e]
// is the longest other entry that is a proper prefix of entry e (-1 if
// none).  All dictionary matches at a position are then: pred = the
// largest entry <= the 38-byte input window (one binary search), walk
// pred's lpf chain, emit every node that is a prefix of the window.
// Proof sketch: any entry P that is a prefix of window S satisfies
// P <= S, and P <= pred <= S forces P to be a prefix of pred, so the
// chain enumerates them all.  This replaces the hashed expanded index,
// whose 12-slot bucket cap dropped 80% of entries (the long, valuable
// ones -- suffix-transform families share 8+ byte output prefixes and
// overflowed any fixed bucket).  Coverage parity target:
// BrotliFindAllStaticDictionaryMatches, reference src/enc/static_dict.rs.
// ---------------------------------------------------------------------------

static const int64_t DICT_SORTED_W = 38;   // padded entry width
static const int64_t DICT_BLOOM_BYTES = int64_t(1) << 21;  // 2^24 bits

// big-endian first-8-bytes key: lexicographic order of the 0-padded
// entries == numeric order of (key8, remaining 30 bytes), so most
// binary-search levels become one integer compare
static inline uint64_t be_key8(const uint8_t* p) {
    uint64_t v; std::memcpy(&v, p, 8);
    return __builtin_bswap64(v);
}

void dict_sorted_init_native(const uint8_t* sb, const int64_t* sl,
                             int64_t m, int32_t* lpf, uint8_t* bloom,
                             uint64_t* key8, int32_t* range16)
{
    std::memset(bloom, 0, DICT_BLOOM_BYTES);
    for (int64_t i = 0; i < m; i++) {
        uint32_t h = (load32(sb + i * DICT_SORTED_W) * 0x1E35A7BDu) >> 8;
        bloom[h >> 3] |= (uint8_t)(1u << (h & 7));
    }
    // key8[i] + range16: per 2-byte-prefix [start, end) ranges.  Every
    // dictionary entry is >= 4 bytes long, so an entry that is a prefix
    // of an input window shares its first 2 bytes — the predecessor
    // search can stay inside the window's bucket.
    for (int64_t i = 0; i < m; i++)
        key8[i] = be_key8(sb + i * DICT_SORTED_W);
    for (int64_t b = 0, i = 0; b <= 65536; b++) {
        while (i < m && (int64_t)(key8[i] >> 48) < b) i++;
        range16[b] = (int32_t)i;
    }
    std::vector<int32_t> stack;
    for (int64_t i = 0; i < m; i++) {
        const uint8_t* ei = sb + i * DICT_SORTED_W;
        while (!stack.empty()) {
            int32_t j = stack.back();
            if (sl[j] < sl[i] &&
                !std::memcmp(sb + (int64_t)j * DICT_SORTED_W, ei,
                             (size_t)sl[j]))
                break;
            stack.pop_back();
        }
        lpf[i] = stack.empty() ? -1 : stack.back();
        stack.push_back((int32_t)i);
    }
}

int64_t collect_dict_sorted_native(
    const uint8_t* data, int64_t n, int64_t dict_len, int64_t window_size,
    const uint8_t* sb, const int64_t* sl, const int64_t* swire,
    const int64_t* swid, const int32_t* lpf, int64_t m,
    const uint8_t* bloom, const uint64_t* key8, const int32_t* range16,
    int64_t* out_pos, int64_t* out_len, int64_t* out_dist,
    int64_t* out_wire, int64_t cap,
    // optional progress for overlapped consumers: [0] = region
    // position covered, [1] = entries emitted so far
    int64_t* progress)
{
    uint8_t wbuf[DICT_SORTED_W];
    int64_t cnt = 0;
    for (int64_t i = dict_len; i + 4 <= n; i++) {
        if (progress && !((i - dict_len) & 8191)) {
            __atomic_store_n(&progress[1], cnt, __ATOMIC_RELEASE);
            __atomic_store_n(&progress[0], i - dict_len,
                             __ATOMIC_RELEASE);
        }
        uint32_t h = (load32(data + i) * 0x1E35A7BDu) >> 8;
        if (!(bloom[h >> 3] & (1u << (h & 7)))) continue;
        const uint8_t* w = data + i;
        if (i + DICT_SORTED_W > n) {
            std::memset(wbuf, 0, DICT_SORTED_W);
            std::memcpy(wbuf, data + i, (size_t)(n - i));
            w = wbuf;
        }
        // pred: last entry with memcmp(entry, window) <= 0 (equal-padded
        // entries sort before the window -- it carries 38 real bytes).
        // Restricted to the window's 2-byte-prefix bucket: entries in
        // other buckets differ from the window within their first 2
        // bytes, so none can be a prefix of it (all entries are >= 4
        // bytes) and none of their lpf ancestors can match either.
        uint64_t wk = be_key8(w);
        int64_t b = (int64_t)(wk >> 48);
        int64_t lo_ = (int64_t)range16[b] - 1;
        int64_t hi_ = range16[b + 1];
        while (hi_ - lo_ > 1) {
            int64_t mid = (lo_ + hi_) >> 1;
            uint64_t k = key8[mid];
            bool le = k != wk ? (k < wk)
                    : (std::memcmp(sb + mid * DICT_SORTED_W + 8, w + 8,
                                   (size_t)(DICT_SORTED_W - 8)) <= 0);
            if (le)
                lo_ = mid;
            else
                hi_ = mid;
        }
        if (lo_ < (int64_t)range16[b]) continue;  // bucket empty/all >
        int64_t rem = n - i;
        bool verified = false;  // once a chain node matches, all its
                                // ancestors are prefixes of it, so of w
        for (int64_t j = lo_; j >= 0; j = lpf[j]) {
            int64_t L = sl[j];
            if (L > rem) continue;
            if (!verified && std::memcmp(sb + j * DICT_SORTED_W, w,
                                         (size_t)L))
                continue;
            verified = true;
            if (cnt >= cap) return -1;
            int64_t max_dist = i < window_size ? i : window_size;
            out_pos[cnt] = i - dict_len;
            out_len[cnt] = L;
            out_dist[cnt] = max_dist + 1 + swid[j];
            out_wire[cnt] = swire[j];
            cnt++;
        }
    }
    if (progress) {
        __atomic_store_n(&progress[1], cnt, __ATOMIC_RELEASE);
        __atomic_store_n(&progress[0], n - dict_len, __ATOMIC_RELEASE);
    }
    return cnt;
}

// ---------------------------------------------------------------------------
// bit packing: (bits, nbits) items -> LSB-first u64 words
// (the serialization hot loop; mirrors bitstream.pack_bits)
// ---------------------------------------------------------------------------

int64_t pack_bits_native(const uint64_t* bits, const int64_t* nbits,
                         int64_t n, uint64_t* words)
{
    int64_t pos = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t nb = nbits[i];
        if (!nb) continue;
        uint64_t b = bits[i];
        int64_t w = pos >> 6;
        int sh = (int)(pos & 63);
        words[w] |= b << sh;
        if (sh + nb > 64) words[w + 1] |= b >> (64 - sh);
        pos += nb;
    }
    return pos;
}

// ---------------------------------------------------------------------------
// cache-aware Zopfli relaxation (reference UpdateNodes +
// ComputeDistanceCache, hq.rs:644-830, :454): every DP node carries its
// exact RFC distance cache, edges whose distance hits the start node's
// cache are charged the short-code cost, and the 4 cached distances
// spawn continuation edges (probed against the data) at every position.
// ---------------------------------------------------------------------------

static inline int short_code_of(int64_t d, const int64_t* c) {
    if (d == c[0]) return 0;
    if (d == c[1]) return 1;
    if (d == c[2]) return 2;
    if (d == c[3]) return 3;
    int64_t k = d - c[0] + 3;
    static const int m0[7] = {8, 6, 4, -1, 5, 7, 9};
    static const int m1[7] = {14, 12, 10, -1, 11, 13, 15};
    if (k >= 0 && k <= 6 && k != 3) return m0[k];
    k = d - c[1] + 3;
    if (k >= 0 && k <= 6 && k != 3) return m1[k];
    return -1;
}

void zopfli_dp_cache_native(
    int64_t n, const double* lcp, const double* cost_cmd,
    const double* cost_dist_short /* [16] */,
    const int64_t* edge_off,
    const int64_t* e_len, const int64_t* e_wire, const int64_t* e_dist,
    const int64_t* e_ccode, const double* e_base, const double* e_dcost,
    const int64_t* ins_code_tab, const int64_t* ins_extra_tab,
    const int64_t* cmd_sym_tab /* [24*24] use_last=0 */,
    const int64_t* cmd_sym_last_tab /* [24*24] use_last=1 */,
    const uint8_t* data, int64_t total_len, int64_t dict_len,
    int64_t window_size, const int64_t* initial_cache,
    double* cost, int64_t* prev_start, int64_t* prev_len,
    int64_t* prev_wire, int64_t* prev_dist, int64_t* node_cache)
{
    const double INF = 1e30;
    for (int64_t i = 0; i <= n; i++) {
        cost[i] = INF; prev_start[i] = 0; prev_len[i] = 0;
        prev_wire[i] = 0; prev_dist[i] = 0;
    }
    cost[0] = 0.0;
    for (int c4 = 0; c4 < 4; c4++)
        node_cache[c4] = initial_cache[c4];

    double best_adj = INF;
    int64_t best_u = 0;

    // copy-code lookup (lengths up to 64K)
    auto copy_code_of = [&](int64_t l) -> int {
        static const int64_t base[24] = {2,3,4,5,6,7,8,9,10,12,14,18,22,
                                         30,38,54,70,102,134,198,326,
                                         582,1094,2118};
        int lo = 0, hi = 23;
        while (lo < hi) {
            int mid = (lo + hi + 1) >> 1;
            if (base[mid] <= l) lo = mid; else hi = mid - 1;
        }
        return lo;
    };
    static const int copy_extra_tab[24] = {0,0,0,0,0,0,0,0,1,1,2,2,3,3,
                                           4,4,5,5,6,7,8,9,10,24};

    auto relax = [&](int64_t p, int64_t u, double start_cost,
                     int64_t tgt, int64_t adv, int64_t wire, int64_t d,
                     double edge_cost, int dcode) {
        if (tgt > n) return;
        double t = start_cost + edge_cost;
        if (t >= cost[tgt]) return;
        cost[tgt] = t;
        prev_start[tgt] = u;
        prev_len[tgt] = adv;
        prev_wire[tgt] = wire;
        prev_dist[tgt] = d;
        // cache propagation mirrors resolve_commands: dcode 0 and
        // dictionary refs leave the cache unchanged
        const int64_t* cs = node_cache + 4 * u;
        int64_t* ct = node_cache + 4 * tgt;
        int64_t max_distance = std::min(dict_len + p, window_size);
        if (dcode != 0 && d <= max_distance) {
            ct[0] = d; ct[1] = cs[0]; ct[2] = cs[1]; ct[3] = cs[2];
        } else {
            ct[0] = cs[0]; ct[1] = cs[1]; ct[2] = cs[2]; ct[3] = cs[3];
        }
    };

    for (int64_t p = 0; p < n; p++) {
        double c = cost[p];
        if (c < INF) {
            double adj = c - lcp[p];
            if (adj < best_adj) { best_adj = adj; best_u = p; }
        }
        // two start candidates: running-min u and zero-insert from p
        struct Start { int64_t u; double base_noins; int64_t il; };
        Start starts[2];
        int ns = 0;
        if (best_adj < INF)
            starts[ns++] = Start{best_u, best_adj + lcp[p],
                                 p - best_u};
        if (c < INF && p != best_u)
            starts[ns++] = Start{p, c, 0};

        for (int si = 0; si < ns; si++) {
            const Start& st = starts[si];
            const int64_t* cs = node_cache + 4 * st.u;
            int ic = st.il < 65536 ? (int)ins_code_tab[st.il] : 23;
            double ins_cost = (double)ins_extra_tab[ic];
            int64_t max_distance = std::min(dict_len + p, window_size);

            // cache-continuation edges (probe capped: longer matches
            // arrive through the candidate tables anyway)
            for (int ci = 0; ci < 4; ci++) {
                int64_t d = cs[ci];
                if (d <= 0 || d > max_distance) continue;
                int64_t ml = probe_len(data, dict_len + p - d,
                                       dict_len + p,
                                       std::min<int64_t>(n - p, 512));
                if (ml < 2) continue;
                int cc = copy_code_of(ml);
                int sc = short_code_of(d, cs);
                double edge;
                int dcode;
                if (sc == 0 && ic < 8 && cc < 16) {
                    edge = ins_cost + copy_extra_tab[cc] +
                           cost_cmd[cmd_sym_last_tab[ic * 24 + cc]];
                    dcode = 0;
                } else {
                    int use = sc >= 0 ? sc : 0;
                    edge = ins_cost + copy_extra_tab[cc] +
                           cost_cmd[cmd_sym_tab[ic * 24 + cc]] +
                           cost_dist_short[use];
                    dcode = use;
                }
                relax(p, st.u, st.base_noins, p + ml, ml, ml, d, edge,
                      dcode);
            }

            // table edges
            int64_t e0 = edge_off[p], e1 = edge_off[p + 1];
            for (int64_t e = e0; e < e1; e++) {
                int64_t ll = e_len[e];
                int64_t d = e_dist[e];
                int cc = (int)e_ccode[e];
                int sc = d <= max_distance ? short_code_of(d, cs) : -1;
                double edge;
                int dcode;
                if (sc == 0 && ic < 8 && cc < 16) {
                    edge = ins_cost + (e_base[e] - e_dcost[e]) +
                           cost_cmd[cmd_sym_last_tab[ic * 24 + cc]];
                    dcode = 0;
                } else if (sc > 0) {
                    edge = ins_cost + (e_base[e] - e_dcost[e]) +
                           cost_dist_short[sc] +
                           cost_cmd[cmd_sym_tab[ic * 24 + cc]];
                    dcode = sc;
                } else {
                    edge = ins_cost + e_base[e] +
                           cost_cmd[cmd_sym_tab[ic * 24 + cc]];
                    dcode = 16;  // any non-zero, non-short marker
                }
                relax(p, st.u, st.base_noins, p + ll, ll, e_wire[e], d,
                      edge, dcode);
            }
        }
    }
}

// ---------------------------------------------------------------------------
// candidate-based cache-aware Zopfli DP: like zopfli_dp_cache_native
// but expands the sub-length ladder inline from per-position
// candidates, so no edge list is materialized and re-priced per
// cost-model iteration.  cost_dist is [4][alpha] conditioned on the
// copy-length distance context.
// ---------------------------------------------------------------------------

void zopfli_dp_cands_range_native(
    int64_t n, int64_t n_starts, int64_t cand_cap,
    int64_t max_zopfli_len, const double* lcp,
    const double* cost_cmd,
    const double* cost_dist_short /* [16] */,
    const double* cost_dist /* [4*alpha] */, int64_t dist_alpha,
    const int64_t* cand_off, const ZCand* cands,
    const int64_t* ins_code_tab, const int64_t* ins_extra_tab,
    const int64_t* cmd_sym_tab, const int64_t* cmd_sym_last_tab,
    const uint8_t* data, int64_t total_len, int64_t dict_len,
    int64_t window_size, const int64_t* initial_cache,
    float* cost, int32_t* prev_start, int32_t* prev_len,
    int32_t* prev_wire, int32_t* prev_dist, int32_t* node_cache,
    int64_t p_start, int64_t p_end, int64_t* qstate /* [18] or null */)
{
    const float INF = 1e30f;
    if (p_start == 0) {
        for (int64_t i = 0; i <= n; i++) {
            cost[i] = INF; prev_start[i] = 0; prev_len[i] = 0;
            prev_wire[i] = 0; prev_dist[i] = 0;
        }
        cost[0] = 0.0f;
        for (int c4 = 0; c4 < 4; c4++)
            node_cache[c4] = (int32_t)initial_cache[c4];
    }

    static int dbg = getenv("BROTLI_TPU_DP_DEBUG")
                         ? atoi(getenv("BROTLI_TPU_DP_DEBUG")) : 0;
    // dbg==5 work counters: memo hits, probes, relax attempts,
    // relax successes, candidate visits, go() calls
    static int64_t dp_ctr[6];
    if (dbg == 5) memset(dp_ctr, 0, sizeof(dp_ctr));
    // top-J insert-start queue (reference StartPosQueue, hq.rs:185-256)
    constexpr int kStarts = 8;
    int max_starts = (int)std::max<int64_t>(
        1, std::min<int64_t>(n_starts, kStarts));
    // early cost-model iterations probe only the 4 plain cache
    // distances; the final (wide-queue) iteration probes all 16
    // short-code variants (reference kNumLastDistancesToCheck)
    int n_sc = n_starts >= 5 ? 16 : 4;
    double q_adj[kStarts];
    int64_t q_u[kStarts];
    int q_n = 0;
    // chunked form: the only cross-position loop state is the start
    // queue and the long-match skip mark — restore/save via qstate
    // ([0]=q_n, [1]=skip_until, [2..9]=q_u, [10..17]=q_adj bit-cast)
    if (qstate && p_start > 0) {
        q_n = (int)qstate[0];
        for (int qi = 0; qi < kStarts; qi++) {
            q_u[qi] = qstate[2 + qi];
            std::memcpy(&q_adj[qi], &qstate[10 + qi], 8);
        }
    }

    // copy-length -> copy code, tabulated (RFC 7932 insert-and-copy
    // length code bases; lengths >= 2118 are all code 23)
    struct CCTab { uint8_t v[2118]; };
    static const CCTab cct = [] {
        static const int64_t base[24] = {2,3,4,5,6,7,8,9,10,12,14,18,22,
                                         30,38,54,70,102,134,198,326,
                                         582,1094,2118};
        CCTab t{};
        int code = 0;
        for (int64_t l = 2; l < 2118; l++) {
            while (code < 23 && base[code + 1] <= l) code++;
            t.v[l] = (uint8_t)code;
        }
        return t;
    }();
    auto copy_code_of = [&](int64_t l) -> int {
        return l < 2118 ? (int)cct.v[l] : 23;
    };
    static const int copy_extra_tab[24] = {0,0,0,0,0,0,0,0,1,1,2,2,3,3,
                                           4,4,5,5,6,7,8,9,10,24};
    // ladder cap (reference MaxZopfliLen, hq.rs:159: 150 for q<=10,
    // 325 for q11): matches longer than this are priced only at their
    // full length, and positions covered by a very long match are
    // start-queue-updated without match evaluation (the `skip` loop,
    // hq.rs:943-972) — without both, the length ladder is O(n^2) on
    // repeat-heavy input
    if (max_zopfli_len <= 0) max_zopfli_len = int64_t(1) << 30;
    int64_t skip_until = (qstate && p_start > 0) ? qstate[1] : 0;

    // cheapest possible command bits, for the minimum-copy-length
    // lower bound (reference min_cost_cmd_, hq.rs:172)
    double min_cost_cmd = 1e30;
    for (int i = 0; i < 704; i++)
        min_cost_cmd = std::min(min_cost_cmd, cost_cmd[i]);

    struct Start {
        int64_t u; double base_i; int64_t il;
        const int32_t* cs; const int64_t* cmd_row;
        const int64_t* cmd_row_last; bool ic_last_ok;
    };
    for (int64_t p = p_start; p < p_end; p++) {
        double c = cost[p];
        if (c < INF) {
            double adj = c - lcp[p];
            if (q_n < max_starts || adj < q_adj[q_n - 1]) {
                int pos = q_n < max_starts ? q_n : max_starts - 1;
                while (pos > 0 && adj < q_adj[pos - 1]) {
                    q_adj[pos] = q_adj[pos - 1];
                    q_u[pos] = q_u[pos - 1];
                    pos--;
                }
                q_adj[pos] = adj;
                q_u[pos] = p;
                if (q_n < max_starts) q_n++;
            }
        }
        // inside a long-match skip region: queue update only
        // (reference EvaluateNode-only loop, hq.rs:957-972)
        if (p < skip_until) continue;
        Start starts[kStarts + 1];
        int ns = 0;
        double best_base = 1e30;
        // only starts within a few bits of the best matter
        for (int qi = 0; qi < q_n; qi++) {
            if (q_adj[qi] > q_adj[0] + 6.0 && qi > 0) break;
            starts[ns++] = Start{q_u[qi], q_adj[qi] + lcp[p],
                                 p - q_u[qi], nullptr, nullptr,
                                 nullptr, false};
            best_base = std::min(best_base, q_adj[qi] + lcp[p]);
        }
        bool have_p = false;
        for (int qi = 0; qi < q_n; qi++) have_p |= q_u[qi] == p;
        if (c < INF && !have_p) {
            starts[ns++] = Start{p, c, 0, nullptr, nullptr, nullptr,
                                 false};
            best_base = std::min(best_base, c);
        }
        if (ns == 0) continue;

        int64_t max_distance = std::min(dict_len + p, window_size);
        int64_t probe_cap = std::min<int64_t>(n - p, 512);
        int64_t e0 = cand_off[p], e1 = cand_off[p + 1];
        // early cost-model iterations only visit the strongest few
        // candidates per position; the final (wide) iteration visits
        // the full set
        if (cand_cap > 0 && e1 - e0 > cand_cap) e1 = e0 + cand_cap;

        // minimum copy length worth pricing at this position
        // (reference ComputeMinimumCopyLength, hq.rs:565): no copy
        // shorter than this can undercut the already-known node costs
        // even with the cheapest command
        int64_t min_len = 2;
        {
            double mc = best_base + min_cost_cmd;
            int64_t next_off = 10, next_bucket = 4;
            while (p + min_len <= n && cost[p + min_len] <= (float)mc) {
                min_len++;
                if (min_len == next_off) {
                    mc += 1.0;
                    next_off += next_bucket;
                    next_bucket *= 2;
                }
            }
        }

        // per-start derived rows, plus the start-independent pricing
        // floor: bestP[cc] = min over starts of
        // (base + insert extras + cost_cmd[cmd symbol(ic, cc)]) — the
        // full-priced (no cache hit) candidate path only needs the
        // winning start per copy code, so candidates price once, not
        // once per start.  Filled LAZILY per copy code (maskP bit):
        // only ~5 distinct copy codes are touched per position, so an
        // eager 24 x ns fill wastes most of its work
        double bestP[24];
        int bestS[24];
        uint32_t maskP = 0;
        for (int si = 0; si < ns; si++) {
            Start& st = starts[si];
            st.cs = node_cache + 4 * st.u;
            int ic = st.il < 65536 ? (int)ins_code_tab[st.il] : 23;
            st.base_i += (double)ins_extra_tab[ic];
            st.cmd_row = cmd_sym_tab + ic * 24;
            st.cmd_row_last = cmd_sym_last_tab + ic * 24;
            st.ic_last_ok = ic < 8;
        }
        auto getP = [&](int cc) {
            if (!(maskP & (1u << cc))) {
                double b = 1e30; int bi = 0;
                for (int si = 0; si < ns; si++) {
                    double t = starts[si].base_i +
                               cost_cmd[starts[si].cmd_row[cc]];
                    if (t < b) { b = t; bi = si; }
                }
                bestP[cc] = b; bestS[cc] = bi; maskP |= 1u << cc;
            }
        };
        // distinct cache rows across starts (usually 1): a candidate
        // distance can only be a short code if it lands within +-3 of
        // cs[0]/cs[1] or equals cs[2]/cs[3] of one of these rows.
        // bestPr/bestSr are the same pricing floor per row, so the
        // short-code probe loop below runs once per row, not per start;
        // lazily filled like bestP
        const int32_t* crows[kStarts + 1];
        int row_of[kStarts + 1];
        double bestPr[kStarts + 1][24];
        int bestSr[kStarts + 1][24];
        uint32_t maskPr[kStarts + 1];
        int ncrows = 0;
        for (int si = 0; si < ns; si++) {
            int r = -1;
            for (int q = 0; q < ncrows && r < 0; q++)
                if (crows[q][0] == starts[si].cs[0] &&
                    crows[q][1] == starts[si].cs[1] &&
                    crows[q][2] == starts[si].cs[2] &&
                    crows[q][3] == starts[si].cs[3])
                    r = q;
            if (r < 0) {
                r = ncrows++;
                crows[r] = starts[si].cs;
                maskPr[r] = 0;
            }
            row_of[si] = r;
        }
        auto getPr = [&](int r, int cc) {
            if (!(maskPr[r] & (1u << cc))) {
                double b = 1e30; int bi = 0;
                for (int si = 0; si < ns; si++) {
                    if (row_of[si] != r) continue;
                    double t = starts[si].base_i +
                               cost_cmd[starts[si].cmd_row[cc]];
                    if (t < b) { b = t; bi = si; }
                }
                bestPr[r][cc] = b; bestSr[r][cc] = bi;
                maskPr[r] |= 1u << cc;
            }
        };

        int64_t relaxed_max = 0;
        auto relax = [&](const Start& st, int64_t tgt, double t,
                         int64_t adv, int64_t wire, int64_t d,
                         bool push) {
            if (dbg == 5) dp_ctr[2]++;
            if (tgt > n || (float)t >= cost[tgt]) return;
            if (dbg == 5) dp_ctr[3]++;
            if (adv > relaxed_max) relaxed_max = adv;
            cost[tgt] = (float)t;
            prev_start[tgt] = (int32_t)st.u;
            prev_len[tgt] = (int32_t)adv;
            prev_wire[tgt] = (int32_t)wire;
            prev_dist[tgt] = (int32_t)d;
            const int32_t* cs = st.cs;
            int32_t* ct = node_cache + 4 * tgt;
            if (push) {
                ct[0] = (int32_t)d; ct[1] = cs[0]; ct[2] = cs[1];
                ct[3] = cs[2];
            } else {
                ct[0] = cs[0]; ct[1] = cs[1]; ct[2] = cs[2];
                ct[3] = cs[3];
            }
        };

        // all 16 short-code variants (RFC 7932 4; reference
        // kDistanceCacheIndex/Offset, hq.rs)
        static const int sc_idx[16] = {0, 1, 2, 3, 0, 0, 0, 0, 0, 0,
                                       1, 1, 1, 1, 1, 1};
        static const int sc_delta[16] = {0, 0, 0, 0, -1, 1, -2, 2,
                                         -3, 3, -1, 1, -2, 2, -3, 3};
        // short-code loop, reference shape (hq.rs:684-768): per cache
        // row a monotone best_len frontier — each variant only prices
        // lengths beyond anything already priced — plus a one-byte
        // continuation filter that skips the probe when the byte at
        // the frontier can't extend it
        int64_t max_len = n - p;
        for (int r = 0; r < ncrows; r++) {
            const int32_t* cs = crows[r];
            int64_t best_len = min_len - 1;
            for (int sc = 0; sc < (dbg == 1 ? 0 : n_sc); sc++) {
                if (best_len >= max_len) break;
                int64_t d = (int64_t)cs[sc_idx[sc]] + sc_delta[sc];
                if (d <= 0 || d > max_distance) continue;
                if (data[dict_len + p + best_len] !=
                    data[dict_len + p - d + best_len])
                    continue;
                if (dbg == 5) dp_ctr[1]++;
                int64_t ml = probe_len(data, dict_len + p - d,
                                       dict_len + p, probe_cap);
                if (ml <= best_len) continue;
                if (sc == 0) {
                    for (int64_t l = best_len + 1; l <= ml; l++) {
                        int cc = copy_code_of(l);
                        for (int si = 0; si < ns; si++) {
                            if (row_of[si] != r) continue;
                            const Start& st = starts[si];
                            if (st.ic_last_ok && cc < 16) {
                                relax(st, p + l,
                                      st.base_i + copy_extra_tab[cc] +
                                          cost_cmd[st.cmd_row_last[cc]],
                                      l, l, d, false);
                            } else {
                                relax(st, p + l,
                                      st.base_i + copy_extra_tab[cc] +
                                          cost_cmd[st.cmd_row[cc]] +
                                          cost_dist_short[0],
                                      l, l, d, false);
                            }
                        }
                    }
                } else {
                    for (int64_t l = best_len + 1; l <= ml; l++) {
                        int cc = copy_code_of(l);
                        getPr(r, cc);
                        relax(starts[bestSr[r][cc]], p + l,
                              bestPr[r][cc] + copy_extra_tab[cc] +
                                  cost_dist_short[sc],
                              l, l, d, true);
                    }
                }
                best_len = ml;
            }
        }

        if (dbg == 3) { e1 = e0; }
        // window candidates are stored first, descending by length
        // (zopfli_cands_native insertion sort); sweep lengths ascending
        // from min_len so every length is priced exactly once with the
        // cheapest covering candidate (reference hq.rs:773-830 walks
        // the same monotone frontier over its sorted match list)
        int nw = 0;
        while (e0 + nw < e1 && !(cands[e0 + nw].flags & 1) && nw < 24)
            nw++;
        // a window match longer than max_zopfli_len collapses the
        // candidate list to just itself, priced at full length only
        // (reference hq.rs:921-926 + the len=max_match_len jump at
        // hq.rs:794)
        bool single_long = nw > 0 && cands[e0].len > max_zopfli_len &&
                           cands[e0].dist <= max_distance;
        if (single_long) {
            const ZCand& c2 = cands[e0];
            int64_t L = std::min<int64_t>(c2.len, max_len);
            if (L >= min_len) {
                int rr = L >= 5 ? 3 : (int)(L - 2);
                double dc = (double)c2.nbits +
                            cost_dist[rr * dist_alpha + c2.sym];
                int cc = copy_code_of(L);
                getP(cc);
                relax(starts[bestS[cc]], p + L,
                      bestP[cc] + copy_extra_tab[cc] + dc, L, L,
                      c2.dist, true);
            }
        } else if (nw > 0 && min_len <= max_len) {
            // prefix-min (over the stored descending-length order) of
            // the distance cost per RFC copy-length context row: entry
            // j = cheapest distance cost among candidates with
            // len >= len_j
            double pmc[4][24];
            int pmi[4][24];
            for (int j = 0; j < nw; j++) {
                const ZCand& c2 = cands[e0 + j];
                bool ok = c2.dist <= max_distance;
                double nb2 = (double)c2.nbits;
                for (int rr = 0; rr < 4; rr++) {
                    double dc = ok ? nb2 + cost_dist[rr * dist_alpha +
                                                    c2.sym]
                                   : 1e30;
                    if (j == 0 || dc < pmc[rr][j - 1]) {
                        pmc[rr][j] = dc;
                        pmi[rr][j] = j;
                    } else {
                        pmc[rr][j] = pmc[rr][j - 1];
                        pmi[rr][j] = pmi[rr][j - 1];
                    }
                }
            }
            int64_t frontier = min_len;
            for (int j = nw - 1; j >= 0; j--) {
                int64_t Lj = std::min<int64_t>(cands[e0 + j].len,
                                               max_len);
                if (Lj < frontier) continue;
                for (int64_t l = frontier; l <= Lj; l++) {
                    if (dbg == 5) dp_ctr[5]++;
                    int rr = l >= 5 ? 3 : (int)(l - 2);
                    double dc = pmc[rr][j];
                    if (dc >= 1e29) continue;
                    int cc = copy_code_of(l);
                    getP(cc);
                    relax(starts[bestS[cc]], p + l,
                          bestP[cc] + copy_extra_tab[cc] + dc,
                          l, l, cands[e0 + pmi[rr][j]].dist, true);
                }
                frontier = Lj + 1;
            }
        }
        // dictionary candidates: exact advance length, wire-coded copy
        // (transform cutoffs make wire != len); pseudo-distances never
        // enter the decoder's cache.  (the single-long collapse drops
        // them, like the reference's matches[0]-only rewrite)
        for (int64_t e = e0 + nw; e < e1 && !single_long; e++) {
            const ZCand& cnd = cands[e];
            if (dbg == 5) dp_ctr[4]++;
            int64_t L = cnd.len;
            if (L < min_len || p + L > n) continue;
            int64_t wirev = cnd.wire;
            int rr = wirev >= 5 ? 3 : (int)std::max<int64_t>(wirev - 2,
                                                             0);
            double dc = (double)cnd.nbits +
                        cost_dist[rr * dist_alpha + cnd.sym];
            int cc = copy_code_of(wirev);
            getP(cc);
            relax(starts[bestS[cc]], p + L,
                  bestP[cc] + copy_extra_tab[cc] + dc,
                  L, wirev, cnd.dist, false);
        }
        // very long matches own the span: following positions get the
        // queue update only (reference skip, hq.rs:943-956)
        int64_t skipv = relaxed_max >= 16384 ? relaxed_max : 0;
        if (single_long)
            skipv = std::max(skipv,
                             std::min<int64_t>(cands[e0].len, max_len));
        if (skipv > 1) skip_until = p + skipv;
    }
    if (qstate) {
        qstate[0] = q_n;
        qstate[1] = skip_until;
        for (int qi = 0; qi < kStarts; qi++) {
            qstate[2 + qi] = q_u[qi];
            std::memcpy(&qstate[10 + qi], &q_adj[qi], 8);
        }
    }
    if (dbg == 5)
        fprintf(stderr,
                "[dpctr] memo_hit %lld probe %lld relax_try %lld "
                "relax_ok %lld cand %lld go %lld\n",
                (long long)dp_ctr[0], (long long)dp_ctr[1],
                (long long)dp_ctr[2], (long long)dp_ctr[3],
                (long long)dp_ctr[4], (long long)dp_ctr[5]);
}

void zopfli_dp_cands_native(
    int64_t n, int64_t n_starts, int64_t cand_cap,
    int64_t max_zopfli_len, const double* lcp,
    const double* cost_cmd,
    const double* cost_dist_short /* [16] */,
    const double* cost_dist /* [4*alpha] */, int64_t dist_alpha,
    const int64_t* cand_off, const ZCand* cands,
    const int64_t* ins_code_tab, const int64_t* ins_extra_tab,
    const int64_t* cmd_sym_tab, const int64_t* cmd_sym_last_tab,
    const uint8_t* data, int64_t total_len, int64_t dict_len,
    int64_t window_size, const int64_t* initial_cache,
    float* cost, int32_t* prev_start, int32_t* prev_len,
    int32_t* prev_wire, int32_t* prev_dist, int32_t* node_cache)
{
    zopfli_dp_cands_range_native(
        n, n_starts, cand_cap, max_zopfli_len, lcp, cost_cmd,
        cost_dist_short, cost_dist, dist_alpha, cand_off, cands,
        ins_code_tab, ins_extra_tab, cmd_sym_tab, cmd_sym_last_tab,
        data, total_len, dict_len, window_size, initial_cache,
        cost, prev_start, prev_len, prev_wire, prev_dist, node_cache,
        0, n, nullptr);
}

// ---------------------------------------------------------------------------
// match finder: top-K most-recent candidates per hash bucket
// (exact native equivalent of match.find_best_matches: ring buffers of
// the K most recent positions per 4-byte and 8-byte hash bucket, same
// candidate order, scoring, and tie-breaking as the numpy oracle)
// ---------------------------------------------------------------------------

void find_matches_native(
    const uint8_t* data, int64_t n, int64_t dict_len,
    int64_t window_size, int64_t k, int64_t bucket_bits,
    int64_t k8, int64_t bucket_bits8, int64_t hash_len,
    int64_t lbs, int64_t match_cap,
    // static dictionary index (may be null): hash table of word ids
    const int64_t* dict_table, int64_t dict_hash_bits,
    int64_t dict_slots, const uint8_t* dict_words_flat,
    const int64_t* dict_word_len, const int64_t* dict_word_idx,
    const int64_t* dict_size_bits, const int64_t* omit_ids,
    int64_t* best_len, int64_t* best_dist, int64_t* best_score,
    uint8_t* best_isdict, int64_t* best_wire,
    int64_t* best2_len, int64_t* best2_dist,
    int64_t miss_economy,
    // optional progress mark for overlapped consumers: rows for every
    // position < *progress are final (release store; readers on x86
    // see all prior row writes)
    int64_t* progress)
{
    const uint32_t HASH_MUL32 = 0x1E35A7BDu;
    const uint64_t HASH_MUL64 = 0x1FE35A7BD3579BD3ull;
    int64_t nbuckets4 = int64_t(1) << bucket_bits;
    int64_t nbuckets8 = int64_t(1) << bucket_bits8;
    // ring buffers of recent positions, packed (first-4-bytes << 32 |
    // pos) so the 4-byte gate is a sequential row read instead of a
    // random data[cand] load per scanned candidate (stored v4 ==
    // load32(data+cand) always, so gate outcomes and output are
    // byte-identical to the position-only rings)
    uint64_t* ring4 = new uint64_t[nbuckets4 * k];
    int32_t* cnt4 = new int32_t[nbuckets4]();
    uint64_t* ring8 = k8 ? new uint64_t[nbuckets8 * k8] : nullptr;
    int32_t* cnt8 = k8 ? new int32_t[nbuckets8]() : nullptr;

    auto score_of = [&](int64_t len, int64_t dist) -> int64_t {
        return lbs * len - 30 * log2floor(dist);
    };

    // incompressible-span economy (opt-in, the collection analog of
    // the parse's sparse-skip, reference hq.rs:984-1045 shape): deep
    // rows are a waste over spans where nothing matches — after 128
    // matchless positions the scan depth drops to 8/4, and after 1024
    // it also probes only every other position (inserts continue at
    // every position, so the candidate tables stay exact; the only
    // loss is a candidate ROW at a skipped position, which a run of
    // misses says is empty anyway).  One hit resets the run.
    // miss_economy=0 (the default, and every oracle-equivalence
    // caller) keeps the exhaustive walk.
    int64_t miss_run = 0;
    const int64_t economy_at = miss_economy ? 128 : INT64_MAX;
    const int64_t stride_at = miss_economy ? 1024 : INT64_MAX;
    for (int64_t i = 0; i < n; i++) {
        if (progress && !(i & 8191))
            __atomic_store_n(progress, i, __ATOMIC_RELEASE);
        best_len[i] = 0; best_dist[i] = 0; best_score[i] = 0;
        best_isdict[i] = 0; best_wire[i] = 0;
        // the runner-up rows must be cleared on EVERY path (including
        // the early-continue ones below): overlapped callers reuse
        // pooled output buffers, so a skipped position must not leak
        // a stale previous-call entry
        if (best2_len) { best2_len[i] = 0; best2_dist[i] = 0; }
        if (i + (hash_len == 5 ? 8 : 4) > n) continue;
        uint32_t v4 = load32(data + i);
        uint32_t h4 = bucket_hash(data + i, hash_len,
                                  (uint32_t)(32 - bucket_bits));
        // software pipeline: the rows are random addresses into a
        // table far bigger than L2, and the walk is strictly i+1 — so
        // the row loads for upcoming positions can start now (same
        // trick as search_impl's next-position prefetch; k=32 rows
        // span 4 lines, pull the first two)
        if (i + 6 + (hash_len == 5 ? 8 : 4) <= n) {
            uint32_t hn = bucket_hash(data + i + 6, hash_len,
                                      (uint32_t)(32 - bucket_bits));
            const char* rp = (const char*)(ring4 + hn * k);
            __builtin_prefetch(rp, 1, 1);
            if (k > 8) __builtin_prefetch(rp + 64, 0, 1);
            if (k8 && i + 6 + 8 <= n) {
                uint64_t v8n = load64(data + i + 6);
                uint32_t h8n = (uint32_t)((v8n * HASH_MUL64)
                                          >> (64 - bucket_bits8));
                __builtin_prefetch(ring8 + h8n * k8, 1, 1);
            }
        }
        int64_t limit = std::min(n - i, match_cap);
        int64_t k_eff = k, k8_eff = k8;
        if (miss_run > economy_at) {
            if (miss_run > stride_at && (i & 1)) {
                // stride-2 probe: insert only
                uint64_t ent = ((uint64_t)v4 << 32) | (uint32_t)i;
                ring4[h4 * k + (cnt4[h4] % k)] = ent;
                cnt4[h4]++;
                if (k8 && i + 8 <= n) {
                    uint64_t v8 = load64(data + i);
                    uint32_t h8 = (uint32_t)((v8 * HASH_MUL64)
                                             >> (64 - bucket_bits8));
                    ring8[h8 * k8 + (cnt8[h8] % k8)] = ent;
                    cnt8[h8]++;
                }
                miss_run++;
                continue;
            }
            k_eff = std::min<int64_t>(k, 8);
            k8_eff = std::min<int64_t>(k8, 4);
        }

        int64_t bl = 0, bd = 0, bs = 0;
        int64_t b2l = 0, b2d = 0, b2s = 0;
        auto consider = [&](int64_t ml, int64_t dist, int64_t sc) {
            if (sc > bs) {
                if (bd != dist) { b2l = bl; b2d = bd; b2s = bs; }
                bs = sc; bl = ml; bd = dist;
            } else if (sc > b2s && dist != bd) {
                b2s = sc; b2l = ml; b2d = dist;
            }
        };
        uint64_t ent = ((uint64_t)v4 << 32) | (uint32_t)i;
        // 4-byte table: iterate most-recent first
        {
            int32_t c = cnt4[h4];
            int32_t m = (int32_t)std::min<int64_t>(c, k_eff);
            const uint64_t* row = ring4 + h4 * k;
            // two-pass scan: a branch-free vectorizable gate pass
            // over the row in STORAGE order (the 4-byte equality and
            // the window bound don't care about recency), then probes
            // walk only the gate hits in recency order.  k <= 64 so
            // one u64 bitmask covers the row.
            uint64_t gatemask = 0;
            int32_t valid = c < (int32_t)k ? c : (int32_t)k;
            for (int32_t s = 0; s < valid; s++) {
                uint64_t e = row[s];
                uint64_t hit = ((uint32_t)(e >> 32) == v4) &
                               ((uint64_t)(i - (int64_t)(uint32_t)e)
                                <= (uint64_t)window_size);
                gatemask |= hit << s;
            }
            if (gatemask) {
                for (int32_t j = 0; j < m; j++) {
                    int32_t s = (int32_t)(((c - 1 - j) % (int32_t)k
                                           + (int32_t)k) % (int32_t)k);
                    if (!((gatemask >> s) & 1)) continue;
                    uint64_t e = row[s];
                    int64_t cand = (int64_t)(uint32_t)e;
                    int64_t dist = i - cand;
                    if (dist > window_size) break;
                    // one-byte domination gate (exact): candidates
                    // arrive distance-increasing and best/b2 were set
                    // within this scan, so entering the top 2 requires
                    // extending past min(bl, b2l) — a mismatch there
                    // prunes the whole probe (same gate as
                    // search_impl / collect_matches; without top2
                    // tracking the bound is bl itself)
                    int64_t g = best2_len ? std::min(bl, b2l) : bl;
                    if (g > 0 && (g >= limit ||
                        data[cand + g] != data[i + g])) continue;
                    int64_t ml = probe_len(data, cand, i, limit);
                    if (ml < 4) continue;
                    consider(ml, dist, score_of(ml, dist));
                }
            }
            ring4[h4 * k + (cnt4[h4] % k)] = ent;
            cnt4[h4]++;
        }
        // 8-byte table
        if (k8 && i + 8 <= n) {
            uint64_t v8 = load64(data + i);
            uint32_t h8 = (uint32_t)((v8 * HASH_MUL64)
                                     >> (64 - bucket_bits8));
            int32_t c = cnt8[h8];
            int32_t m = (int32_t)std::min<int64_t>(c, k8_eff);
            // the same domination gate, but LOCAL to this scan: the
            // global best may carry a larger distance than an 8-table
            // candidate (the tables restart at small distances), so
            // only lengths of candidates seen in THIS scan bound what
            // a later candidate must exceed.  A pruned candidate is
            // dominated by two already-considered distinct-distance
            // locals, so the global top 2 is unchanged (exact).
            int64_t l_bl = 0, l_bd = 0, l_bs = 0, l_b2l = 0,
                    l_b2s = 0;
            for (int32_t j = 0; j < m; j++) {
                uint64_t e = ring8[h8 * k8 + ((c - 1 - j) % k8 + k8)
                                   % k8];
                int64_t cand = (int64_t)(uint32_t)e;
                int64_t dist = i - cand;
                if (dist > window_size) break;
                if ((uint32_t)(e >> 32) != v4) continue;
                int64_t g = best2_len ? std::min(l_bl, l_b2l) : l_bl;
                if (g > 0 && (g >= limit ||
                    data[cand + g] != data[i + g])) continue;
                int64_t ml = probe_len(data, cand, i, limit);
                if (ml < 4) continue;
                int64_t sc = score_of(ml, dist);
                if (sc > l_bs) {
                    if (l_bd != dist) { l_b2l = l_bl; l_b2s = l_bs; }
                    l_bs = sc; l_bl = ml; l_bd = dist;
                } else if (sc > l_b2s && dist != l_bd) {
                    l_b2s = sc; l_b2l = ml;
                }
                consider(ml, dist, sc);
            }
            ring8[h8 * k8 + (cnt8[h8] % k8)] = ent;
            cnt8[h8]++;
        }
        bool isdict = false;
        int64_t bwire = bl;
        // static dictionary probe: identity + cutoff (OmitLast_k)
        if (dict_table && i >= dict_len) {
            uint32_t hd = (v4 * HASH_MUL32) >> (32 - dict_hash_bits);
            for (int64_t s = 0; s < dict_slots; s++) {
                int64_t e = dict_table[hd * dict_slots + s];
                if (e < 0) continue;
                int64_t L = dict_word_len[e];
                const uint8_t* w = dict_words_flat + e * 24;
                int64_t avail = std::min<int64_t>(L, n - i);
                int64_t m = 0;
                while (m < avail && data[i + m] == w[m]) m++;
                if (m < 4) continue;
                int64_t omit = L - m;
                int64_t transform;
                if (omit == 0) transform = 0;
                else if (omit <= 9 && omit_ids[omit] >= 0)
                    transform = omit_ids[omit];
                else continue;
                int64_t maxd = std::min<int64_t>(i, window_size);
                int64_t dist = maxd + 1 +
                    (transform << dict_size_bits[L]) + dict_word_idx[e];
                int64_t sc = score_of(m, dist);
                if (sc > bs) {
                    bs = sc; bl = m; bd = dist; isdict = true;
                    bwire = L;
                }
            }
        }
        best_len[i] = bl; best_dist[i] = bd; best_score[i] = bs;
        best_isdict[i] = isdict ? 1 : 0;
        best_wire[i] = isdict ? bwire : bl;
        if (best2_len) { best2_len[i] = b2l; best2_dist[i] = b2d; }
        miss_run = bl >= 4 ? 0 : miss_run + 1;
    }
    if (progress) __atomic_store_n(progress, n, __ATOMIC_RELEASE);
    delete[] ring4; delete[] cnt4;
    delete[] ring8; delete[] cnt8;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// combined search + greedy parse (the reference's actual hot-path shape:
// CreateBackwardReferences, mod.rs:2376 — FindLongestMatch only at parse
// positions, bulk hash insertion over skipped spans, lazy matching,
// distance-cache candidates at every searched position, sparse-skip over
// incompressible spreads).  Used for the q2-q9 one-shot host path; the
// decoupled matcher+walk remains the cross-checked oracle pipeline.
// ---------------------------------------------------------------------------

namespace {

// opt-in profiling counters for the combined parse (enable via
// parse_stats_enable(1); near-zero cost when off)
struct ParseStats {
    int64_t positions = 0;       // search() calls
    int64_t cache_probes = 0;    // short-code probe_len calls
    int64_t t4_scanned = 0;      // primary-table candidates examined
    int64_t t4_probed = 0;       // ... that reached probe_len
    int64_t t8_scanned = 0;
    int64_t t8_probed = 0;
    int64_t dict_probes = 0;
    int64_t inserts = 0;
    uint64_t cyc_search = 0;
    uint64_t cyc_insert = 0;
    uint64_t cyc_hash = 0;
};
bool g_stats_on = false;
// global, not thread_local: the single-stream pipeline runs exactly
// one parse worker, and the main thread reads after joining.  (Opt-in
// profiling only — concurrent CompressMulti parses would interleave.)
ParseStats g_stats;

inline uint64_t rdtsc_now() {
#if defined(__x86_64__)
    unsigned lo, hi;
    __asm__ __volatile__("rdtsc" : "=a"(lo), "=d"(hi));
    return ((uint64_t)hi << 32) | lo;
#else
    return 0;
#endif
}

struct SearchResult {
    int64_t len = 0, dist = 0, score = 0, wire = 0;
    bool isdict = false;
};

// Packed static-dictionary gate: (first-4-bytes-of-word << 32) |
// (word_id + 1) per index slot, 0 = empty.  A probe then rejects on
// one sequential row load instead of chasing word bytes + metadata —
// EXACT: every transform here is omit-last, so an m >= 4 match
// requires word[0..4] == data[i..i+4].  Built once per distinct index
// pointer; old tables are intentionally kept (a handful per process)
// so concurrent sessions never see a freed buffer.
std::mutex g_dictpack_mtx;
std::vector<std::pair<const int64_t*, std::vector<uint64_t>*>>
    g_dictpack_tabs;

const uint64_t* dict_packed_gate(const int64_t* table,
                                 int64_t hash_bits, int64_t slots,
                                 const uint8_t* words_flat) {
    std::lock_guard<std::mutex> lk(g_dictpack_mtx);
    for (auto& p : g_dictpack_tabs)
        if (p.first == table) return p.second->data();
    int64_t total = (int64_t(1) << hash_bits) * slots;
    auto* v = new std::vector<uint64_t>(total, 0);
    for (int64_t i = 0; i < total; i++) {
        int64_t e = table[i];
        if (e < 0) continue;
        uint32_t v4 = load32(words_flat + e * 24);
        (*v)[i] = ((uint64_t)v4 << 32) | (uint64_t)(e + 1);
    }
    g_dictpack_tabs.push_back({table, v});
    return v->data();
}

struct CombinedCtx {
    const uint8_t* data;
    int64_t n_cache = 4;   // short-code candidates probed per search
    bool basic = false;    // q2/q3 direct-mapped tier (see basic_*)
    int64_t dict_gate = 10;   // probe dict only when best len < gate
    int64_t lazy_gate = 1 << 30;  // skip lazy re-search at/after this len
    int64_t n;                // total incl. dict prefix
    int64_t dict_len;
    int64_t window;
    int64_t k, k8;
    int64_t cap4, mask4, cap8, mask8;  // pow2 ring geometry
    int64_t lbs;
    uint32_t shift4, shift8;
    // u16 bucket counters (half the counter footprint; the recency
    // walk is modular so wraparound is harmless).  Ring entries pack
    // (first-4-bytes << 32 | position): the 4-byte match gate then
    // reads the ring row sequentially instead of doing a random
    // data[cand] load per scanned candidate (the dominant memory
    // traffic of the speed-tier search loop)
    uint64_t* ring4; uint16_t* cnt4;
    uint64_t* ring8; uint16_t* cnt8;
    // compact ring mode (window < 2^24, ring tiers only): u32 entries
    // (tag8 << 24 | pos24).  Halves the table footprint — the q5-q9
    // search is latency-bound on ring-row loads, and the smaller
    // tables keep rows in L2.  The tag is 8 product bits just below
    // the bucket id; a tag hit is verified by probe_len's exact byte
    // compare (ml < 4 rejects), so the candidate set that can WIN is
    // identical to the u64 gate's and output is bit-identical for
    // inputs < 16 MiB (beyond that, a >16MiB-stale slot can alias to
    // a nearer position; any emitted match is still byte-verified).
    bool small_ring = false;
    uint32_t* r4 = nullptr; uint32_t* r8 = nullptr;
    int64_t row4_bytes = 0, row8_bytes = 0;  // for prefetch arithmetic

    static inline uint32_t tag_of(uint32_t v4) {
        return ((v4 * 0x1E35A7BDu) >> 8) & 0xFFu;
    }
    inline const char* base4() const {
        return small_ring ? (const char*)r4 : (const char*)ring4;
    }
    inline const char* base8() const {
        return small_ring ? (const char*)r8 : (const char*)ring8;
    }
    // precomputed bucket ids (straight vectorizable passes), covering
    // absolute positions [hash_base, hash_base + coverage); the
    // session slides this window per metablock so hash scratch stays
    // O(metablock + window), not O(input)
    const uint32_t* H4 = nullptr;
    const uint32_t* H8 = nullptr;
    int64_t hash_base = 0;
    int64_t hash_limit = 0;   // absolute end of H4/H8 coverage
    int hash_len4 = 4;
    int64_t ins_pos = 0;      // next absolute position to insert
    // adaptive dictionary gating (reference SearchInStaticDictionary,
    // mod.rs:1942: stop paying for dictionary probes on data where
    // they never hit — probe only while lookups/128 <= matches)
    int64_t dict_lookups = 0, dict_matches = 0;
    // per-tier probe depth (the reference probes TWO Hash14 items per
    // miss, mod.rs:1942; the full 12-slot index is a quality-tier
    // luxury — at speed tiers it dominates miss-position cost)
    int64_t dict_max_slots = 64;
    // dictionary index
    const uint64_t* dict_pack = nullptr;  // packed 4-byte gate rows
    const int64_t* dict_table;
    int64_t dict_hash_bits, dict_slots;
    const uint8_t* dict_words;
    const int64_t* dict_wlen;
    const int64_t* dict_widx;
    const int64_t* dict_sbits;
    const int64_t* omit_ids;

    inline void insert_one(int64_t i) {
        if (i + 4 > n) return;
        uint32_t v4 = load32(data + i);
        uint32_t h4 = H4[i - hash_base];
        if (small_ring) {
            uint32_t e = (tag_of(v4) << 24) | ((uint32_t)i & 0xFFFFFFu);
            r4[h4 * cap4 + (cnt4[h4] & mask4)] = e;
            cnt4[h4]++;
            if (k8 && i + 8 <= n && (k8 > 4 || !(i & 1))) {
                uint32_t h8 = H8[i - hash_base];
                r8[h8 * cap8 + (cnt8[h8] & mask8)] = e;
                cnt8[h8]++;
            }
            return;
        }
        uint64_t e = ((uint64_t)v4 << 32) | (uint32_t)i;
        ring4[h4 * cap4 + (cnt4[h4] & mask4)] = e;
        cnt4[h4]++;
        if (k8 && i + 8 <= n && (k8 > 4 || !(i & 1))) {
            // speed tiers (k8 <= 4) stride the 8-byte inserts: a long
            // match missed at an odd start is found one position
            // later, and the insert traffic halves; quality tiers
            // (k8 > 4) insert densely
            uint32_t h8 = H8[i - hash_base];
            ring8[h8 * cap8 + (cnt8[h8] & mask8)] = e;
            cnt8[h8]++;
        }
    }

    // prefix-priming insert: positions below the sliding hash window
    // (CompressMulti shard prefixes) hash inline
    inline void insert_one_inline(int64_t i) {
        if (i + 4 > n) return;
        // tail positions land in bucket 0, matching the buffer fill
        uint32_t v4 = load32(data + i);
        uint32_t h4 = i + (hash_len4 == 5 ? 8 : 4) <= n
            ? bucket_hash(data + i, hash_len4, shift4) : 0;
        if (small_ring) {
            uint32_t e = (tag_of(v4) << 24) | ((uint32_t)i & 0xFFFFFFu);
            r4[h4 * cap4 + (cnt4[h4] & mask4)] = e;
            cnt4[h4]++;
            if (k8 && i + 8 <= n && (k8 > 4 || !(i & 1))) {
                uint32_t h8 = (uint32_t)(
                    (load64(data + i) * 0x1FE35A7BD3579BD3ull)
                    >> shift8);
                r8[h8 * cap8 + (cnt8[h8] & mask8)] = e;
                cnt8[h8]++;
            }
            return;
        }
        uint64_t e = ((uint64_t)v4 << 32) | (uint32_t)i;
        ring4[h4 * cap4 + (cnt4[h4] & mask4)] = e;
        cnt4[h4]++;
        if (k8 && i + 8 <= n && (k8 > 4 || !(i & 1))) {
            uint32_t h8 = (uint32_t)((load64(data + i) *
                                      0x1FE35A7BD3579BD3ull) >> shift8);
            ring8[h8 * cap8 + (cnt8[h8] & mask8)] = e;
            cnt8[h8]++;
        }
    }

    // insert loop with a 6-position prefetch pipeline: every insert
    // writes one random ring row (an RFO miss on a cold line); H4 is
    // precomputed, so the rows for upcoming positions can be pulled
    // while earlier inserts retire
    inline void insert_run(int64_t from, int64_t stop) {
        int64_t pf_end = std::min(stop, hash_limit);
        const char* b4 = base4();
        for (int64_t i = from; i < stop; i++) {
            int64_t p = i + 6;
            if (p < pf_end && p + 4 <= n)
                __builtin_prefetch(
                    b4 + (int64_t)H4[p - hash_base] * row4_bytes, 1, 1);
            insert_one(i);
        }
    }

    inline void insert_upto(int64_t stop) {
        if (__builtin_expect(g_stats_on, 0)) {
            uint64_t t0 = rdtsc_now();
            int64_t from = ins_pos;
            insert_run(ins_pos, stop);
            if (stop > ins_pos) ins_pos = stop;
            g_stats.inserts += stop > from ? stop - from : 0;
            g_stats.cyc_insert += rdtsc_now() - t0;
            return;
        }
        insert_run(ins_pos, stop);
        if (stop > ins_pos) ins_pos = stop;
    }

    // insert a copied span: long matches hash only the edges plus a
    // strided interior (the reference skips interior positions of long
    // copies the same way)
    inline void insert_span(int64_t start, int64_t stop) {
        if (basic) { basic_insert_span(start, stop); return; }
        if (stop - ins_pos <= 48) { insert_upto(stop); return; }
        insert_upto(std::min(start + 16, stop));
        for (int64_t i = ins_pos; i < stop - 16; i += 4) insert_one(i);
        ins_pos = std::max(ins_pos, stop - 16);
        insert_upto(stop);
    }

    // search at absolute position i (candidates strictly before i).
    // gate_len: the lazy re-search passes the current best length —
    // candidates that cannot exceed it skip their probe entirely (the
    // reference seeds FindLongestMatch with best_len_in the same way,
    // mod.rs:2438)
    SearchResult search(int64_t i, const int64_t* cache,
                        int64_t gate_len = 0) {
        if (__builtin_expect(!g_stats_on, 1))
            return basic ? basic_search(i, cache, gate_len)
                         : search_impl(i, cache, gate_len);
        g_stats.positions++;
        uint64_t t0 = rdtsc_now();
        SearchResult r = basic ? basic_search(i, cache, gate_len)
                               : search_impl(i, cache, gate_len);
        g_stats.cyc_search += rdtsc_now() - t0;
        return r;
    }

    SearchResult search_impl(int64_t i, const int64_t* cache,
                             int64_t gate_len = 0) {
        SearchResult sr;
        insert_upto(i);
        if (i + 4 > n) return sr;
        int64_t limit = n - i;
        int64_t gl = std::min(gate_len, limit - 1);
        if (gl < 0) gl = 0;
        // prefetch everything the probes below will touch: the two
        // ring bucket rows and the data at each cache-candidate
        // source.  The probe loops otherwise serialize these misses.
        __builtin_prefetch(
            base4() + (int64_t)H4[i - hash_base] * row4_bytes, 0, 1);
        if (k8 && i + 8 <= n)
            __builtin_prefetch(
                base8() + (int64_t)H8[i - hash_base] * row8_bytes, 0, 1);
        for (int c = 0; c < n_cache; c++) {
            int64_t d = cache[kSCIdx[c]] + kSCDelta[c];
            if (d > 0 && d <= i && d <= window)
                __builtin_prefetch(data + i - d, 0, 1);
        }
        // software pipeline: also start the NEXT positions' ring-row
        // loads now.  The walk almost always searches i+1 next (lazy
        // re-search after a hit, advance-by-one after a miss), and
        // these rows miss L2 — issuing the loads a full search early
        // hides most of the L3 latency behind the current probe work.
        for (int64_t nx = i + 1; nx <= i + 2; nx++) {
            if (nx >= hash_limit || nx + 4 > n) break;
            __builtin_prefetch(
                base4() + (int64_t)H4[nx - hash_base] * row4_bytes, 0, 1);
            if (k8 && nx + 8 <= n)
                __builtin_prefetch(
                    base8() + (int64_t)H8[nx - hash_base] * row8_bytes,
                    0, 1);
        }
        // distance-cache candidates: the full short-code set
        // (reference H9 kNumLastDistancesToCheck=16, mod.rs:598 —
        // cache[idx]+delta with last-distance penalties); n_cache is
        // 4 for speed tiers, 16 for quality tiers.  A candidate can
        // only win if it matches one byte past the current best.
        uint32_t v4g = load32(data + i);
        for (int c = 0; c < n_cache; c++) {
            int64_t d = cache[kSCIdx[c]] + kSCDelta[c];
            if (d <= 0 || d > i || d > window) continue;
            // cheap 4-byte gate first: only length >= 4 cache matches
            // count, so a first-word mismatch can never win
            if (load32(data + i - d) != v4g) continue;
            int64_t g = sr.len > gl ? sr.len : gl;
            if (g > 0 && (g >= limit ||
                data[i - d + g] != data[i + g])) continue;
            if (__builtin_expect(g_stats_on, 0)) g_stats.cache_probes++;
            int64_t ml = probe_len(data, i - d, i, limit);
            if (ml >= 4) {
                int64_t sc = lbs * ml + 15;
                if (c != 0) sc -= cache_penalty(c);
                if (sc > sr.score) {
                    sr.score = sc; sr.len = ml; sr.dist = d;
                    sr.wire = ml; sr.isdict = false;
                }
            }
        }
        uint32_t v4 = load32(data + i);
        if (small_ring) {
            // compact-ring scan: tag gate, probe_len verifies (ml < 4
            // rejects a tag false-positive — the winning candidate
            // set is identical to the u64 gate's)
            uint32_t tag = tag_of(v4);
            uint32_t h4 = H4[i - hash_base];
            int32_t c = cnt4[h4];
            int32_t m = (int32_t)std::min<int64_t>(
                std::min<int64_t>(c, k), 64);
            const uint32_t* row = r4 + h4 * cap4;
            if (__builtin_expect(g_stats_on, 0)) g_stats.t4_scanned += m;
            for (int32_t j = 0; j < m; j++) {
                uint32_t e = row[(c - 1 - j) & mask4];
                int64_t dist = (int64_t)((uint32_t)(i - e) & 0xFFFFFFu);
                if (dist == 0) continue;
                if (dist > window) break;
                if ((e >> 24) != tag) continue;
                int64_t cand = i - dist;
                int64_t g = sr.len > gl ? sr.len : gl;
                if (g > 0 && (g >= limit ||
                    data[cand + g] != data[i + g])) continue;
                if (__builtin_expect(g_stats_on, 0)) g_stats.t4_probed++;
                int64_t ml = probe_len(data, cand, i, limit);
                if (ml < 4) continue;
                int64_t sc = lbs * ml - 30 * log2floor(dist);
                if (sc > sr.score) {
                    sr.score = sc; sr.len = ml; sr.dist = dist;
                    sr.wire = ml; sr.isdict = false;
                    if (ml >= 72) break;  // good enough; stop probing
                }
            }
            if (k8 && i + 8 <= n && sr.len < 72) {
                uint32_t h8 = H8[i - hash_base];
                int32_t c8 = cnt8[h8];
                int32_t m8 = (int32_t)std::min<int64_t>(
                    std::min<int64_t>(c8, k8), 64);
                const uint32_t* row8 = r8 + h8 * cap8;
                if (__builtin_expect(g_stats_on, 0))
                    g_stats.t8_scanned += m8;
                for (int32_t j = 0; j < m8; j++) {
                    uint32_t e = row8[(c8 - 1 - j) & mask8];
                    int64_t dist =
                        (int64_t)((uint32_t)(i - e) & 0xFFFFFFu);
                    if (dist == 0) continue;
                    if (dist > window) break;
                    if ((e >> 24) != tag) continue;
                    int64_t cand = i - dist;
                    int64_t g = sr.len > gl ? sr.len : gl;
                    if (g > 0 && (g >= limit ||
                        data[cand + g] != data[i + g])) continue;
                    if (__builtin_expect(g_stats_on, 0))
                        g_stats.t8_probed++;
                    int64_t ml = probe_len(data, cand, i, limit);
                    if (ml < 4) continue;
                    int64_t sc = lbs * ml - 30 * log2floor(dist);
                    if (sc > sr.score) {
                        sr.score = sc; sr.len = ml; sr.dist = dist;
                        sr.wire = ml; sr.isdict = false;
                    }
                }
            }
            dict_probe(i, v4, sr);
            return sr;
        }
        {
            uint32_t h4 = H4[i - hash_base];
            int32_t c = cnt4[h4];
            int32_t m = (int32_t)std::min<int64_t>(
                std::min<int64_t>(c, k), 64);
            // the 4-byte gate reads the value packed in the ring entry
            // — sequential row traffic, no random data[cand] load per
            // scanned candidate.  (A tag-byte prefilter was tried and
            // reverted: same-bucket candidates share the hashed prefix
            // — but the FULL 4-byte value does discriminate, and it is
            // exactly the old gate, so behavior is unchanged.)
            const uint64_t* row = ring4 + h4 * cap4;
            if (__builtin_expect(g_stats_on, 0)) g_stats.t4_scanned += m;
            for (int32_t j = 0; j < m; j++) {
                uint64_t e = row[(c - 1 - j) & mask4];
                int64_t cand = (int64_t)(uint32_t)e;
                int64_t dist = i - cand;
                if (dist > window) break;
                if ((uint32_t)(e >> 32) != v4) continue;
                // a candidate can only beat the best if it matches at
                // least one byte past it (reference mod.rs:1714)
                int64_t g = sr.len > gl ? sr.len : gl;
                if (g > 0 && (g >= limit ||
                    data[cand + g] != data[i + g])) continue;
                if (__builtin_expect(g_stats_on, 0)) g_stats.t4_probed++;
                int64_t ml = probe_len(data, cand, i, limit);
                if (ml < 4) continue;
                int64_t sc = lbs * ml - 30 * log2floor(dist);
                if (sc > sr.score) {
                    sr.score = sc; sr.len = ml; sr.dist = dist;
                    sr.wire = ml; sr.isdict = false;
                    if (ml >= 72) break;  // good enough; stop probing
                }
            }
        }
        if (k8 && i + 8 <= n && sr.len < 72) {
            uint32_t h8 = H8[i - hash_base];
            int32_t c = cnt8[h8];
            int32_t m = (int32_t)std::min<int64_t>(
                std::min<int64_t>(c, k8), 64);
            const uint64_t* row = ring8 + h8 * cap8;
            if (__builtin_expect(g_stats_on, 0)) g_stats.t8_scanned += m;
            for (int32_t j = 0; j < m; j++) {
                uint64_t e = row[(c - 1 - j) & mask8];
                int64_t cand = (int64_t)(uint32_t)e;
                int64_t dist = i - cand;
                if (dist > window) break;
                if ((uint32_t)(e >> 32) != v4) continue;
                int64_t g = sr.len > gl ? sr.len : gl;
                if (g > 0 && (g >= limit ||
                    data[cand + g] != data[i + g])) continue;
                if (__builtin_expect(g_stats_on, 0)) g_stats.t8_probed++;
                int64_t ml = probe_len(data, cand, i, limit);
                if (ml < 4) continue;
                int64_t sc = lbs * ml - 30 * log2floor(dist);
                if (sc > sr.score) {
                    sr.score = sc; sr.len = ml; sr.dist = dist;
                    sr.wire = ml; sr.isdict = false;
                }
            }
        }
        // dictionary probe only when no good window match exists (the
        // reference gates SearchInStaticDictionary the same way,
        // mod.rs:1979: dict words are <= 24 bytes, so a solid window
        // match always wins)
        dict_probe(i, v4, sr);
        return sr;
    }

    int dict_economy = 7;  // probe while lookups/2^e <= matches
    inline void dict_probe(int64_t i, uint32_t v4, SearchResult& sr) {
        if (!(dict_table && i >= dict_len && sr.len < dict_gate &&
              (dict_lookups >> dict_economy) <= dict_matches))
            return;
        dict_lookups++;
        if (__builtin_expect(g_stats_on, 0)) g_stats.dict_probes++;
        uint32_t hd = (v4 * 0x1E35A7BDu) >> (32 - dict_hash_bits);
        int64_t nslots = std::min(dict_slots, dict_max_slots);
        const uint64_t* prow = dict_pack + hd * dict_slots;
        for (int64_t s = 0; s < nslots; s++) {
            // packed 4-byte gate: one sequential row load rejects a
            // slot without touching word bytes or metadata
            uint64_t pe = prow[s];
            if ((uint32_t)(pe >> 32) != v4 || pe == 0) continue;
            int64_t e = (int64_t)(uint32_t)pe - 1;
            int64_t L = dict_wlen[e];
            const uint8_t* wptr = dict_words + e * 24;
            int64_t avail = std::min<int64_t>(L, n - i);
            // u64 XOR compare (word rows are 24-byte padded; avail
            // <= n - i bounds the data read) — the byte loop ran up
            // to 24 iterations on every probe
            int64_t m = 0;
            while (m + 8 <= avail) {
                uint64_t x = load64(data + i + m) ^ load64(wptr + m);
                if (x) { m += __builtin_ctzll(x) >> 3; break; }
                m += 8;
            }
            if (m + 8 > avail && !(m < avail &&
                                   data[i + m] != wptr[m])) {
                while (m < avail && data[i + m] == wptr[m]) m++;
            }
            if (m < 4) continue;
            int64_t omit = L - m;
            int64_t transform;
            if (omit == 0) transform = 0;
            else if (omit <= 9 && omit_ids[omit] >= 0)
                transform = omit_ids[omit];
            else continue;
            int64_t maxd = std::min<int64_t>(i, window);
            int64_t dist = maxd + 1 +
                (transform << dict_sbits[L]) + dict_widx[e];
            int64_t sc = lbs * m - 30 * log2floor(dist);
            if (sc > sr.score) {
                sr.score = sc; sr.len = m; sr.dist = dist;
                sr.wire = L; sr.isdict = true;
                dict_matches++;
            }
        }
    }

    // ----- basic tier (q2/q3): the reference's H2/H3 BasicHasher
    // shape (mod.rs BasicHasher / google H2: 5-byte hash into a
    // direct-mapped 2^16 table of 1-2 slots, no counters, no
    // precomputed hash pass, last-distance-only cache probe).  The
    // top-K ring machinery costs ~2x the per-position work these
    // tiers want; ring4 doubles as the slot table (value<<32|pos,
    // zero-initialized: a stale/zero entry is just a candidate that
    // probe_len then rejects).
    inline void basic_insert(int64_t i) {
        if (i + (hash_len4 == 5 ? 8 : 4) > n) return;
        uint64_t e = ((uint64_t)load32(data + i) << 32) | (uint32_t)i;
        uint32_t h = bucket_hash(data + i, hash_len4, shift4);
        if (cap4 == 1) {
            ring4[h] = e;
        } else {
            // counter-free recency pair: slot0 = newest, slot1 =
            // previous (a 2-entry move-to-front; recency order is
            // what the position-phase slot picking of the reference's
            // BUCKET_SWEEP gives up, and it costs ~2% ratio here)
            uint64_t* row = ring4 + ((int64_t)h << 1);
            row[1] = row[0];
            row[0] = e;
        }
    }

    inline void basic_insert_upto(int64_t stop) {
        if (__builtin_expect(g_stats_on, 0)) {
            int64_t from = ins_pos;
            uint64_t t0 = rdtsc_now();
            for (int64_t i = ins_pos; i < stop; i++) basic_insert(i);
            if (stop > ins_pos) ins_pos = stop;
            g_stats.inserts += stop > from ? stop - from : 0;
            g_stats.cyc_insert += rdtsc_now() - t0;
            return;
        }
        for (int64_t i = ins_pos; i < stop; i++) basic_insert(i);
        if (stop > ins_pos) ins_pos = stop;
    }

    inline void basic_insert_span(int64_t start, int64_t stop) {
        // dense over the whole body (the reference's basic StoreRange:
        // 1-2-slot buckets can't afford strided gaps), strided only
        // deep inside very long copies
        if (stop - ins_pos <= 512) { basic_insert_upto(stop); return; }
        basic_insert_upto(std::min(start + 256, stop));
        for (int64_t i = ins_pos; i < stop - 128; i += 2)
            basic_insert(i);
        ins_pos = std::max(ins_pos, stop - 128);
        basic_insert_upto(stop);
    }

    SearchResult basic_search(int64_t i, const int64_t* cache,
                              int64_t gate_len = 0) {
        SearchResult sr;
        basic_insert_upto(i);
        if (i + 4 > n) return sr;
        int64_t limit = n - i;
        int64_t gl = std::min(gate_len, limit - 1);
        if (gl < 0) gl = 0;
        uint32_t v4 = load32(data + i);
        // last-distance probe (BasicHasher checks one cache slot)
        {
            int64_t d = cache[0];
            if (d > 0 && d <= i && d <= window &&
                load32(data + i - d) == v4) {
                if (__builtin_expect(g_stats_on, 0))
                    g_stats.cache_probes++;
                int64_t ml = probe_len(data, i - d, i, limit);
                if (ml >= 4) {
                    sr.score = lbs * ml + 15;
                    sr.len = ml; sr.dist = d; sr.wire = ml;
                }
            }
        }
        if (i + (hash_len4 == 5 ? 8 : 4) <= n) {
            uint32_t h = bucket_hash(data + i, hash_len4, shift4);
            uint64_t* row = ring4 + (int64_t)h * cap4;
            if (__builtin_expect(g_stats_on, 0))
                g_stats.t4_scanned += cap4;
            for (int64_t s = 0; s < cap4; s++) {
                uint64_t e = row[s];
                int64_t cand = (int64_t)(uint32_t)e;
                int64_t dist = i - cand;
                if (dist <= 0) continue;
                if (dist > window) break;  // slots are recency-ordered
                if ((uint32_t)(e >> 32) != v4) continue;
                int64_t g = sr.len > gl ? sr.len : gl;
                if (g > 0 && (g >= limit ||
                    data[cand + g] != data[i + g])) continue;
                if (__builtin_expect(g_stats_on, 0)) g_stats.t4_probed++;
                int64_t ml = probe_len(data, cand, i, limit);
                if (ml < 4) continue;
                int64_t sc = lbs * ml - 30 * log2floor(dist);
                if (sc > sr.score) {
                    sr.score = sc; sr.len = ml; sr.dist = dist;
                    sr.wire = ml; sr.isdict = false;
                }
            }
            // insert this position with the hash already in hand (the
            // probe ran on the pre-insert table, so candidates stay
            // strictly before i); later insert_upto calls skip it via
            // ins_pos — one hash computation per position instead of
            // two (the reference's H2 search/store share the hash the
            // same way)
            uint64_t e = ((uint64_t)v4 << 32) | (uint32_t)i;
            if (cap4 == 1) {
                row[0] = e;
            } else {
                row[1] = row[0];
                row[0] = e;
            }
            if (ins_pos == i) ins_pos = i + 1;
        }
        dict_probe(i, v4, sr);
        return sr;
    }
};

}  // namespace

namespace {

// a whole-compress parse session: tables + hash buffers + walk state.
// Owned buffers (not thread_local) so begin() and next() may run on
// different threads; a one-deep global pool recycles the ~17MB of
// scratch across compress calls.
// live parse sessions: with several concurrent (CompressMulti
// workers) the per-call h8 helper thread oversubscribes the cores —
// hash inline instead
std::atomic<int> g_active_sessions{0};

struct ParseSession {
    CombinedCtx cx;
    std::vector<uint64_t> ring4, ring8;   // wide mode + basic tier
    std::vector<uint32_t> ring4s, ring8s; // compact (tag) mode
    std::vector<uint16_t> cnt4, cnt8;
    std::vector<uint32_t> h4, h8;
    int64_t cache[4] = {0, 0, 0, 0};
    int64_t pos = 0, insert_start = 0;   // absolute walk state
    int64_t hash_end = 0;                // hashes cover [cx.hash_base,
                                         // hash_end)
    int hash_len = 4;
    // preallocated-arena mode (session buffers carved from a caller
    // arena; ensure_hashes must stay within h_cap and inline)
    bool arena_mode = false;
    uint32_t* h4_p = nullptr;
    uint32_t* h8_p = nullptr;
    int64_t h_cap = 0;

    // slide the hash window to cover [from, to): recompute the two
    // bucket-id passes over just that span (each position is hashed
    // once across the whole parse; scratch stays O(metablock), not
    // O(input)).  The 8-byte pass runs on a helper thread — this is
    // the serial head of each metablock's parse.
    void ensure_hashes(int64_t from, int64_t to) {
        CombinedCtx& c = cx;
        if (c.basic) return;  // basic tier hashes inline, no scratch
        if (c.hash_base <= from && to <= hash_end) return;
        int64_t span = to - from;
        // arena mode: the caller carved h_cap entries (one metablock
        // span + generous slack — ins_pos lags the boundary by at
        // most a few positions).  Clamp the WRITE bound defensively:
        // an over-span fill must never scribble past the carve into
        // the neighboring arena buffers (a clamped tail would only
        // yield stale hashes, and every ring candidate is
        // byte-verified downstream).
        int64_t to_w = to;
        uint32_t* h4buf;
        if (arena_mode) {
            if (span > h_cap) to_w = from + h_cap;
            h4buf = h4_p;
        } else {
            if ((int64_t)h4.size() < span) h4.resize(span);
            h4buf = h4.data();
        }
        uint32_t* h8buf = nullptr;
        std::thread h8_thread;
        bool h8_inline = arena_mode || g_active_sessions.load(
            std::memory_order_relaxed) > 1;
        if (c.k8) {
            if (arena_mode) {
                h8buf = h8_p;
            } else {
                if ((int64_t)h8.size() < span) h8.resize(span);
                h8buf = h8.data();
            }
            const uint8_t* data = c.data;
            int64_t n = c.n;
            uint32_t shift8 = c.shift8;
            auto h8_fill = [=] {
                // exclusive end, capped at `to_w`: the buffer holds
                // exactly to-from entries (an inclusive bound wrote
                // one past the end whenever the boundary sat >= 8
                // bytes before the input end — heap corruption under
                // CompressMulti's allocation pattern)
                int64_t e8 = std::min(to_w, n - 8 + 1);
                for (int64_t i = from; i < e8; i++)
                    h8buf[i - from] = (uint32_t)(
                        (load64(data + i) * 0x1FE35A7BD3579BD3ull)
                        >> shift8);
                for (int64_t i = std::max(from, e8); i < to_w; i++)
                    h8buf[i - from] = 0;
            };
            if (h8_inline) h8_fill();
            else h8_thread = std::thread(h8_fill);
        }
        {
            int64_t e4 = std::min(to_w,
                                  c.n - (hash_len == 5 ? 8 : 4) + 1);
            for (int64_t i = from; i < e4; i++)
                h4buf[i - from] = bucket_hash(c.data + i, hash_len,
                                              c.shift4);
            // tail positions hash into bucket 0 (harmless: min match
            // length 4 gates real use)
            for (int64_t i = std::max(from, e4); i < to_w; i++)
                h4buf[i - from] = 0;
        }
        if (h8_thread.joinable()) h8_thread.join();
        c.H4 = h4buf;
        c.H8 = h8buf;
        c.hash_base = from;
        c.hash_limit = to;
        hash_end = to;
    }
};

std::mutex g_sess_mtx;
// two-deep spare pool: the dual-session parse holds two sessions per
// compress call, and a one-deep pool made the second a fresh ~17MB
// allocation (page re-faults) every call
ParseSession* g_sess_spares[2] = {nullptr, nullptr};

// caller-provided session arena (the preallocated no-alloc encode
// mode): while set on this thread, parse_session_begin carves every
// session buffer from it instead of the heap-backed pool, and
// parse_session_end releases nothing.  The caller guarantees the
// arena outlives the session.
struct SessArena {
    uint8_t* base = nullptr;
    int64_t size = 0, used = 0;
    bool fail = false;
};
static thread_local SessArena g_sess_arena;

template <typename T>
static T* sess_arena_carve(int64_t count) {
    SessArena& a = g_sess_arena;
    int64_t off = (a.used + 63) & ~int64_t(63);
    int64_t bytes = count * (int64_t)sizeof(T);
    if (!a.base || off + bytes > a.size) {
        a.fail = true;
        return nullptr;
    }
    a.used = off + bytes;
    return reinterpret_cast<T*>(a.base + off);
}

ParseSession* session_pool_get() {
    g_active_sessions.fetch_add(1, std::memory_order_relaxed);
    if (g_sess_arena.base) {
        void* mem = sess_arena_carve<ParseSession>(1);
        if (!mem) {
            g_active_sessions.fetch_sub(1, std::memory_order_relaxed);
            return nullptr;
        }
        ParseSession* s = new (mem) ParseSession();
        s->arena_mode = true;
        return s;
    }
    std::lock_guard<std::mutex> lk(g_sess_mtx);
    for (auto& sp : g_sess_spares) {
        if (sp) {
            ParseSession* s = sp;
            sp = nullptr;
            return s;
        }
    }
    return new ParseSession();
}

void session_pool_put(ParseSession* s) {
    g_active_sessions.fetch_sub(1, std::memory_order_relaxed);
    if (s->arena_mode) return;  // arena-backed: caller owns the bytes
    std::lock_guard<std::mutex> lk(g_sess_mtx);
    for (auto& sp : g_sess_spares) {
        if (!sp) {
            sp = s;
            return;
        }
    }
    delete s;
}

}  // namespace

extern "C" {

void parse_stats_enable(int64_t on) { g_stats_on = on != 0; }

// copy out the 11 counters and reset (positions, cache_probes,
// t4_scanned, t4_probed, t8_scanned, t8_probed, dict_probes, inserts,
// cyc_search, cyc_insert, cyc_hash)
void parse_stats_read(int64_t* out) {
    ParseStats& s = g_stats;
    out[0] = s.positions; out[1] = s.cache_probes;
    out[2] = s.t4_scanned; out[3] = s.t4_probed;
    out[4] = s.t8_scanned; out[5] = s.t8_probed;
    out[6] = s.dict_probes; out[7] = s.inserts;
    out[8] = (int64_t)s.cyc_search; out[9] = (int64_t)s.cyc_insert;
    out[10] = (int64_t)s.cyc_hash;
    s = ParseStats{};
}

// Parse-session form of the one-pass search+parse: begin() builds the
// tables and hashes the whole buffer once; next() parses up to one
// boundary and returns its commands; state (tables, distance cache,
// walk position) persists between calls, so per-metablock delivery is
// byte-identical to a single whole-input parse.  This is what lets the
// encoder overlap parse(metablock g+1) with serialization(g) on two
// threads.  combined_parse_native() below remains the one-shot form,
// now a thin loop over a session.
int64_t parse_session_next(void* vs, int64_t boundary_rel,
                           int64_t* out_insert, int64_t* out_copy,
                           int64_t* out_dist, int64_t* out_adv,
                           int64_t max_cmds)
{
    ParseSession& S = *(ParseSession*)vs;
    CombinedCtx& cx = S.cx;
    const uint8_t* data = cx.data;
    int64_t window_size = cx.window;
    int64_t boundary = cx.dict_len + boundary_rel;  // absolute
    uint64_t t_hash0 = g_stats_on ? rdtsc_now() : 0;
    S.ensure_hashes(std::min(cx.ins_pos, S.pos), boundary);
    if (g_stats_on) g_stats.cyc_hash += rdtsc_now() - t_hash0;
    int64_t n_out = 0;
    int64_t misses = 0;
    int64_t pos = S.pos;
    int64_t insert_start = S.insert_start;
    int64_t* cache = S.cache;
    int64_t seg_start_count = 0;
    static const int kMaxDefers =
        getenv("BROTLI_TPU_DEFERS") ? atoi(getenv("BROTLI_TPU_DEFERS"))
                                    : 4;
    static const int64_t kSkip1 =
        getenv("BROTLI_TPU_SKIP1") ? atoll(getenv("BROTLI_TPU_SKIP1"))
                                   : 64;
    static const int64_t kSkip2 =
        getenv("BROTLI_TPU_SKIP2") ? atoll(getenv("BROTLI_TPU_SKIP2"))
                                   : 512;
    while (pos + 2 <= boundary) {
        SearchResult sr = cx.search(pos, cache);
        if (sr.score <= 100) {
            // sparse skip over incompressible spreads
            // (LiteralSpreeLengthForSparseSearch, mod.rs:150); deep
            // into a spree the skipped positions are not inserted
            // either — the reference advances without storing them
            int64_t step = 1;
            if (misses > kSkip2) step = 4;
            else if (misses > kSkip1) step = 2;
            misses++;
            pos += step;
            if (step > 1 && cx.ins_pos < pos) cx.ins_pos = pos;
            continue;
        }
        // lazy matching: defer up to 4 times (skipped after a long
        // match at speed tiers — a one-later restart can't beat it by
        // the 175 margin often enough to pay for the search)
        int defers = 0;
        while (sr.len < cx.lazy_gate && defers < kMaxDefers &&
               pos + 1 + 4 <= boundary) {
            // no length gate on the lazy re-search: a same-length
            // nearer candidate can legally clear the +175 margin
            // (measured: gating on sr.len costs 0.6% size at q5)
            SearchResult sr2 = cx.search(pos + 1, cache);
            if (sr2.score > sr.score + 175) {
                pos++; sr = sr2; defers++;
            } else break;
        }
        misses = 0;
        int64_t l = sr.len;
        if (pos + l > boundary) {
            if (sr.isdict) { pos++; continue; }
            l = boundary - pos;
            sr.wire = l;
            if (l < 2) { pos++; continue; }
        }
        if (n_out < max_cmds) {
            out_insert[n_out] = pos - insert_start;
            out_copy[n_out] = sr.wire;
            out_dist[n_out] = sr.dist;
            out_adv[n_out] = l;
            n_out++;
        }
        int64_t max_distance = std::min(pos, window_size);
        if (sr.dist <= max_distance && sr.dist != cache[0]) {
            cache[3] = cache[2]; cache[2] = cache[1];
            cache[1] = cache[0]; cache[0] = sr.dist;
        }
        cx.insert_span(pos, std::min(pos + l, cx.n));
        pos += l;
        insert_start = pos;
    }
    if (boundary > insert_start || n_out == seg_start_count) {
        if (n_out < max_cmds) {
            out_insert[n_out] = boundary - insert_start;
            out_copy[n_out] = 0;
            out_dist[n_out] = 0;
            out_adv[n_out] = 0;
            n_out++;
        }
    }
    insert_start = boundary;
    if (pos < boundary) pos = boundary;
    S.pos = pos;
    S.insert_start = insert_start;
    return n_out;
}

// advance a session over [its position, boundary) by INSERTING every
// position without searching or emitting.  The ring state then
// approximates a parsed span's state (the parse strides long-match
// interiors and skips deep-spree inserts; the dense prime keeps the
// same recency order, so candidates differ only where those
// economies dropped entries).  Lets a second session pick up
// alternate half-metablocks at ~30% of the parse cost (the
// dual-session parse in encoder._dual_parse_segments).
void parse_session_prime(void* vs, int64_t boundary_rel)
{
    ParseSession& S = *(ParseSession*)vs;
    CombinedCtx& cx = S.cx;
    int64_t boundary = cx.dict_len + boundary_rel;
    if (boundary <= S.pos) return;
    if (cx.basic) {
        // basic tier (q2/q3) hashes inline without the scratch pass
        cx.basic_insert_span(cx.ins_pos, boundary);
        if (cx.ins_pos < boundary) cx.ins_pos = boundary;
    } else {
        S.ensure_hashes(std::min(cx.ins_pos, S.pos), boundary);
        cx.insert_upto(boundary);
    }
    S.pos = boundary;
    S.insert_start = boundary;
}

void* parse_session_begin(
    const uint8_t* data, int64_t total_len, int64_t dict_len,
    int64_t window_size, int64_t k, int64_t bucket_bits,
    int64_t k8, int64_t bucket_bits8, int64_t hash_len,
    int64_t n_cache, int64_t lbs,
    const int64_t* dict_table, int64_t dict_hash_bits,
    int64_t dict_slots, const uint8_t* dict_words_flat,
    const int64_t* dict_word_len, const int64_t* dict_word_idx,
    const int64_t* dict_size_bits, const int64_t* omit_ids,
    int64_t pos0, const int64_t* initial_cache)
{
    ParseSession* Sp = session_pool_get();
    if (!Sp) return nullptr;  // arena exhausted
    ParseSession& S = *Sp;
    CombinedCtx& cx = S.cx;
    cx = CombinedCtx{};
    cx.data = data; cx.n = total_len; cx.dict_len = dict_len;
    cx.window = window_size; cx.k = k; cx.k8 = k8; cx.lbs = lbs;
    cx.n_cache = std::max<int64_t>(1, std::min<int64_t>(n_cache, 16));
    cx.shift4 = (uint32_t)(32 - bucket_bits);
    cx.shift8 = (uint32_t)(64 - bucket_bits8);
    auto pow2 = [](int64_t v) {
        int64_t p = 1;
        while (p < v) p <<= 1;
        return p;
    };
    cx.cap4 = pow2(k);
    cx.mask4 = cx.cap4 - 1;
    cx.cap8 = k8 ? pow2(k8) : 1;
    cx.mask8 = cx.cap8 - 1;
    int64_t nb4 = int64_t(1) << bucket_bits;
    int64_t nb8 = int64_t(1) << bucket_bits8;
    // session-owned scratch, recycled through a one-deep global pool:
    // reallocating ~17MB of tables per compress call costs more in
    // page faults than the parse saves in cache warmth
    auto fit = [&](auto& v, int64_t need) {
        using VT = typename std::decay_t<decltype(v)>::value_type;
        if (S.arena_mode) return sess_arena_carve<VT>(need);
        if ((int64_t)v.size() < need) v.resize(need);
        return v.data();
    };
    // q2/q3 basic tier: direct-mapped slots, no counters, inline
    // 5-byte hashing (the reference's H2/H3 BasicHasher geometry)
    cx.basic = (k8 == 0 && k <= 2 && cx.n_cache <= 1);
    // basic tier probes the dictionary only when the window search
    // found nothing at all (the reference's BasicHasher dictionary
    // condition); the ring tiers use the len<10 gate
    if (cx.basic) cx.dict_gate = 4;
    cx.dict_max_slots = cx.basic ? 2 : (cx.n_cache <= 4 ? 4 : 64);
    // probe economy env-overridable for A/B (default = the
    // reference's 1-in-128, mod.rs:1942; affordable now that the
    // packed 4-byte gate rejects most probes on one row load)
    if (const char* e = getenv("BROTLI_TPU_DICT_ECON"))
        cx.dict_economy = atoi(e);
    if (dict_table)
        cx.dict_pack = dict_packed_gate(dict_table, dict_hash_bits,
                                        dict_slots, dict_words_flat);
    // compact (u32 tag) rings when every in-window distance fits 24
    // bits; the basic tier keeps u64 slots (empty-slot semantics)
    cx.small_ring = !cx.basic && window_size < (int64_t(1) << 24)
        && !getenv("BROTLI_TPU_WIDE_RING");
    if (cx.small_ring) {
        cx.r4 = fit(S.ring4s, nb4 * cx.cap4);
        cx.r8 = k8 ? fit(S.ring8s, nb8 * cx.cap8) : nullptr;
        cx.row4_bytes = cx.cap4 * 4;
        cx.row8_bytes = cx.cap8 * 4;
    } else {
        cx.ring4 = fit(S.ring4, nb4 * cx.cap4);
        cx.ring8 = k8 ? fit(S.ring8, nb8 * cx.cap8) : nullptr;
        cx.row4_bytes = cx.cap4 * 8;
        cx.row8_bytes = cx.cap8 * 8;
    }
    cx.cnt4 = fit(S.cnt4, nb4);
    cx.cnt8 = k8 ? fit(S.cnt8, nb8) : nullptr;
    if (S.arena_mode && g_sess_arena.fail) {
        // undersized caller arena: fail cleanly before any memset
        // touches a null carve (the public prealloc entry validates
        // sizes, so this is belt-and-suspenders)
        g_active_sessions.fetch_sub(1, std::memory_order_relaxed);
        return nullptr;
    }
    std::memset(cx.cnt4, 0, nb4 * sizeof(uint16_t));
    if (cx.basic)
        std::memset(cx.ring4, 0, nb4 * cx.cap4 * sizeof(uint64_t));
    if (k8) std::memset(cx.cnt8, 0, nb8 * sizeof(uint16_t));
    // bucket ids are computed per metablock by ensure_hashes (a
    // sliding window over [ins_pos, boundary)) — hash scratch stays
    // O(metablock), not O(input)
    cx.hash_len4 = (int)hash_len;
    S.hash_len = (int)hash_len;
    cx.hash_base = 0;
    S.hash_end = 0;
    cx.dict_table = dict_table;
    cx.dict_hash_bits = dict_hash_bits;
    cx.dict_slots = dict_slots;
    cx.dict_words = dict_words_flat;
    cx.dict_wlen = dict_word_len;
    cx.dict_widx = dict_word_idx;
    cx.dict_sbits = dict_size_bits;
    cx.omit_ids = omit_ids;

    // sparse prefix hashing (shared-shard compression installs the
    // whole preceding input as an LZ77 dictionary): full density for
    // the last 256KB, every 3rd position to 1MB back, every 8th
    // farther — long-range matches are long, so a strided table still
    // finds them via extension, and prefix hashing stops being the
    // critical path of the LAST shard in CompressMulti (its prefix is
    // the whole preceding input)
    if (dict_len > (1 << 20)) {
        int64_t dense_from = dict_len - (1 << 20);
        int64_t mid_from = std::max<int64_t>(0, dict_len - (4 << 20));
        if (cx.basic) {
            for (int64_t i = 0; i < mid_from; i += 8)
                cx.basic_insert(i);
            for (int64_t i = mid_from; i < dense_from; i += 2)
                cx.basic_insert(i);
        } else {
            // prefetch the ring row 4 strides ahead: priming is one
            // random RFO per position, and this loop is the serial
            // head of every CompressMulti shard
            const uint8_t* d = cx.data;
            auto pf = [&](int64_t p) {
                if (p + 8 <= cx.n)
                    __builtin_prefetch(
                        cx.base4() + (int64_t)bucket_hash(
                            d + p, cx.hash_len4, cx.shift4)
                            * cx.row4_bytes, 1, 1);
            };
            for (int64_t i = 0; i < mid_from; i += 8) {
                pf(i + 32);
                cx.insert_one_inline(i);
            }
            for (int64_t i = mid_from; i < dense_from; i += 2) {
                pf(i + 8);
                cx.insert_one_inline(i);
            }
        }
        cx.ins_pos = dense_from;
    }

    for (int c = 0; c < 4; c++) S.cache[c] = initial_cache[c];
    S.pos = dict_len + pos0;
    S.insert_start = dict_len + pos0;
    if (const char* g = std::getenv("BROTLI_TPU_LAZY_GATE"))
        cx.lazy_gate = std::atoll(g);
    if (const char* g = std::getenv("BROTLI_TPU_DICT_GATE"))
        cx.dict_gate = std::atoll(g);
    return Sp;
}

void parse_session_cache(void* vs, int64_t* out_cache) {
    ParseSession& S = *(ParseSession*)vs;
    for (int c = 0; c < 4; c++) out_cache[c] = S.cache[c];
}

// extend a live session with appended input (the streaming encoder's
// persistent session: one session spans many PROCESS chunks, so match
// context carries across chunk boundaries exactly like one-shot).
// `data` may be a new base pointer (caller-side realloc) but bytes
// [0, old_total) must be unchanged.  Tail positions within 8 bytes of
// the old end were hashed with the zero fallback; rolling hash
// coverage back past them makes the next ensure_hashes() recompute
// their real buckets from the appended bytes.
void parse_session_extend(void* vs, const uint8_t* data,
                          int64_t new_total) {
    ParseSession& S = *(ParseSession*)vs;
    int64_t old_n = S.cx.n;
    S.cx.data = data;
    S.cx.n = new_total;
    if (!S.cx.basic && S.hash_end > 0) {
        int64_t keep = std::max(S.cx.hash_base, old_n - 8);
        if (S.hash_end > keep) S.hash_end = keep;
    }
}

// install/clear this thread's session arena (preallocated encode
// mode).  Returns 1 on install; the arena must outlive every session
// begun while it is set.
void parse_session_set_arena(uint8_t* base, int64_t size) {
    g_sess_arena.base = base;
    g_sess_arena.size = size;
    g_sess_arena.used = 0;
    g_sess_arena.fail = false;
}

int64_t parse_session_arena_failed(void) {
    return g_sess_arena.fail ? 1 : 0;
}

// carve raw bytes from this thread's session arena (the prealloc
// drivers' command/staging buffers share the caller's arena)
uint8_t* parse_session_arena_carve(int64_t bytes) {
    return sess_arena_carve<uint8_t>(bytes);
}

// carve the hash scratch for an arena-mode session (max metablock
// span + slack); must run before the first parse_session_next
int64_t parse_session_prealloc_hashes(void* vs, int64_t max_span) {
    ParseSession& S = *(ParseSession*)vs;
    if (!S.arena_mode) return 0;
    S.h4_p = sess_arena_carve<uint32_t>(max_span);
    S.h8_p = S.cx.k8 ? sess_arena_carve<uint32_t>(max_span)
                     : S.h4_p;
    S.h_cap = max_span;
    return (S.h4_p && S.h8_p) ? 0 : -1;
}

void parse_session_end(void* vs) {
    session_pool_put((ParseSession*)vs);
}

int64_t combined_parse_native(
    const uint8_t* data, int64_t total_len, int64_t dict_len,
    int64_t window_size, int64_t k, int64_t bucket_bits,
    int64_t k8, int64_t bucket_bits8, int64_t hash_len,
    int64_t n_cache, int64_t lbs,
    const int64_t* dict_table, int64_t dict_hash_bits,
    int64_t dict_slots, const uint8_t* dict_words_flat,
    const int64_t* dict_word_len, const int64_t* dict_word_idx,
    const int64_t* dict_size_bits, const int64_t* omit_ids,
    const int64_t* boundaries, int64_t n_boundaries, int64_t pos0,
    const int64_t* initial_cache,
    int64_t* out_insert, int64_t* out_copy, int64_t* out_dist,
    int64_t* out_adv, int64_t* out_seg_counts, int64_t max_cmds)
{
    void* sess = parse_session_begin(
        data, total_len, dict_len, window_size, k, bucket_bits, k8,
        bucket_bits8, hash_len, n_cache, lbs, dict_table,
        dict_hash_bits, dict_slots, dict_words_flat, dict_word_len,
        dict_word_idx, dict_size_bits, omit_ids, pos0, initial_cache);
    int64_t n_out = 0;
    for (int64_t bi = 0; bi < n_boundaries; bi++) {
        int64_t cnt = parse_session_next(
            sess, boundaries[bi], out_insert + n_out, out_copy + n_out,
            out_dist + n_out, out_adv + n_out, max_cmds - n_out);
        out_seg_counts[bi] = cnt;
        n_out += cnt;
    }
    parse_session_end(sess);
    return n_out;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Zopfli backtrack: cheapest stream close + path walk (the native form
// of encode/zopfli.py _finish_parse; reference
// ComputeShortestPathFromNodes, hq.rs:840)
// ---------------------------------------------------------------------------

extern "C" int64_t zopfli_backtrack_native(
    int64_t n, const double* lcp, const double* cost,
    const int64_t* prev_start, const int64_t* prev_len,
    const int64_t* prev_wire, const int64_t* prev_dist,
    int64_t* out_ins, int64_t* out_cps, int64_t* out_dst,
    int64_t* out_adv)
{
    double best_adj = 1e300;
    int64_t best_u = 0;
    for (int64_t u = 0; u < n; u++) {
        if (cost[u] < 1e29) {
            double a = cost[u] - lcp[u];
            if (a < best_adj) { best_adj = a; best_u = u; }
        }
    }
    int64_t cnt = 0;
    int64_t pos = n;
    double end_from_u = best_adj + lcp[n];
    if (cost[n] >= 1e29 || end_from_u < cost[n]) {
        out_ins[cnt] = n - best_u;
        out_cps[cnt] = 0;
        out_dst[cnt] = 0;
        out_adv[cnt] = 0;
        cnt++;
        pos = best_u;
    }
    while (pos > 0) {
        int64_t u = prev_start[pos];
        int64_t l = prev_len[pos];
        out_ins[cnt] = pos - l - u;
        out_cps[cnt] = prev_wire[pos];
        out_dst[cnt] = prev_dist[pos];
        out_adv[cnt] = l;
        cnt++;
        pos = u;
    }
    // reverse in place
    for (int64_t i = 0, j = cnt - 1; i < j; i++, j--) {
        std::swap(out_ins[i], out_ins[j]);
        std::swap(out_cps[i], out_cps[j]);
        std::swap(out_dst[i], out_dst[j]);
        std::swap(out_adv[i], out_adv[j]);
    }
    return cnt;
}

// ---------------------------------------------------------------------------
// permutation application for the TPU offload pull loop: the device
// matchers return results in CONTENT-SORTED space (pos_s[j] says which
// position row j belongs to) because the on-chip inversion sort costs
// ~9 ms per 5M rows — applying the permutation here rides under the
// pipeline overlap with the next shard's device work.  pos_s is a
// permutation, so every target index is written exactly once and the
// scatter parallelizes race-free across input ranges (a two-pass
// radix was measured SLOWER than the direct scatter on this host:
// the ~20 MB working set is L3-resident).
// ---------------------------------------------------------------------------

namespace {
template <typename F>
void inv_parallel(int64_t n, F body) {
    int nt = (int)std::thread::hardware_concurrency();
    if (nt > 4) nt = 4;
    if (nt < 2 || n < (1 << 18)) { body(0, n); return; }
    std::vector<std::thread> ts;
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 1; t < nt; t++) {
        int64_t lo = t * chunk;
        if (lo >= n) break;
        ts.emplace_back(body, lo, std::min(n, lo + chunk));
    }
    body(0, std::min(n, chunk));
    for (auto& th : ts) th.join();
}
}  // namespace

extern "C" {

void invert_perm32_native(const int32_t* pos, const int32_t* val,
                          int64_t n, int32_t* out) {
    inv_parallel(n, [=](int64_t lo, int64_t hi) {
        for (int64_t j = lo; j < hi; j++) out[pos[j]] = val[j];
    });
}

// merged inversion for the exact9 two-fold form: apply permutation A,
// then B where B\'s score strictly wins (same tie-break as the device
// merge: upd = score_b > score_a)
void invert_merge32_native(
    const int32_t* pos_a, const int32_t* val_a, const int32_t* sc_a,
    const int32_t* pos_b, const int32_t* val_b, const int32_t* sc_b,
    int64_t n, int32_t* out_val, int32_t* out_sc) {
    inv_parallel(n, [=](int64_t lo, int64_t hi) {
        for (int64_t j = lo; j < hi; j++) {
            int32_t p = pos_a[j];
            out_val[p] = val_a[j];
            out_sc[p] = sc_a[j];
        }
    });
    inv_parallel(n, [=](int64_t lo, int64_t hi) {
        for (int64_t j = lo; j < hi; j++) {
            int32_t p = pos_b[j];
            if (sc_b[j] > out_sc[p]) out_val[p] = val_b[j];
        }
    });
}

}  // extern "C"
