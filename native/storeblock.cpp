// Native metablock planner + serializer: the encoder's entropy-coding
// backend (block splitting, context clustering, depth-limited Huffman,
// prefix-code / context-map / command-stream serialization).
//
// Port of the Python pipeline in brotli_tpu/encode/metablock.py +
// bitstream.py + core/huffman.py + core/prefix.py — those modules are
// the tested oracle; this path must produce a stream the same decoders
// accept with near-identical size (bit-exactness is not required by the
// format and float tie-breaks may differ).  Reference analogs:
// BrotliBuildMetaBlock (src/enc/metablock.rs:133), store_meta_block
// (src/enc/brotli_bit_stream.rs:2035), BrotliCreateHuffmanTree
// (src/enc/entropy_encode.rs:133).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>
#include <thread>
#include <queue>
#include <chrono>
#include <cstdio>
#include <cstdlib>

namespace sb {

// ---------------------------------------------------------------------------
// bit writer
// ---------------------------------------------------------------------------

struct BW {
    uint64_t* w;
    int64_t cap_bits;
    int64_t pos = 0;
    bool overflow = false;
    void put(uint64_t bits, int nb) {
        if (nb == 0) return;
        if (pos + nb > cap_bits) { overflow = true; return; }
        bits &= (nb >= 64) ? ~0ull : ((1ull << nb) - 1);
        int64_t word = pos >> 6, off = pos & 63;
        w[word] |= bits << off;
        if (off + nb > 64) w[word + 1] |= bits >> (64 - off);
        pos += nb;
    }
};

// ---------------------------------------------------------------------------
// static tables (same formulas as core/constants.py)
// ---------------------------------------------------------------------------

struct Tables {
    int64_t ins_extra[24], ins_base[24];
    int64_t copy_extra[24], copy_base[24];
    int64_t blk_extra[26], blk_base[26];
    int16_t cmd_ins_code[704], cmd_copy_code[704];
    uint8_t cmd_implicit[704];
    uint8_t clcode_bits[8];
    int8_t clcode_nbits[8];
    int8_t cl_order[18];
    bool ready = false;
};
static Tables T;

static void init_tables() {
    if (T.ready) return;
    static const int64_t ie[24] = {0,0,0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,7,
                                   8,9,10,12,14,24};
    static const int64_t ce[24] = {0,0,0,0,0,0,0,0,1,1,2,2,3,3,4,4,5,5,
                                   6,7,8,9,10,24};
    static const int64_t be[26] = {2,2,2,2,3,3,3,3,4,4,4,4,5,5,5,5,6,6,
                                   7,8,9,10,11,12,13,24};
    int64_t acc = 0;
    for (int i = 0; i < 24; i++) {
        T.ins_extra[i] = ie[i];
        T.ins_base[i] = acc;
        acc += int64_t(1) << ie[i];
    }
    acc = 2;
    for (int i = 0; i < 24; i++) {
        T.copy_extra[i] = ce[i];
        T.copy_base[i] = acc;
        acc += int64_t(1) << ce[i];
    }
    acc = 1;
    for (int i = 0; i < 26; i++) {
        T.blk_extra[i] = be[i];
        T.blk_base[i] = acc;
        acc += int64_t(1) << be[i];
    }
    // command symbol layout (RFC 5; constants.py _CELLS): 11 cells of
    // 64; cells 0-1 imply distance code 0
    static const int cell_ins[11] = {0, 0, 0, 0, 8, 8, 0, 16, 8, 16, 16};
    static const int cell_copy[11] = {0, 8, 0, 8, 0, 8, 16, 0, 16, 8, 16};
    for (int cell = 0; cell < 11; cell++) {
        for (int i = 0; i < 64; i++) {
            int idx = cell * 64 + i;
            T.cmd_ins_code[idx] = (int16_t)(cell_ins[cell] + ((i >> 3) & 7));
            T.cmd_copy_code[idx] = (int16_t)(cell_copy[cell] + (i & 7));
            T.cmd_implicit[idx] = (cell < 2) ? 1 : 0;
        }
    }
    static const uint8_t clb[8] = {0b00, 0b0111, 0b011, 0b10, 0b01,
                                   0b1111, 0, 0};
    static const int8_t cln[8] = {2, 4, 3, 2, 2, 4, 0, 0};
    static const int8_t ord[18] = {1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9,
                                   10, 11, 12, 13, 14, 15};
    std::memcpy(T.clcode_bits, clb, 8);
    std::memcpy(T.clcode_nbits, cln, 8);
    std::memcpy(T.cl_order, ord, 18);
    T.ready = true;
}

static inline int ins_code_of(int64_t il) {
    int lo = 0, hi = 23;
    while (lo < hi) {
        int mid = (lo + hi + 1) >> 1;
        if (T.ins_base[mid] <= il) lo = mid; else hi = mid - 1;
    }
    return lo;
}
static inline int copy_code_of(int64_t cl) {
    int lo = 0, hi = 23;
    while (lo < hi) {
        int mid = (lo + hi + 1) >> 1;
        if (T.copy_base[mid] <= cl) lo = mid; else hi = mid - 1;
    }
    return lo;
}
static inline int blk_code_of(int64_t bl) {
    int lo = 0, hi = 25;
    while (lo < hi) {
        int mid = (lo + hi + 1) >> 1;
        if (T.blk_base[mid] <= bl) lo = mid; else hi = mid - 1;
    }
    return lo;
}

// ---------------------------------------------------------------------------
// huffman: depth-limited lengths + canonical codes
// (core/huffman.py / core/prefix.py port)
// ---------------------------------------------------------------------------

static void huffman_depths(const int64_t* counts, int n, uint8_t* depths) {
    // two-queue linear Huffman build over (count, id)-sorted leaves.
    // Pop order is EXACTLY the old min-heap of (count, id) tuples:
    // the leaf queue is sorted ascending, and internal nodes are
    // created with non-decreasing counts and increasing ids >= n, so
    // both queues stay (count, id)-sorted and a two-front min is the
    // global min.  Output is bit-identical; the heap's allocator
    // traffic (this was ~9% of a q5 encode) is gone.
    using P = std::pair<int64_t, int64_t>;
    P leaves_buf[720];
    std::vector<P> leaves_dyn;
    P* leaves = n <= 720 ? leaves_buf : (leaves_dyn.resize(n),
                                         leaves_dyn.data());
    int m = 0;
    for (int s = 0; s < n; s++)
        if (counts[s] > 0) leaves[m++] = {counts[s], s};
    std::sort(leaves, leaves + m);
    if (m == 0) { std::memset(depths, 0, n); return; }
    if (m == 1) {
        std::memset(depths, 0, n);
        return;
    }
    // parent[] indexed by id; internal ids n..n+m-2, root = n+m-2
    int64_t nid = n + m - 1;
    int64_t parent_buf[1440];
    std::vector<int64_t> parent_dyn;
    int64_t* parent = nid <= 1440 ? parent_buf
        : (parent_dyn.resize(nid), parent_dyn.data());
    // internal queue: (count, id) in creation order == sorted order
    P internals_buf[720];
    std::vector<P> internals_dyn;
    P* internals = m <= 720 ? internals_buf
        : (internals_dyn.resize(m), internals_dyn.data());
    size_t li = 0, ii = 0, ni = 0;
    int64_t next_id = n;
    auto pop_min = [&]() -> P {
        if (li < (size_t)m && (ii >= ni || leaves[li] < internals[ii]))
            return leaves[li++];
        return internals[ii++];
    };
    int64_t total = m;  // nodes remaining across both queues
    while (total > 1) {
        P a = pop_min();
        P b = pop_min();
        parent[a.second] = next_id;
        parent[b.second] = next_id;
        internals[ni++] = {a.first + b.first, next_id};
        next_id++;
        total--;
    }
    // children have smaller ids than their parent, so one descending
    // pass over the INTERNAL ids assigns every internal depth; leaves
    // read theirs from their parent
    int depth_buf[720];
    std::vector<int> depth_dyn;
    int* idepth = (m - 1) <= 720 ? depth_buf
        : (depth_dyn.resize(m - 1), depth_dyn.data());
    idepth[next_id - 1 - n] = 0;  // root
    for (int64_t v = next_id - 2; v >= n; v--)
        idepth[v - n] = idepth[parent[v] - n] + 1;
    for (int s = 0; s < n; s++)
        depths[s] = counts[s] > 0
            ? (uint8_t)(idepth[parent[s] - n] + 1) : 0;
}

static void huffman_lengths(const int64_t* hist, int n, int max_bits,
                            uint8_t* lengths) {
    int nz = 0, last = -1;
    for (int i = 0; i < n; i++) if (hist[i] > 0) { nz++; last = i; }
    std::memset(lengths, 0, n);
    if (nz == 0) return;            // caller guards (safe-hist)
    if (nz == 1) { lengths[last] = 1; return; }
    static thread_local std::vector<int64_t> counts;
    counts.assign(n, 0);
    int64_t limit = 1;
    for (;;) {
        for (int i = 0; i < n; i++)
            counts[i] = hist[i] > 0 ? std::max(hist[i], limit) : 0;
        huffman_depths(counts.data(), n, lengths);
        int mx = 0;
        for (int i = 0; i < n; i++) mx = std::max(mx, (int)lengths[i]);
        if (mx <= max_bits) return;
        limit *= 2;
    }
}

static void lengths_to_codes(const uint8_t* lengths, int n,
                             uint16_t* codes) {
    int count[17] = {0};
    for (int i = 0; i < n; i++) count[lengths[i]]++;
    count[0] = 0;
    int next_code[17] = {0};
    int code = 0;
    for (int l = 1; l <= 16; l++) {
        code = (code + count[l - 1]) << 1;
        next_code[l] = code;
    }
    for (int i = 0; i < n; i++) {
        int l = lengths[i];
        if (!l) { codes[i] = 0; continue; }
        uint32_t v = next_code[l]++;
        // bit-reverse low l bits
        uint32_t x = v;
        x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555);
        x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333);
        x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F);
        x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF);
        codes[i] = (uint16_t)(x >> (16 - l));
    }
}

// RLE-friendly histogram flattening (core/huffman.py:83 port)
static void optimize_rle(int64_t* counts, int n) {
    int nonzero = 0;
    for (int i = 0; i < n; i++) if (counts[i] != 0) nonzero++;
    if (nonzero < 16) return;
    int length = n;
    while (length && counts[length - 1] == 0) length--;
    if (length == 0) return;
    static thread_local std::vector<int64_t> nzv = [] {
        std::vector<int64_t> v; v.reserve(768); return v; }();
    nzv.clear();
    for (int i = 0; i < length; i++)
        if (counts[i] != 0) nzv.push_back(counts[i]);
    if ((int)nzv.size() < 5) return;
    int64_t mn = nzv[0];
    for (int64_t v : nzv) mn = std::min(mn, v);
    if (mn < 4) {
        int zeros = length - (int)nzv.size();
        if (zeros < 6) {
            for (int i = 1; i + 1 < length; i++)
                if (counts[i - 1] != 0 && counts[i] == 0 &&
                    counts[i + 1] != 0)
                    counts[i] = 1;
        }
    }
    if ((int)nzv.size() < 28) return;

    static thread_local std::vector<uint8_t> good = [] {
        std::vector<uint8_t> v; v.reserve(768); return v; }();
    good.assign(length + 1, 0);
    {
        int i = 0;
        while (i < length) {
            int j = i;
            while (j < length && counts[j] == counts[i]) j++;
            int step = j - i;
            if ((counts[i] == 0 && step >= 5) ||
                (counts[i] != 0 && step >= 7))
                for (int t = i; t < j; t++) good[t] = 1;
            i = j;
        }
    }
    const int64_t streak_limit = 1240;
    int64_t stride = 0, sum = 0;
    int64_t limit = 256 * (counts[0] + counts[1] + counts[2]) / 3 + 420;
    for (int i = 0; i <= length; i++) {
        bool boundary;
        if (i == length) {
            boundary = true;
        } else {
            boundary = good[i] || (i != 0 && good[i - 1]) ||
                       std::llabs(256 * counts[i] - limit) >= streak_limit;
        }
        if (i == length || boundary) {
            if (stride >= 4 || (stride >= 3 && sum == 0)) {
                int64_t count = std::max<int64_t>(
                    1, (sum + stride / 2) / stride);
                if (sum == 0) count = 0;
                for (int t = i - (int)stride; t < i; t++)
                    counts[t] = count;
            }
            stride = 0;
            sum = 0;
            if (i < length - 2) {
                limit = 256 * (counts[i] + counts[i + 1] +
                               counts[i + 2]) / 3 + 420;
            } else if (i < length) {
                limit = 256 * counts[i];
            } else {
                limit = 0;
            }
        }
        stride += 1;
        if (i != length) {
            sum += counts[i];
            if (stride >= 4) limit = (256 * sum + stride / 2) / stride;
        }
    }
}

// ---------------------------------------------------------------------------
// prefix-code serialization (core/prefix.py:238 port)
// ---------------------------------------------------------------------------

static int alphabet_bits(int alphabet) {
    int b = 0, v = alphabet - 1;
    while (v) { b++; v >>= 1; }
    return std::max(1, b);
}

struct Tok { uint8_t sym; uint8_t extra; uint8_t nbits; };

static void rle_encode_lengths(const uint8_t* lengths, int n,
                               std::vector<Tok>& out) {
    int prev_nonzero = 8;
    int i = 0;
    while (i < n) {
        int v = lengths[i];
        int j = i;
        while (j < n && lengths[j] == v) j++;
        int run = j - i;
        if (v == 0) {
            if (j == n) break;  // trailing zeros implicit
            if (run < 3) {
                for (int t = 0; t < run; t++) out.push_back({0, 0, 0});
            } else {
                int reps = run - 3;
                Tok chain[16];
                int nc = 0;
                for (;;) {
                    chain[nc++] = {17, (uint8_t)(reps & 7), 3};
                    reps >>= 3;
                    if (reps == 0) break;
                    reps -= 1;
                }
                for (int t = nc - 1; t >= 0; t--) out.push_back(chain[t]);
            }
        } else {
            int reps = run;
            if (v != prev_nonzero) {
                out.push_back({(uint8_t)v, 0, 0});
                reps -= 1;
            }
            if (reps < 3) {
                for (int t = 0; t < reps; t++)
                    out.push_back({(uint8_t)v, 0, 0});
            } else {
                reps -= 3;
                Tok chain[16];
                int nc = 0;
                for (;;) {
                    chain[nc++] = {16, (uint8_t)(reps & 3), 2};
                    reps >>= 2;
                    if (reps == 0) break;
                    reps -= 1;
                }
                for (int t = nc - 1; t >= 0; t--) out.push_back(chain[t]);
            }
            prev_nonzero = v;
        }
        i = j;
    }
}

static void write_prefix_code(BW& bw, const uint8_t* lengths, int n) {
    int syms[5], nsym = 0;
    for (int i = 0; i < n && nsym <= 4; i++)
        if (lengths[i] > 0) { if (nsym < 5) syms[nsym] = i; nsym++; }
    bool simple = false;
    if (nsym >= 1 && nsym <= 4) {
        int ls[4];
        for (int i = 0; i < nsym; i++) ls[i] = lengths[syms[i]];
        std::sort(ls, ls + nsym);
        simple = (nsym == 1) ||
                 (nsym == 2 && ls[0] == 1 && ls[1] == 1) ||
                 (nsym == 3 && ls[0] == 1 && ls[1] == 2 && ls[2] == 2) ||
                 (nsym == 4 && ((ls[0] == 2 && ls[1] == 2 && ls[2] == 2 &&
                                 ls[3] == 2) ||
                                (ls[0] == 1 && ls[1] == 2 && ls[2] == 3 &&
                                 ls[3] == 3)));
    }
    if (simple) {
        bw.put(1, 2);
        bw.put(nsym - 1, 2);
        int bits = alphabet_bits(n);
        // order by (length, symbol)
        int ord[4];
        for (int i = 0; i < nsym; i++) ord[i] = syms[i];
        std::sort(ord, ord + nsym, [&](int a, int b) {
            if (lengths[a] != lengths[b]) return lengths[a] < lengths[b];
            return a < b;
        });
        for (int i = 0; i < nsym; i++) bw.put(ord[i], bits);
        if (nsym == 4) {
            int ls[4];
            for (int i = 0; i < 4; i++) ls[i] = lengths[syms[i]];
            std::sort(ls, ls + 4);
            bw.put((ls[0] == 1 && ls[1] == 2 && ls[2] == 3 &&
                    ls[3] == 3) ? 1 : 0, 1);
        }
        return;
    }
    // complex
    static thread_local std::vector<Tok> tokens = [] {
        std::vector<Tok> v; v.reserve(1024); return v; }();
    tokens.clear();
    rle_encode_lengths(lengths, n, tokens);
    int64_t hist[18] = {0};
    for (const Tok& t : tokens) hist[t.sym]++;
    uint8_t cl_lengths[18];
    huffman_lengths(hist, 18, 5, cl_lengths);
    int nzc = 0, nzs = -1;
    for (int i = 0; i < 18; i++)
        if (cl_lengths[i]) { nzc++; nzs = i; }
    if (nzc == 1) {
        cl_lengths[nzs] = 1;
        cl_lengths[nzs != 0 ? 0 : 1] = 1;
    }
    uint16_t cl_codes[18];
    lengths_to_codes(cl_lengths, 18, cl_codes);
    int hskip = 0;
    while (hskip < 3 && cl_lengths[T.cl_order[hskip]] == 0) hskip++;
    if (hskip == 1) hskip = 0;
    bw.put(hskip, 2);
    int space = 0;
    for (int k = hskip; k < 18; k++) {
        int l = cl_lengths[T.cl_order[k]];
        bw.put(T.clcode_bits[l], T.clcode_nbits[l]);
        if (l) {
            space += 32 >> l;
            if (space >= 32) break;
        }
    }
    for (const Tok& t : tokens) {
        bw.put(cl_codes[t.sym], cl_lengths[t.sym]);
        if (t.nbits) bw.put(t.extra, t.nbits);
    }
}

// encoding table semantics: single-symbol code emits 0 bits per symbol
struct Enc {
    std::vector<uint16_t> codes;
    std::vector<uint8_t> lens;
    void build(const uint8_t* lengths, int n) {
        codes.assign(n, 0);
        lens.assign(n, 0);
        int nz = 0;
        for (int i = 0; i < n; i++) if (lengths[i]) nz++;
        if (nz <= 1) return;  // zero bits per symbol
        lengths_to_codes(lengths, n, codes.data());
        for (int i = 0; i < n; i++) lens[i] = lengths[i];
    }
};

// ---------------------------------------------------------------------------
// small header helpers
// ---------------------------------------------------------------------------

static void write_mlen(BW& bw, int64_t mlen) {
    int lg = 1;
    if (mlen > 1) {
        lg = 0;
        int64_t v = mlen - 1;
        while (v) { lg++; v >>= 1; }
    }
    int mnibbles = std::max(4, (lg + 3) / 4);
    bw.put(mnibbles - 4, 2);
    bw.put(mlen - 1, mnibbles * 4);
}

static void write_count_code(BW& bw, int v) {
    if (v == 1) { bw.put(0, 1); return; }
    bw.put(1, 1);
    int nbits = 0;
    int x = v - 1;
    while (x >> (nbits + 1)) nbits++;
    bw.put(nbits, 3);
    bw.put(v - 1 - (1 << nbits), nbits);
}

// ---------------------------------------------------------------------------
// context-map serialization (bitstream.py:190 port)
// ---------------------------------------------------------------------------

static void write_context_map(BW& bw, const int64_t* cmap, int n,
                              int ntrees) {
    // forward MTF
    uint8_t mtf[256];
    for (int i = 0; i < 256; i++) mtf[i] = (uint8_t)i;
    std::vector<int> vals(n);
    for (int i = 0; i < n; i++) {
        uint8_t v = (uint8_t)cmap[i];
        int j = 0;
        while (mtf[j] != v) j++;
        vals[i] = j;
        if (j) {
            std::memmove(mtf + 1, mtf, j);
            mtf[0] = v;
        }
    }
    // runs
    int max_run_bits = 0;
    {
        int i = 0;
        while (i < n) {
            if (vals[i] == 0) {
                int j = i;
                while (j < n && vals[j] == 0) j++;
                int r = j - i;
                if (r >= 2) {
                    int lb = 0;
                    while ((1 << (lb + 1)) <= r) lb++;
                    max_run_bits = std::max(max_run_bits, lb);
                }
                i = j;
            } else {
                i++;
            }
        }
    }
    int rlemax = std::min(16, max_run_bits);
    struct CTok { int sym; int extra; int nbits; };
    std::vector<CTok> tokens;
    {
        int i = 0;
        while (i < n) {
            if (vals[i] != 0) {
                tokens.push_back({rlemax + vals[i], 0, 0});
                i++;
                continue;
            }
            int j = i;
            while (j < n && vals[j] == 0) j++;
            int r = j - i;
            while (r > 0) {
                if (r == 1) {
                    tokens.push_back({0, 0, 0});
                    r = 0;
                } else {
                    int s = 0;
                    while ((1 << (s + 1)) <= r) s++;
                    s = std::min(rlemax, s);
                    if (s == 0) {
                        tokens.push_back({0, 0, 0});
                        r -= 1;
                        continue;
                    }
                    int take = std::min(r, (1 << s) + ((1 << s) - 1));
                    tokens.push_back({s, take - (1 << s), s});
                    r -= take;
                }
            }
            i = j;
        }
    }
    int alpha = ntrees + rlemax;
    std::vector<int64_t> hist(alpha, 0);
    for (const CTok& t : tokens) hist[t.sym]++;
    std::vector<uint8_t> lengths(alpha);
    huffman_lengths(hist.data(), alpha, 15, lengths.data());
    if (rlemax) {
        bw.put(1, 1);
        bw.put(rlemax - 1, 4);
    } else {
        bw.put(0, 1);
    }
    write_prefix_code(bw, lengths.data(), alpha);
    Enc enc;
    enc.build(lengths.data(), alpha);
    for (const CTok& t : tokens) {
        bw.put(enc.codes[t.sym], enc.lens[t.sym]);
        if (t.nbits) bw.put(t.extra, t.nbits);
    }
    bw.put(1, 1);  // IMTF
}

// ---------------------------------------------------------------------------
// block splitting (metablock.py:237 port: chunked entropy k-means with
// hysteresis + agglomerative merge)
// ---------------------------------------------------------------------------

struct SplitParams {
    int chunk;
    int max_types;
    double switch_cost;
    int min_run;
    double header_cost;
};
static const SplitParams SP_LIT = {256, 32, 28.1, 3, 320.0};
static const SplitParams SP_CMD = {128, 16, 13.5, 3, 500.0};
static const SplitParams SP_DIST = {128, 8, 14.6, 3, 600.0};
// speed-tier (q < 7) variants: coarser chunks, fewer clusters — the
// reference's q<10 greedy splitter is similarly cheaper than its q11
// iterative one (block_splitter.rs:797)
static const SplitParams SP_LIT_FAST = {512, 16, 28.1, 2, 320.0};
static const SplitParams SP_CMD_FAST = {256, 8, 13.5, 2, 500.0};
static const SplitParams SP_DIST_FAST = {256, 6, 14.6, 2, 600.0};

struct Split {
    int num_types = 1;
    std::vector<int> types;                  // per symbol
    std::vector<std::pair<int, int>> blocks; // (type, length)
};

// exact log2 of small integers (the reference's kLog2Table shape,
// util.rs): histogram counts are overwhelmingly < 4096, and the table
// value IS std::log2 of the integer, so results are bit-identical —
// this removes the libm call chain that was ~8% of a q10 store
static const double* log2_int_table() {
    static double t[4096];
    static bool init = [] {
        t[0] = 0.0;
        for (int i = 1; i < 4096; i++) t[i] = std::log2((double)i);
        return true;
    }();
    (void)init;
    return t;
}
static const double* const kLog2Int = log2_int_table();
static inline double fast_log2u(uint64_t v) {
    return v < 4096 ? kLog2Int[v] : std::log2((double)v);
}

static double entropy_of(const double* h, int alpha) {
    double s = 0, t = 0;
    for (int i = 0; i < alpha; i++) {
        double v = h[i];
        // chunk histograms hold integer counts; route through the
        // exact table when the double is a small integer
        if (v > 0) {
            uint64_t iv = (uint64_t)v;
            double lv = ((double)iv == v) ? fast_log2u(iv)
                                          : std::log2(v);
            s += v; t += v * lv;
        }
    }
    if (s <= 0) return 0.0;
    uint64_t is = (uint64_t)s;
    double ls = ((double)is == s) ? fast_log2u(is) : std::log2(s);
    return s * ls - t;
}

static Split split_symbols(const int64_t* syms, int64_t n, int alpha,
                           const SplitParams& p) {
    Split out;
    out.types.assign(n, 0);
    out.blocks = {{0, (int)n}};
    if (n < 128) return out;
    int chunk = p.chunk;
    int nch = (int)((n + chunk - 1) / chunk);
    std::vector<double> hist((size_t)nch * alpha, 0.0);
    for (int c = 0; c < nch; c++) {
        double* h = &hist[(size_t)c * alpha];
        int64_t e = std::min<int64_t>((int64_t)(c + 1) * chunk, n);
        for (int64_t i = (int64_t)c * chunk; i < e; i++)
            h[syms[i]] += 1.0;
    }
    // sparse per-chunk entries for the assignment cost loop
    std::vector<int32_t> nz_sym;
    std::vector<double> nz_cnt;
    std::vector<int64_t> nz_off(nch + 1, 0);
    for (int c = 0; c < nch; c++) {
        const double* h = &hist[(size_t)c * alpha];
        for (int s = 0; s < alpha; s++)
            if (h[s] > 0) { nz_sym.push_back(s); nz_cnt.push_back(h[s]); }
        nz_off[c + 1] = (int64_t)nz_sym.size();
    }
    int k = std::min({p.max_types, std::max(1, nch / 3), 256});
    if (k <= 1) return out;

    std::vector<double> cent((size_t)k * alpha, 0.0);
    // seeds: evenly spaced chunk groups
    for (int j = 0; j < k; j++) {
        int a = (int)((int64_t)j * nch / k);
        int b = (int)((int64_t)(j + 1) * nch / k);
        b = std::max(b, a + 1);
        for (int c = a; c < b && c < nch; c++)
            for (int s = 0; s < alpha; s++)
                cent[(size_t)j * alpha + s] += hist[(size_t)c * alpha + s];
    }
    std::vector<int> assign(nch, -1);
    std::vector<double> cost((size_t)nch * k);
    // transposed negated log-probs [alpha][k] in float: the assignment
    // inner loop becomes a unit-stride FMA over k and vectorizes
    std::vector<float> logp_t((size_t)alpha * k);
    std::vector<float> accf(k);
    double switch_pen = p.switch_cost / std::max(1, chunk / 16);
    for (int iter = 0; iter < 3; iter++) {
        for (int j = 0; j < k; j++) {
            double tot = 0;
            for (int s = 0; s < alpha; s++)
                tot += cent[(size_t)j * alpha + s];
            tot += alpha * 0.25;
            for (int s = 0; s < alpha; s++)
                logp_t[(size_t)s * k + j] = (float)-std::log2(
                    (cent[(size_t)j * alpha + s] + 0.25) / tot);
        }
        std::vector<int> na(nch);
        for (int c = 0; c < nch; c++) {
            int64_t a = nz_off[c], b = nz_off[c + 1];
            for (int j = 0; j < k; j++) accf[j] = 0.0f;
            for (int64_t e = a; e < b; e++) {
                float cnt = (float)nz_cnt[e];
                const float* lp = &logp_t[(size_t)nz_sym[e] * k];
                for (int j = 0; j < k; j++) accf[j] += cnt * lp[j];
            }
            double best = 1e300;
            int bj = 0;
            for (int j = 0; j < k; j++) {
                double acc = (double)accf[j] + switch_pen;
                cost[(size_t)c * k + j] = acc;
                if (acc < best) { best = acc; bj = j; }
            }
            na[c] = bj;
        }
        // hysteresis: absorb short runs into the cheaper neighbor
        for (int pass = 0; pass < 4; pass++) {
            bool changed = false;
            int i = 0;
            while (i < nch) {
                int j = i;
                while (j < nch && na[j] == na[i]) j++;
                int run = j - i;
                bool has_prev = i > 0, has_next = j < nch;
                if (run < p.min_run && (has_prev || has_next)) {
                    int t = na[i], new_t;
                    if (!has_prev) new_t = na[j];
                    else if (!has_next) new_t = na[i - 1];
                    else {
                        double cp = 0, cn = 0;
                        for (int c = i; c < j; c++) {
                            cp += cost[(size_t)c * k + na[i - 1]];
                            cn += cost[(size_t)c * k + na[j]];
                        }
                        new_t = cp <= cn ? na[i - 1] : na[j];
                    }
                    if (new_t != t) {
                        for (int c = i; c < j; c++) na[c] = new_t;
                        changed = true;
                    }
                }
                i = j;
            }
            if (!changed) break;
        }
        if (na == assign) break;
        assign = na;
        std::fill(cent.begin(), cent.end(), 0.0);
        for (int c = 0; c < nch; c++)
            for (int s = 0; s < alpha; s++)
                cent[(size_t)assign[c] * alpha + s] +=
                    hist[(size_t)c * alpha + s];
    }

    // agglomerative merge while it pays for the header
    {
        std::vector<double> cc((size_t)k * alpha, 0.0);
        for (int c = 0; c < nch; c++)
            for (int s = 0; s < alpha; s++)
                cc[(size_t)assign[c] * alpha + s] +=
                    hist[(size_t)c * alpha + s];
        std::vector<int> ids;
        std::vector<uint8_t> seen(k, 0);
        for (int c = 0; c < nch; c++)
            if (!seen[assign[c]]) { seen[assign[c]] = 1;
                                    ids.push_back(assign[c]); }
        std::sort(ids.begin(), ids.end());
        std::vector<double> ent(k);
        for (int id : ids) ent[id] = entropy_of(&cc[(size_t)id * alpha],
                                                alpha);
        std::vector<double> merged(alpha);
        while ((int)ids.size() > 1) {
            double best_delta = 0.0;
            int ba = -1, bb = -1;
            for (size_t ii = 0; ii < ids.size(); ii++)
                for (size_t jj = ii + 1; jj < ids.size(); jj++) {
                    int a = ids[ii], b = ids[jj];
                    for (int s = 0; s < alpha; s++)
                        merged[s] = cc[(size_t)a * alpha + s] +
                                    cc[(size_t)b * alpha + s];
                    double d = entropy_of(merged.data(), alpha) -
                               ent[a] - ent[b] - p.header_cost;
                    if (d < best_delta) { best_delta = d; ba = a; bb = b; }
                }
            if (ba < 0) break;
            for (int s = 0; s < alpha; s++)
                cc[(size_t)ba * alpha + s] += cc[(size_t)bb * alpha + s];
            ent[ba] = entropy_of(&cc[(size_t)ba * alpha], alpha);
            ids.erase(std::find(ids.begin(), ids.end(), bb));
            for (int c = 0; c < nch; c++)
                if (assign[c] == bb) assign[c] = ba;
        }
    }

    // compress ids, first-appearance order
    std::vector<int> remap(k, -1);
    int num = 0;
    for (int c = 0; c < nch; c++)
        if (remap[assign[c]] < 0) remap[assign[c]] = num++;
    if (num == 1) return out;
    out.num_types = num;
    for (int64_t i = 0; i < n; i++)
        out.types[i] = remap[assign[(int)(i / chunk)]];
    out.blocks.clear();
    int64_t i = 0;
    while (i < n) {
        int64_t j = i;
        while (j < n && out.types[j] == out.types[i]) j++;
        out.blocks.push_back({out.types[i], (int)(j - i)});
        i = j;
    }
    return out;
}

// ---------------------------------------------------------------------------
// quality-tier block splitting: sampled seed histograms + per-symbol
// Viterbi (reference SplitByteVector shape, block_splitter.rs:699 —
// InitialEntropyCodes/RefineEntropyCodes seeds, 3 rounds of FindBlocks
// + histogram re-estimation, then the agglomerative type merge).
// Unlike the chunked k-means above, block switches can land on ANY
// symbol, which is where the reference wins on binary data.
// ---------------------------------------------------------------------------

struct HqSplitParams {
    int syms_per_hist;   // kSymbolsPer*Histogram (544/530/544)
    int max_hist;        // kMax*Histograms (100/50/50)
    int stride;          // sampling stride (70)
    double switch_cost;  // FindBlocks switch bit cost (28.1/13.5/14.6)
    double header_cost;  // per-kept-type header estimate for the merge
};
static const HqSplitParams HQ_LIT = {544, 100, 70, 28.1, 320.0};
static const HqSplitParams HQ_CMD = {530, 50, 40, 13.5, 500.0};
static const HqSplitParams HQ_DIST = {544, 50, 40, 14.6, 600.0};

static inline double bit_cost_of(double count) {
    if (count == 0.0) return -2.0;
    uint64_t iv = (uint64_t)count;
    return ((double)iv == count) ? fast_log2u(iv) : std::log2(count);
}

// coded size of one histogram: payload entropy + an estimate of its
// RLE-coded depth description (reference BrotliPopulationCost,
// bit_cost.rs:76 — including the 1/2/3/4-symbol special cases)
static double population_cost(const uint32_t* h, int alpha,
                              uint32_t total) {
    if (total == 0) return 12.0;
    int count = 0;
    int s[5];
    for (int i = 0; i < alpha && count < 5; i++)
        if (h[i]) s[count++] = i;
    if (count == 1) return 12.0;
    if (count == 2) return 20.0 + (double)total;
    if (count == 3) {
        uint32_t mx = std::max({h[s[0]], h[s[1]], h[s[2]]});
        return 28.0 + 2.0 * (double)total - mx;
    }
    if (count == 4) {
        uint32_t v[4];
        for (int i = 0; i < 4; i++) v[i] = h[s[i]];
        std::sort(v, v + 4, std::greater<uint32_t>());
        uint32_t h23 = v[2] + v[3];
        uint32_t mx = std::max(h23, v[0]);
        return 37.0 + 3.0 * h23 + 2.0 * (v[0] + v[1]) - mx;
    }
    double bits = 0.0;
    int max_depth = 1;
    uint32_t depth_histo[18] = {0};
    double log2total = fast_log2u(total);
    int i = 0;
    while (i < alpha) {
        if (h[i]) {
            double log2p = log2total - fast_log2u(h[i]);
            int depth = std::min((int)(log2p + 0.5), 15);
            bits += h[i] * log2p;
            if (depth > max_depth) max_depth = depth;
            depth_histo[depth]++;
            i++;
        } else {
            uint32_t reps = 1;
            while (i + (int)reps < alpha && h[i + reps] == 0) reps++;
            i += reps;
            if (i == alpha) break;  // trailing zeros are not coded
            if (reps < 3) {
                depth_histo[0] += reps;
            } else {
                reps -= 2;
                while (reps > 0) {
                    depth_histo[17]++;
                    bits += 3.0;
                    reps >>= 3;
                }
            }
        }
    }
    bits += 18.0 + 2.0 * max_depth;
    double e = 0.0;
    uint32_t sum = 0;
    for (int j = 0; j < 18; j++)
        if (depth_histo[j]) {
            sum += depth_histo[j];
            e -= depth_histo[j] * fast_log2u(depth_histo[j]);
        }
    if (sum) e += sum * fast_log2u(sum);
    if (e < (double)sum) e = (double)sum;  // BitsEntropy floor
    return bits + e;
}

// pairwise histogram clustering (reference BrotliHistogramCombine,
// cluster.rs:123, with the pair queue of BrotliCompareAndPushToQueue)
struct HPair {
    uint32_t idx1, idx2;
    double cost_combo, cost_diff;
};
static inline bool hpair_less(const HPair& a, const HPair& b) {
    return a.cost_diff != b.cost_diff
               ? a.cost_diff > b.cost_diff
               : (a.idx2 - a.idx1) > (b.idx2 - b.idx1);
}

struct HistSet {
    int alpha = 0;
    std::vector<uint32_t> counts;  // [m][alpha]
    std::vector<uint32_t> total;
    std::vector<double> bit_cost;
    uint32_t* row(size_t i) { return &counts[i * alpha]; }
    const uint32_t* row(size_t i) const { return &counts[i * alpha]; }
};

static double cluster_cost_diff(uint32_t a, uint32_t b) {
    auto l2 = [](uint64_t x) { return x > 0 ? fast_log2u(x) : 0.0; };
    uint64_t c = (uint64_t)a + b;
    return a * l2(a) + b * l2(b) - (double)c * l2(c);
}

static void compare_and_push_pair(HistSet& hs,
                                  const std::vector<uint32_t>& cl_size,
                                  uint32_t idx1, uint32_t idx2,
                                  size_t max_pairs,
                                  std::vector<HPair>& pairs,
                                  std::vector<uint32_t>& merged) {
    if (idx1 == idx2) return;
    if (idx2 < idx1) std::swap(idx1, idx2);
    HPair p;
    p.idx1 = idx1;
    p.idx2 = idx2;
    p.cost_combo = 0.0;
    p.cost_diff = 0.5 * cluster_cost_diff(cl_size[idx1], cl_size[idx2]) -
                  hs.bit_cost[idx1] - hs.bit_cost[idx2];
    bool good = false;
    if (hs.total[idx1] == 0) {
        p.cost_combo = hs.bit_cost[idx2];
        good = true;
    } else if (hs.total[idx2] == 0) {
        p.cost_combo = hs.bit_cost[idx1];
        good = true;
    } else {
        double threshold =
            pairs.empty() ? 1e38 : std::max(pairs[0].cost_diff, 0.0);
        const uint32_t* a = hs.row(idx1);
        const uint32_t* b = hs.row(idx2);
        for (int k = 0; k < hs.alpha; k++) merged[k] = a[k] + b[k];
        double combo = population_cost(merged.data(), hs.alpha,
                                       hs.total[idx1] + hs.total[idx2]);
        if (combo < threshold - p.cost_diff) {
            p.cost_combo = combo;
            good = true;
        }
    }
    if (!good) return;
    p.cost_diff += p.cost_combo;
    if (!pairs.empty() && hpair_less(pairs[0], p)) {
        if (pairs.size() < max_pairs) pairs.push_back(pairs[0]);
        pairs[0] = p;
    } else if (pairs.size() < max_pairs) {
        pairs.push_back(p);
    }
}

static void histogram_combine(HistSet& hs, std::vector<uint32_t>& cl_size,
                              uint32_t* symbols, size_t symbols_size,
                              std::vector<uint32_t>& clusters,
                              size_t max_clusters, size_t max_pairs) {
    double cost_diff_threshold = 0.0;
    size_t min_cluster_size = 1;
    std::vector<HPair> pairs;
    pairs.reserve(max_pairs + 1);
    std::vector<uint32_t> scratch(hs.alpha);
    for (size_t i = 0; i < clusters.size(); i++)
        for (size_t j = i + 1; j < clusters.size(); j++)
            compare_and_push_pair(hs, cl_size, clusters[i], clusters[j],
                                  max_pairs, pairs, scratch);
    while (clusters.size() > min_cluster_size) {
        if (pairs.empty() ||
            pairs[0].cost_diff >= cost_diff_threshold) {
            if (min_cluster_size >= max_clusters || pairs.empty()) break;
            cost_diff_threshold = 1e38;
            min_cluster_size = max_clusters;
            continue;
        }
        uint32_t b1 = pairs[0].idx1, b2 = pairs[0].idx2;
        {
            uint32_t* d = hs.row(b1);
            const uint32_t* s = hs.row(b2);
            for (int k = 0; k < hs.alpha; k++) d[k] += s[k];
            hs.total[b1] += hs.total[b2];
            hs.bit_cost[b1] = pairs[0].cost_combo;
            cl_size[b1] += cl_size[b2];
        }
        for (size_t i = 0; i < symbols_size; i++)
            if (symbols[i] == b2) symbols[i] = b1;
        clusters.erase(std::find(clusters.begin(), clusters.end(), b2));
        // drop pairs touching the merged pair, keeping the best at [0]
        size_t copy_to = 0;
        for (size_t i = 0; i < pairs.size(); i++) {
            HPair p = pairs[i];
            if (p.idx1 == b1 || p.idx2 == b1 || p.idx1 == b2 ||
                p.idx2 == b2)
                continue;
            if (copy_to > 0 && hpair_less(pairs[0], p)) {
                HPair front = pairs[0];
                pairs[0] = p;
                pairs[copy_to] = front;
            } else {
                pairs[copy_to] = p;
            }
            copy_to++;
        }
        pairs.resize(copy_to);
        for (uint32_t c : clusters)
            compare_and_push_pair(hs, cl_size, b1, c, max_pairs, pairs,
                                  scratch);
    }
}

// run-level reclustering of a block assignment (reference
// ClusterBlocks, block_splitter.rs:399: per-run histograms combined in
// 64-run batches, then globally to <=256 types, then each run remapped
// to its cheapest final cluster)
static Split cluster_blocks(const int64_t* syms, int64_t n,
                            const uint8_t* block_id, int alpha) {
    Split out;
    out.types.assign(n, 0);
    out.blocks = {{0, (int)n}};
    std::vector<uint32_t> block_lengths;
    {
        int64_t i = 0;
        while (i < n) {
            int64_t j = i;
            while (j < n && block_id[j] == block_id[i]) j++;
            block_lengths.push_back((uint32_t)(j - i));
            i = j;
        }
    }
    size_t num_blocks = block_lengths.size();
    if (num_blocks <= 1) return out;

    HistSet all;
    all.alpha = alpha;
    std::vector<uint32_t> cluster_size;
    std::vector<uint32_t> hist_sym(num_blocks);
    size_t num_clusters = 0;
    size_t max_pairs = 64 * 64 / 2;
    {
        HistSet batch;
        batch.alpha = alpha;
        batch.counts.resize((size_t)64 * alpha);
        batch.total.resize(64);
        batch.bit_cost.resize(64);
        int64_t pos = 0;
        uint32_t symbols64[64], remap64[64];
        for (size_t i = 0; i < num_blocks; i += 64) {
            size_t nc = std::min(num_blocks - i, (size_t)64);
            std::fill(batch.counts.begin(), batch.counts.end(), 0u);
            std::vector<uint32_t> new_clusters(nc);
            std::vector<uint32_t> cl_sz(nc, 1);
            for (size_t j = 0; j < nc; j++) {
                uint32_t* h = batch.row(j);
                uint32_t tt = block_lengths[i + j];
                for (uint32_t t = 0; t < tt; t++) h[syms[pos++]]++;
                batch.total[j] = tt;
                batch.bit_cost[j] = population_cost(h, alpha, tt);
                new_clusters[j] = (uint32_t)j;
                symbols64[j] = (uint32_t)j;
            }
            histogram_combine(batch, cl_sz, symbols64, nc, new_clusters,
                              64, max_pairs);
            size_t nnew = new_clusters.size();
            for (size_t j = 0; j < nnew; j++) {
                uint32_t src = new_clusters[j];
                all.counts.insert(all.counts.end(), batch.row(src),
                                  batch.row(src) + alpha);
                all.total.push_back(batch.total[src]);
                all.bit_cost.push_back(batch.bit_cost[src]);
                cluster_size.push_back(cl_sz[src]);
                remap64[src] = (uint32_t)j;
            }
            for (size_t j = 0; j < nc; j++)
                hist_sym[i + j] =
                    (uint32_t)num_clusters + remap64[symbols64[j]];
            num_clusters += nnew;
        }
    }
    std::vector<uint32_t> clusters(num_clusters);
    for (size_t i = 0; i < num_clusters; i++) clusters[i] = (uint32_t)i;
    max_pairs = std::min((size_t)64 * num_clusters,
                         num_clusters / 2 * num_clusters);
    histogram_combine(all, cluster_size, hist_sym.data(), num_blocks,
                      clusters, 256, max_pairs);
    size_t num_final = clusters.size();

    // remap each run to its cheapest final cluster (HistogramRemap)
    std::vector<int> new_index(num_clusters, -1);
    std::vector<uint32_t> histo(alpha);
    std::vector<uint32_t> merged(alpha);
    auto bit_cost_distance = [&](uint32_t total, uint32_t cand) {
        if (total == 0) return 0.0;
        const uint32_t* c = all.row(cand);
        for (int k = 0; k < alpha; k++) merged[k] = histo[k] + c[k];
        return population_cost(merged.data(), alpha,
                               total + all.total[cand]) -
               all.bit_cost[cand];
    };
    int next_index = 0;
    {
        int64_t pos = 0;
        for (size_t i = 0; i < num_blocks; i++) {
            std::fill(histo.begin(), histo.end(), 0u);
            uint32_t tt = block_lengths[i];
            for (uint32_t t = 0; t < tt; t++) histo[syms[pos++]]++;
            uint32_t best_out = i == 0 ? hist_sym[0] : hist_sym[i - 1];
            double best_bits = bit_cost_distance(tt, best_out);
            for (size_t j = 0; j < num_final; j++) {
                double cur = bit_cost_distance(tt, clusters[j]);
                if (cur < best_bits) {
                    best_bits = cur;
                    best_out = clusters[j];
                }
            }
            hist_sym[i] = best_out;
            if (new_index[best_out] < 0) new_index[best_out] = next_index++;
        }
    }
    if (next_index <= 1) return out;
    out.num_types = next_index;
    out.blocks.clear();
    {
        int64_t pos = 0;
        for (size_t i = 0; i < num_blocks; i++) {
            int ty = new_index[hist_sym[i]];
            uint32_t len = block_lengths[i];
            for (uint32_t t = 0; t < len; t++) out.types[pos++] = ty;
            if (!out.blocks.empty() && out.blocks.back().first == ty)
                out.blocks.back().second += (int)len;
            else
                out.blocks.push_back({ty, (int)len});
        }
    }
    return out;
}

// forward scan + capped-cost recurrence + backward signal walk
// (reference FindBlocks, block_splitter.rs:223-351)
static void hq_find_blocks(const int64_t* syms, int64_t n,
                           double switch_cost, int k, int alpha,
                           const double* hist /* k*alpha */,
                           float* insert_cost /* alpha*k */,
                           float* cost /* k */,
                           uint8_t* switch_signal /* n*bitmaplen */,
                           uint8_t* block_id /* n */) {
    int bitmaplen = (k + 7) >> 3;
    for (int j = 0; j < k; j++) {
        double tot = 0;
        for (int s = 0; s < alpha; s++) tot += hist[(size_t)j * alpha + s];
        // FastLog2(0) == 0 in the reference: an empty histogram prices
        // every symbol at +2 bits, it must not become attractive
        double lt = tot > 0 ? fast_log2u((uint64_t)tot) : 0.0;
        for (int s = 0; s < alpha; s++)
            insert_cost[(size_t)s * k + j] =
                (float)(lt - bit_cost_of(hist[(size_t)j * alpha + s]));
    }
    for (int j = 0; j < k; j++) cost[j] = 0.0f;
    std::memset(switch_signal, 0, (size_t)n * bitmaplen);
    // forward pass in three vectorizable sweeps over k (the reference
    // runs this 8-wide in Mem256f lanes): add, min-reduce, cap+signal
    for (int64_t i = 0; i < n; i++) {
        const float* ic = &insert_cost[(size_t)syms[i] * k];
        for (int j = 0; j < k; j++) cost[j] += ic[j];
        float min_cost = cost[0];
        for (int j = 1; j < k; j++)
            min_cost = cost[j] < min_cost ? cost[j] : min_cost;
        int best = 0;
        while (cost[best] != min_cost) best++;
        block_id[i] = (uint8_t)best;
        float sc = (float)switch_cost;
        if (i < 2000) sc *= (float)(0.77 + 0.07 * (double)i / 2000.0);
        uint8_t* sig = &switch_signal[(size_t)i * bitmaplen];
        for (int b = 0; b < bitmaplen; b++) {
            uint8_t bits = 0;
            int j0 = b << 3;
            int je = j0 + 8 < k ? j0 + 8 : k;
            for (int j = j0; j < je; j++) {
                float d = cost[j] - min_cost;
                bits |= (uint8_t)(d >= sc) << (j - j0);
                cost[j] = d < sc ? d : sc;
            }
            sig[b] = bits;
        }
    }
    static int fb_dbg = getenv("BROTLI_TPU_SPLIT_DEBUG")
                            ? atoi(getenv("BROTLI_TPU_SPLIT_DEBUG")) : 0;
    if (fb_dbg >= 2) {
        std::vector<int64_t> cnt(k, 0);
        int64_t bits = 0;
        for (int64_t t = 0; t < n; t++) cnt[block_id[t]]++;
        for (size_t t = 0; t < (size_t)n * bitmaplen; t++)
            bits += __builtin_popcount(switch_signal[t]);
        int distinct = 0;
        for (int j = 0; j < k; j++) distinct += cnt[j] > 0;
        fprintf(stderr,
                "[findblocks] fwd distinct=%d sigbits/pos=%.2f\n",
                distinct, (double)bits / n);
    }
    // backward pass: propagate the last block id until a switch signal
    int64_t i = n - 1;
    uint8_t cur = block_id[i];
    while (i > 0) {
        uint8_t mask = (uint8_t)(1u << (cur & 7));
        i--;
        if ((switch_signal[(size_t)i * bitmaplen + (cur >> 3)] & mask) &&
            cur != block_id[i])
            cur = block_id[i];
        block_id[i] = cur;
    }
}

static Split split_symbols_hq(const int64_t* syms, int64_t n, int alpha,
                              const HqSplitParams& p) {
    Split out;
    out.types.assign(n, 0);
    out.blocks = {{0, (int)n}};
    if (n < 128) return out;
    int k = (int)std::min<int64_t>(n / p.syms_per_hist + 1, p.max_hist);
    if (k <= 1) return out;
    int64_t stride = std::min<int64_t>(p.stride, n);

    // seed histograms from strided + random samples (reference
    // InitialEntropyCodes / RefineEntropyCodes)
    std::vector<double> hist((size_t)k * alpha, 0.0);
    uint32_t seed = 7;
    auto rnd = [&]() {
        seed = seed * 16807u;
        if (seed == 0) seed = 1;
        return seed;
    };
    {
        int64_t block_length = n / k;
        for (int j = 0; j < k; j++) {
            int64_t pos = n * (int64_t)j / k;
            if (j != 0) pos += rnd() % (uint64_t)block_length;
            if (pos + stride >= n) pos = n - stride - 1;
            if (pos < 0) pos = 0;
            for (int64_t t = 0; t < stride; t++)
                hist[(size_t)j * alpha + syms[pos + t]] += 1.0;
        }
    }
    {
        seed = 7;
        int64_t iters = 2 * n / stride + 100;
        iters = (iters + k - 1) / k * k;
        for (int64_t it = 0; it < iters; it++) {
            int64_t pos = n > stride ? rnd() % (uint64_t)(n - stride + 1)
                                     : 0;
            double* h = &hist[(size_t)(it % k) * alpha];
            for (int64_t t = 0; t < stride; t++) h[syms[pos + t]] += 1.0;
        }
    }

    int bitmaplen = (k + 7) >> 3;
    std::vector<float> insert_cost((size_t)alpha * k);
    std::vector<float> cost(k);
    std::vector<uint8_t> switch_signal((size_t)n * bitmaplen);
    std::vector<uint8_t> block_id(n);
    for (int round = 0; round < 3; round++) {
        hq_find_blocks(syms, n, p.switch_cost, k, alpha, hist.data(),
                       insert_cost.data(), cost.data(),
                       switch_signal.data(), block_id.data());
        // shrink to the ids actually used (reference RemapBlockIds,
        // block_splitter.rs:355: empty histograms never re-enter
        // FindBlocks, where their +2-bit flat cost would attract
        // everything) and re-estimate
        std::vector<int> remap(k, -1);
        int used = 0;
        for (int64_t i = 0; i < n; i++)
            if (remap[block_id[i]] < 0) remap[block_id[i]] = used++;
        for (int64_t i = 0; i < n; i++)
            block_id[i] = (uint8_t)remap[block_id[i]];
        k = used;
        bitmaplen = (k + 7) >> 3;
        std::fill(hist.begin(), hist.end(), 0.0);
        for (int64_t i = 0; i < n; i++)
            hist[(size_t)block_id[i] * alpha + syms[i]] += 1.0;
        if (k <= 1) break;
    }
    if (k <= 1) return out;

    static int split_dbg = getenv("BROTLI_TPU_SPLIT_DEBUG")
                               ? atoi(getenv("BROTLI_TPU_SPLIT_DEBUG"))
                               : 0;
    Split res = cluster_blocks(syms, n, block_id.data(), alpha);
    if (split_dbg) {
        int64_t nblk = 1;
        for (int64_t i2 = 1; i2 < n; i2++)
            if (block_id[i2] != block_id[i2 - 1]) nblk++;
        fprintf(stderr,
                "[hqsplit] n=%lld alpha=%d viterbi types=%d runs=%lld "
                "-> clustered types=%d blocks=%d\n",
                (long long)n, alpha, k, (long long)nblk, res.num_types,
                (int)res.blocks.size());
    }
    return res;
}


// context-histogram clustering on the same pair-queue machinery
// (reference BrotliClusterHistograms, cluster.rs:380: 64-batch combine,
// global combine to <=max_out, remap every input bucket to its
// cheapest cluster, reindex in first-use order)
static void cluster_histograms_hq(const int64_t* bucket_hist, int nb,
                                  int alpha, int max_out,
                                  std::vector<int>& out_assign,
                                  std::vector<int64_t>& tree_hists,
                                  int& ntrees) {
    HistSet hs;
    hs.alpha = alpha;
    hs.counts.resize((size_t)nb * alpha);
    hs.total.assign(nb, 0);
    hs.bit_cost.resize(nb);
    for (int i = 0; i < nb; i++) {
        uint32_t tt = 0;
        for (int s = 0; s < alpha; s++) {
            uint32_t v = (uint32_t)bucket_hist[(size_t)i * alpha + s];
            hs.counts[(size_t)i * alpha + s] = v;
            tt += v;
        }
        hs.total[i] = tt;
        hs.bit_cost[i] = population_cost(hs.row(i), alpha, tt);
    }
    std::vector<uint32_t> cl_size(nb, 1);
    std::vector<uint32_t> symbols(nb);
    for (int i = 0; i < nb; i++) symbols[i] = (uint32_t)i;
    std::vector<uint32_t> clusters;
    clusters.reserve(nb);
    size_t pairs_cap = 64 * 64 / 2;
    for (int i = 0; i < nb; i += 64) {
        size_t nc = std::min((size_t)(nb - i), (size_t)64);
        std::vector<uint32_t> batch(nc);
        for (size_t j = 0; j < nc; j++) batch[j] = (uint32_t)(i + j);
        histogram_combine(hs, cl_size, &symbols[i], nc, batch,
                          (size_t)max_out, pairs_cap);
        clusters.insert(clusters.end(), batch.begin(), batch.end());
    }
    size_t max_pairs2 = std::min((size_t)64 * clusters.size(),
                                 clusters.size() / 2 * clusters.size());
    histogram_combine(hs, cl_size, symbols.data(), nb, clusters,
                      (size_t)max_out, max_pairs2);
    // remap each ORIGINAL bucket to its cheapest final cluster
    std::vector<uint32_t> histo(alpha), merged(alpha);
    for (int i = 0; i < nb; i++) {
        uint32_t tt = 0;
        for (int s = 0; s < alpha; s++) {
            histo[s] = (uint32_t)bucket_hist[(size_t)i * alpha + s];
            tt += histo[s];
        }
        uint32_t best = symbols[i];
        double best_bits = 1e300;
        for (uint32_t c : clusters) {
            double d;
            if (tt == 0) {
                d = 0.0;
            } else {
                const uint32_t* cr = hs.row(c);
                for (int s = 0; s < alpha; s++) merged[s] = histo[s] +
                                                           cr[s];
                d = population_cost(merged.data(), alpha,
                                    tt + hs.total[c]) -
                    hs.bit_cost[c];
            }
            if (d < best_bits) { best_bits = d; best = c; }
        }
        symbols[i] = best;
    }
    // reindex, first-use order
    std::vector<int> newid(nb, -1);
    ntrees = 0;
    out_assign.assign(nb, 0);
    for (int i = 0; i < nb; i++) {
        if (newid[symbols[i]] < 0) newid[symbols[i]] = ntrees++;
        out_assign[i] = newid[symbols[i]];
    }
    tree_hists.assign((size_t)ntrees * alpha, 0);
    for (int i = 0; i < nb; i++)
        for (int s = 0; s < alpha; s++)
            tree_hists[(size_t)out_assign[i] * alpha + s] +=
                bucket_hist[(size_t)i * alpha + s];
}

// ---------------------------------------------------------------------------
// context-histogram clustering (metablock.py:351 port)
// ---------------------------------------------------------------------------

static void cluster_histograms(const int64_t* bucket_hist, int nb,
                               int alpha, int max_trees,
                               double header_cost,
                               std::vector<int>& out_assign,
                               std::vector<int64_t>& tree_hists,
                               int& ntrees) {
    out_assign.assign(nb, 0);
    std::vector<int> used;
    std::vector<int64_t> totals(nb, 0);
    for (int b = 0; b < nb; b++) {
        for (int s = 0; s < alpha; s++)
            totals[b] += bucket_hist[(size_t)b * alpha + s];
        if (totals[b] > 0) used.push_back(b);
    }
    if (used.empty()) {
        ntrees = 1;
        tree_hists.assign(alpha, 0);
        return;
    }
    int m = (int)used.size();
    int k = std::min(max_trees, m);
    // seeds: largest buckets
    std::vector<int> order(m);
    for (int i = 0; i < m; i++) order[i] = i;
    std::sort(order.begin(), order.end(), [&](int a, int b) {
        if (totals[used[a]] != totals[used[b]])
            return totals[used[a]] > totals[used[b]];
        return a < b;
    });
    std::vector<double> cent((size_t)k * alpha, 0.0);
    for (int j = 0; j < k; j++)
        for (int s = 0; s < alpha; s++)
            cent[(size_t)j * alpha + s] =
                (double)bucket_hist[(size_t)used[order[j]] * alpha + s];
    std::vector<int> assign(m, -1);
    std::vector<double> logp((size_t)k * alpha);
    for (int iter = 0; iter < 6; iter++) {
        for (int j = 0; j < k; j++) {
            double tot = alpha * 0.25;
            for (int s = 0; s < alpha; s++)
                tot += cent[(size_t)j * alpha + s];
            for (int s = 0; s < alpha; s++)
                logp[(size_t)j * alpha + s] =
                    std::log2((cent[(size_t)j * alpha + s] + 0.25) / tot);
        }
        std::vector<int> na(m);
        bool same = true;
        for (int i = 0; i < m; i++) {
            const int64_t* h = &bucket_hist[(size_t)used[i] * alpha];
            double best = 1e300;
            int bj = 0;
            for (int j = 0; j < k; j++) {
                double acc = 0;
                const double* lp = &logp[(size_t)j * alpha];
                for (int s = 0; s < alpha; s++) acc -= h[s] * lp[s];
                if (acc < best) { best = acc; bj = j; }
            }
            na[i] = bj;
            if (na[i] != assign[i]) same = false;
        }
        if (same) break;
        assign = na;
        std::fill(cent.begin(), cent.end(), 0.0);
        for (int i = 0; i < m; i++)
            for (int s = 0; s < alpha; s++)
                cent[(size_t)assign[i] * alpha + s] +=
                    (double)bucket_hist[(size_t)used[i] * alpha + s];
    }
    // greedy merge
    {
        std::vector<int> ids;
        std::vector<uint8_t> seen(k, 0);
        for (int i = 0; i < m; i++)
            if (!seen[assign[i]]) { seen[assign[i]] = 1;
                                    ids.push_back(assign[i]); }
        std::sort(ids.begin(), ids.end());
        std::vector<double> ent(k, 0.0);
        for (int id : ids)
            ent[id] = entropy_of(&cent[(size_t)id * alpha], alpha);
        std::vector<double> merged(alpha);
        while ((int)ids.size() > 1) {
            double best_delta = 0.0;
            int ba = -1, bb = -1;
            for (size_t ii = 0; ii < ids.size(); ii++)
                for (size_t jj = ii + 1; jj < ids.size(); jj++) {
                    int a = ids[ii], b = ids[jj];
                    for (int s = 0; s < alpha; s++)
                        merged[s] = cent[(size_t)a * alpha + s] +
                                    cent[(size_t)b * alpha + s];
                    double d = entropy_of(merged.data(), alpha) -
                               ent[a] - ent[b] - header_cost;
                    if (d < best_delta) { best_delta = d; ba = a; bb = b; }
                }
            if (ba < 0) break;
            for (int s = 0; s < alpha; s++)
                cent[(size_t)ba * alpha + s] +=
                    cent[(size_t)bb * alpha + s];
            ent[ba] = entropy_of(&cent[(size_t)ba * alpha], alpha);
            ids.erase(std::find(ids.begin(), ids.end(), bb));
            for (int i = 0; i < m; i++)
                if (assign[i] == bb) assign[i] = ba;
        }
        // remap sorted
        std::vector<int> remap(k, -1);
        int num = 0;
        for (int id : ids) remap[id] = num++;
        ntrees = num;
        tree_hists.assign((size_t)ntrees * alpha, 0);
        for (int i = 0; i < m; i++) {
            int t = remap[assign[i]];
            out_assign[used[i]] = t;
            for (int s = 0; s < alpha; s++)
                tree_hists[(size_t)t * alpha + s] +=
                    bucket_hist[(size_t)used[i] * alpha + s];
        }
    }
}

// ---------------------------------------------------------------------------
// block-switch wire planning (metablock.py:632 port)
// ---------------------------------------------------------------------------

struct SwitchPlan {
    bool active = false;
    int64_t first_len = 0;
    int first_len_code = 0;
    std::vector<int> type_syms, len_codes;
    std::vector<std::pair<int64_t, int>> len_extra; // (value, bits)
    std::vector<int64_t> switch_at;
    std::vector<int64_t> type_hist, len_hist;
    uint8_t type_lengths[258], len_lengths[26];
    Enc type_enc, len_enc;
};

static void plan_switches(const Split& sp, SwitchPlan& out) {
    if (sp.num_types < 2) return;
    out.active = true;
    out.first_len = sp.blocks[0].second;
    out.first_len_code = blk_code_of(out.first_len);
    int ntypes = sp.num_types;
    int cur = 0, prev = 1;
    int64_t at = 0;
    for (size_t bi = 1; bi < sp.blocks.size(); bi++) {
        at += sp.blocks[bi - 1].second;
        int t = sp.blocks[bi].first;
        int64_t ln = sp.blocks[bi].second;
        int s;
        if (t == prev) s = 0;
        else if (t == (cur + 1) % ntypes) s = 1;
        else s = t + 2;
        out.type_syms.push_back(s);
        int lc = blk_code_of(ln);
        out.len_codes.push_back(lc);
        out.len_extra.push_back({ln - T.blk_base[lc],
                                 (int)T.blk_extra[lc]});
        out.switch_at.push_back(at);
        prev = cur;
        cur = t;
    }
    out.type_hist.assign(ntypes + 2, 0);
    for (int s : out.type_syms) out.type_hist[s]++;
    out.len_hist.assign(26, 0);
    out.len_hist[out.first_len_code]++;
    for (int lc : out.len_codes) out.len_hist[lc]++;
    // safe hist
    int64_t th = 0, lh = 0;
    for (int64_t v : out.type_hist) th += v;
    for (int64_t v : out.len_hist) lh += v;
    if (th == 0) out.type_hist[0] = 1;
    if (lh == 0) out.len_hist[0] = 1;
    huffman_lengths(out.type_hist.data(), ntypes + 2, 15,
                    out.type_lengths);
    huffman_lengths(out.len_hist.data(), 26, 15, out.len_lengths);
    out.type_enc.build(out.type_lengths, ntypes + 2);
    out.len_enc.build(out.len_lengths, 26);
}

}  // namespace sb

// ---------------------------------------------------------------------------
// entry point
// ---------------------------------------------------------------------------

extern "C" int64_t store_metablock_native(
    const uint8_t* data, int64_t start, int64_t mlen, int64_t is_last,
    int64_t n_cmds, const int64_t* insert_len, const int64_t* copy_len,
    const int64_t* dist_code, const int64_t* dist_extra,
    const int64_t* dist_extra_bits, const int64_t* cmd_sym,
    const int64_t* copy_advance,
    int64_t npostfix, int64_t ndirect, int64_t dist_alpha,
    int64_t quality, int64_t context_mode,
    int64_t num_lit_ctx, const int64_t* lit_static_map /* [64] */,
    const uint8_t* lut0 /* [256] */, const uint8_t* lut1 /* [256] */,
    int64_t enable_splits,
    const int32_t* ext_lit_types /* per literal; may be null */,
    int64_t ext_lit_ntypes,
    uint64_t* out_words, int64_t cap_bits, int64_t bit0)
{
    using namespace sb;
    init_tables();
    // bit0 (0..63): start ORing at that bit of out_words[0] — lets a
    // driver append metablocks in place with no scratch+copy pass.
    // The returned bit count includes bit0.
    BW bw{out_words, cap_bits};
    bw.pos = bit0 & 63;
    static int prof = getenv("BROTLI_TPU_STORE_PROF") ? 1 : 0;
    auto tprof = std::chrono::steady_clock::now();
    auto mark = [&](const char* what) {
        if (!prof) return;
        auto now = std::chrono::steady_clock::now();
        fprintf(stderr, "[store] %-10s %.3f ms\n", what,
                std::chrono::duration<double, std::milli>(now - tprof)
                    .count());
        tprof = now;
    };

    // ---- gather literals + their contexts ----
    // persistent per-thread scratch (multi-MB reallocation per
    // metablock costs more in page faults than it saves)
    static thread_local std::vector<uint8_t> literals;
    static thread_local std::vector<uint8_t> lit_ctx;
    literals.clear();
    lit_ctx.clear();
    // contexts are only consulted by the static-map path when the map
    // is non-trivial, or by the dynamic clustering at q>=10 — skip the
    // per-literal LUT walk otherwise (the q<4 trivial tier)
    bool need_ctx = quality >= 10 || num_lit_ctx > 1;
    // the trivial tier (no splits, no context map) never needs the
    // gathered literal buffer: the histogram and emit loops walk the
    // window data through the command stream instead
    bool need_lit_buf = need_ctx || enable_splits ||
                        (ext_lit_types && ext_lit_ntypes > 1);
    int64_t n_lit = 0;
    {
        int64_t pos = start;
        int64_t tot = 0;
        for (int64_t c = 0; c < n_cmds; c++) tot += insert_len[c];
        n_lit = tot;
        literals.resize(need_lit_buf ? tot : 0);
        lit_ctx.resize(need_ctx ? tot : 0);
        if (need_lit_buf) {
            int64_t o = 0;
            for (int64_t c = 0; c < n_cmds; c++) {
                int64_t il = insert_len[c];
                if (il) {
                    std::memcpy(literals.data() + o, data + pos,
                                (size_t)il);
                    if (need_ctx) {
                        for (int64_t j = 0; j < il; j++) {
                            int64_t p = pos + j;
                            uint8_t p1 = p >= 1 ? data[p - 1] : 0;
                            uint8_t p2 = p >= 2 ? data[p - 2] : 0;
                            lit_ctx[o + j] =
                                (uint8_t)(lut0[p1] | lut1[p2]);
                        }
                    }
                    o += il;
                }
                pos += il + copy_advance[c];
            }
        }
    }
    mark("lits");

    // ---- distance symbol stream ----
    static thread_local std::vector<int64_t> dist_syms;
    static thread_local std::vector<int64_t> dist_cmd_idx;
    dist_syms.clear();
    dist_cmd_idx.clear();
    dist_syms.reserve(n_cmds);
    dist_cmd_idx.reserve(n_cmds);
    for (int64_t c = 0; c < n_cmds; c++) {
        if (copy_len[c] > 0 && !T.cmd_implicit[cmd_sym[c]]) {
            dist_syms.push_back(dist_code[c]);
            dist_cmd_idx.push_back(c);
        }
    }

    mark("dists");
    // ---- block splits ----
    static thread_local std::vector<int64_t> lit64;
    // thread_local with explicit reset: the trivial tier's
    // one-element blocks assignments then reuse capacity (the
    // prealloc no-alloc mode is mallinfo-gated on this)
    static thread_local Split lit_split, cmd_split, dist_split;
    for (Split* sp : {&lit_split, &cmd_split, &dist_split}) {
        sp->num_types = 1;
        sp->types.clear();
        sp->blocks.clear();
    }
    if (ext_lit_types && ext_lit_ntypes > 1) {
        // externally planned literal split (the device Lloyd planner,
        // ops/split.py) — command/distance splits still computed here
        lit_split.num_types = (int)ext_lit_ntypes;
        lit_split.types.assign(ext_lit_types, ext_lit_types + n_lit);
        lit_split.blocks.clear();
        int64_t i = 0;
        while (i < n_lit) {
            int64_t j = i;
            while (j < n_lit && lit_split.types[j] == lit_split.types[i])
                j++;
            lit_split.blocks.push_back({lit_split.types[i],
                                        (int)(j - i)});
            i = j;
        }
        if (enable_splits) {
            bool fast_split = quality < 7;
            cmd_split = split_symbols(cmd_sym, n_cmds, 704,
                                      fast_split ? SP_CMD_FAST : SP_CMD);
            dist_split = split_symbols(dist_syms.data(),
                                       (int64_t)dist_syms.size(),
                                       (int)dist_alpha,
                                       fast_split ? SP_DIST_FAST
                                                  : SP_DIST);
        } else {
            cmd_split.blocks = {{0, (int)n_cmds}};
            dist_split.blocks = {{0, (int)dist_syms.size()}};
            // the q>=10 dynamic-context clustering below indexes the
            // per-symbol type arrays unconditionally
            if (quality >= 10) {
                cmd_split.types.assign(n_cmds, 0);
                dist_split.types.assign(dist_syms.size(), 0);
            }
        }
    } else if (enable_splits) {
        lit64.assign(literals.begin(), literals.end());
        if (quality >= 10) {
            // per-symbol Viterbi splitter (reference SplitByteVector).
            // The three categories are independent pure passes and the
            // literal one (k<=100 lanes over ~0.6 symbol/byte)
            // dominates the whole q10 store — run cmd+dist on helper
            // threads under it.  CAREFUL: cmd_split/dist_split and the
            // symbol vectors are thread_local, so inside a helper
            // lambda those NAMES would resolve to the helper's empty
            // instances — evaluate every pointer on this thread and
            // write results to plain locals
            const int64_t* ds_ptr = dist_syms.data();
            int64_t ds_n = (int64_t)dist_syms.size();
            Split cmd_sp, dist_sp;
            std::thread t_cmd([&cmd_sp, cmd_sym, n_cmds] {
                cmd_sp = split_symbols_hq(cmd_sym, n_cmds, 704,
                                          HQ_CMD);
            });
            std::thread t_dist([&dist_sp, ds_ptr, ds_n, dist_alpha] {
                dist_sp = split_symbols_hq(ds_ptr, ds_n,
                                           (int)dist_alpha, HQ_DIST);
            });
            lit_split = split_symbols_hq(lit64.data(), n_lit, 256,
                                         HQ_LIT);
            t_cmd.join();
            t_dist.join();
            cmd_split = std::move(cmd_sp);
            dist_split = std::move(dist_sp);
        } else {
            bool fast_split = quality < 7;
            // literal trees = block types x static contexts must fit
            // the 256-tree wire limit; cap the splitter's type count
            // so the context map never needs the lossy num_lit_ctx
            // collapse below (it used to emit cmap values >= ntrees
            // when the splitter returned >256/nlc types — OOB in
            // write_context_map's histogram + invalid stream)
            SplitParams pl = fast_split ? SP_LIT_FAST : SP_LIT;
            pl.max_types = std::min<int>(
                pl.max_types, (int)(256 / std::max<int64_t>(
                                        1, num_lit_ctx)));
            lit_split = split_symbols(lit64.data(), n_lit, 256, pl);
            cmd_split = split_symbols(cmd_sym, n_cmds, 704,
                                      fast_split ? SP_CMD_FAST : SP_CMD);
            dist_split = split_symbols(dist_syms.data(),
                                       (int64_t)dist_syms.size(),
                                       (int)dist_alpha,
                                       fast_split ? SP_DIST_FAST
                                                  : SP_DIST);
        }
    } else {
        // single-type splits: .types stays empty (every consumer
        // below treats num_types == 1 as type 0 without the array)
        lit_split.blocks.assign(1, {0, (int)n_lit});
        cmd_split.blocks.assign(1, {0, (int)n_cmds});
        dist_split.blocks.assign(1, {0, (int)dist_syms.size()});
    }
    while ((int64_t)lit_split.num_types * num_lit_ctx > 256)
        num_lit_ctx = 1;

    mark("splits");
    // ---- context maps + per-tree histograms ----
    bool dynamic_ctx = quality >= 10 && n_lit > 512;
    int ntrees_l, ntrees_d;
    static thread_local std::vector<int64_t> cmap_l, cmap_d;
    cmap_l.assign((size_t)lit_split.num_types * 64, 0);
    cmap_d.assign((size_t)dist_split.num_types * 4, 0);
    // per-symbol tree ids are only consulted by the multi-tree emit
    // loop; skip the zeroed multi-MB allocations in the single-tree
    // tiers (thread_local so the capacity persists across metablocks)
    static thread_local std::vector<int> lit_tree;
    static thread_local std::vector<int> dist_tree;
    bool multi_l = dynamic_ctx || lit_split.num_types > 1 ||
                   num_lit_ctx > 1;
    bool multi_d = dynamic_ctx || dist_split.num_types > 1;
    lit_tree.assign(multi_l ? n_lit : 0, 0);
    dist_tree.assign(multi_d ? dist_syms.size() : 0, 0);
    static thread_local std::vector<int64_t> lit_h, dist_h;
    lit_h.clear();
    dist_h.clear();

    if (dynamic_ctx) {
        int nbuck_l = lit_split.num_types * 64;
        std::vector<int64_t> bh((size_t)nbuck_l * 256, 0);
        for (int64_t i = 0; i < n_lit; i++)
            bh[(size_t)(lit_split.types[i] * 64 + lit_ctx[i]) * 256 +
               literals[i]]++;
        std::vector<int> assign_l;
        cluster_histograms_hq(bh.data(), nbuck_l, 256, 256, assign_l,
                              lit_h, ntrees_l);
        for (int b = 0; b < nbuck_l; b++) cmap_l[b] = assign_l[b];
        for (int64_t i = 0; i < n_lit; i++)
            lit_tree[i] = assign_l[lit_split.types[i] * 64 + lit_ctx[i]];

        int nbuck_d = dist_split.num_types * 4;
        std::vector<int64_t> bhd((size_t)nbuck_d * dist_alpha, 0);
        for (size_t i = 0; i < dist_syms.size(); i++) {
            int64_t c = dist_cmd_idx[i];
            int64_t cl = copy_len[c];
            int dctx = (int)(cl < 5 ? (cl < 2 ? 0 : cl - 2) : 3);
            bhd[(size_t)(dist_split.types[i] * 4 + dctx) * dist_alpha +
                dist_syms[i]]++;
        }
        std::vector<int> assign_d;
        cluster_histograms_hq(bhd.data(), nbuck_d, (int)dist_alpha, 256,
                              assign_d, dist_h, ntrees_d);
        for (int b = 0; b < nbuck_d; b++) cmap_d[b] = assign_d[b];
        for (size_t i = 0; i < dist_syms.size(); i++) {
            int64_t c = dist_cmd_idx[i];
            int64_t cl = copy_len[c];
            int dctx = (int)(cl < 5 ? (cl < 2 ? 0 : cl - 2) : 3);
            dist_tree[i] = assign_d[dist_split.types[i] * 4 + dctx];
        }
    } else {
        ntrees_l = lit_split.num_types * (int)num_lit_ctx;
        for (int t = 0; t < lit_split.num_types; t++)
            for (int c = 0; c < 64; c++)
                // when num_lit_ctx was collapsed to 1 (external split
                // with too many types), the static map must collapse
                // with it — tree == block type
                cmap_l[(size_t)t * 64 + c] =
                    t * num_lit_ctx +
                    (num_lit_ctx > 1 ? lit_static_map[c] : 0);
        lit_h.assign((size_t)ntrees_l * 256, 0);
        if (ntrees_l == 1) {
            // single tree: plain byte histogram, no per-literal tree
            if (need_lit_buf) {
                for (int64_t i = 0; i < n_lit; i++) lit_h[literals[i]]++;
            } else {
                // trivial tier: walk the window data (no gathered copy)
                int64_t pos = start;
                for (int64_t c = 0; c < n_cmds; c++) {
                    int64_t il = insert_len[c];
                    for (int64_t j = 0; j < il; j++)
                        lit_h[data[pos + j]]++;
                    pos += il + copy_advance[c];
                }
            }
        } else if (num_lit_ctx == 1) {
            // trivial map: tree == block type, no context lookup
            for (int64_t i = 0; i < n_lit; i++) {
                int tr = lit_split.types[i];
                lit_tree[i] = tr;
                lit_h[(size_t)tr * 256 + literals[i]]++;
            }
        } else {
            for (int64_t i = 0; i < n_lit; i++) {
                int tr = (int)((lit_split.num_types == 1
                                    ? 0 : lit_split.types[i])
                                   * num_lit_ctx +
                               lit_static_map[lit_ctx[i]]);
                lit_tree[i] = tr;
                lit_h[(size_t)tr * 256 + literals[i]]++;
            }
        }
        if (ntrees_l > 1 && n_lit < 50 * (int64_t)ntrees_l) {
            // thin histograms: the static map spreads a handful of
            // literals over types x contexts trees, paying a tree
            // header each.  The reference's greedy metablock builder
            // clusters these (cluster.rs via BrotliBuildMetaBlock
            // greedy path); cluster only when histograms are thin so
            // the normal text path pays nothing.
            std::vector<int> assign;
            std::vector<int64_t> merged;
            int nt2 = 0;
            cluster_histograms_hq(lit_h.data(), ntrees_l, 256, 64,
                                  assign, merged, nt2);
            if (nt2 < ntrees_l) {
                for (size_t b = 0; b < cmap_l.size(); b++)
                    cmap_l[b] = assign[cmap_l[b]];
                for (int64_t i = 0; i < n_lit; i++)
                    lit_tree[i] = assign[lit_tree[i]];
                lit_h.swap(merged);
                ntrees_l = nt2;
            }
        }
        ntrees_d = dist_split.num_types;
        for (int t = 0; t < ntrees_d; t++)
            for (int c = 0; c < 4; c++) cmap_d[(size_t)t * 4 + c] = t;
        dist_h.assign((size_t)ntrees_d * dist_alpha, 0);
        if (ntrees_d == 1) {
            for (size_t i = 0; i < dist_syms.size(); i++)
                dist_h[dist_syms[i]]++;
        } else {
            for (size_t i = 0; i < dist_syms.size(); i++) {
                dist_tree[i] = dist_split.types[i];
                dist_h[(size_t)dist_split.types[i] * dist_alpha +
                       dist_syms[i]]++;
            }
        }
    }

    int nct = cmd_split.num_types;
    static thread_local std::vector<int64_t> cmd_h;
    cmd_h.assign((size_t)nct * 704, 0);
    if (nct == 1) {
        for (int64_t c = 0; c < n_cmds; c++) cmd_h[cmd_sym[c]]++;
    } else {
        for (int64_t c = 0; c < n_cmds; c++)
            cmd_h[(size_t)cmd_split.types[c] * 704 + cmd_sym[c]]++;
    }

    mark("hists");
    // ---- per-tree code lengths (safe-hist + RLE optimize) ----
    auto tree_lengths = [&](std::vector<int64_t>& hists, int ntrees,
                            int alpha, std::vector<uint8_t>& lengths) {
        lengths.assign((size_t)ntrees * alpha, 0);
        static thread_local std::vector<int64_t> tmp;
        tmp.assign(alpha, 0);
        for (int t = 0; t < ntrees; t++) {
            int64_t* h = &hists[(size_t)t * alpha];
            int64_t s = 0;
            for (int i = 0; i < alpha; i++) s += h[i];
            std::memcpy(tmp.data(), h, alpha * sizeof(int64_t));
            if (s == 0) tmp[0] = 1;
            optimize_rle(tmp.data(), alpha);
            huffman_lengths(tmp.data(), alpha, 15,
                            &lengths[(size_t)t * alpha]);
        }
    };
    static thread_local std::vector<uint8_t> lit_lengths,
        cmd_lengths, dist_lengths;
    tree_lengths(lit_h, ntrees_l, 256, lit_lengths);
    tree_lengths(cmd_h, nct, 704, cmd_lengths);
    tree_lengths(dist_h, ntrees_d, (int)dist_alpha, dist_lengths);

    mark("treelens");
    // ---- header ----
    bw.put(is_last ? 1 : 0, 1);
    if (is_last) bw.put(0, 1);
    write_mlen(bw, mlen);
    if (!is_last) bw.put(0, 1);  // ISUNCOMPRESSED

    SwitchPlan sw_l, sw_c, sw_d;
    plan_switches(lit_split, sw_l);
    plan_switches(cmd_split, sw_c);
    plan_switches(dist_split, sw_d);
    const Split* splits[3] = {&lit_split, &cmd_split, &dist_split};
    SwitchPlan* sws[3] = {&sw_l, &sw_c, &sw_d};
    for (int cat = 0; cat < 3; cat++) {
        write_count_code(bw, splits[cat]->num_types);
        if (splits[cat]->num_types >= 2) {
            SwitchPlan& sp = *sws[cat];
            write_prefix_code(bw, sp.type_lengths,
                              splits[cat]->num_types + 2);
            write_prefix_code(bw, sp.len_lengths, 26);
            bw.put(sp.len_enc.codes[sp.first_len_code],
                   sp.len_enc.lens[sp.first_len_code]);
            bw.put(sp.first_len - T.blk_base[sp.first_len_code],
                   (int)T.blk_extra[sp.first_len_code]);
        }
    }

    bw.put(npostfix, 2);
    bw.put(ndirect >> npostfix, 4);
    for (int t = 0; t < lit_split.num_types; t++)
        bw.put(context_mode, 2);

    write_count_code(bw, ntrees_l);
    if (ntrees_l >= 2)
        write_context_map(bw, cmap_l.data(),
                          lit_split.num_types * 64, ntrees_l);
    write_count_code(bw, ntrees_d);
    if (ntrees_d >= 2)
        write_context_map(bw, cmap_d.data(),
                          dist_split.num_types * 4, ntrees_d);

    static thread_local std::vector<Enc> lit_enc, cmd_enc, dist_enc;
    lit_enc.resize(ntrees_l);
    cmd_enc.resize(nct);
    dist_enc.resize(ntrees_d);
    for (int t = 0; t < ntrees_l; t++) {
        write_prefix_code(bw, &lit_lengths[(size_t)t * 256], 256);
        lit_enc[t].build(&lit_lengths[(size_t)t * 256], 256);
    }
    for (int t = 0; t < nct; t++) {
        write_prefix_code(bw, &cmd_lengths[(size_t)t * 704], 704);
        cmd_enc[t].build(&cmd_lengths[(size_t)t * 704], 704);
    }
    for (int t = 0; t < ntrees_d; t++) {
        write_prefix_code(bw, &dist_lengths[(size_t)t * dist_alpha],
                          (int)dist_alpha);
        dist_enc[t].build(&dist_lengths[(size_t)t * dist_alpha],
                          (int)dist_alpha);
    }

    mark("header");
    // ---- command stream ----
    auto emit_switch = [&](SwitchPlan& sp, size_t si) {
        int ts = sp.type_syms[si];
        int lc = sp.len_codes[si];
        bw.put(sp.type_enc.codes[ts], sp.type_enc.lens[ts]);
        bw.put(sp.len_enc.codes[lc], sp.len_enc.lens[lc]);
        bw.put(sp.len_extra[si].first, sp.len_extra[si].second);
    };
    if (!sw_c.active && !sw_l.active && !sw_d.active &&
        ntrees_l == 1 && nct == 1 && ntrees_d == 1) {
        // single tree per category (the trivial store and any
        // metablock the splitter left whole): no switch checks, no
        // per-symbol tree loads, and a register-resident bit
        // accumulator flushed a full word at a time (BW::put's two
        // read-modify-writes per symbol dominate this loop otherwise)
        const Enc& ce = cmd_enc[0];
        const Enc& le = lit_enc[0];
        const Enc& de = dist_enc[0];
        int64_t word = bw.pos >> 6;
        int off = (int)(bw.pos & 63);
        uint64_t acc = bw.w[word];
        auto push = [&](uint64_t bits, int nb) {
            bits &= (nb >= 64) ? ~0ull : ((1ull << nb) - 1);
            acc |= bits << off;
            off += nb;
            if (off >= 64) {
                bw.w[word++] = acc;
                off -= 64;
                acc = (off == 0) ? 0 : (bits >> (nb - off));
            }
        };
        int64_t dist_i2 = 0;
        int64_t lit_pos = start;  // literals stream straight from the
                                  // window data via the command walk
        for (int64_t c = 0; c < n_cmds; c++) {
            int64_t il = insert_len[c];
            if ((word << 6) + off + 192 + il * 16 > cap_bits) {
                bw.overflow = true;
                break;
            }
            int sym = (int)cmd_sym[c];
            int icode = T.cmd_ins_code[sym];
            int ccode = T.cmd_copy_code[sym];
            int64_t wire_copy = copy_len[c] == 0 ? 4 : copy_len[c];
            // cmd code (<=15b) + insert extra (<=24b) + copy extra
            // (<=24b) fit one 64-bit push
            int l0 = ce.lens[sym];
            int l1 = (int)T.ins_extra[icode];
            uint64_t v = (uint64_t)ce.codes[sym] |
                         ((uint64_t)(insert_len[c] - T.ins_base[icode])
                          << l0) |
                         ((uint64_t)(wire_copy - T.copy_base[ccode])
                          << (l0 + l1));
            push(v, l0 + l1 + (int)T.copy_extra[ccode]);
            const uint8_t* lp = data + lit_pos;
            int64_t j = 0;
            for (; j + 4 <= il; j += 4) {
                // 4 literal codes <=15b each: one push
                uint8_t b0 = lp[j], b1 = lp[j + 1], b2 = lp[j + 2],
                        b3 = lp[j + 3];
                int s0 = le.lens[b0];
                int s1 = s0 + le.lens[b1];
                int s2 = s1 + le.lens[b2];
                uint64_t lv = (uint64_t)le.codes[b0] |
                              ((uint64_t)le.codes[b1] << s0) |
                              ((uint64_t)le.codes[b2] << s1) |
                              ((uint64_t)le.codes[b3] << s2);
                push(lv, s2 + le.lens[b3]);
            }
            for (; j < il; j++) push(le.codes[lp[j]], le.lens[lp[j]]);
            lit_pos += il + copy_advance[c];
            if (copy_len[c] > 0 && !T.cmd_implicit[sym]) {
                int ds = (int)dist_syms[dist_i2];
                int dl = de.lens[ds];
                push((uint64_t)de.codes[ds] |
                         ((uint64_t)dist_extra[c] << dl),
                     dl + (int)dist_extra_bits[c]);
                dist_i2++;
            }
        }
        bw.w[word] = acc;
        bw.pos = (word << 6) + off;
        mark("emit1tree");
        return bw.overflow ? -1 : bw.pos;
    }
    size_t sw_li = 0, sw_ci = 0, sw_di = 0;
    int64_t lit_i = 0, dist_i = 0;
    for (int64_t c = 0; c < n_cmds; c++) {
        if (sw_c.active && sw_ci < sw_c.switch_at.size() &&
            sw_c.switch_at[sw_ci] == c)
            emit_switch(sw_c, sw_ci++);
        int sym = (int)cmd_sym[c];
        // nct == 1 leaves cmd_split.types empty (splits disabled but a
        // multi-tree literal context map routed us off the 1-tree path)
        int tr = nct == 1 ? 0 : cmd_split.types[c];
        bw.put(cmd_enc[tr].codes[sym], cmd_enc[tr].lens[sym]);
        int icode = T.cmd_ins_code[sym];
        int ccode = T.cmd_copy_code[sym];
        int64_t wire_copy = copy_len[c] == 0 ? 4 : copy_len[c];
        bw.put(insert_len[c] - T.ins_base[icode],
               (int)T.ins_extra[icode]);
        bw.put(wire_copy - T.copy_base[ccode],
               (int)T.copy_extra[ccode]);
        for (int64_t j = 0; j < insert_len[c]; j++) {
            if (sw_l.active && sw_li < sw_l.switch_at.size() &&
                sw_l.switch_at[sw_li] == lit_i)
                emit_switch(sw_l, sw_li++);
            int t = multi_l ? lit_tree[lit_i] : 0;
            uint8_t b = literals[lit_i];
            bw.put(lit_enc[t].codes[b], lit_enc[t].lens[b]);
            lit_i++;
        }
        if (copy_len[c] > 0 && !T.cmd_implicit[sym]) {
            if (sw_d.active && sw_di < sw_d.switch_at.size() &&
                sw_d.switch_at[sw_di] == dist_i)
                emit_switch(sw_d, sw_di++);
            int t = multi_d ? dist_tree[dist_i] : 0;
            int ds = (int)dist_syms[dist_i];
            bw.put(dist_enc[t].codes[ds], dist_enc[t].lens[ds]);
            bw.put(dist_extra[c], (int)dist_extra_bits[c]);
            dist_i++;
        }
    }
    return bw.overflow ? -1 : bw.pos;
}

// ---------------------------------------------------------------------------
// fused resolve + store: one native call per metablock for the q4-q9
// production path (distance-cache resolution from hotloops.cpp feeds
// store_metablock_native directly, removing the per-metablock Python
// glue between them)
// ---------------------------------------------------------------------------

extern "C" void resolve_commands_native(
    const int64_t*, const int64_t*, const int64_t*, const int64_t*,
    int64_t, int64_t, int64_t, int64_t*, int64_t, int64_t,
    int64_t*, int64_t*, int64_t*, uint8_t*, int64_t*);

extern "C" int64_t encode_metablock_native(
    const uint8_t* data, int64_t start, int64_t mlen, int64_t is_last,
    int64_t n_cmds, const int64_t* insert_len, const int64_t* wire_copy,
    const int64_t* distance, const int64_t* advance,
    int64_t* cache_io, int64_t window_size,
    int64_t npostfix, int64_t ndirect, int64_t dist_alpha,
    int64_t quality, int64_t context_mode,
    int64_t num_lit_ctx, const int64_t* lit_static_map,
    const uint8_t* lut0, const uint8_t* lut1,
    int64_t enable_splits,
    const int32_t* ext_lit_types, int64_t ext_lit_ntypes,
    uint64_t* out_words, int64_t cap_bits, int64_t bit0)
{
    static thread_local std::vector<int64_t> code, extra, bits, sym;
    static thread_local std::vector<uint8_t> ul;
    code.resize(n_cmds); extra.resize(n_cmds); bits.resize(n_cmds);
    sym.resize(n_cmds); ul.resize(n_cmds);
    int64_t cache[4] = {cache_io[0], cache_io[1], cache_io[2],
                        cache_io[3]};
    resolve_commands_native(insert_len, advance, distance, wire_copy,
                            n_cmds, npostfix, ndirect, cache, start,
                            window_size, code.data(), extra.data(),
                            bits.data(), ul.data(), sym.data());
    int64_t r = store_metablock_native(
        data, start, mlen, is_last, n_cmds, insert_len, wire_copy,
        code.data(), extra.data(), bits.data(), sym.data(), advance,
        npostfix, ndirect, dist_alpha, quality, context_mode,
        num_lit_ctx, lit_static_map, lut0, lut1, enable_splits,
        ext_lit_types, ext_lit_ntypes, out_words, cap_bits, bit0);
    if (r >= 0) {
        // commit the rolled-forward distance cache only when the
        // compressed form is used (an uncompressed fallback leaves the
        // decoder's cache untouched)
        cache_io[0] = cache[0]; cache_io[1] = cache[1];
        cache_io[2] = cache[2]; cache_io[3] = cache[3];
    }
    return r;
}

// ---------------------------------------------------------------------------
// distance NPOSTFIX/NDIRECT search (reference BrotliBuildMetaBlock,
// metablock.rs:158-208; exact port of metablock.choose_distance_params:
// cost = depth-limited Huffman bits + serialized tree description +
// extra bits, swept over npostfix 0-3 x 16 ndirect wire values with
// the reference's two-strike early break per lane)
// ---------------------------------------------------------------------------

extern "C" void choose_dist_params_native(
    const int64_t* distance, const int64_t* dist_code_now,
    const int64_t* cmd_sym, const int64_t* copy_len, int64_t n_cmds,
    int64_t* npostfix_out, int64_t* ndirect_out)
{
    using namespace sb;
    init_tables();
    int64_t short_hist[16] = {0};
    std::vector<int64_t> far;
    far.reserve(n_cmds);
    for (int64_t c = 0; c < n_cmds; c++) {
        if (copy_len[c] <= 0 || T.cmd_implicit[cmd_sym[c]]) continue;
        if (dist_code_now[c] >= 16) far.push_back(distance[c]);
        else short_hist[dist_code_now[c]]++;
    }
    *npostfix_out = 0;
    *ndirect_out = 0;
    if (far.empty()) return;

    auto stream_cost = [&](const int64_t* hist, int alpha,
                           int64_t extra_cost) -> double {
        static thread_local std::vector<int64_t> h;
        h.assign(hist, hist + alpha);
        int64_t s = 0;
        for (int i = 0; i < alpha; i++) s += h[i];
        if (s == 0) { h.assign(alpha, 0); h[0] = 1; }
        optimize_rle(h.data(), alpha);
        std::vector<uint8_t> lengths(alpha);
        huffman_lengths(h.data(), alpha, 15, lengths.data());
        double code_bits = 0;
        for (int i = 0; i < alpha; i++)
            code_bits += (double)hist[i] * lengths[i];
        // serialized tree description size via a counting writer
        std::vector<uint64_t> scratch((size_t)(alpha / 2 + 64), 0);
        BW bw{scratch.data(), (int64_t)scratch.size() * 64};
        write_prefix_code(bw, lengths.data(), alpha);
        return code_bits + (double)bw.pos + (double)extra_cost;
    };

    double best = 1e300;
    int64_t best_np = 0, best_nd = 0;
    for (int np = 0; np < 4; np++) {
        double prev = -1;
        bool have_prev = false;
        for (int wire = 0; wire < 16; wire++) {
            int64_t nd = (int64_t)wire << np;
            int alpha = (int)(16 + nd + (48 << np));
            std::vector<int64_t> hist(alpha, 0);
            for (int i = 0; i < 16; i++) hist[i] = short_hist[i];
            int64_t extra_cost = 0;
            for (int64_t d : far) {
                if (d <= nd) {
                    hist[16 + d - 1]++;
                    continue;
                }
                int64_t dd = d - nd - 1;
                int64_t lcode = dd & ((1 << np) - 1);
                int64_t dp = dd >> np;
                int64_t nb = 63 - __builtin_clzll((uint64_t)(dp + 4)) - 1;
                int64_t prefix = ((dp + 4) >> nb) & 1;
                int64_t hcode = 2 * (nb - 1) + prefix;
                int64_t sym = 16 + nd + ((hcode << np) | lcode);
                if (sym < alpha) hist[sym]++;
                extra_cost += nb;
            }
            double total = stream_cost(hist.data(), alpha, extra_cost);
            if (total < best) { best = total; best_np = np; best_nd = nd; }
            if (have_prev && total > prev && total > best) break;
            prev = total;
            have_prev = true;
        }
    }
    *npostfix_out = best_np;
    *ndirect_out = best_nd;
}

// ---------------------------------------------------------------------------
// fully-native q0/q1 pipeline: fragment parse (worker thread) +
// trivial store + bit-level stream assembly, no Python in the loop.
// The Python fragment tier paid ~4 ctypes transitions + 4 array
// copies per metablock and never reached parse/store overlap; this
// driver is the fragment-tier analog of the reference's
// BrotliCompressFragmentFast one-shot entry
// (src/enc/compress_fragment.rs) with the store pipelined behind the
// parse.
// ---------------------------------------------------------------------------

#include <future>

extern "C" int64_t fragment_parse_core(
    const uint8_t*, int64_t, int64_t, int64_t, int64_t, int32_t*,
    const int64_t*, int64_t, int64_t*, int64_t*, int64_t*,
    int64_t*, int64_t*, int64_t);

namespace {

inline void put_bits(uint64_t* dst, int64_t& pos, uint64_t bits,
                     int nb) {
    if (nb == 0) return;
    int64_t off = pos & 63, w = pos >> 6;
    dst[w] |= bits << off;
    if (off + nb > 64) dst[w + 1] |= bits >> (64 - off);
    pos += nb;
}

// ISUNCOMPRESSED metablock (RFC 9.2; caller appends the empty-last
// block if this ends the stream)
inline void put_uncompressed(uint64_t* dst, int64_t& pos,
                             const uint8_t* data, int64_t mlen) {
    put_bits(dst, pos, 0, 1);  // ISLAST
    int lg = mlen > 1 ? 64 - __builtin_clzll((uint64_t)(mlen - 1)) : 1;
    int mnibbles = std::max(4, (lg + 3) / 4);
    put_bits(dst, pos, (uint64_t)(mnibbles - 4), 2);
    put_bits(dst, pos, (uint64_t)(mlen - 1), mnibbles * 4);
    put_bits(dst, pos, 1, 1);  // ISUNCOMPRESSED
    pos = (pos + 7) & ~7ll;    // align (dst is zero here already)
    std::memcpy((uint8_t*)dst + (pos >> 3), data, (size_t)mlen);
    pos += mlen * 8;
}

}  // namespace

extern "C" int64_t compress_fragment_pipeline_native(
    const uint8_t* data, int64_t n, int64_t window_size, int64_t span,
    int64_t table_bits, int64_t quality, int64_t suppress_last,
    int64_t bit0, int64_t* cache_io, uint64_t* out_words,
    int64_t cap_bits)
{
    std::vector<int64_t> bounds;
    for (int64_t b = span; b < n; b += span) bounds.push_back(b);
    bounds.push_back(n);
    int nseg = (int)bounds.size();

    // persistent per-thread state: re-faulting ~16MB of slot/table
    // pages per call costs more than the parse itself on short inputs
    static thread_local std::vector<int32_t> table;
    table.assign((size_t)1 << table_bits, 0);
    struct Slot {
        std::vector<int64_t> ins, cps, dst, adv;
        int64_t cnt = 0;
    };
    static thread_local Slot slots[2];
    // the async worker must use the CALLER's table: a thread_local
    // name inside a lambda rebinds to the executing thread's instance,
    // so hand the pointer over explicitly
    int32_t* table_ptr = table.data();
    auto parse_seg = [&, table_ptr](int g, Slot& s) {
        int64_t pos0 = g == 0 ? 0 : bounds[g - 1];
        int64_t bound = bounds[g];
        int64_t cap = (bound - pos0) / 4 + 16;
        if ((int64_t)s.ins.size() < cap) {
            s.ins.resize(cap); s.cps.resize(cap);
            s.dst.resize(cap); s.adv.resize(cap);
        }
        int64_t segc = 0;
        s.cnt = fragment_parse_core(
            data, n, pos0, window_size, table_bits, table_ptr,
            &bound, 1, s.ins.data(), s.cps.data(), s.dst.data(),
            s.adv.data(), &segc, cap);
    };

    static const int64_t kZeroMap[64] = {0};
    static const uint8_t kZeroLut[256] = {0};
    // start at the stream's bit phase (the Python writer holds
    // bit0 (0..7) bits of stream header in its partial last byte) so
    // the ISUNCOMPRESSED byte alignment lands on true stream bytes;
    // the first bit0 bits of out_words stay zero and the caller ORs
    // them away (BitWriter.append_packed_phased)
    int64_t pos = bit0 & 7;
    std::future<void> fut;
    parse_seg(0, slots[0]);
    int64_t seg_start = 0;
    for (int g = 0; g < nseg; g++) {
        if (g + 1 < nseg)
            fut = std::async(std::launch::async, parse_seg, g + 1,
                             std::ref(slots[(g + 1) & 1]));
        Slot& s = slots[g & 1];
        int64_t mlen = bounds[g] - seg_start;
        bool is_final = g == nseg - 1;
        bool mark_last = is_final && !suppress_last;
        // the store ORs straight into the output at the running bit
        // position — no per-metablock scratch memset or copy pass.
        // Anything above 8*mlen+40 bits is replaced by an
        // ISUNCOMPRESSED block, so cap the in-place write there.
        int64_t mb_cap = 8 * mlen + 4096;
        if (pos + mb_cap + 64 > cap_bits) {
            if (fut.valid()) fut.get();
            return -1;
        }
        int64_t base_w = pos >> 6;
        int64_t phase = pos & 63;
        int64_t cache_snap[4] = {cache_io[0], cache_io[1], cache_io[2],
                                 cache_io[3]};
        int64_t r = encode_metablock_native(
            data, seg_start, mlen, mark_last ? 1 : 0, s.cnt,
            s.ins.data(), s.cps.data(), s.dst.data(), s.adv.data(),
            cache_io, window_size, 0, 0, 64, quality, 0, 1, kZeroMap,
            kZeroLut, kZeroLut, 0, nullptr, 0, out_words + base_w,
            mb_cap + phase, phase);
        int64_t take = r >= 0 ? r - phase : -1;
        if (take > 8 * mlen + 40) take = -1;
        if (take >= 0) {
            pos += take;
        } else {
            // expansion fallback (reference encode.rs:2141-2163):
            // zero what the failed store wrote (preserving the bits
            // below `phase` in the boundary word) and emit the block
            // uncompressed.  The store committed the distance cache,
            // but the wire carries the raw block — the decoder's
            // cache is unchanged, so roll ours back.
            for (int c = 0; c < 4; c++) cache_io[c] = cache_snap[c];
            out_words[base_w] &= phase ? (1ull << phase) - 1 : 0;
            std::memset(out_words + base_w + 1, 0,
                        (size_t)((mb_cap + phase) / 64 + 1) * 8);
            put_uncompressed(out_words, pos, data + seg_start, mlen);
            if (mark_last) {
                put_bits(out_words, pos, 1, 1);  // ISLAST
                put_bits(out_words, pos, 1, 1);  // ISLASTEMPTY
            }
        }
        seg_start = bounds[g];
        if (fut.valid()) fut.get();
    }
    return pos;
}

// ---------------------------------------------------------------------------
// fully-native q2-q3 pipeline: basic-tier parse session (worker
// thread) + trivial store + bit-level stream assembly — the
// ---------------------------------------------------------------------------
// fully-preallocated encode (the reference's declare_stack_allocator
// mode, src/enc/combined_alloc.rs:33-57 / README seccomp example):
// the caller provides one scratch arena for the tier's table and
// command buffers, the driver runs single-threaded (no std::async —
// jails forbid clone), and after BrotliEncoderPreallocWarmup() has
// sized this thread's small store pools, a compress call performs
// ZERO heap allocations (mallinfo-gated in tests/test_capi.py).
// Supported tier: q0/q1 (the fragment tier — the reference's own
// no-alloc examples live in this speed class).
// ---------------------------------------------------------------------------

extern "C" int64_t compress_fragment_prealloc_native(
    const uint8_t* data, int64_t n, int64_t lgwin, int64_t quality,
    uint8_t* scratch, int64_t scratch_size,
    uint64_t* out_words, int64_t cap_bits)
{
    if (lgwin < 10) lgwin = 10;
    if (lgwin > 24) lgwin = 24;
    int64_t window = (int64_t(1) << lgwin) - 16;
    int64_t table_bits = quality <= 0 ? 15 : 16;
    // modest metablocks keep the command arena small (~2MB) — the
    // no-alloc mode trades a sliver of ratio for a bounded footprint
    int64_t span = std::min<int64_t>(int64_t(1) << lgwin,
                                     int64_t(1) << 18);

    // carve the arena: table, then one command-slot set
    int64_t used = 0;
    auto carve = [&](int64_t bytes) -> uint8_t* {
        int64_t off = (used + 63) & ~int64_t(63);
        if (off + bytes > scratch_size) return nullptr;
        used = off + bytes;
        return scratch + off;
    };
    int64_t tbytes = (int64_t(4) << table_bits);
    int64_t cap_cmds = span / 4 + 16;
    auto* table = reinterpret_cast<int32_t*>(carve(tbytes));
    auto* oi = reinterpret_cast<int64_t*>(carve(cap_cmds * 8));
    auto* oc = reinterpret_cast<int64_t*>(carve(cap_cmds * 8));
    auto* od = reinterpret_cast<int64_t*>(carve(cap_cmds * 8));
    auto* oa = reinterpret_cast<int64_t*>(carve(cap_cmds * 8));
    if (!table || !oa) return -2;  // arena too small
    std::memset(table, 0, (size_t)tbytes);
    std::memset(out_words, 0, (size_t)(cap_bits / 64 + 1) * 8);

    int64_t pos = 0;
    {   // stream header (RFC WBITS)
        uint64_t hb;
        int hn;
        if (lgwin == 16) { hb = 0; hn = 1; }
        else if (lgwin == 17) { hb = 1; hn = 7; }
        else if (lgwin > 17) { hb = ((uint64_t)(lgwin - 17) << 1) | 1;
                               hn = 4; }
        else { hb = ((uint64_t)(lgwin - 8) << 4) | 1; hn = 7; }
        put_bits(out_words, pos, hb, hn);
    }

    static const int64_t kZeroMap[64] = {0};
    static const uint8_t kZeroLut[256] = {0};
    int64_t cache_io[4] = {4, 11, 15, 16};
    if (n == 0) {
        put_bits(out_words, pos, 1, 1);  // ISLAST
        put_bits(out_words, pos, 1, 1);  // ISLASTEMPTY
        return pos;
    }
    int64_t seg_start = 0;
    while (seg_start < n) {
        int64_t bound = std::min(seg_start + span, n);
        int64_t mlen = bound - seg_start;
        bool is_last = bound == n;
        int64_t segc = 0;
        int64_t cnt = fragment_parse_core(
            data, n, seg_start, window, table_bits, table, &bound, 1,
            oi, oc, od, oa, &segc, cap_cmds);
        int64_t mb_cap = 8 * mlen + 4096;
        if (pos + mb_cap + 64 > cap_bits) return -1;
        int64_t base_w = pos >> 6;
        int64_t phase = pos & 63;
        int64_t cache_snap[4] = {cache_io[0], cache_io[1],
                                 cache_io[2], cache_io[3]};
        int64_t r = encode_metablock_native(
            data, seg_start, mlen, is_last ? 1 : 0, cnt, oi, oc, od,
            oa, cache_io, window, 0, 0, 64, quality, 0, 1, kZeroMap,
            kZeroLut, kZeroLut, 0, nullptr, 0, out_words + base_w,
            mb_cap + phase, phase);
        int64_t take = r >= 0 ? r - phase : -1;
        if (take > 8 * mlen + 40) take = -1;
        if (take >= 0) {
            pos += take;
        } else {
            for (int c = 0; c < 4; c++) cache_io[c] = cache_snap[c];
            out_words[base_w] &= phase ? (1ull << phase) - 1 : 0;
            std::memset(out_words + base_w + 1, 0,
                        (size_t)((mb_cap + phase) / 64 + 1) * 8);
            put_uncompressed(out_words, pos, data + seg_start, mlen);
            if (is_last) {
                put_bits(out_words, pos, 1, 1);
                put_bits(out_words, pos, 1, 1);
            }
        }
        seg_start = bound;
    }
    return pos;
}

// ---------------------------------------------------------------------------
// fully-preallocated RING-TIER encode (q2-q9): the session analog of
// compress_fragment_prealloc_native above.  Every session buffer
// (rings, counters, hash scratch, command arrays) carves from the
// caller's arena via the hotloops session-arena hooks; the store side
// reuses the warmed thread_local pools, so after
// BrotliEncoderPreallocWarmup a compress performs zero heap
// allocations (mallinfo-gated in tests).  Reference:
// combined_alloc.rs:33-57 declare_stack_allocator mode at every
// quality.
// ---------------------------------------------------------------------------

extern "C" {
void parse_session_set_arena(uint8_t*, int64_t);
int64_t parse_session_arena_failed(void);
int64_t parse_session_prealloc_hashes(void*, int64_t);
uint8_t* parse_session_arena_carve(int64_t);
void* parse_session_begin(
    const uint8_t*, int64_t, int64_t, int64_t, int64_t, int64_t,
    int64_t, int64_t, int64_t, int64_t, int64_t,
    const int64_t*, int64_t, int64_t, const uint8_t*, const int64_t*,
    const int64_t*, const int64_t*, const int64_t*, int64_t,
    const int64_t*);
int64_t parse_session_next(void*, int64_t, int64_t*, int64_t*,
                           int64_t*, int64_t*, int64_t);
void parse_session_end(void*);
}

extern "C" int64_t compress_session_prealloc_native(
    const uint8_t* data, int64_t n, int64_t lgwin, int64_t span,
    int64_t quality,
    int64_t k, int64_t bucket_bits, int64_t k8, int64_t bucket_bits8,
    int64_t hash_len, int64_t n_cache, int64_t lbs,
    int64_t ctx_mode, int64_t nlc, const int64_t* smap,
    const uint8_t* lut0, const uint8_t* lut1,
    uint8_t* scratch, int64_t scratch_size,
    uint64_t* out_words, int64_t cap_bits)
{
    int64_t window_size = (int64_t(1) << lgwin) - 16;
    // the arena was budgeted from the INPUT size
    // (BrotliEncoderPreallocScratchSizeQ spans at most
    // max(input, 4096)), so the metablock span must not exceed it —
    // an lgwin-derived span larger than the input over-carves the
    // hash/command buffers and fails small-input encodes
    span = std::min(span, std::max<int64_t>(n, 4096));
    int64_t cache_io[4] = {4, 11, 15, 16};
    parse_session_set_arena(scratch, scratch_size);
    void* sess = parse_session_begin(
        data, n, 0, window_size, k, bucket_bits, k8, bucket_bits8,
        hash_len, n_cache, lbs, nullptr, 0, 0, nullptr, nullptr,
        nullptr, nullptr, nullptr, 0, cache_io);
    int64_t cap_cmds = span / 2 + 16;
    int64_t* oi = nullptr;
    int64_t* oc = nullptr;
    int64_t* od = nullptr;
    int64_t* oa = nullptr;
    if (sess && parse_session_prealloc_hashes(sess, span + 256) == 0) {
        oi = (int64_t*)parse_session_arena_carve(cap_cmds * 8);
        oc = (int64_t*)parse_session_arena_carve(cap_cmds * 8);
        od = (int64_t*)parse_session_arena_carve(cap_cmds * 8);
        oa = (int64_t*)parse_session_arena_carve(cap_cmds * 8);
    }
    if (!sess || !oa || parse_session_arena_failed()) {
        if (sess) parse_session_end(sess);
        parse_session_set_arena(nullptr, 0);
        return -2;
    }
    std::memset(out_words, 0, (size_t)(cap_bits / 64 + 1) * 8);

    int64_t pos = 0;
    {   // stream header (RFC WBITS)
        uint64_t hb;
        int hn;
        if (lgwin == 16) { hb = 0; hn = 1; }
        else if (lgwin == 17) { hb = 1; hn = 7; }
        else if (lgwin > 17) { hb = ((uint64_t)(lgwin - 17) << 1) | 1;
                               hn = 4; }
        else { hb = ((uint64_t)(lgwin - 8) << 4) | 1; hn = 7; }
        put_bits(out_words, pos, hb, hn);
    }
    int64_t rc = 0;
    if (n == 0) {
        put_bits(out_words, pos, 1, 1);  // ISLAST
        put_bits(out_words, pos, 1, 1);  // ISLASTEMPTY
        parse_session_end(sess);
        parse_session_set_arena(nullptr, 0);
        return pos;
    }
    int64_t seg_start = 0;
    while (seg_start < n) {
        int64_t bound = std::min(seg_start + span, n);
        int64_t mlen = bound - seg_start;
        bool is_last = bound == n;
        int64_t cnt = parse_session_next(sess, bound, oi, oc, od, oa,
                                         cap_cmds);
        int64_t mb_cap = 9 * mlen + (1 << 16);
        if (pos + mb_cap + 64 > cap_bits) { rc = -1; break; }
        int64_t base_w = pos >> 6;
        int64_t phase = pos & 63;
        int64_t cache_snap[4] = {cache_io[0], cache_io[1],
                                 cache_io[2], cache_io[3]};
        int64_t r = encode_metablock_native(
            data, seg_start, mlen, is_last ? 1 : 0, cnt, oi, oc, od,
            oa, cache_io, window_size, 0, 0, 64, quality, ctx_mode,
            nlc, smap, lut0, lut1, quality >= 4 ? 1 : 0, nullptr, 0,
            out_words + base_w, mb_cap + phase, phase);
        int64_t take = r >= 0 ? r - phase : -1;
        if (take > 8 * mlen + 40) take = -1;
        if (take >= 0) {
            pos += take;
        } else {
            for (int c = 0; c < 4; c++) cache_io[c] = cache_snap[c];
            out_words[base_w] &= phase ? (1ull << phase) - 1 : 0;
            std::memset(out_words + base_w + 1, 0,
                        (size_t)((mb_cap + phase) / 64 + 1) * 8);
            put_uncompressed(out_words, pos, data + seg_start, mlen);
            if (is_last) {
                put_bits(out_words, pos, 1, 1);
                put_bits(out_words, pos, 1, 1);
            }
        }
        seg_start = bound;
    }
    parse_session_end(sess);
    parse_session_set_arena(nullptr, 0);
    return rc < 0 ? rc : pos;
}

// basic-tier analog of compress_fragment_pipeline_native above.  The
// Python-orchestrated loop pays per-metablock ctypes transitions +
// numpy marshalling (~0.3ms x 23 metablocks on a 3MB input at 128KiB
// spans) and GIL handoffs between the parse worker and the store;
// this driver keeps the whole metablock loop native.
// ---------------------------------------------------------------------------

extern "C" {
void* parse_session_begin(
    const uint8_t*, int64_t, int64_t, int64_t, int64_t, int64_t,
    int64_t, int64_t, int64_t, int64_t, int64_t,
    const int64_t*, int64_t, int64_t, const uint8_t*, const int64_t*,
    const int64_t*, const int64_t*, const int64_t*, int64_t,
    const int64_t*);
int64_t parse_session_next(void*, int64_t, int64_t*, int64_t*,
                           int64_t*, int64_t*, int64_t);
void parse_session_end(void*);
}

extern "C" int64_t compress_session_pipeline_native(
    const uint8_t* data, int64_t n, int64_t window_size, int64_t span,
    int64_t quality,
    int64_t k, int64_t bucket_bits, int64_t k8, int64_t bucket_bits8,
    int64_t hash_len, int64_t n_cache, int64_t lbs,
    const int64_t* dict_table, int64_t dict_hash_bits,
    int64_t dict_slots, const uint8_t* dict_words_flat,
    const int64_t* dict_word_len, const int64_t* dict_word_idx,
    const int64_t* dict_size_bits, const int64_t* omit_ids,
    int64_t suppress_last, int64_t bit0, int64_t* cache_io,
    uint64_t* out_words, int64_t cap_bits)
{
    std::vector<int64_t> bounds;
    for (int64_t b = span; b < n; b += span) bounds.push_back(b);
    bounds.push_back(n);
    int nseg = (int)bounds.size();

    void* sess = parse_session_begin(
        data, n, 0, window_size, k, bucket_bits, k8, bucket_bits8,
        hash_len, n_cache, lbs, dict_table, dict_hash_bits, dict_slots,
        dict_words_flat, dict_word_len, dict_word_idx, dict_size_bits,
        omit_ids, 0, cache_io);

    struct Slot {
        std::vector<int64_t> ins, cps, dst, adv;
        int64_t cnt = 0;
    };
    static thread_local Slot slots[2];
    auto parse_seg = [&](int g, Slot& s) {
        int64_t pos0 = g == 0 ? 0 : bounds[g - 1];
        int64_t bound = bounds[g];
        int64_t cap = (bound - pos0) / 2 + 16;
        if ((int64_t)s.ins.size() < cap) {
            s.ins.resize(cap); s.cps.resize(cap);
            s.dst.resize(cap); s.adv.resize(cap);
        }
        s.cnt = parse_session_next(sess, bound, s.ins.data(),
                                   s.cps.data(), s.dst.data(),
                                   s.adv.data(), cap);
    };

    static const int64_t kZeroMap2[64] = {0};
    static const uint8_t kZeroLut2[256] = {0};
    int64_t pos = bit0 & 7;
    std::future<void> fut;
    parse_seg(0, slots[0]);
    int64_t seg_start = 0;
    int64_t rc = 0;
    for (int g = 0; g < nseg; g++) {
        if (g + 1 < nseg)
            fut = std::async(std::launch::async, parse_seg, g + 1,
                             std::ref(slots[(g + 1) & 1]));
        Slot& s = slots[g & 1];
        int64_t mlen = bounds[g] - seg_start;
        bool is_final = g == nseg - 1;
        bool mark_last = is_final && !suppress_last;
        int64_t mb_cap = 8 * mlen + 4096;
        if (pos + mb_cap + 64 > cap_bits) {
            if (fut.valid()) fut.get();
            rc = -1;
            break;
        }
        int64_t base_w = pos >> 6;
        int64_t phase = pos & 63;
        int64_t cache_snap[4] = {cache_io[0], cache_io[1], cache_io[2],
                                 cache_io[3]};
        int64_t r = encode_metablock_native(
            data, seg_start, mlen, mark_last ? 1 : 0, s.cnt,
            s.ins.data(), s.cps.data(), s.dst.data(), s.adv.data(),
            cache_io, window_size, 0, 0, 64, quality, 0, 1, kZeroMap2,
            kZeroLut2, kZeroLut2, 0, nullptr, 0, out_words + base_w,
            mb_cap + phase, phase);
        int64_t take = r >= 0 ? r - phase : -1;
        if (take > 8 * mlen + 40) take = -1;
        if (take >= 0) {
            pos += take;
        } else {
            // expansion fallback: raw block, decoder cache untouched
            for (int c = 0; c < 4; c++) cache_io[c] = cache_snap[c];
            out_words[base_w] &= phase ? (1ull << phase) - 1 : 0;
            std::memset(out_words + base_w + 1, 0,
                        (size_t)((mb_cap + phase) / 64 + 1) * 8);
            put_uncompressed(out_words, pos, data + seg_start, mlen);
            if (mark_last) {
                put_bits(out_words, pos, 1, 1);  // ISLAST
                put_bits(out_words, pos, 1, 1);  // ISLASTEMPTY
            }
        }
        seg_start = bounds[g];
        if (fut.valid()) fut.get();
    }
    parse_session_end(sess);
    return rc < 0 ? rc : pos;
}
