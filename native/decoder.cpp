// Native RFC 7932 decoder core.
//
// Semantics mirror brotli_tpu/decode/decoder.py (the tested Python
// oracle; tests assert byte-identical output on fixtures and fuzz).
// Exported with a plain C ABI for ctypes.  The TPU batched path decodes
// independent streams in parallel; this is the single-stream host
// runtime (reference surface: BrotliDecompressStream, src/lib.rs:33-52).
//
// Error codes: >= 0 output length; -1 needs more input (truncated);
// -2 corrupt stream; -3 output buffer too small.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cstdio>
#include <vector>
#include <cstdlib>
// compile-gated trace for decoder debugging (-DBROTLI_DEC_DBG):
// a runtime env check costs a guarded static + branch per command in
// the hot loop, so the trace is opt-in at build time
#ifdef BROTLI_DEC_DBG
#define DBG(...) std::fprintf(stderr, __VA_ARGS__)
#else
#define DBG(...) do {} while (0)
#endif

namespace {

// Shift-register bit reader: the next bits sit at the LSB of `bits`,
// so a prefix-table index is ready one shift after the previous symbol
// resolves (no pos-relative shift on the critical path).  Reads
// zero-pad past the end; truncation is detected by the monotone
// `over()` check at command/header granularity, keeping bounds tests
// off the per-symbol path.
// env-gated work counters: [0] commands, [1] trivial literals,
// [2] ctx literals, [3] dist symbols, [4] dict refs, [5] block
// switches
// thread_local: debug-only instrumentation, but concurrent decodes
// (workpool verification, multi-threaded callers) must not race on
// the accumulators — each thread reports its own totals
static thread_local int64_t* dec_ctr = nullptr;
static thread_local int64_t dec_ctr_store[8];
// opt-in per-section cycle split (BROTLI_TPU_DEC_CTR=2): [0] command
// head, [1] literals, [2] distance, [3] copy.  rdtsc pairs around the
// sections distort the measurement (~10-20%) but the RATIOS locate
// the expensive leg per content class
static thread_local uint64_t dec_cyc[4];
static thread_local int dec_cyc_on = 0;
static inline uint64_t dec_tsc() {
#if defined(__x86_64__)
    unsigned lo, hi;
    __asm__ __volatile__("rdtsc" : "=a"(lo), "=d"(hi));
    return ((uint64_t)hi << 32) | lo;
#else
    return 0;
#endif
}

struct BitReader {
    const uint8_t* data;
    int64_t size;       // bytes
    int64_t pos;        // absolute bit position (consumed bits)
    uint64_t bits = 0;  // upcoming bits, LSB-first
    int64_t avail = 0;  // valid bit count in `bits`

    inline void refill() {
        int64_t b = pos >> 3;
        uint64_t v = 0;
        int64_t rem = size - b;
        if (__builtin_expect(rem >= 8, 1)) {
            std::memcpy(&v, data + b, 8);
        } else if (rem > 0) {
            std::memcpy(&v, data + b, (size_t)rem);
        }
        int sh = (int)(pos & 7);
        bits = v >> sh;
        avail = 64 - sh;    // >= 57
    }

    inline uint64_t peek(int nbits) {
        if (__builtin_expect(avail < nbits, 0)) refill();
        return bits & ((1ull << nbits) - 1);
    }
    // skip of <= 57 bits already peeked (shift amount must stay < 64)
    inline void skip(int nbits) {
        bits >>= nbits;
        avail -= nbits;
        pos += nbits;
    }
    // arbitrary-length skip (uncompressed/metadata payloads)
    inline void skip_bulk(int64_t nbits) {
        pos += nbits;
        avail = 0;
    }
    inline uint64_t read(int nbits) {
        uint64_t v = peek(nbits);
        skip(nbits);
        return v;
    }
    // a refill delivers at most 57 valid bits; large-window distance
    // codes can carry up to 62 extra bits — split across two windows
    inline uint64_t read_long(int nbits) {
        if (__builtin_expect(nbits <= 57, 1)) return read(nbits);
        uint64_t lo = read(32);
        return lo | (read(nbits - 32) << 32);
    }
    inline bool over() const { return pos > size * 8; }
    inline bool align_ok() {   // align to byte; padding must be zero
        int n = (int)((-pos) & 7);
        return read(n) == 0;
    }
    inline bool at_least(int64_t nbits) {
        return pos + nbits <= size * 8;
    }
};

// two-level prefix decode table: a 512-entry root (9-bit peek) plus
// per-prefix subtables for codes longer than 9 bits.  Root entries are
// (sym << 4 | len) for direct codes; for long prefixes len holds
// 9 + sub_bits and sym holds the subtable base.  Keeps every hot tree
// within ~2KB (the flat 2^15 layout thrashed L1 on literal-heavy data).
struct PrefixTable {
    int32_t* tab = nullptr;
    int max_len = 0;
    int single = -1;  // kept for introspection

    inline int decode(BitReader& br) {
        uint64_t bits = br.peek(15);
        int32_t e = tab[bits & 511];
        int l = e & 15;
        if (__builtin_expect(l > 9, 0)) {
            e = tab[(e >> 4) + ((bits >> 9) & ((1u << (l - 9)) - 1))];
            l = e & 15;
        }
        br.skip(l);
        return e >> 4;
    }
};

// decode against a raw root-table pointer (the hot loops hoist the
// per-segment table out of the PrefixTable struct)
static inline int decode_tab(BitReader& br, const int32_t* tab) {
    uint64_t bits = br.peek(15);
    int32_t e = tab[bits & 511];
    int l = e & 15;
    if (__builtin_expect(l > 9, 0)) {
        e = tab[(e >> 4) + ((bits >> 9) & ((1u << (l - 9)) - 1))];
        l = e & 15;
    }
    br.skip(l);
    return e >> 4;
}

// 10-bit-root variant for the big alphabets (704-symbol commands,
// wide distance codes): a 1024-entry root resolves most symbols in
// one load where the 512-entry root would chase a subtable
static inline int decode_tab10(BitReader& br, const int32_t* tab) {
    uint64_t bits = br.peek(15);
    int32_t e = tab[bits & 1023];
    int l = e & 15;
    if (__builtin_expect(l > 10, 0)) {
        e = tab[(e >> 4) + ((bits >> 10) & ((1u << (l - 10)) - 1))];
        l = e & 15;
    }
    br.skip(l);
    return e >> 4;
}

struct TableArena {
    int32_t* mem;
    int64_t cap;
    int64_t used = 0;
    int32_t* alloc(int64_t n) {
        if (used + n > cap) return nullptr;
        int32_t* p = mem + used;
        used += n;
        return p;
    }
};

static const int64_t kInsertBase[24] = {
    0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194,
    322, 578, 1090, 2114, 6210, 22594};
static const int kInsertExtra[24] = {
    0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 12,
    14, 24};
static const int64_t kCopyBase[24] = {
    2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102,
    134, 198, 326, 582, 1094, 2118};
static const int kCopyExtra[24] = {
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9,
    10, 24};
static const int64_t kBlockLenBase[26] = {
    1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145, 177, 209,
    241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625};
static const int kBlockLenExtra[26] = {
    2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 8, 9, 10,
    11, 12, 13, 24};
static const int kDistShortIdx[16] = {0, 1, 2, 3, 0, 0, 0, 0, 0, 0, 1,
                                      1, 1, 1, 1, 1};
static const int kDistShortDelta[16] = {0, 0, 0, 0, -1, 1, -2, 2, -3, 3,
                                        -1, 1, -2, 2, -3, 3};
static const int kClOrder[18] = {1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9,
                                 10, 11, 12, 13, 14, 15};

// per-command-symbol decode table: packed (ins_code | copy_code<<8 |
// implicit0<<16), one load instead of the cell decompose arithmetic
// (RFC 7932 5, command code layout)
static uint32_t kCmdLut[704];
static bool init_cmd_lut() {
    static const int ib_tab[11] = {0, 0, 0, 0, 8, 8, 0, 16, 8, 16, 16};
    static const int cb_tab[11] = {0, 8, 0, 8, 0, 8, 16, 0, 16, 8, 16};
    for (int cmd = 0; cmd < 704; cmd++) {
        int cell = cmd >> 6;
        int low = cmd & 63;
        uint32_t ic = (uint32_t)(ib_tab[cell] + ((low >> 3) & 7));
        uint32_t cc = (uint32_t)(cb_tab[cell] + (low & 7));
        uint32_t imp = cell < 2 ? 1u : 0u;
        kCmdLut[cmd] = ic | (cc << 8) | (imp << 16);
    }
    return true;
}
static const bool g_cmd_lut_ready = init_cmd_lut();

// dictionary transform data (set once from Python)
struct DictData {
    const uint8_t* data;
    const int64_t* offsets_by_length;   // [25]
    const int64_t* size_bits_by_length; // [25]
    const uint8_t* t_prefix;            // [121 * 16] padded
    const int64_t* t_prefix_len;
    const uint8_t* t_suffix;
    const int64_t* t_suffix_len;
    const int64_t* t_type;
    const uint8_t* ctx_lut0;            // [4][256]
    const uint8_t* ctx_lut1;
};
static DictData g_dict;

static int read_clcode_len(BitReader& br) {
    if (br.read(1) == 0) return br.read(1) == 0 ? 0 : 3;
    if (br.read(1) == 0) return 4;
    if (br.read(1) == 0) return 2;
    return br.read(1) == 0 ? 1 : 5;
}

// build flat decode table from code lengths; returns false on corrupt
static const uint8_t kRev8[256] = {
#define R2(n) n, n + 2 * 64, n + 1 * 64, n + 3 * 64
#define R4(n) R2(n), R2(n + 2 * 16), R2(n + 1 * 16), R2(n + 3 * 16)
#define R6(n) R4(n), R4(n + 2 * 4), R4(n + 1 * 4), R4(n + 3 * 4)
    R6(0), R6(2), R6(1), R6(3)
#undef R2
#undef R4
#undef R6
};

static inline uint32_t rev_bits(uint32_t c, int l) {
    // reverse the low l bits (l <= 15)
    uint32_t r = ((uint32_t)kRev8[c & 255] << 8) | kRev8[(c >> 8) & 255];
    return r >> (16 - l);
}

static bool build_table(PrefixTable& pt, const uint8_t* lengths, int n,
                        TableArena& arena, int root_bits = 9) {
    const int root_size = 1 << root_bits;
    int nz = 0, single = -1, maxlen = 0;
    int64_t space = 0;
    for (int i = 0; i < n; i++) {
        if (lengths[i]) {
            nz++;
            single = i;
            maxlen = std::max(maxlen, (int)lengths[i]);
            space += 1ll << (15 - lengths[i]);
        }
    }
    if (nz == 0) return false;
    if (nz == 1) {
        // 0-bit code: constant root (decode skips 0 bits)
        pt.single = single;
        pt.max_len = 0;
        pt.tab = arena.alloc(root_size);
        if (!pt.tab) return false;
        const int64_t v2 =
            (int64_t)(uint32_t)(single << 4) * 0x100000001ll;
        int64_t* t8 = (int64_t*)pt.tab;
        for (int i = 0; i < root_size / 2; i++) t8[i] = v2;
        return true;
    }
    if (space != (1ll << 15)) return false;  // not Kraft-complete
    pt.single = -1;
    pt.max_len = maxlen;
    pt.tab = arena.alloc(root_size);
    if (!pt.tab) return false;
    // canonical code assignment, LSB-first
    int count[16] = {0};
    for (int i = 0; i < n; i++) count[lengths[i]]++;
    count[0] = 0;
    int64_t next_code[17] = {0};
    int64_t code = 0;
    for (int l = 1; l <= 15; l++) {
        code = (code + count[l - 1]) << 1;
        next_code[l] = code;
    }
    // per-prefix subtable depth for codes longer than root_bits
    int sub_bits[1024];
    bool any_long = maxlen > root_bits;
    if (any_long)
        std::memset(sub_bits, 0, root_size * sizeof(int));
    // worst-case alphabet: large-window distances,
    // 16 + ndirect + (62 << (npostfix+1)) <= 1128
    std::pair<int32_t, int32_t> longs[1136];  // (rev_code, sym)
    int n_longs = 0;
    for (int i = 0; i < n; i++) {
        int l = lengths[i];
        if (!l) continue;
        uint32_t c = (uint32_t)next_code[l]++;
        uint32_t r = rev_bits(c, l);
        if (l <= root_bits) {
            int64_t step = 1ll << l;
            for (int64_t idx = r; idx < root_size; idx += step)
                pt.tab[idx] = (int32_t)((i << 4) | l);
        } else {
            int p = (int)(r & (root_size - 1));
            sub_bits[p] = std::max(sub_bits[p], l - root_bits);
            longs[n_longs++] = {(int32_t)r, (int32_t)i};
        }
    }
    if (any_long) {
        int32_t sub_base[1024];
        for (int p = 0; p < root_size; p++) {
            if (!sub_bits[p]) continue;
            int32_t* sub = arena.alloc(1ll << sub_bits[p]);
            if (!sub) return false;
            sub_base[p] = (int32_t)(sub - pt.tab);
            pt.tab[p] = (sub_base[p] << 4) | (root_bits + sub_bits[p]);
        }
        for (int li = 0; li < n_longs; li++) {
            auto& [r, sym] = longs[li];
            int l = lengths[sym];
            int p = r & (root_size - 1);
            int sb = sub_bits[p];
            int32_t* sub = pt.tab + sub_base[p];
            int64_t hi = (r >> root_bits) & ((1 << sb) - 1);
            int64_t step = 1ll << (l - root_bits);
            for (int64_t idx = hi; idx < (1ll << sb); idx += step)
                sub[idx] = (int32_t)((sym << 4) | l);
        }
    }
    return true;
}

// Bake each literal symbol's context classes into spare bits of its
// table entries: leaf = len(4b) | sym(8b)<<4 | lut0[sym]<<12 |
// lut1[sym]<<18.  The context literal hot loops then obtain the NEXT
// literal's context with pure ALU work (ctx = cc0 | pc1) instead of
// two dependent LUT loads after every decoded symbol — the serial
// ctx->tree->symbol chain loses one L1 hop per literal (the round-4
// cycle split put ~35% of q5-stream decode in this chain).  Symbol
// consumers extract (uint8_t)(e >> 4), so the extra bits are inert
// everywhere else; internal root entries (len > 10) keep their
// subtable offsets and are skipped here, while their second-level
// leaves are baked through the walk.
static void bake_lit_ctx(PrefixTable& pt, const uint8_t* lut0,
                         const uint8_t* lut1) {
    int32_t* tab = pt.tab;
    for (int i = 0; i < 1024; i++) {
        int32_t e = tab[i];
        int l = e & 15;
        if (l <= 10) {
            int sym = (e >> 4) & 255;
            tab[i] = (int32_t)(l | (sym << 4) |
                               ((int32_t)lut0[sym] << 12) |
                               ((int32_t)lut1[sym] << 18));
        } else {
            int32_t* sub = tab + (e >> 4);
            for (int64_t j = 0; j < (1ll << (l - 10)); j++) {
                int32_t e2 = sub[j];
                int sym = (e2 >> 4) & 255;
                sub[j] = (int32_t)((e2 & 15) | (sym << 4) |
                                   ((int32_t)lut0[sym] << 12) |
                                   ((int32_t)lut1[sym] << 18));
            }
        }
    }
}

// Bake the command side data (ins_code, copy_code, implicit0 — what
// kCmdLut holds per symbol) into spare bits of the command-table
// entries: leaf = len(4b) | sym(10b)<<4 | ins_code<<14 |
// copy_code<<19 | implicit0<<24.  Removes the dependent kCmdLut load
// from the per-command chain; the base/extra table loads then issue
// in parallel straight off the entry.  Internal entries keep their
// subtable offsets (len > 10); idempotent like bake_lit_ctx.
static void bake_cmd_entries(PrefixTable& pt, const uint32_t* lut) {
    auto bake1 = [&](int32_t e) -> int32_t {
        int l = e & 15;
        int sym = (e >> 4) & 1023;
        uint32_t cd = lut[sym & 1023];
        return (int32_t)(l | (sym << 4) | ((cd & 31) << 14) |
                         (((cd >> 8) & 31) << 19) |
                         (((cd >> 16) & 1) << 24));
    };
    int32_t* tab = pt.tab;
    for (int i = 0; i < 1024; i++) {
        int32_t e = tab[i];
        if ((e & 15) <= 10) {
            tab[i] = bake1(e);
        } else {
            int32_t* sub = tab + (e >> 4);
            for (int64_t j = 0; j < (1ll << ((e & 15) - 10)); j++)
                sub[j] = bake1(sub[j]);
        }
    }
}

// Distance-table analog of bake_cmd_entries: leaf = len(4b) |
// sym(11b)<<4 | nbits(6b)<<15 (nbits from the per-metablock side
// table; >= 30 / the large-window marker bakes as 63 to force the
// exact 64-bit path).  dside_base stays a side load (the base value
// does not fit the remaining entry bits for large windows).
static void bake_dist_entries(PrefixTable& pt, const int8_t* nbits_tab,
                              int64_t alpha) {
    auto bake1 = [&](int32_t e) -> int32_t {
        int l = e & 15;
        int sym = (e >> 4) & 2047;
        int nb = sym < alpha ? (int)(uint8_t)nbits_tab[sym] : 63;
        if (nb >= 30 || nb < 0) nb = 63;
        return (int32_t)(l | (sym << 4) | (nb << 15));
    };
    int32_t* tab = pt.tab;
    for (int i = 0; i < 1024; i++) {
        int32_t e = tab[i];
        if ((e & 15) <= 10) {
            tab[i] = bake1(e);
        } else {
            int32_t* sub = tab + (e >> 4);
            for (int64_t j = 0; j < (1ll << ((e & 15) - 10)); j++)
                sub[j] = bake1(sub[j]);
        }
    }
}

// read a prefix code description (RFC 3.4/3.5) into lengths[n]
static int read_prefix_code(BitReader& br, uint8_t* lengths, int n,
                            PrefixTable& pt, TableArena& arena,
                            int root_bits = 9) {
    std::memset(lengths, 0, n);
    int hskip = (int)br.read(2);
    if (br.over()) return -1;
    if (hskip == 1) {
        int nsym = (int)br.read(2) + 1;
        int bits = 1;
        while ((1 << bits) < n) bits++;
        int syms[4];
        for (int i = 0; i < nsym; i++) {
            int s = (int)br.read(bits);
            if (s >= n) return br.over() ? -1 : -2;
            for (int j = 0; j < i; j++)
                if (syms[j] == s) return br.over() ? -1 : -2;
            syms[i] = s;
        }
        if (br.over()) return -1;
        if (nsym == 1) lengths[syms[0]] = 1;
        else if (nsym == 2) {
            lengths[syms[0]] = lengths[syms[1]] = 1;
        } else if (nsym == 3) {
            lengths[syms[0]] = 1;
            lengths[syms[1]] = lengths[syms[2]] = 2;
        } else {
            if (br.read(1)) {
                lengths[syms[0]] = 1;
                lengths[syms[1]] = 2;
                lengths[syms[2]] = lengths[syms[3]] = 3;
            } else {
                for (int i = 0; i < 4; i++) lengths[syms[i]] = 2;
            }
        }
        if (!build_table(pt, lengths, n, arena, root_bits))
            return br.over() ? -1 : -2;
        return 0;
    }
    // complex
    uint8_t cl_len[18] = {0};
    int64_t space = 0;
    int num_codes = 0;
    for (int i = hskip; i < 18; i++) {
        int l = read_clcode_len(br);
        if (br.over()) return -1;
        cl_len[kClOrder[i]] = (uint8_t)l;
        if (l) {
            num_codes++;
            space += 32 >> l;
            if (space >= 32) break;
        }
    }
    if (num_codes != 1 && space != 32) return br.over() ? -1 : -2;
    PrefixTable cl;
    int32_t clmem[512];
    TableArena cl_arena{clmem, 512, 0};
    if (!build_table(cl, cl_len, 18, cl_arena)) return br.over() ? -1 : -2;

    int64_t sym_space = 0;
    int i = 0;
    int prev_nonzero = 8;
    int prev_repeat_sym = -1;
    int64_t repeat = 0;
    while (i < n && sym_space < 32768) {
        int sym = cl.decode(br);
        if (br.over()) return -1;
        if (sym < 16) {
            lengths[i++] = (uint8_t)sym;
            prev_repeat_sym = -1;
            if (sym) {
                prev_nonzero = sym;
                sym_space += 32768 >> sym;
            }
        } else {
            int eb = sym == 16 ? 2 : 3;
            int64_t extra = (int64_t)br.read(eb);
            if (br.over()) return -1;
            int64_t new_repeat;
            if (prev_repeat_sym == sym)
                new_repeat = ((repeat - 2) << eb) + 3 + extra;
            else
                new_repeat = 3 + extra;
            int64_t delta = new_repeat -
                (prev_repeat_sym == sym ? repeat : 0);
            repeat = new_repeat;
            prev_repeat_sym = sym;
            int val = sym == 16 ? prev_nonzero : 0;
            if (i + delta > n) return br.over() ? -1 : -2;
            for (int64_t j = 0; j < delta; j++)
                lengths[i++] = (uint8_t)val;
            if (val) sym_space += delta * (32768 >> val);
        }
    }
    if (sym_space != 32768) return br.over() ? -1 : -2;
    if (!build_table(pt, lengths, n, arena, root_bits))
        return br.over() ? -1 : -2;
    return 0;
}

struct BlockCat {
    int num_types = 1;
    int cur = 0, prev = 1;
    int64_t remaining = 1ll << 60;
    PrefixTable type_pt, len_pt;
    bool has = false;
};

static int read_count_code(BitReader& br) {
    if (br.read(1) == 0) return 1;
    int nbits = (int)br.read(3);
    return (1 << nbits) + 1 + (int)br.read(nbits);
}

static int read_block_len(BitReader& br, PrefixTable& pt) {
    int s = pt.decode(br);
    if (s >= 26) return -1;
    return (int)(kBlockLenBase[s] + br.read(kBlockLenExtra[s]));
}

static int read_block_header(BitReader& br, BlockCat& bc,
                             TableArena& arena, uint8_t* scratch) {
    bc.num_types = read_count_code(br);
    if (br.over()) return -1;
    bc.cur = 0; bc.prev = 1;
    if (bc.num_types >= 2) {
        bc.has = true;
        int r = read_prefix_code(br, scratch, bc.num_types + 2,
                                 bc.type_pt, arena);
        if (r) return r;
        r = read_prefix_code(br, scratch, 26, bc.len_pt, arena);
        if (r) return r;
        int bl = read_block_len(br, bc.len_pt);
        if (bl < 0 || br.over()) return br.over() ? -1 : -2;
        bc.remaining = bl;
    } else {
        bc.remaining = 1ll << 60;
    }
    return 0;
}

// block-type switch when a category's count runs out (RFC 7932 6)
static int switch_block(BitReader& br, BlockCat& bc) {
    int s = bc.type_pt.decode(br);
    int next;
    if (s == 0) next = bc.prev;
    else if (s == 1) next = (bc.cur + 1) % bc.num_types;
    else next = s - 2;
    if (next >= bc.num_types) return br.over() ? -1 : -2;
    bc.prev = bc.cur; bc.cur = next;
    int bl = read_block_len(br, bc.len_pt);
    if (bl < 0) return br.over() ? -1 : -2;
    bc.remaining = bl;
    return 0;
}

static inline int tick(BitReader& br, BlockCat& bc) {
    if (bc.remaining == 0) {
        int r = switch_block(br, bc);
        if (r) return r;
    }
    bc.remaining--;
    return 0;
}

static int read_context_map(BitReader& br, int num_ctx, int ntrees,
                            uint8_t* cmap, TableArena& arena,
                            uint8_t* scratch) {
    std::memset(cmap, 0, num_ctx);
    if (ntrees < 2) return 0;
    int rlemax = br.read(1) ? (int)br.read(4) + 1 : 0;
    PrefixTable pt;
    int r = read_prefix_code(br, scratch, ntrees + rlemax, pt, arena);
    if (r) return r;
    int i = 0;
    while (i < num_ctx) {
        int sym = pt.decode(br);
        if (br.over()) return -1;
        if (sym == 0) {
            cmap[i++] = 0;
        } else if (sym <= rlemax) {
            int64_t reps = (1ll << sym) + (int64_t)br.read(sym);
            if (i + reps > num_ctx) return br.over() ? -1 : -2;
            i += (int)reps;
        } else {
            cmap[i++] = (uint8_t)(sym - rlemax);
        }
    }
    if (br.read(1)) {  // inverse MTF
        uint8_t mtf[256];
        for (int j = 0; j < 256; j++) mtf[j] = (uint8_t)j;
        for (int j = 0; j < num_ctx; j++) {
            int v = cmap[j];
            uint8_t x = mtf[v];
            cmap[j] = x;
            if (v) {
                std::memmove(mtf + 1, mtf, v);
                mtf[0] = x;
            }
        }
    }
    for (int j = 0; j < num_ctx; j++)
        if (cmap[j] >= ntrees) return br.over() ? -1 : -2;
    return 0;
}

}  // namespace

extern "C" {

void decoder_set_dictionary(
    const uint8_t* data, const int64_t* offsets_by_length,
    const int64_t* size_bits_by_length,
    const uint8_t* t_prefix, const int64_t* t_prefix_len,
    const uint8_t* t_suffix, const int64_t* t_suffix_len,
    const int64_t* t_type,
    const uint8_t* ctx_lut0, const uint8_t* ctx_lut1)
{
    g_dict = DictData{data, offsets_by_length, size_bits_by_length,
                      t_prefix, t_prefix_len, t_suffix, t_suffix_len,
                      t_type, ctx_lut0, ctx_lut1};
}

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

// transform a dictionary word into out; returns output length or -2
static int64_t transform_word(int64_t word_len, int64_t idx,
                              int64_t transform, uint8_t* out) {
    if (transform >= 121) return -2;
    const uint8_t* w = g_dict.data +
        g_dict.offsets_by_length[word_len] + word_len * idx;
    int64_t ty = g_dict.t_type[transform];
    int64_t start = 0, len = word_len;
    if (ty >= 12 && ty <= 20) {        // omit first 1..9
        int64_t k = ty - 11;
        start = std::min(k, len);
        len -= start;
    } else if (ty >= 1 && ty <= 9) {   // omit last 1..9
        len = len > ty ? len - ty : 0;
    }
    int64_t o = 0;
    const uint8_t* pre = g_dict.t_prefix + transform * 16;
    for (int64_t j = 0; j < g_dict.t_prefix_len[transform]; j++)
        out[o++] = pre[j];
    int64_t body = o;
    for (int64_t j = 0; j < len; j++) out[o++] = w[start + j];
    if (ty == 10) {                    // uppercase first
        if (len > 0) ferment(out + body, len, 0);
    } else if (ty == 11) {             // uppercase all
        int64_t i = 0;
        while (i < len) i += ferment(out + body, len, i);
    }
    const uint8_t* suf = g_dict.t_suffix + transform * 16;
    for (int64_t j = 0; j < g_dict.t_suffix_len[transform]; j++)
        out[o++] = suf[j];
    return o;
}

static int64_t parse_stream_header(BitReader& br, int64_t large_window,
                                   int* wbits_out);
static int64_t decode_loop(
    BitReader& br, uint8_t* out, int64_t out_cap, int64_t* out_len_io,
    const uint8_t* custom_dict, int64_t custom_dict_len,
    int64_t window_size, int max_distbits,
    int32_t* table_mem, int64_t table_mem_size,
    int64_t* dist_cache, int single_block, int* finished);

int64_t decode_native(
    const uint8_t* in, int64_t in_len,
    uint8_t* out, int64_t out_cap,
    const uint8_t* custom_dict, int64_t custom_dict_len,
    int64_t large_window,
    int32_t* table_mem, int64_t table_mem_size)
{
    static int want_ctr = getenv("BROTLI_TPU_DEC_CTR")
                              ? atoi(getenv("BROTLI_TPU_DEC_CTR")) : 0;
    if (want_ctr) {
        dec_ctr = dec_ctr_store;
        memset(dec_ctr_store, 0, sizeof(dec_ctr_store));
        if (want_ctr >= 2) {
            dec_cyc_on = 1;
            memset(dec_cyc, 0, sizeof(dec_cyc));
        }
    }
    BitReader br{in, in_len, 0};
    int wbits;
    int64_t rh = parse_stream_header(br, large_window, &wbits);
    if (rh) return rh;
    int64_t window_size = (1ll << wbits) - 16;
    int64_t dist_cache[4] = {4, 11, 15, 16};
    int max_distbits = large_window ? 62 : 24;
    int64_t out_len = 0;
    int finished = 0;
    int64_t r2 = decode_loop(br, out, out_cap, &out_len, custom_dict,
                             custom_dict_len, window_size, max_distbits,
                             table_mem, table_mem_size, dist_cache, 0,
                             &finished);
    if (r2) return r2;
    if (dec_ctr)
        fprintf(stderr,
                "[decctr] cmds %lld lit_triv %lld lit_ctx %lld "
                "dists %lld dictrefs %lld cmd_switches %lld "
                "lit_sub %lld\n",
                (long long)dec_ctr[0], (long long)dec_ctr[1],
                (long long)dec_ctr[2], (long long)dec_ctr[3],
                (long long)dec_ctr[4], (long long)dec_ctr[5],
                (long long)dec_ctr[6]);
    if (dec_cyc_on) {
        uint64_t tot = dec_cyc[0] + dec_cyc[1] + dec_cyc[2] +
                       dec_cyc[3];
        fprintf(stderr,
                "[deccyc] cmd %.1f%% lit %.1f%% dist %.1f%% "
                "copy %.1f%% (tot %llu Mcyc)\n",
                100.0 * dec_cyc[0] / tot, 100.0 * dec_cyc[1] / tot,
                100.0 * dec_cyc[2] / tot, 100.0 * dec_cyc[3] / tot,
                (unsigned long long)(tot >> 20));
    }
    return out_len;
}

// ---------------------------------------------------------------------------
// stream header + metablock loop, shared by the one-shot entry above
// and the resumable streaming step below
// ---------------------------------------------------------------------------

static int64_t parse_stream_header(BitReader& br, int64_t large_window,
                                   int* wbits_out) {
    int wbits;
    if (br.read(1) == 0) wbits = 16;
    else {
        int n = (int)br.read(3);
        if (n != 0) wbits = 17 + n;
        else {
            int m = (int)br.read(3);
            if (m == 0) wbits = 17;
            else if (m == 1) {
                if (!large_window) return br.over() ? -1 : -2;
                if (br.read(1)) return br.over() ? -1 : -2;
                wbits = (int)br.read(6);
                if (wbits < 10 || wbits > 30) return br.over() ? -1 : -2;
            } else wbits = 8 + m;
        }
    }
    if (br.over()) return -1;
    *wbits_out = wbits;
    return 0;
}

// decode metablocks (all of them, or one when single_block) — returns
// 0 on success with *out_len_io/*finished updated, or -1 truncated /
// -2 corrupt / -3 out_cap too small (out/cache state is then garbage;
// the streaming caller rolls back to its checkpoint)
static int64_t decode_loop(
    BitReader& br, uint8_t* out, int64_t out_cap, int64_t* out_len_io,
    const uint8_t* custom_dict, int64_t custom_dict_len,
    int64_t window_size, int max_distbits,
    int32_t* table_mem, int64_t table_mem_size,
    int64_t* dist_cache, int single_block, int* finished)
{
    int64_t out_len = *out_len_io;
    uint8_t scratch[1200];
    uint8_t word_buf[64];

    for (;;) {
        int64_t islast = br.read(1);
        if (br.over()) return -1;
        if (islast && br.read(1)) {  // ISLASTEMPTY
            *finished = 1;
            break;
        }
        if (br.over()) return -1;
        int64_t mnibbles = br.read(2);
        if (mnibbles == 3) {  // metadata
            if (br.read(1)) return br.over() ? -1 : -2;
            int64_t mskip = br.read(2);
            int64_t skip = 0;
            if (mskip) {
                int64_t val = br.read((int)(8 * mskip));
                if (mskip > 1 && (val >> (8 * (mskip - 1))) == 0)
                    return br.over() ? -1 : -2;
                skip = val + 1;
            }
            if (!br.align_ok()) return br.over() ? -1 : -2;
            if (!br.at_least(8 * skip)) return -1;
            br.skip_bulk(8 * skip);
            if (islast) { *finished = 1; break; }
            if (single_block) break;
            continue;
        }
        int64_t mlen = br.read((int)(16 + 4 * mnibbles)) + 1;
        if (br.over()) return -1;
        if (mnibbles > 0 && ((mlen - 1) >> (16 + 4 * (mnibbles - 1))) == 0)
            return br.over() ? -1 : -2;
        if (!islast && br.read(1)) {  // ISUNCOMPRESSED
            // RFC 7932 §9.2: alignment bits before the raw bytes MUST
            // be zero (same check as the META path)
            if (!br.align_ok()) return br.over() ? -1 : -2;
            if (!br.at_least(8 * mlen)) return -1;
            if (out_len + mlen > out_cap) return -3;
            std::memcpy(out + out_len, br.data + (br.pos >> 3),
                        (size_t)mlen);
            br.skip_bulk(8 * mlen);
            out_len += mlen;
            if (single_block) break;
            continue;
        }

        // ---- compressed metablock ----
        TableArena arena{table_mem, table_mem_size, 0};
        BlockCat L, I, D;
        int r;
        if ((r = read_block_header(br, L, arena, scratch))) return r;
        if ((r = read_block_header(br, I, arena, scratch))) return r;
        if ((r = read_block_header(br, D, arena, scratch))) return r;

        int npostfix = (int)br.read(2);
        int ndirect = (int)br.read(4) << npostfix;
        uint8_t modes[256];
        for (int t = 0; t < L.num_types; t++)
            modes[t] = (uint8_t)br.read(2);
        if (br.over()) return -1;

        int ntrees_l = read_count_code(br);
        uint8_t cmap_l[256 * 64];
        if ((r = read_context_map(br, 64 * L.num_types, ntrees_l,
                                  cmap_l, arena, scratch)))
            return r;
        int ntrees_d = read_count_code(br);
        uint8_t cmap_d[256 * 4];
        if ((r = read_context_map(br, 4 * D.num_types, ntrees_d,
                                  cmap_d, arena, scratch)))
            return r;

        int dist_alpha = 16 + ndirect + (max_distbits << (npostfix + 1));
        // distance-symbol side tables: nbits and precomputed base per
        // dcode (depends only on npostfix/ndirect — one table per
        // metablock).  The hot loop then decodes every distance class
        // through one uniform skip(dl + nb) and a branch-lean select
        // instead of the 4-way class branch (mispredict-heavy on
        // mixed streams).
        int8_t dside_nbits[1136];
        int32_t dside_base[1136];
        {
            int da = dist_alpha < 1136 ? dist_alpha : 1136;
            for (int dc = 0; dc < da; dc++) {
                if (dc < 16) {
                    dside_nbits[dc] = 0;
                    dside_base[dc] = 0;
                } else if (dc < 16 + ndirect) {
                    dside_nbits[dc] = 0;
                    dside_base[dc] = dc - 16 + 1;
                } else {
                    int64_t h = dc - ndirect - 16;
                    int64_t hcode = h >> npostfix;
                    int64_t lcode = h & ((1 << npostfix) - 1);
                    int nbits = (int)(1 + (hcode >> 1));
                    int64_t offset = ((2 + (hcode & 1)) << nbits) - 4;
                    dside_nbits[dc] = (int8_t)nbits;
                    int64_t base = (offset << npostfix) + lcode +
                                   ndirect + 1;
                    // large-window distances can exceed int32; the
                    // hot loop routes those through the exact 64-bit
                    // computation (nbits >= 30 marks them)
                    if (base + (((1ll << nbits) - 1) << npostfix) >
                        0x7fffffffll) {
                        dside_nbits[dc] = (int8_t)(nbits | 64);
                        dside_base[dc] = 0;
                    } else {
                        dside_base[dc] = (int32_t)base;
                    }
                }
            }
        }
        PrefixTable lit_pt[256], cmd_pt[256], dist_pt[256];
        uint8_t big_scratch[1 << 11];
        for (int t = 0; t < ntrees_l; t++) {
            lit_pt[t] = PrefixTable();
            if ((r = read_prefix_code(br, big_scratch, 256, lit_pt[t],
                                      arena, 10)))
                return r;
        }
        for (int t = 0; t < I.num_types; t++) {
            cmd_pt[t] = PrefixTable();
            if ((r = read_prefix_code(br, big_scratch, 704, cmd_pt[t],
                                      arena, 10)))
                return r;
            bake_cmd_entries(cmd_pt[t], kCmdLut);
        }
        for (int t = 0; t < ntrees_d; t++) {
            dist_pt[t] = PrefixTable();
            if ((r = read_prefix_code(br, big_scratch, dist_alpha,
                                      dist_pt[t], arena, 10)))
                return r;
            bake_dist_entries(dist_pt[t], dside_nbits, dist_alpha);
        }

        const uint8_t* lut0 = nullptr;
        const uint8_t* lut1 = nullptr;


        // Per-segment invariants hoisted out of the symbol loops: root
        // table pointers per tree, and the current block type's LUT
        // rows / context-map rows, refreshed only on block switches.
        int32_t* lit_roots[256];
        int32_t* dist_roots[256];
        for (int t = 0; t < ntrees_l; t++) lit_roots[t] = lit_pt[t].tab;
        for (int t = 0; t < ntrees_d; t++) dist_roots[t] = dist_pt[t].tab;
        const int32_t* cmd_tab = cmd_pt[I.cur].tab;
        const uint8_t* lrow = cmap_l + ((int64_t)L.cur << 6);
        const uint8_t* l0 = g_dict.ctx_lut0 + modes[L.cur] * 256;
        const uint8_t* l1 = g_dict.ctx_lut1 + modes[L.cur] * 256;
        const uint8_t* drow = cmap_d + ((int64_t)D.cur << 2);
        const bool lit_trivial = !L.has && ntrees_l == 1;
        // bake context classes into the literal tables (mode of block
        // type 0; block types with a different mode — possible per RFC
        // but emitted by no known encoder — fall back to the LUT
        // chain via bake_ok)
        if (!lit_trivial) {
            const uint8_t* bl0 = g_dict.ctx_lut0 + modes[0] * 256;
            const uint8_t* bl1 = g_dict.ctx_lut1 + modes[0] * 256;
            for (int t = 0; t < ntrees_l; t++)
                bake_lit_ctx(lit_pt[t], bl0, bl1);
        }
        bool bake_ok = modes[L.cur] == modes[0];
        // fold the context-map row and the per-tree root array into
        // one pointer table per block type: the per-literal chain
        // drops a dependent load (ctx -> root instead of
        // ctx -> tree -> root)
        const int32_t* ctx_tabs[64];
        const int32_t* dctx_tabs[4];
        int lit_res = 15;  // per-symbol bit reservation (max depth
                           // over the block type's context trees)
        auto refresh_lit_tabs = [&]() {
            int mx = 1;
            for (int c2 = 0; c2 < 64; c2++) {
                ctx_tabs[c2] = lit_roots[lrow[c2]];
                int ml = lit_pt[lrow[c2]].max_len;
                if (ml > mx) mx = ml;
            }
            lit_res = mx;
        };
        auto refresh_dist_tabs = [&]() {
            for (int c2 = 0; c2 < 4; c2++)
                dctx_tabs[c2] = dist_roots[drow[c2]];
        };
        refresh_lit_tabs();
        refresh_dist_tabs();

        auto prev_byte = [&](int k) -> uint8_t {
            if (out_len >= k) return out[out_len - k];
            int64_t i = custom_dict_len - (k - out_len);
            return i >= 0 ? custom_dict[i] : 0;
        };
        uint8_t p1 = prev_byte(1), p2 = prev_byte(2);

        while (mlen > 0) {
            if (__builtin_expect(dec_ctr != nullptr, 0)) dec_ctr[0]++;
            uint64_t _t0 = __builtin_expect(dec_cyc_on, 0) ? dec_tsc()
                                                           : 0;
            uint64_t _t1 = 0;
            if (__builtin_expect(I.remaining == 0, 0)) {
                if ((r = switch_block(br, I))) return r;
                cmd_tab = cmd_pt[I.cur].tab;
                if (dec_ctr) dec_ctr[5]++;
            }
            I.remaining--;
            // fused decode: one 57-bit window covers the command
            // symbol plus both length extras in all but pathological
            // cases (one refill check, one dependent shift chain)
            uint64_t w = br.peek(57);
            int32_t e = cmd_tab[w & 1023];
            int cl = e & 15;
            if (__builtin_expect(cl > 10, 0)) {
                e = cmd_tab[(e >> 4) +
                            ((w >> 10) & ((1u << (cl - 10)) - 1))];
                cl = e & 15;
            }
            int cmd = (e >> 4) & 1023;
            DBG("cmd=%d pos=%ld mlen=%ld out=%ld ovf=%d\n", cmd,
                br.pos, mlen, out_len, (int)br.over());
            if (cmd >= 704) return br.over() ? -1 : -2;
            // side data baked into the entry (bake_cmd_entries)
            int ins_code = (int)((e >> 14) & 31);
            int copy_code = (int)((e >> 19) & 31);
            bool implicit0 = ((e >> 24) & 1) != 0;
            int ieb = kInsertExtra[ins_code];
            int ceb = kCopyExtra[copy_code];
            int64_t ins_len, copy_len;
            if (__builtin_expect(cl + ieb + ceb <= 57, 1)) {
                uint64_t rest = w >> cl;
                ins_len = kInsertBase[ins_code] +
                    (int64_t)(rest & ((1ull << ieb) - 1));
                copy_len = kCopyBase[copy_code] +
                    (int64_t)((rest >> ieb) & ((1ull << ceb) - 1));
                br.skip(cl + ieb + ceb);
            } else {
                br.skip(cl);
                ins_len = kInsertBase[ins_code] +
                    (int64_t)br.read(ieb);
                copy_len = kCopyBase[copy_code] +
                    (int64_t)br.read(ceb);
            }
            if (br.over()) return -1;
            if (__builtin_expect(dec_cyc_on, 0)) {
                _t1 = dec_tsc();
                dec_cyc[0] += _t1 - _t0;
            }

            if (ins_len > mlen) return br.over() ? -1 : -2;
            if (out_len + ins_len > out_cap) return -3;
            if (__builtin_expect(dec_ctr != nullptr, 0))
                dec_ctr[lit_trivial ? 1 : 2] += ins_len;
            if (lit_trivial) {
                // common fast path: one literal block type, one tree.
                // Literals are decoded in register-resident batches:
                // one refill yields >= 57 bits, enough for several
                // symbols, so the per-symbol work is a table load and
                // a shift — the avail check, bit-position update, and
                // memory round-trip through the BitReader happen once
                // per batch instead of once per literal.
                const int32_t* tab = lit_roots[0];
                // reserve only the tree's real max depth per symbol:
                // shallow trees (8-10 bits typical) then fit 5-7
                // symbols per refill instead of 3
                const int res = std::max(1, lit_pt[0].max_len);
                int64_t j = 0;
                while (j < ins_len) {
                    if (br.avail < res) br.refill();
                    uint64_t w = br.bits;
                    int64_t amax = br.avail;
                    int consumed = 0;
                    do {
                        int32_t e = tab[w & 1023];
                        int l = e & 15;
                        if (__builtin_expect(l > 10, 0)) {
                            e = tab[(e >> 4) +
                                    ((w >> 10) & ((1u << (l - 10)) - 1))];
                            l = e & 15;
                        }
                        out[out_len++] = (uint8_t)(e >> 4);
                        w >>= l;
                        consumed += l;
                        j++;
                    } while (j < ins_len && consumed + res <= amax);
                    br.skip(consumed);
                }
                if (br.over()) return -1;
                if (out_len >= 2) {
                    p1 = out[out_len - 1];
                    p2 = out[out_len - 2];
                } else {
                    p1 = prev_byte(1); p2 = prev_byte(2);
                }
            } else if (ins_len > 0 && ins_len <= 3 &&
                       L.remaining >= ins_len) {
                // short-insert context path: q5-grade streams average
                // ~2 literals per command, so the general path's batch
                // machinery (block-run split, per-batch avail
                // accounting) is pure overhead there.  3 symbols at
                // max depth 15 fit one 45-bit window: one refill, one
                // skip, no inner bookkeeping.
                L.remaining -= ins_len;
                if (br.avail < 45) br.refill();
                uint64_t w0 = br.bits;
                int consumed = 0;
                if (__builtin_expect(bake_ok, 1)) {
                    // carried-class chain: the three LUT loads issue
                    // off p1/p2 (ready before the command decode);
                    // after each symbol the NEXT context is ALU-only
                    // from the entry's baked classes
                    int cc0 = l0[p1], cc1 = l1[p1], pc1 = l1[p2];
                    for (int64_t j = 0; j < ins_len; j++) {
                        int ctx = cc0 | pc1;
                        const int32_t* tab = ctx_tabs[ctx];
                        uint64_t w = w0 >> consumed;
                        int32_t e = tab[w & 1023];
                        int l = e & 15;
                        if (__builtin_expect(l > 10, 0)) {
                            if (__builtin_expect(dec_ctr != nullptr,
                                                 0))
                                dec_ctr[6]++;
                            e = tab[(e >> 4) +
                                    ((w >> 10) &
                                     ((1u << (l - 10)) - 1))];
                            l = e & 15;
                        }
                        pc1 = cc1;
                        cc0 = (e >> 12) & 63;
                        cc1 = (e >> 18) & 63;
                        p2 = p1;
                        p1 = (uint8_t)(e >> 4);
                        out[out_len++] = p1;
                        consumed += l;
                    }
                } else {
                    for (int64_t j = 0; j < ins_len; j++) {
                        int ctx = l0[p1] | l1[p2];
                        const int32_t* tab = ctx_tabs[ctx];
                        uint64_t w = w0 >> consumed;
                        int32_t e = tab[w & 1023];
                        int l = e & 15;
                        if (__builtin_expect(l > 10, 0)) {
                            if (__builtin_expect(dec_ctr != nullptr,
                                                 0))
                                dec_ctr[6]++;
                            e = tab[(e >> 4) +
                                    ((w >> 10) &
                                     ((1u << (l - 10)) - 1))];
                            l = e & 15;
                        }
                        p2 = p1;
                        p1 = (uint8_t)(e >> 4);
                        out[out_len++] = p1;
                        consumed += l;
                    }
                }
                br.skip(consumed);
                if (br.over()) return -1;
            } else {
                // general path in runs bounded by the literal block
                // count: mode LUTs and the context-map row stay in
                // registers between switches
                int64_t j = 0;
                while (j < ins_len) {
                    if (__builtin_expect(L.remaining == 0, 0)) {
                        if ((r = switch_block(br, L))) return r;
                        lrow = cmap_l + ((int64_t)L.cur << 6);
                        l0 = g_dict.ctx_lut0 + modes[L.cur] * 256;
                        l1 = g_dict.ctx_lut1 + modes[L.cur] * 256;
                        bake_ok = modes[L.cur] == modes[0];
                        refresh_lit_tabs();
                    }
                    int64_t take = std::min(ins_len - j, L.remaining);
                    L.remaining -= take;
                    j += take;
                    // same register-batched shape as the trivial path,
                    // with the context chain carried in registers
                    // across the batch — as baked classes (cc0/cc1/
                    // pc1) when the tables carry this block type's
                    // mode, so the per-symbol context is ALU-only
                    if (__builtin_expect(bake_ok, 1)) {
                        int cc0 = l0[p1], cc1 = l1[p1], pc1 = l1[p2];
                        while (take > 0) {
                            if (br.avail < lit_res) br.refill();
                            uint64_t w = br.bits;
                            int64_t amax = br.avail;
                            int consumed = 0;
                            do {
                                int ctx = cc0 | pc1;
                                const int32_t* tab = ctx_tabs[ctx];
                                int32_t e = tab[w & 1023];
                                int l = e & 15;
                                if (__builtin_expect(l > 10, 0)) {
                                    if (__builtin_expect(
                                            dec_ctr != nullptr, 0))
                                        dec_ctr[6]++;
                                    e = tab[(e >> 4) +
                                            ((w >> 10) &
                                             ((1u << (l - 10)) - 1))];
                                    l = e & 15;
                                }
                                pc1 = cc1;
                                cc0 = (e >> 12) & 63;
                                cc1 = (e >> 18) & 63;
                                p2 = p1;
                                p1 = (uint8_t)(e >> 4);
                                out[out_len++] = p1;
                                w >>= l;
                                consumed += l;
                                take--;
                            } while (take > 0 &&
                                     consumed + lit_res <= amax);
                            br.skip(consumed);
                        }
                    } else {
                        while (take > 0) {
                            if (br.avail < lit_res) br.refill();
                            uint64_t w = br.bits;
                            int64_t amax = br.avail;
                            int consumed = 0;
                            do {
                                int ctx = l0[p1] | l1[p2];
                                const int32_t* tab = ctx_tabs[ctx];
                                int32_t e = tab[w & 1023];
                                int l = e & 15;
                                if (__builtin_expect(l > 10, 0)) {
                                    if (__builtin_expect(
                                            dec_ctr != nullptr, 0))
                                        dec_ctr[6]++;
                                    e = tab[(e >> 4) +
                                            ((w >> 10) &
                                             ((1u << (l - 10)) - 1))];
                                    l = e & 15;
                                }
                                p2 = p1;
                                p1 = (uint8_t)(e >> 4);
                                out[out_len++] = p1;
                                w >>= l;
                                consumed += l;
                                take--;
                            } while (take > 0 &&
                                     consumed + lit_res <= amax);
                            br.skip(consumed);
                        }
                    }
                    if (br.over()) return -1;
                }
            }
            if (__builtin_expect(dec_cyc_on, 0)) {
                uint64_t t = dec_tsc();
                dec_cyc[1] += t - _t1;
                _t1 = t;
            }
            mlen -= ins_len;
            if (mlen == 0) break;

            if (__builtin_expect(dec_ctr != nullptr, 0) && !implicit0)
                dec_ctr[3]++;
            int64_t pos_total = out_len + custom_dict_len;
            int64_t max_distance = std::min(pos_total, window_size);
            int64_t distance;
            int dcode = 0;
            if (implicit0) {
                distance = dist_cache[0];
            } else {
                if (__builtin_expect(D.remaining == 0, 0)) {
                    if ((r = switch_block(br, D))) return r;
                    drow = cmap_d + ((int64_t)D.cur << 2);
                    refresh_dist_tabs();
                }
                D.remaining--;
                int dctx = (int)std::min<int64_t>(
                    std::max<int64_t>(copy_len, 2), 5) - 2;
                // fused distance decode: symbol + extra bits from one
                // 57-bit window in the common case
                const int32_t* dtab = dctx_tabs[dctx];
                uint64_t wd = br.peek(57);
                int32_t de = dtab[wd & 1023];
                int dl = de & 15;
                if (__builtin_expect(dl > 10, 0)) {
                    de = dtab[(de >> 4) +
                              ((wd >> 10) & ((1u << (dl - 10)) - 1))];
                    dl = de & 15;
                }
                dcode = (de >> 4) & 2047;
                if (br.over()) return -1;
                int nb = (de >> 15) & 63;
                if (__builtin_expect(nb < 30, 1)) {
                    // uniform fast path: extra bits from the same
                    // 57-bit window (nb == 0 for cache/direct codes),
                    // then a branch-lean select between the
                    // distance-cache form and the precomputed base
                    int64_t extra = (int64_t)((wd >> dl) &
                                              ((1ull << nb) - 1));
                    br.skip(dl + nb);
                    int64_t cacheval =
                        dist_cache[kDistShortIdx[dcode & 15]] +
                        kDistShortDelta[dcode & 15];
                    int64_t cand = (int64_t)dside_base[dcode] +
                                   (extra << npostfix);
                    distance = dcode < 16 ? cacheval : cand;
                    if (distance <= 0) return br.over() ? -1 : -2;
                } else {
                    // large-window tail (or >57-bit window overflow):
                    // exact 64-bit computation, cold
                    nb &= 63;
                    int64_t h = dcode - ndirect - 16;
                    int64_t hcode = h >> npostfix;
                    int64_t lcode = h & ((1 << npostfix) - 1);
                    int nbits = (int)(1 + (hcode >> 1));
                    int64_t offset = ((2 + (hcode & 1)) << nbits) - 4;
                    int64_t extra;
                    if (__builtin_expect(dl + nbits <= 57, 1)) {
                        extra = (int64_t)((wd >> dl) &
                                          ((1ull << nbits) - 1));
                        br.skip(dl + nbits);
                    } else {
                        br.skip(dl);
                        extra = (int64_t)br.read_long(nbits);
                    }
                    if (br.over()) return -1;
                    distance = ((offset + extra) << npostfix) + lcode +
                               ndirect + 1;
                }
            }

            if (__builtin_expect(dec_cyc_on, 0)) {
                uint64_t t = dec_tsc();
                dec_cyc[2] += t - _t1;
                _t1 = t;
            }
            DBG("ins=%ld copy=%ld dist=%ld dcode=%d maxd=%ld pos=%ld ovf=%d\n",
                ins_len, copy_len, distance, dcode, max_distance,
                br.pos, (int)br.over());
            if (distance > max_distance) {
                if (dec_ctr) dec_ctr[4]++;
                // static dictionary reference
                if (copy_len < 4 || copy_len > 24) return br.over() ? -1 : -2;
                int64_t word_id = distance - max_distance - 1;
                int64_t sb = g_dict.size_bits_by_length[copy_len];
                int64_t idx = word_id & ((1ll << sb) - 1);
                int64_t transform = word_id >> sb;
                int64_t wl = transform_word(copy_len, idx, transform,
                                            word_buf);
                if (wl < 0) return br.over() ? -1 : -2;
                if (wl > mlen) return br.over() ? -1 : -2;
                if (out_len + wl > out_cap) return -3;
                std::memcpy(out + out_len, word_buf, (size_t)wl);
                out_len += wl;
                mlen -= wl;
            } else {
                if (copy_len > mlen) return br.over() ? -1 : -2;
                if (out_len + copy_len > out_cap) return -3;
                int64_t remaining = copy_len;
                int64_t src = out_len - distance;
                if (__builtin_expect(src < 0, 0)) {
                    int64_t dstart = custom_dict_len + src;
                    if (dstart < 0) return br.over() ? -1 : -2;
                    int64_t take = std::min(remaining, -src);
                    std::memcpy(out + out_len, custom_dict + dstart,
                                (size_t)take);
                    out_len += take;
                    remaining -= take;
                    src = out_len - distance;
                }
                if (__builtin_expect(distance >= remaining, 1)) {
                    // non-overlapping: 16-byte rounds with overcopy
                    // (bytes past `remaining` are rewritten by later
                    // output; glibc memcpy dispatch costs more than
                    // the whole copy at typical 8-16 byte lengths)
                    uint8_t* dst = out + out_len;
                    const uint8_t* sp = out + src;
                    if (out_len + ((remaining + 15) & ~15ll) <= out_cap) {
                        int64_t k = 0;
                        do {
                            std::memcpy(dst + k, sp + k, 16);
                            k += 16;
                        } while (k < remaining);
                    } else {
                        std::memcpy(dst, sp, (size_t)remaining);
                    }
                } else if (remaining <= 16) {
                    // short overlapping copy: width-staged chunks
                    // instead of the per-byte loop (store-to-load
                    // forwarding stalls at ~1 byte/cycle).  Chunks of
                    // width w <= distance never overlap internally,
                    // and earlier chunks produce exactly the bytes
                    // later chunks read; the 16-byte overcopy is
                    // rewritten by subsequent output
                    uint8_t* dst = out + out_len;
                    const uint8_t* sp = out + src;
                    if (out_len + 16 > out_cap) {
                        for (int64_t j = 0; j < remaining; j++)
                            out[out_len + j] = out[src + j];
                    } else if (distance >= 8) {
                        std::memcpy(dst, sp, 8);
                        std::memcpy(dst + 8, sp + 8, 8);
                    } else if (distance >= 4) {
                        std::memcpy(dst, sp, 4);
                        std::memcpy(dst + 4, sp + 4, 4);
                        std::memcpy(dst + 8, sp + 8, 4);
                        std::memcpy(dst + 12, sp + 12, 4);
                    } else if (distance == 1) {
                        std::memset(dst, sp[0], 16);
                    } else {
                        std::memcpy(dst, sp, 2);
                        std::memcpy(dst + 2, sp + 2, 2);
                        std::memcpy(dst + 4, sp + 4, 2);
                        std::memcpy(dst + 6, sp + 6, 2);
                        std::memcpy(dst + 8, sp + 8, 2);
                        std::memcpy(dst + 10, sp + 10, 2);
                        std::memcpy(dst + 12, sp + 12, 2);
                        std::memcpy(dst + 14, sp + 14, 2);
                    }
                } else {
                    // overlapping long copy: period-doubling memcpys
                    // (span stays a multiple of the distance, so each
                    // chunk is a non-overlapping copy)
                    int64_t span = distance;
                    int64_t done = 0;
                    while (done < remaining) {
                        int64_t chunk = std::min(span, remaining - done);
                        std::memcpy(out + out_len + done,
                                    out + out_len + done - span,
                                    (size_t)chunk);
                        done += chunk;
                        span <<= 1;
                    }
                }
                out_len += remaining;
                mlen -= copy_len;
                if (dcode != 0) {
                    dist_cache[3] = dist_cache[2];
                    dist_cache[2] = dist_cache[1];
                    dist_cache[1] = dist_cache[0];
                    dist_cache[0] = distance;
                }
            }
            if (__builtin_expect(out_len >= 2, 1)) {
                p1 = out[out_len - 1];
                p2 = out[out_len - 2];
            } else {
                p1 = prev_byte(1);
                p2 = prev_byte(2);
            }
            if (__builtin_expect(dec_cyc_on, 0))
                dec_cyc[3] += dec_tsc() - _t1;
        }
        if (islast) { *finished = 1; break; }
        if (single_block) break;
    }
    // RFC 7932 §9.2: the padding bits after the last metablock must
    // be zero (the reference decoder rejects nonzero final padding;
    // trailing BYTES after the aligned boundary stay tolerated)
    if (*finished && !br.align_ok()) return br.over() ? -1 : -2;
    *out_len_io = out_len;
    return 0;
}

// ---------------------------------------------------------------------------
// resumable streaming decode step (metablock-granular): decodes as
// many whole metablocks as the input allows, rolling back to the last
// metablock boundary when the input runs out mid-block.  State layout
// (caller-owned int64[8]):
//   [0] header_done  [1] finished  [2] wbits  [3] unused
//   [4..7] distance cache
// `hist` is the retained window (back-references past this step's
// output resolve into it).  Returns bytes written this step (>= 0; a
// zero with !finished means feed more input), -2 corrupt, or -3
// out_cap cannot hold the next metablock (grow and retry; bit_pos is
// left at the block boundary in both non-error cases).
// ---------------------------------------------------------------------------

extern "C" int64_t decode_stream_step_native(
    int64_t* state, const uint8_t* in, int64_t in_len,
    int64_t* bit_pos_io, const uint8_t* hist, int64_t hist_len,
    uint8_t* out, int64_t out_cap, int64_t large_window,
    int32_t* table_mem, int64_t table_mem_size)
{
    BitReader br{in, in_len, *bit_pos_io};
    if (!state[0]) {
        int wbits;
        int64_t r = parse_stream_header(br, large_window, &wbits);
        if (r == -1) return 0;          // needs more input, no progress
        if (r) return r;
        state[0] = 1;
        state[2] = wbits;
        *bit_pos_io = br.pos;
    }
    int64_t window_size = (1ll << state[2]) - 16;
    int max_distbits = large_window ? 62 : 24;
    int64_t out_len = 0;
    while (!state[1]) {
        int64_t ck_pos = *bit_pos_io;
        int64_t ck_out = out_len;
        int64_t ck_cache[4] = {state[4], state[5], state[6], state[7]};
        br.pos = ck_pos;
        br.avail = 0;
        int finished = 0;
        int64_t r = decode_loop(br, out, out_cap, &out_len, hist,
                                hist_len, window_size, max_distbits,
                                table_mem, table_mem_size, state + 4,
                                1, &finished);
        if (r == -1 || r == -3) {
            // truncated mid-block (wait for input) or out full (caller
            // grows): roll back to the block boundary
            out_len = ck_out;
            for (int i = 0; i < 4; i++) state[4 + i] = ck_cache[i];
            *bit_pos_io = ck_pos;
            return r == -3 && out_len == 0 ? -3 : out_len;
        }
        if (r) return r;                 // corrupt
        *bit_pos_io = br.pos;
        if (finished) state[1] = 1;
    }
    return out_len;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Resumable streaming decoder: suspends at ANY input byte (reference
// BrotliDecompressStream contract, src/ffi/decompressor.rs:4-180).
// Unlike decode_stream_step_native above (metablock-granular
// rollback), this engine checkpoints per phase — metablock header,
// command head, literal refill-batch, distance, copy chunk — so the
// undigested input tail is bounded by ONE partial phase (<= a
// metablock header, typically <= 8 bytes) and total state is
// O(window): retained window + parsed tables + <100 bytes of
// counters.  The one-shot decode_loop stays untouched (it is the hot
// path and the oracle-pinned one).
// ---------------------------------------------------------------------------

namespace {

struct MbDecoder {
    // stream level
    int header_done = 0;
    int finished = 0;
    int wbits = 0;
    int large_window = 0;
    int64_t window_size = 0;
    int max_distbits = 24;
    int64_t dist_cache[4] = {4, 11, 15, 16};
    int64_t err = 0;  // sticky corrupt (-2)

    enum Phase {
        MB_HEADER = 0, CMD_HEAD, LITERALS, DIST, COPY, DICT_FLUSH,
        UNCOMP, META
    };
    int phase = MB_HEADER;
    int islast = 0;
    int64_t mlen = 0;       // remaining metablock bytes
    int64_t skip_left = 0;  // metadata bytes (META) / raw bytes (UNCOMP)

    // parsed metablock state (CMDS family phases)
    BlockCat L, I, D;
    int npostfix = 0, ndirect = 0;
    int ntrees_l = 0, ntrees_d = 0;
    uint8_t modes[256];
    uint8_t cmap_l[256 * 64];
    uint8_t cmap_d[256 * 4];
    PrefixTable lit_pt[256], cmd_pt[256], dist_pt[256];
    int dist_alpha = 0;
    uint8_t p1 = 0, p2 = 0;

    // mid-command state
    int64_t pend_insert = 0;
    int64_t pend_copy_total = 0;  // copy_len as parsed (for dctx)
    int64_t pend_copy = 0;        // copy bytes still to emit
    int64_t pend_dist = 0;
    int pend_implicit0 = 0;
    // dictionary word flush
    uint8_t word_buf[64];
    int64_t word_len = 0, word_off = 0;

    // total output emitted across all calls (for max_distance before
    // the window fills; the facade's hist is capped at the window)
    int64_t total_out = 0;
};

}  // namespace

extern "C" {

void* stream_decoder_create(int64_t large_window) {
    MbDecoder* d = new MbDecoder();
    d->large_window = large_window ? 1 : 0;
    d->max_distbits = large_window ? 62 : 24;
    return d;
}

void stream_decoder_destroy(void* p) { delete (MbDecoder*)p; }

int64_t stream_decoder_finished(void* p) {
    return ((MbDecoder*)p)->finished;
}

// Returns bytes written to `out` (>= 0) with *bit_pos_io advanced to
// the first unconsumed bit; -2 corrupt (sticky); -3 needs more output
// space (only when ZERO bytes fit this call — with progress the byte
// count is returned instead, and out_len == out_cap tells the caller
// to drain and call again).  A short count with input remaining means
// more input is needed; -1 = needs input with zero progress.
// table_mem must be the SAME buffer across calls (the parsed prefix
// tables live in it between suspensions).
int64_t stream_decoder_step(
    void* pd, const uint8_t* in, int64_t in_len, int64_t* bit_pos_io,
    const uint8_t* hist, int64_t hist_len, uint8_t* out,
    int64_t out_cap, int32_t* table_mem, int64_t table_mem_size)
{
    MbDecoder& d = *(MbDecoder*)pd;
    if (d.err) return d.err;
    BitReader br{in, in_len, *bit_pos_io};
    int64_t out_len = 0;
    uint8_t scratch[1200];
    uint8_t big_scratch[1 << 11];
    TableArena arena{table_mem, table_mem_size, 0};

    auto fail = [&](int64_t code) {
        if (code == -2) d.err = -2;
        return code;
    };
    auto suspend_in = [&](int64_t ck_pos) {
        *bit_pos_io = ck_pos;
        return out_len > 0 ? out_len : -1;
    };
    // literal source byte k positions back (facade hist covers the
    // window before this call's output)
    auto prev_byte = [&](int64_t k) -> uint8_t {
        if (out_len >= k) return out[out_len - k];
        int64_t i = hist_len - (k - out_len);
        return i >= 0 ? hist[i] : 0;
    };

    for (;;) {
        if (d.finished) { *bit_pos_io = br.pos; return out_len; }
        switch (d.phase) {
        case MbDecoder::MB_HEADER: {
            int64_t ck = br.pos;
            br.avail = 0;
            if (!d.header_done) {
                int wb;
                int64_t r = parse_stream_header(br, d.large_window,
                                                &wb);
                if (r == -1) return suspend_in(ck);
                if (r) return fail(r);
                d.header_done = 1;
                d.wbits = wb;
                d.window_size = (1ll << wb) - 16;
                ck = br.pos;
            }
            int64_t islast = br.read(1);
            if (br.over()) return suspend_in(ck);
            if (islast && br.read(1)) {  // ISLASTEMPTY
                if (br.over()) return suspend_in(ck);
                // RFC 7932 §9.2: final padding bits must be zero
                bool alz = br.align_ok();
                if (br.over()) return suspend_in(ck);
                if (!alz) return fail(-2);
                d.finished = 1;
                *bit_pos_io = br.pos;
                return out_len;
            }
            if (br.over()) return suspend_in(ck);
            int64_t mnibbles = br.read(2);
            if (mnibbles == 3) {  // metadata
                if (br.read(1)) {
                    if (br.over()) return suspend_in(ck);
                    return fail(-2);
                }
                int64_t mskip = br.read(2);
                int64_t skip = 0;
                if (mskip) {
                    int64_t val = br.read((int)(8 * mskip));
                    if (br.over()) return suspend_in(ck);
                    if (mskip > 1 &&
                        (val >> (8 * (mskip - 1))) == 0)
                        return fail(-2);
                    skip = val + 1;
                }
                if (br.over()) return suspend_in(ck);
                if (!br.align_ok())
                    return br.over() ? suspend_in(ck) : fail(-2);
                d.islast = (int)islast;
                d.skip_left = skip;
                d.phase = MbDecoder::META;
                break;
            }
            int64_t mlen = br.read((int)(16 + 4 * mnibbles)) + 1;
            if (br.over()) return suspend_in(ck);
            if (mnibbles > 0 &&
                ((mlen - 1) >> (16 + 4 * (mnibbles - 1))) == 0) {
                if (br.over()) return suspend_in(ck);
                return fail(-2);
            }
            if (!islast && br.read(1)) {  // ISUNCOMPRESSED
                if (br.over()) return suspend_in(ck);
                // RFC 7932 §9.2: alignment bits must be zero (same
                // check as the META path)
                bool alz = br.align_ok();
                if (br.over()) return suspend_in(ck);
                if (!alz) return fail(-2);
                d.islast = 0;
                d.skip_left = mlen;
                d.phase = MbDecoder::UNCOMP;
                break;
            }
            if (br.over()) return suspend_in(ck);
            // ---- full metablock header: block cats, dist params,
            // context maps, trees (one checkpoint for the lot) ----
            arena.used = 0;
            int r;
            auto hdr_r = [&](int rr) {
                // corrupt results derived from padded bits are
                // truncation, not corruption
                return (rr == -1 || br.over()) ? 1 : (rr ? 2 : 0);
            };
            if ((r = hdr_r(read_block_header(br, d.L, arena, scratch))))
                return r == 1 ? suspend_in(ck) : fail(-2);
            if ((r = hdr_r(read_block_header(br, d.I, arena, scratch))))
                return r == 1 ? suspend_in(ck) : fail(-2);
            if ((r = hdr_r(read_block_header(br, d.D, arena, scratch))))
                return r == 1 ? suspend_in(ck) : fail(-2);
            d.npostfix = (int)br.read(2);
            d.ndirect = (int)br.read(4) << d.npostfix;
            for (int t = 0; t < d.L.num_types; t++)
                d.modes[t] = (uint8_t)br.read(2);
            if (br.over()) return suspend_in(ck);
            d.ntrees_l = read_count_code(br);
            if ((r = hdr_r(read_context_map(br, 64 * d.L.num_types,
                                            d.ntrees_l, d.cmap_l,
                                            arena, scratch))))
                return r == 1 ? suspend_in(ck) : fail(-2);
            d.ntrees_d = read_count_code(br);
            if ((r = hdr_r(read_context_map(br, 4 * d.D.num_types,
                                            d.ntrees_d, d.cmap_d,
                                            arena, scratch))))
                return r == 1 ? suspend_in(ck) : fail(-2);
            d.dist_alpha = 16 + d.ndirect +
                (d.max_distbits << (d.npostfix + 1));
            for (int t = 0; t < d.ntrees_l; t++) {
                d.lit_pt[t] = PrefixTable();
                if ((r = hdr_r(read_prefix_code(br, big_scratch, 256,
                                                d.lit_pt[t], arena,
                                                10))))
                    return r == 1 ? suspend_in(ck) : fail(-2);
            }
            for (int t = 0; t < d.I.num_types; t++) {
                d.cmd_pt[t] = PrefixTable();
                if ((r = hdr_r(read_prefix_code(br, big_scratch, 704,
                                                d.cmd_pt[t], arena,
                                                10))))
                    return r == 1 ? suspend_in(ck) : fail(-2);
            }
            for (int t = 0; t < d.ntrees_d; t++) {
                d.dist_pt[t] = PrefixTable();
                if ((r = hdr_r(read_prefix_code(br, big_scratch,
                                                d.dist_alpha,
                                                d.dist_pt[t], arena,
                                                10))))
                    return r == 1 ? suspend_in(ck) : fail(-2);
            }
            // final gate: any helper above that "succeeded" on
            // zero-padded bits shows up here as over()
            if (br.over()) return suspend_in(ck);
            d.islast = (int)islast;
            d.mlen = mlen;
            d.p1 = prev_byte(1);
            d.p2 = prev_byte(2);
            d.phase = MbDecoder::CMD_HEAD;
            *bit_pos_io = br.pos;
            break;
        }
        case MbDecoder::META: {
            // skip metadata bytes (byte-aligned already)
            int64_t have = in_len - (br.pos >> 3);
            int64_t take = std::min(d.skip_left, have);
            br.skip_bulk(8 * take);
            d.skip_left -= take;
            *bit_pos_io = br.pos;
            if (d.skip_left > 0) return suspend_in(br.pos);
            if (d.islast) d.finished = 1;
            else d.phase = MbDecoder::MB_HEADER;
            break;
        }
        case MbDecoder::UNCOMP: {
            int64_t have = in_len - (br.pos >> 3);
            int64_t space = out_cap - out_len;
            if (space <= 0) {
                *bit_pos_io = br.pos;
                return out_len > 0 ? out_len : -3;
            }
            int64_t take = std::min({d.skip_left, have, space});
            std::memcpy(out + out_len, in + (br.pos >> 3),
                        (size_t)take);
            out_len += take;
            d.total_out += take;
            br.skip_bulk(8 * take);
            d.skip_left -= take;
            *bit_pos_io = br.pos;
            if (d.skip_left > 0) {
                if (out_cap - out_len <= 0)
                    return out_len > 0 ? out_len : -3;
                return suspend_in(br.pos);
            }
            d.phase = MbDecoder::MB_HEADER;
            break;
        }
        case MbDecoder::CMD_HEAD: {
            if (d.mlen <= 0) {
                if (d.islast) {
                    // RFC 7932 §9.2: final padding bits must be zero
                    int64_t ck = br.pos;
                    br.avail = 0;
                    bool alz = br.align_ok();
                    if (br.over()) return suspend_in(ck);
                    if (!alz) return fail(-2);
                    d.finished = 1;
                } else d.phase = MbDecoder::MB_HEADER;
                break;
            }
            // checkpoint: command symbol + both length extras +
            // an I-block switch — all rolled back together
            int64_t ck = br.pos;
            BlockCat ckI = d.I;
            br.avail = 0;
            if (d.I.remaining == 0) {
                int r = switch_block(br, d.I);
                if (r == -1 || br.over()) {
                    d.I = ckI;
                    return suspend_in(ck);
                }
                if (r) return fail(-2);
            }
            d.I.remaining--;
            int cmd = decode_tab10(br, d.cmd_pt[d.I.cur].tab);
            if (br.over()) { d.I = ckI; return suspend_in(ck); }
            if (cmd >= 704) return fail(-2);
            uint32_t cd = kCmdLut[cmd];
            int ins_code = (int)(cd & 255);
            int copy_code = (int)((cd >> 8) & 255);
            d.pend_implicit0 = (cd >> 16) != 0;
            int64_t ins_len = kInsertBase[ins_code] +
                (int64_t)br.read(kInsertExtra[ins_code]);
            int64_t copy_len = kCopyBase[copy_code] +
                (int64_t)br.read(kCopyExtra[copy_code]);
            if (br.over()) { d.I = ckI; return suspend_in(ck); }
            if (ins_len > d.mlen) return fail(-2);
            d.pend_insert = ins_len;
            d.pend_copy_total = copy_len;
            d.phase = MbDecoder::LITERALS;
            *bit_pos_io = br.pos;
            break;
        }
        case MbDecoder::LITERALS: {
            while (d.pend_insert > 0) {
                // block switch under its own checkpoint
                if (d.L.remaining == 0) {
                    int64_t ck = br.pos;
                    BlockCat ckL = d.L;
                    br.avail = 0;
                    int r = switch_block(br, d.L);
                    // a switch that "succeeded" on zero-padded bits
                    // past the input end would commit a garbage block
                    // length — over() outranks the result code
                    if (r == -1 || br.over()) {
                        d.L = ckL;
                        return suspend_in(ck);
                    }
                    if (r) return fail(-2);
                }
                if (out_len >= out_cap) {
                    *bit_pos_io = br.pos;
                    return out_len > 0 ? out_len : -3;
                }
                // one refill-batch of literals (checkpointed: a batch
                // re-decodes at most one 57-bit window on truncation)
                int64_t ck = br.pos;
                int64_t ck_out = out_len;
                uint8_t ck_p1 = d.p1, ck_p2 = d.p2;
                int64_t ck_Lrem = d.L.remaining;
                const uint8_t* l0 =
                    g_dict.ctx_lut0 + d.modes[d.L.cur] * 256;
                const uint8_t* l1 =
                    g_dict.ctx_lut1 + d.modes[d.L.cur] * 256;
                const uint8_t* lrow =
                    d.cmap_l + ((int64_t)d.L.cur << 6);
                int64_t take = std::min({d.pend_insert,
                                         d.L.remaining,
                                         out_cap - out_len});
                br.avail = 0;
                br.refill();
                uint64_t w = br.bits;
                int64_t amax = br.avail;
                int consumed = 0;
                int64_t done = 0;
                while (done < take && consumed + 15 <= amax) {
                    int ctx = l0[d.p1] | l1[d.p2];
                    const int32_t* tab = d.lit_pt[lrow[ctx]].tab;
                    int32_t e = tab[w & 1023];
                    int l = e & 15;
                    if (__builtin_expect(l > 10, 0)) {
                        e = tab[(e >> 4) +
                                ((w >> 10) & ((1u << (l - 10)) - 1))];
                        l = e & 15;
                    }
                    d.p2 = d.p1;
                    d.p1 = (uint8_t)(e >> 4);
                    out[out_len++] = d.p1;
                    w >>= l;
                    consumed += l;
                    done++;
                }
                br.skip(consumed);
                if (br.over()) {
                    // partial batch past the input end: roll the
                    // whole batch back (<= 57 bits of re-decode)
                    out_len = ck_out;
                    d.p1 = ck_p1;
                    d.p2 = ck_p2;
                    d.L.remaining = ck_Lrem;
                    return suspend_in(ck);
                }
                d.pend_insert -= done;
                d.L.remaining -= done;
                d.mlen -= done;
                d.total_out += done;
                *bit_pos_io = br.pos;
                if (done == 0 && take > 0) {
                    // could not decode a single literal: need input
                    return suspend_in(br.pos);
                }
            }
            if (d.mlen == 0) {
                // trailing-insert command: no copy part
                d.phase = MbDecoder::CMD_HEAD;
                break;
            }
            d.phase = MbDecoder::DIST;
            break;
        }
        case MbDecoder::DIST: {
            int64_t ck = br.pos;
            BlockCat ckD = d.D;
            br.avail = 0;
            int64_t copy_len = d.pend_copy_total;
            int64_t pos_total = d.total_out;
            int64_t max_distance = std::min(pos_total, d.window_size);
            int64_t distance;
            int dcode = 0;
            if (d.pend_implicit0) {
                distance = d.dist_cache[0];
            } else {
                if (d.D.remaining == 0) {
                    int r = switch_block(br, d.D);
                    if (r == -1 || br.over()) {
                        d.D = ckD;
                        return suspend_in(ck);
                    }
                    if (r) return fail(-2);
                }
                d.D.remaining--;
                int dctx = (int)std::min<int64_t>(
                    std::max<int64_t>(copy_len, 2), 5) - 2;
                const uint8_t* drow = d.cmap_d +
                    ((int64_t)d.D.cur << 2);
                dcode = decode_tab10(br, d.dist_pt[drow[dctx]].tab);
                if (br.over()) { d.D = ckD; return suspend_in(ck); }
                if (dcode == 0) {
                    distance = d.dist_cache[0];
                } else if (dcode < 16) {
                    distance = d.dist_cache[kDistShortIdx[dcode]] +
                               kDistShortDelta[dcode];
                    if (distance <= 0) {
                        if (br.over()) { d.D = ckD;
                                         return suspend_in(ck); }
                        return fail(-2);
                    }
                } else if (dcode < 16 + d.ndirect) {
                    distance = dcode - 16 + 1;
                } else {
                    int64_t h = dcode - d.ndirect - 16;
                    int64_t hcode = h >> d.npostfix;
                    int64_t lcode = h & ((1 << d.npostfix) - 1);
                    int nbits = (int)(1 + (hcode >> 1));
                    int64_t offset = ((2 + (hcode & 1)) << nbits) - 4;
                    int64_t extra = (int64_t)br.read_long(nbits);
                    if (br.over()) { d.D = ckD; return suspend_in(ck); }
                    distance = ((offset + extra) << d.npostfix) +
                               lcode + d.ndirect + 1;
                }
            }
            if (br.over()) { d.D = ckD; return suspend_in(ck); }
            *bit_pos_io = br.pos;
            static const bool mb_trace = getenv("MBDEC_TRACE");
            if (__builtin_expect(mb_trace, 0))
                fprintf(stderr,
                        "[mb] tot=%lld cp=%lld d=%lld imp=%d Lr=%lld "
                        "Ir=%lld Dr=%lld\n",
                        (long long)d.total_out, (long long)copy_len,
                        (long long)distance, d.pend_implicit0,
                        (long long)d.L.remaining,
                        (long long)d.I.remaining,
                        (long long)d.D.remaining);
            if (distance > max_distance) {
                // static dictionary reference
                if (copy_len < 4 || copy_len > 24) return fail(-2);
                int64_t word_id = distance - max_distance - 1;
                int64_t sb = g_dict.size_bits_by_length[copy_len];
                int64_t idx = word_id & ((1ll << sb) - 1);
                int64_t transform = word_id >> sb;
                int64_t wl = transform_word(copy_len, idx, transform,
                                            d.word_buf);
                if (wl < 0 || wl > d.mlen) return fail(-2);
                d.word_len = wl;
                d.word_off = 0;
                d.phase = MbDecoder::DICT_FLUSH;
            } else {
                if (copy_len > d.mlen) return fail(-2);
                d.pend_copy = copy_len;
                d.pend_dist = distance;
                if (!d.pend_implicit0 && dcode != 0) {
                    d.dist_cache[3] = d.dist_cache[2];
                    d.dist_cache[2] = d.dist_cache[1];
                    d.dist_cache[1] = d.dist_cache[0];
                    d.dist_cache[0] = distance;
                }
                d.phase = MbDecoder::COPY;
            }
            break;
        }
        case MbDecoder::DICT_FLUSH: {
            int64_t space = out_cap - out_len;
            if (space <= 0) {
                *bit_pos_io = br.pos;
                return out_len > 0 ? out_len : -3;
            }
            int64_t take = std::min(d.word_len - d.word_off, space);
            std::memcpy(out + out_len, d.word_buf + d.word_off,
                        (size_t)take);
            out_len += take;
            d.word_off += take;
            d.mlen -= take;
            d.total_out += take;
            if (d.word_off < d.word_len) {
                *bit_pos_io = br.pos;
                return out_len > 0 ? out_len : -3;
            }
            d.p1 = prev_byte(1);
            d.p2 = prev_byte(2);
            d.phase = MbDecoder::CMD_HEAD;
            break;
        }
        case MbDecoder::COPY: {
            int64_t space = out_cap - out_len;
            if (space <= 0) {
                *bit_pos_io = br.pos;
                return out_len > 0 ? out_len : -3;
            }
            int64_t take = std::min(d.pend_copy, space);
            int64_t dist = d.pend_dist;
            for (int64_t j = 0; j < take; j++) {
                int64_t src = out_len - dist;
                uint8_t b;
                if (src >= 0) {
                    b = out[src];
                } else {
                    int64_t hi = hist_len + src;
                    if (hi < 0) return fail(-2);
                    b = hist[hi];
                }
                out[out_len++] = b;
            }
            d.pend_copy -= take;
            d.mlen -= take;
            d.total_out += take;
            if (d.pend_copy > 0) {
                *bit_pos_io = br.pos;
                return out_len > 0 ? out_len : -3;
            }
            d.p1 = prev_byte(1);
            d.p2 = prev_byte(2);
            d.phase = MbDecoder::CMD_HEAD;
            break;
        }
        }
    }
}

}  // extern "C"

extern "C" void stream_decoder_debug(void* pd, int64_t* out8) {
    MbDecoder& d = *(MbDecoder*)pd;
    out8[0] = d.phase;
    out8[1] = d.mlen;
    out8[2] = d.pend_insert;
    out8[3] = d.pend_copy;
    out8[4] = d.total_out;
    out8[5] = d.L.remaining;
    out8[6] = d.I.remaining;
    out8[7] = d.D.remaining;
}

extern "C" int64_t stream_decoder_window_size(void* pd) {
    MbDecoder& d = *(MbDecoder*)pd;
    return d.header_done ? d.window_size : 0;
}

// ---------------------------------------------------------------------------
// LZ execution for the TPU batched symbol-layer decoder: the chip
// returns (literal bytes, commands); this applies them over the
// retained prefix at memcpy speed (the Python per-command loop was
// the batch path's wall-clock bottleneck once the device leg shrank).
// cmds rows are (insert_len, copy_len, distance); a distance past the
// window resolves a static-dictionary word exactly like the stream
// decoder.  Returns body length (== mlen) or -2.
// ---------------------------------------------------------------------------
extern "C" int64_t lz_execute_native(
    const uint8_t* lits, int64_t nlit,
    const int32_t* cmds, int64_t ncmd,
    int64_t prefix_len, int64_t window, int64_t mlen,
    uint8_t* out /* prefix already at out[0..prefix_len) */)
{
    uint8_t word_buf[64];
    int64_t n = prefix_len;
    int64_t li = 0;
    const int64_t end = prefix_len + mlen;
    for (int64_t k = 0; k < ncmd; k++) {
        int64_t ins = cmds[3 * k], cpy = cmds[3 * k + 1],
                dist = cmds[3 * k + 2];
        if (ins) {
            if (li + ins > nlit || n + ins > end) return -2;
            std::memcpy(out + n, lits + li, (size_t)ins);
            n += ins;
            li += ins;
        }
        if (cpy) {
            int64_t max_dist = std::min(n, window);
            if (dist > max_dist) {
                int64_t word_id = dist - max_dist - 1;
                if (cpy < 4 || cpy > 24 || word_id < 0) return -2;
                int64_t sb = g_dict.size_bits_by_length[cpy];
                int64_t idx = word_id & ((int64_t(1) << sb) - 1);
                int64_t transform = word_id >> sb;
                int64_t wl = transform_word(cpy, idx, transform,
                                            word_buf);
                if (wl < 0 || n + wl > end) return -2;
                std::memcpy(out + n, word_buf, (size_t)wl);
                n += wl;
            } else if (dist <= 0 || n + cpy > end) {
                return -2;
            } else if (dist >= cpy) {
                std::memcpy(out + n, out + n - dist, (size_t)cpy);
                n += cpy;
            } else {
                for (int64_t j = 0; j < cpy; j++, n++)
                    out[n] = out[n - dist];
            }
        }
    }
    return n - prefix_len == mlen ? mlen : -2;
}

// ---------------------------------------------------------------------------
// Lane-header parse for the TPU batched decoder: walks one stream's
// structure (headers only, no symbol decode) and, when it matches the
// device tier's eligibility — any number of uncompressed/metadata
// metablocks followed by ONE final compressed metablock with a single
// block type per category and one literal/distance tree — returns the
// wire code-length arrays + bit position the device kernel needs.
// Mirrors decode/batch_tpu._try_parse_stream (the Python oracle).
// Returns 1 eligible, 0 ineligible, -1 truncated, -2 corrupt.
// meta[8]: bit0, mlen, wbits, npostfix, ndirect, dist_alpha, n_pre,
// out_prefix_len.  pre[2*max_pre]: (byte_off, len) literal segments.
// ---------------------------------------------------------------------------
extern "C" int64_t parse_lane_header_native(
    const uint8_t* in, int64_t in_len,
    int64_t* meta, int64_t* pre, int64_t max_pre,
    uint8_t* lit_len, uint8_t* cmd_len, uint8_t* dist_len)
{
    BitReader br{in, in_len, 0};
    int wbits;
    int64_t rh = parse_stream_header(br, 0, &wbits);
    if (rh) return rh;
    std::vector<int32_t> arena_mem(1 << 16);
    TableArena arena{arena_mem.data(), (int64_t)arena_mem.size()};
    uint8_t scratch[1200];
    int64_t n_pre = 0, out_prefix = 0;
    for (;;) {
        int64_t islast = br.read(1);
        if (br.over()) return -1;
        if (islast && br.read(1)) return br.over() ? -1 : 0;  // empty
        if (br.over()) return -1;
        int64_t mnibbles = br.read(2);
        if (mnibbles == 3) {  // metadata
            if (br.read(1)) return br.over() ? -1 : -2;
            int64_t mskip = br.read(2);
            int64_t skip = 0;
            if (mskip) {
                int64_t val = br.read((int)(8 * mskip));
                if (mskip > 1 && (val >> (8 * (mskip - 1))) == 0)
                    return br.over() ? -1 : -2;
                skip = val + 1;
            }
            if (!br.align_ok()) return br.over() ? -1 : -2;
            if (!br.at_least(8 * skip)) return -1;
            br.skip_bulk(8 * skip);
            if (islast) return 0;
            continue;
        }
        int64_t mlen = br.read((int)(16 + 4 * mnibbles)) + 1;
        if (br.over()) return -1;
        if (mnibbles > 0 &&
            ((mlen - 1) >> (16 + 4 * (mnibbles - 1))) == 0)
            return -2;
        if (!islast && br.read(1)) {  // ISUNCOMPRESSED
            if (!br.align_ok()) return br.over() ? -1 : -2;
            if (!br.at_least(8 * mlen)) return -1;
            if (n_pre >= max_pre) return 0;
            pre[2 * n_pre] = br.pos >> 3;
            pre[2 * n_pre + 1] = mlen;
            n_pre++;
            out_prefix += mlen;
            br.skip_bulk(8 * mlen);
            continue;
        }
        // compressed metablock: must be last (the host walk cannot
        // pass an un-decoded metablock)
        BlockCat L, I, D;
        if (read_block_header(br, L, arena, scratch)) return 0;
        if (read_block_header(br, I, arena, scratch)) return 0;
        if (read_block_header(br, D, arena, scratch)) return 0;
        if (L.num_types != 1 || I.num_types != 1 || D.num_types != 1)
            return 0;
        int64_t npostfix = br.read(2);
        int64_t ndirect = br.read(4) << npostfix;
        br.read(2);  // literal context mode (single type)
        int ntrees_l = read_count_code(br);
        uint8_t cmap[256 * 4];
        if (ntrees_l > 256) return 0;
        if (read_context_map(br, 64, ntrees_l, cmap, arena, scratch))
            return 0;
        int ntrees_d = read_count_code(br);
        if (ntrees_d > 256) return 0;
        if (read_context_map(br, 4, ntrees_d, cmap, arena, scratch))
            return 0;
        if (ntrees_l != 1 || ntrees_d != 1) return 0;
        int64_t dist_alpha = 16 + ndirect + (48ll << npostfix);
        PrefixTable pt;
        arena.used = 0;
        if (read_prefix_code(br, lit_len, 256, pt, arena)) return 0;
        if (read_prefix_code(br, cmd_len, 704, pt, arena)) return 0;
        if (read_prefix_code(br, dist_len, (int)dist_alpha, pt,
                             arena)) return 0;
        if (!islast) return 0;
        meta[0] = br.pos;
        meta[1] = mlen;
        meta[2] = wbits;
        meta[3] = npostfix;
        meta[4] = ndirect;
        meta[5] = dist_alpha;
        meta[6] = n_pre;
        meta[7] = out_prefix;
        return 1;
    }
}
