// Drop-in google/brotli-compatible C ABI over the native runtime.
//
// A C/Go caller links against libbrotli_tpu_native.so and gets the
// reference's public surface (reference headers:
// /root/reference/c/brotli/encode.h:256-457, decode.h:146-330;
// impl /root/reference/src/ffi/compressor.rs, decompressor.rs) without
// ever touching Python: the static dictionary/transform tables are
// embedded (dict_embed.inc), the encode pipeline is the same native
// combined_parse + encode_metablock chain the Python package uses, and
// the decoder is decode_native.
//
// Scope notes (documented divergences, not silent ones):
//  - qualities 10/11 run the native optimal parse (zopfli_hq.cpp),
//    including the exact sorted (word x transform) dictionary index
//    built from the embedded tables; the greedy tiers do not search
//    the static dictionary on this path.
//  - the streaming DECODER resumes at ANY input byte (the resumable
//    MbDecoder engine; state is O(window) + one partial phase); the
//    streaming ENCODER emits per metablock-sized chunk and supports
//    FLUSH byte-alignment.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <algorithm>
#include <future>
#include <vector>

#include "dict_embed.inc"

extern "C" {
int64_t combined_parse_native(
    const uint8_t*, int64_t, int64_t, int64_t, int64_t, int64_t,
    int64_t, int64_t, int64_t, int64_t, int64_t,
    const int64_t*, int64_t, int64_t, const uint8_t*, const int64_t*,
    const int64_t*, const int64_t*, const int64_t*,
    const int64_t*, int64_t, int64_t, const int64_t*,
    int64_t*, int64_t*, int64_t*, int64_t*, int64_t*, int64_t);
int64_t encode_metablock_native(
    const uint8_t*, int64_t, int64_t, int64_t,
    int64_t, const int64_t*, const int64_t*, const int64_t*,
    const int64_t*, int64_t*, int64_t, int64_t, int64_t, int64_t,
    int64_t, int64_t, int64_t, const int64_t*, const uint8_t*,
    const uint8_t*, int64_t, const int32_t*, int64_t,
    uint64_t*, int64_t, int64_t);
int64_t decode_native(
    const uint8_t*, int64_t, uint8_t*, int64_t, const uint8_t*,
    int64_t, int64_t, int32_t*, int64_t);
int64_t decode_stream_step_native(
    int64_t*, const uint8_t*, int64_t, int64_t*, const uint8_t*,
    int64_t, uint8_t*, int64_t, int64_t, int32_t*, int64_t);
void* stream_decoder_create(int64_t);
void stream_decoder_destroy(void*);
int64_t stream_decoder_finished(void*);
int64_t stream_decoder_window_size(void*);
int64_t stream_decoder_step(
    void*, const uint8_t*, int64_t, int64_t*, const uint8_t*, int64_t,
    uint8_t*, int64_t, int32_t*, int64_t);
void decoder_set_dictionary(
    const uint8_t*, const int64_t*, const int64_t*, const uint8_t*,
    const int64_t*, const uint8_t*, const int64_t*, const int64_t*,
    const uint8_t*, const uint8_t*);
void zopfli_hq_dict_init(
    const uint8_t*, const int64_t*, const int64_t*, const int64_t*,
    const uint8_t*, const int64_t*, const uint8_t*, const int64_t*,
    int64_t);
int64_t zopfli_hq_parse_native(
    const uint8_t*, int64_t, int64_t, int64_t, int64_t, int64_t,
    const int64_t*, const uint8_t*, const uint8_t*,
    int64_t*, int64_t*, int64_t*, int64_t*, int64_t);
int64_t zopfli_hq_parse_pre_native(
    const uint8_t*, int64_t, int64_t, int64_t, int64_t, int64_t,
    const int64_t*, const uint8_t*, const uint8_t*, void*,
    int64_t*, int64_t*, int64_t*, int64_t*, int64_t);
void* zopfli_hq_collect_native(const uint8_t*, int64_t, int64_t,
                               int64_t, int64_t);
void zopfli_hq_collect_free(void*);
void resolve_commands_native(
    const int64_t*, const int64_t*, const int64_t*, const int64_t*,
    int64_t, int64_t, int64_t, int64_t*, int64_t, int64_t,
    int64_t*, int64_t*, int64_t*, uint8_t*, int64_t*);
void choose_dist_params_native(
    const int64_t*, const int64_t*, const int64_t*, const int64_t*,
    int64_t, int64_t*, int64_t*);
}

namespace capi {

static void ensure_decoder_dict() {
    static bool done = false;
    if (done) return;
    decoder_set_dictionary(kDictData, kDictOffsets, kDictSizeBits,
                           kDictTPrefix, kDictTPrefixLen, kDictTSuffix,
                           kDictTSuffixLen, kDictTType, kCtxLut0,
                           kCtxLut1);
    done = true;
}

// ---------------------------------------------------------------------------
// byte-granular bit writer
// ---------------------------------------------------------------------------

struct ByteBW {
    std::vector<uint8_t> buf;
    int64_t bitpos = 0;

    void put(uint64_t bits, int nb) {
        if (nb <= 0) return;
        int64_t need = (bitpos + nb + 7) >> 3;
        if ((int64_t)buf.size() < need) buf.resize(need, 0);
        bits &= nb >= 64 ? ~0ull : ((1ull << nb) - 1);
        int64_t byte = bitpos >> 3, off = bitpos & 7;
        // write into up to 9 bytes
        buf[byte] |= (uint8_t)(bits << off);
        uint64_t rest = bits >> (8 - off);
        int written = 8 - (int)off;
        int64_t b = byte + 1;
        while (written < nb) {
            if ((int64_t)buf.size() <= b) buf.resize(b + 1, 0);
            buf[b] |= (uint8_t)rest;
            rest >>= 8;
            written += 8;
            b++;
        }
        bitpos += nb;
    }
    void align() {
        bitpos = (bitpos + 7) & ~7ll;
        if ((int64_t)buf.size() < (bitpos >> 3)) buf.resize(bitpos >> 3, 0);
    }
    void put_bytes(const uint8_t* p, int64_t n) {
        align();
        buf.resize((bitpos >> 3) + n);
        std::memcpy(buf.data() + (bitpos >> 3), p, (size_t)n);
        bitpos += n * 8;
    }
    void append_words(const uint64_t* words, int64_t nbits) {
        int64_t full = nbits / 64;
        for (int64_t i = 0; i < full; i++) {
            put((uint32_t)words[i], 32);
            put((uint32_t)(words[i] >> 32), 32);
        }
        int rem = (int)(nbits & 63);
        if (rem) {
            uint64_t w = words[full];
            if (rem > 32) { put((uint32_t)w, 32); w >>= 32; rem -= 32; }
            put(w, rem);
        }
    }
};

// ---------------------------------------------------------------------------
// stream shaping primitives (port of encode/bitstream.py)
// ---------------------------------------------------------------------------

static void write_stream_header(ByteBW& w, int lgwin) {
    if (lgwin == 16) { w.put(0, 1); return; }
    if (lgwin == 17) { w.put(1, 7); return; }
    if (lgwin > 17 && lgwin <= 24) { w.put(((lgwin - 17) << 1) | 1, 4); return; }
    w.put(((lgwin - 8) << 4) | 1, 7);  // 10..15
}

static void write_mlen(ByteBW& w, int64_t mlen) {
    int lg = 1;
    while ((int64_t(1) << lg) < mlen) lg++;
    int mnibbles = std::max(4, (lg + 3) / 4);
    w.put(mnibbles - 4, 2);
    w.put((uint64_t)(mlen - 1), mnibbles * 4);
}

static void write_empty_last(ByteBW& w) { w.put(3, 2); }

// Dropbox magic-number header: a metadata block after the window
// header carrying magic + version + base-128 size hint (reference
// BrotliWriteMetadataMetaBlock, brotli_bit_stream.rs:2869; port of
// encode/bitstream.py write_magic_number)
static void write_magic_number(ByteBW& w, uint32_t size_hint,
                               bool catable, bool appendable) {
    uint8_t hint[8];
    int hn = 0;
    uint32_t v = size_hint;
    do {
        hint[hn] = (uint8_t)(v & 0x7F);
        v >>= 7;
        if (v) hint[hn] |= 0x80;
        hn++;
    } while (v);
    w.put(0, 1);             // ISLAST
    w.put(3, 2);             // MNIBBLES == 0 -> metadata
    w.put(0, 1);             // reserved
    w.put(1, 2);             // MSKIPBYTES = 1
    w.put((uint64_t)(3 + hn), 8);  // MSKIPLEN - 1
    w.align();
    uint8_t magic[4] = {0xE1, 0x97,
                        (uint8_t)(catable ? 0x81
                                  : appendable ? 0x82 : 0x80),
                        1 /* FORMAT_VERSION, reference src/lib.rs:67 */};
    w.put_bytes(magic, 4);
    w.put_bytes(hint, hn);
}

static void write_padding_block(ByteBW& w) {
    w.put(0, 1); w.put(3, 2); w.put(0, 1); w.put(0, 2);
    w.align();
}

static void store_uncompressed(ByteBW& w, const uint8_t* p, int64_t n) {
    while (n > 0) {
        int64_t chunk = std::min<int64_t>(n, int64_t(1) << 24);
        w.put(0, 1);
        write_mlen(w, chunk);
        w.put(1, 1);  // ISUNCOMPRESSED
        w.put_bytes(p, chunk);
        p += chunk;
        n -= chunk;
    }
}

// ---------------------------------------------------------------------------
// context-mode / static-context-map decisions (port of metablock.py,
// reference ChooseContextMode encode.rs:1357 and
// DecideOverLiteralContextModeling :1873)
// ---------------------------------------------------------------------------

static const int64_t kMapSimple[64] = {
    0,0,1,1, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0,
    0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0,
    0,0,0,0, 0,0,0,0};
static const int64_t kMapContinuation[64] = {
    1,1,2,2, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0,
    0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0,
    0,0,0,0, 0,0,0,0};
static const int64_t kMapComplex[64] = {
    11, 11, 12, 12, 0, 0, 0, 0, 1, 1, 9, 9, 2, 2, 2, 2,
    1, 1, 1, 1, 8, 3, 3, 3, 1, 1, 1, 1, 2, 2, 2, 2,
    8, 4, 4, 4, 8, 7, 4, 4, 8, 0, 0, 0, 3, 3, 3, 3,
    5, 5, 10, 5, 5, 5, 10, 5, 6, 6, 6, 6, 6, 6, 6, 6};
static const int64_t kMapZero[64] = {0};

static bool is_mostly_utf8(const uint8_t* d, int64_t n) {
    if (n == 0) return true;
    int64_t size_utf8 = 0, total = 0;
    // sample 4KB blocks every 64KB on large inputs
    int64_t step = n > (1 << 16) ? (1 << 16) : n;
    for (int64_t s = 0; s + 4096 <= n || s == 0; s += step) {
        int64_t e = std::min(n, s + (n > (1 << 16) ? 4096 : n));
        for (int64_t i = s; i < e; i++) {
            uint8_t c = d[i];
            total++;
            if (c < 0x80) size_utf8++;
            else if (c >= 0xC2 && c < 0xE0 && i + 1 < e &&
                     d[i + 1] >= 0x80 && d[i + 1] < 0xC0)
                size_utf8 += 2;
            else if (c >= 0xE0 && c < 0xF0 && i + 2 < e &&
                     d[i + 1] >= 0x80 && d[i + 1] < 0xC0 &&
                     d[i + 2] >= 0x80 && d[i + 2] < 0xC0)
                size_utf8 += 3;
        }
        if (n <= (1 << 16)) break;
    }
    return size_utf8 * 4 > total * 3;
}

static double shannon(const int64_t* h, int n) {
    double total = 0, acc = 0;
    for (int i = 0; i < n; i++) total += (double)h[i];
    if (total <= 0) return 0.0;
    for (int i = 0; i < n; i++)
        if (h[i] > 0) acc += (double)h[i] * std::log2((double)h[i]);
    return total * std::log2(total) - acc;
}

// returns num_lit_ctx and sets *map_out
static int choose_literal_map(const uint8_t* data, int64_t start,
                              int64_t length, int quality,
                              int64_t size_hint, const int64_t** map_out) {
    *map_out = kMapZero;
    if (quality < 5 || length < 64) return 1;
    // complex-map check (ShouldUseComplexStaticContextMap)
    if (size_hint >= (1 << 20)) {
        const uint8_t* l0 = kCtxLut0 + 2 * 256;   // UTF8 mode rows
        const uint8_t* l1 = kCtxLut1 + 2 * 256;
        int64_t combined[32] = {0};
        int64_t ctxh[13 * 32] = {0};
        int64_t total = 0;
        for (int64_t s = start; s + 64 <= start + length; s += 4096) {
            for (int64_t i = s + 2; i < s + 64; i++) {
                int ctx = (int)kMapComplex[l0[data[i - 1]] | l1[data[i - 2]]];
                int t5 = data[i] >> 3;
                combined[t5]++;
                ctxh[ctx * 32 + t5]++;
                total++;
            }
        }
        if (total > 0) {
            double e1 = shannon(combined, 32) / (double)total;
            double e2 = 0;
            for (int i = 0; i < 13; i++) e2 += shannon(ctxh + i * 32, 32);
            e2 /= (double)total;
            if (e2 <= 3.0 && e1 - e2 >= 0.2) {
                *map_out = kMapComplex;
                return 13;
            }
        }
    }
    // bigram prefix decision (ChooseContextMap)
    static const int clut[4] = {0, 0, 1, 2};
    int64_t bigram[9] = {0};
    for (int64_t s = start; s + 64 <= start + length; s += 4096) {
        for (int64_t i = s + 1; i < s + 64; i++) {
            int a = clut[data[i - 1] >> 6], b = clut[data[i] >> 6];
            bigram[a * 3 + b]++;
        }
    }
    int64_t mono[3] = {0}, twop[6] = {0};
    for (int i = 0; i < 9; i++) { mono[i % 3] += bigram[i]; twop[i % 6] += bigram[i]; }
    int64_t total = mono[0] + mono[1] + mono[2];
    if (total == 0) return 1;
    double e1 = shannon(mono, 3) / (double)total;
    double e2 = (shannon(twop, 3) + shannon(twop + 3, 3)) / (double)total;
    double e3 = 0;
    for (int i = 0; i < 3; i++) e3 += shannon(bigram + 3 * i, 3);
    e3 /= (double)total;
    if (quality < 7) e3 = e1 * 10.0;
    if (e1 - e2 < 0.2 && e1 - e3 < 0.2) return 1;
    if (e2 - e3 < 0.02) { *map_out = kMapSimple; return 2; }
    *map_out = kMapContinuation;
    return 3;
}

// ---------------------------------------------------------------------------
// one-shot encode core (port of encoder.compress_with_params, q<=9 tier)
// ---------------------------------------------------------------------------

struct Knobs { int64_t k, bb, k8, bb8, hl, nc; };

static Knobs quality_knobs(int q) {
    if (q <= 1) return {1, 15, 0, 15, 4, 4};
    if (q <= 3) return {2, 16, 1, 16, 4, 4};
    if (q <= 6) return {8, 15, 4, 15, 5, 4};
    return {24, 16, 8, 16, 5, 16};
}

static const int64_t kPoisonedDistance = 0x7FFFFFF0;

// per-metablock distance-parameter search for the optimal-parse tier
// (reference BrotliBuildMetaBlock, metablock.rs:158-208): resolve the
// commands at (0,0) to classify short codes, then sweep
static void pick_dist_params(const int64_t* oi, const int64_t* oc,
                             const int64_t* od, const int64_t* oa,
                             int64_t cnt, const int64_t* cache,
                             int64_t abs_start, int64_t window,
                             int64_t* npostfix, int64_t* ndirect) {
    *npostfix = 0;
    *ndirect = 0;
    if (cnt <= 0) return;
    std::vector<int64_t> rcode(cnt), rextra(cnt), rbits(cnt), rsym(cnt);
    std::vector<uint8_t> rul(cnt);
    int64_t scratch_cache[4] = {cache[0], cache[1], cache[2], cache[3]};
    resolve_commands_native(oi, oa, od, oc, cnt, 0, 0, scratch_cache,
                            abs_start, window, rcode.data(),
                            rextra.data(), rbits.data(), rul.data(),
                            rsym.data());
    choose_dist_params_native(od, rcode.data(), rsym.data(), oc, cnt,
                              npostfix, ndirect);
}

static bool c_encode(const uint8_t* input, int64_t n, int quality,
                     int lgwin, int mode, bool catable, bool appendable,
                     bool bare, bool byte_align,
                     const uint8_t* custom_dict, int64_t dict_len,
                     std::vector<uint8_t>& out) {
    ensure_decoder_dict();
    if (quality < 0) quality = 0;
    if (quality > 11) quality = 11;
    bool zopfli = quality >= 10;  // native optimal-parse tier
    if (zopfli)
        zopfli_hq_dict_init(kDictData, kDictOffsets, kDictSizeBits,
                            kDictTType, kDictTPrefix, kDictTPrefixLen,
                            kDictTSuffix, kDictTSuffixLen, 121);
    // catable implies appendable (SanitizeParams, encode.rs:546); a
    // custom dictionary stays allowed here because CompressMulti
    // installs the shard prefix as one (threading/mod.rs:354-366) —
    // after concatenation those prefix bytes precede the shard, so
    // back-references into them are position-correct
    if (catable) appendable = true;
    if (bare) byte_align = true;
    if (lgwin < 10) lgwin = 10;
    if (lgwin > 24) lgwin = 24;
    if (n > 0 && quality >= 2 && !catable && !appendable) {
        while (lgwin > 10 && (int64_t(1) << (lgwin - 1)) - 16 >= n)
            lgwin--;
    }
    int64_t window = (int64_t(1) << lgwin) - 16;
    int lgblock = quality <= 1 ? lgwin : 22;
    lgblock = std::max(16, std::min(24, lgblock));
    int64_t span = int64_t(1) << lgblock;

    ByteBW w;
    if (!(bare && catable)) write_stream_header(w, lgwin);

    int64_t cache[4] = {4, 11, 15, 16};
    int64_t start = 0;
    if (catable && n > 0) {
        for (int i = 0; i < 4; i++) cache[i] = kPoisonedDistance;
        int64_t k = std::min<int64_t>(2, n);
        store_uncompressed(w, input, k);
        start = k;
    }
    if (start >= n) {
        if (appendable || byte_align) {
            if (byte_align) write_padding_block(w);
            if (!bare) write_empty_last(w);
        } else {
            write_empty_last(w);
        }
        out = std::move(w.buf);
        return true;
    }

    // concatenated dict + data region
    std::vector<uint8_t> full;
    const uint8_t* base = input;
    int64_t total_len = n;
    if (dict_len > 0) {
        full.resize(dict_len + n);
        std::memcpy(full.data(), custom_dict, (size_t)dict_len);
        std::memcpy(full.data() + dict_len, input, (size_t)n);
        base = full.data();
        total_len = dict_len + n;
    }

    std::vector<int64_t> bounds;
    for (int64_t b = start + span; b < n; b += span) bounds.push_back(b);
    bounds.push_back(n);

    Knobs kn = quality_knobs(quality);
    if (catable && bare && dict_len > 0) {
        // CompressMulti shard (prefix-dict catable continuation): 4+
        // concurrent shards at the single-stream geometry put ~40MB
        // of ring tables on the shared LLC and the search goes
        // latency-bound on evictions — shrink the per-shard tables
        // (the shard only SEARCHES its own slice; candidates it loses
        // are the far tail of the prefix, and the multi size gate is
        // pinned by test at <= 1.05x single)
        // defaults from the round-4 sweep: bbd=1/kd=1 is 2.2 -> ~2.6x
        // on 4 cores at multi/single size 1.009 -> 1.014 (bbd=2 gave
        // no more speed at 1.019)
        static const int bbd = getenv("BROTLI_TPU_MULTI_BBD")
                                   ? atoi(getenv("BROTLI_TPU_MULTI_BBD"))
                                   : 1;
        static const int kd = getenv("BROTLI_TPU_MULTI_KD")
                                  ? atoi(getenv("BROTLI_TPU_MULTI_KD"))
                                  : 1;
        kn.bb = std::max(12, (int)kn.bb - bbd);
        kn.bb8 = std::max(12, (int)kn.bb8 - bbd);
        if (kd) {
            kn.k = std::max<int64_t>(4, kn.k >> kd);
            if (kn.k8) kn.k8 = std::max<int64_t>(2, kn.k8 >> kd);
        }
    }
    int64_t max_cmds = n / 2 + (int64_t)bounds.size() + 2;
    std::vector<int64_t> oi(max_cmds), oc(max_cmds), od(max_cmds),
        oa(max_cmds), segc(bounds.size());
    if (!zopfli) {
        int64_t ncmd = combined_parse_native(
            base, total_len, dict_len, window, kn.k, kn.bb, kn.k8,
            kn.bb8, kn.hl, kn.nc, 135,
            nullptr, 0, 0, nullptr, nullptr, nullptr, nullptr, nullptr,
            bounds.data(), (int64_t)bounds.size(), start, cache,
            oi.data(), oc.data(), od.data(), oa.data(), segc.data(),
            max_cmds);
        (void)ncmd;
    }

    bool suppress = appendable || byte_align;
    int64_t off = 0;
    int64_t seg_start = start;
    std::vector<uint64_t> words;
    std::future<void*> zopfli_next;
    if (zopfli && bounds.size() > 0) {
        int64_t b0 = bounds[0];
        int64_t abs0 = dict_len + start;
        int64_t keep0 = std::min(abs0, window);
        const uint8_t* base0 = base + abs0 - keep0;
        int64_t s0 = start;
        int64_t use_d = catable ? 0 : 1;
        zopfli_next = std::async(
            std::launch::async, [base0, keep0, b0, s0, window, use_d] {
                return zopfli_hq_collect_native(base0, keep0, b0 - s0,
                                                window, use_d);
            });
    }
    for (size_t bi = 0; bi < bounds.size(); bi++) {
        int64_t mb_npostfix = 0, mb_ndirect = 0;
        int64_t boundary = bounds[bi];
        int64_t mlen = boundary - seg_start;
        bool is_final = bi + 1 == bounds.size();
        bool is_last = is_final && !suppress;
        int64_t abs_start = dict_len + seg_start;
        int64_t cnt;
        if (zopfli) {
            // per-metablock native optimal parse (the q10/q11 tier);
            // the preceding input acts as the LZ77 prefix, clamped to
            // the window — no distance can reach further back, and an
            // unclamped prefix makes the candidate collection
            // quadratic across metablocks
            int64_t keep = std::min(abs_start, window);
            int64_t cap2 = mlen + 2;
            if ((int64_t)oi.size() < cap2) {
                oi.resize(cap2); oc.resize(cap2);
                od.resize(cap2); oa.resize(cap2);
            }
            // the DP's context-conditional literal pricing uses the
            // same LUT family the store will pick (UTF8 vs SIGNED)
            int pmode = (mode != 2 &&
                         is_mostly_utf8(base + abs_start, mlen)) ? 2 : 3;
            void* col = nullptr;
            if (zopfli_next.valid()) col = zopfli_next.get();
            if (bi + 1 < bounds.size()) {
                // prefetch the NEXT metablock's candidate collection
                // (cache-independent) while this block's DP runs
                int64_t s1 = boundary;
                int64_t b1 = bounds[bi + 1];
                int64_t abs1 = dict_len + s1;
                int64_t keep1 = std::min(abs1, window);
                const uint8_t* base1 = base + abs1 - keep1;
                int64_t use_d = catable ? 0 : 1;
                zopfli_next = std::async(
                    std::launch::async,
                    [base1, keep1, b1, s1, window, use_d] {
                        return zopfli_hq_collect_native(
                            base1, keep1, b1 - s1, window, use_d);
                    });
            }
            cnt = zopfli_hq_parse_pre_native(
                base + abs_start - keep, keep, mlen, window, quality,
                catable ? 0 : 1, cache, kCtxLut0 + pmode * 256,
                kCtxLut1 + pmode * 256, col, oi.data(), oc.data(),
                od.data(), oa.data(), cap2);
            if (cnt < 0) {
                if (zopfli_next.valid())
                    zopfli_hq_collect_free(zopfli_next.get());
                return false;
            }
            off = 0;
            pick_dist_params(oi.data(), oc.data(), od.data(), oa.data(),
                             cnt, cache, abs_start, window,
                             &mb_npostfix, &mb_ndirect);
        } else {
            cnt = segc[bi];
        }
        int ctx_mode = 3;  // SIGNED
        if (mode != 2 && quality >= 4 &&
            is_mostly_utf8(base + abs_start, mlen))
            ctx_mode = 2;  // UTF8
        const int64_t* smap = capi::kMapZero;
        int nlc = 1;
        if (ctx_mode == 2)
            nlc = choose_literal_map(base, abs_start, mlen, quality, n,
                                     &smap);
        int64_t cap_bits = 9 * mlen + (1 << 17);
        words.assign((size_t)(cap_bits / 64 + 2), 0);
        int64_t mb_alpha = 16 + mb_ndirect + (48 << mb_npostfix);
        int64_t cache_snap[4] = {cache[0], cache[1], cache[2],
                                 cache[3]};
        int64_t nbits = encode_metablock_native(
            base, abs_start, mlen, is_last ? 1 : 0, cnt,
            oi.data() + off, oc.data() + off, od.data() + off,
            oa.data() + off, cache, window, mb_npostfix, mb_ndirect,
            mb_alpha, std::max(quality, 4), ctx_mode, nlc, smap,
            kCtxLut0 + ctx_mode * 256, kCtxLut1 + ctx_mode * 256,
            quality >= 4 ? 1 : 0, nullptr, 0, words.data(), cap_bits,
            0);
        if (nbits < 0 || nbits > 8 * mlen + 40) {
            // uncompressed fallback: the wire carries the raw block,
            // so the DECODER's distance ring is untouched — roll the
            // encoder's back too or the next metablock's short codes
            // resolve against a ring the decoder does not have
            for (int c = 0; c < 4; c++) cache[c] = cache_snap[c];
            store_uncompressed(w, input + seg_start, mlen);
            if (is_last) write_empty_last(w);
        } else {
            w.append_words(words.data(), nbits);
        }
        off += cnt;
        seg_start = boundary;
    }
    if (appendable || byte_align) {
        if (byte_align) write_padding_block(w);
        if (!bare) write_empty_last(w);
    }
    out = std::move(w.buf);
    return true;
}

// ---------------------------------------------------------------------------
// incremental chunk encode for the streaming facade: one region with
// an external LZ77 prefix (the retained window), threading the
// distance cache across chunks.  Same tiers as c_encode.
// ---------------------------------------------------------------------------

static bool encode_stream_chunk(
    ByteBW& w, const uint8_t* prefix, int64_t plen,
    const uint8_t* body, int64_t blen, bool is_last,
    int quality, int lgwin, int mode, bool use_dict, int64_t* cache) {
    ensure_decoder_dict();
    if (quality < 0) quality = 0;
    if (quality > 11) quality = 11;
    bool zopfli = quality >= 10;
    if (zopfli)
        zopfli_hq_dict_init(kDictData, kDictOffsets, kDictSizeBits,
                            kDictTType, kDictTPrefix, kDictTPrefixLen,
                            kDictTSuffix, kDictTSuffixLen, 121);
    int64_t window = (int64_t(1) << lgwin) - 16;
    if (blen == 0) return true;
    std::vector<uint8_t> full((size_t)(plen + blen));
    if (plen) std::memcpy(full.data(), prefix, (size_t)plen);
    std::memcpy(full.data() + plen, body, (size_t)blen);

    int64_t cnt;
    std::vector<int64_t> oi, oc, od, oa;
    if (zopfli) {
        oi.resize(blen + 2); oc.resize(blen + 2);
        od.resize(blen + 2); oa.resize(blen + 2);
        int pmode = (mode != 2 &&
                     is_mostly_utf8(full.data() + plen, blen)) ? 2 : 3;
        cnt = zopfli_hq_parse_native(
            full.data(), plen, blen, window, quality, use_dict ? 1 : 0,
            cache, kCtxLut0 + pmode * 256, kCtxLut1 + pmode * 256,
            oi.data(), oc.data(), od.data(), oa.data(), blen + 2);
        if (cnt < 0) return false;
    } else {
        capi::Knobs kn = capi::quality_knobs(quality);
        int64_t max_cmds = blen / 2 + 4;
        oi.resize(max_cmds); oc.resize(max_cmds);
        od.resize(max_cmds); oa.resize(max_cmds);
        int64_t bounds[1] = {blen};
        int64_t segc[1] = {0};
        cnt = combined_parse_native(
            full.data(), plen + blen, plen, window, kn.k, kn.bb, kn.k8,
            kn.bb8, kn.hl, kn.nc, 135,
            nullptr, 0, 0, nullptr, nullptr, nullptr, nullptr, nullptr,
            bounds, 1, 0, cache, oi.data(), oc.data(), od.data(),
            oa.data(), segc, max_cmds);
        if (cnt < 0) return false;
        cnt = segc[0];
    }

    int ctx_mode = 3;
    if (mode != 2 && quality >= 4 && is_mostly_utf8(full.data() + plen,
                                                    blen))
        ctx_mode = 2;
    const int64_t* smap = kMapZero;
    int nlc = 1;
    if (ctx_mode == 2)
        nlc = choose_literal_map(full.data(), plen, blen, quality, blen,
                                 &smap);
    int64_t mb_npostfix = 0, mb_ndirect = 0;
    if (zopfli)
        pick_dist_params(oi.data(), oc.data(), od.data(), oa.data(),
                         cnt, cache, plen, window, &mb_npostfix,
                         &mb_ndirect);
    int64_t dist_alpha = 16 + mb_ndirect + (48 << mb_npostfix);
    int64_t cap_bits = 9 * blen + (1 << 17);
    std::vector<uint64_t> words((size_t)(cap_bits / 64 + 2), 0);
    int64_t cache_snap2[4] = {cache[0], cache[1], cache[2], cache[3]};
    int64_t nbits = encode_metablock_native(
        full.data(), plen, blen, is_last ? 1 : 0, cnt, oi.data(),
        oc.data(), od.data(), oa.data(), cache, window, mb_npostfix,
        mb_ndirect, dist_alpha, std::max(quality, 4), ctx_mode, nlc,
        smap, kCtxLut0 + ctx_mode * 256, kCtxLut1 + ctx_mode * 256,
        quality >= 4 ? 1 : 0, nullptr, 0, words.data(), cap_bits, 0);
    if (nbits < 0 || nbits > 8 * blen + 40) {
        // uncompressed fallback: roll the ring back (see c_encode)
        for (int c = 0; c < 4; c++) cache[c] = cache_snap2[c];
        store_uncompressed(w, body, blen);
        if (is_last) write_empty_last(w);
    } else {
        w.append_words(words.data(), nbits);
    }
    return true;
}

}  // namespace capi

// ---------------------------------------------------------------------------
// public C ABI (google/brotli-compatible surface)
// ---------------------------------------------------------------------------

extern "C" {

typedef enum {
    BROTLI_DECODER_RESULT_ERROR = 0,
    BROTLI_DECODER_RESULT_SUCCESS = 1,
    BROTLI_DECODER_RESULT_NEEDS_MORE_INPUT = 2,
    BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT = 3,
} BrotliDecoderResult;

typedef enum {
    BROTLI_OPERATION_PROCESS = 0,
    BROTLI_OPERATION_FLUSH = 1,
    BROTLI_OPERATION_FINISH = 2,
    BROTLI_OPERATION_EMIT_METADATA = 3,
} BrotliEncoderOperation;

uint32_t BrotliEncoderVersion(void) { return 0x1009000; }
uint32_t BrotliDecoderVersion(void) { return 0x1009000; }

size_t BrotliEncoderMaxCompressedSize(size_t input_size) {
    size_t num_blocks = (input_size >> 24) + 1;
    return input_size + 2 + 4 * num_blocks + 3 + 1 + 16;
}

// ---- fully-preallocated encode (reference combined_alloc.rs
// declare_stack_allocator mode / README seccomp example) ----
extern int64_t compress_fragment_prealloc_native(
    const uint8_t*, int64_t, int64_t, int64_t, uint8_t*, int64_t,
    uint64_t*, int64_t);
extern "C" int64_t compress_session_prealloc_native(
    const uint8_t*, int64_t, int64_t, int64_t, int64_t,
    int64_t, int64_t, int64_t, int64_t, int64_t, int64_t, int64_t,
    int64_t, int64_t, const int64_t*, const uint8_t*, const uint8_t*,
    uint8_t*, int64_t, uint64_t*, int64_t);

size_t BrotliEncoderPreallocScratchSize(size_t input_size) {
    // table (256KB) + 4 command arrays for a 256KB metablock (8MB)
    // + the 64-bit output staging words (9n bits) + slack
    return (4u << 16) + 4 * ((1u << 18) / 4 + 16) * 8 +
           (9 * input_size + (1u << 18)) / 8 + 4096;
}

// quality-aware arena size: q0/q1 use the fragment formula above;
// q2-q9 add the ring-tier session buffers (rings, counters, hash
// scratch, command arrays — all carved from the caller's arena by
// compress_session_prealloc_native).
size_t BrotliEncoderPreallocScratchSizeQ(size_t input_size,
                                         int quality) {
    size_t base = BrotliEncoderPreallocScratchSize(input_size);
    if (quality <= 1) return base;
    capi::Knobs kn = capi::quality_knobs(quality > 9 ? 9 : quality);
    auto pow2 = [](int64_t v) {
        int64_t p = 1;
        while (p < v) p <<= 1;
        return p;
    };
    size_t span = std::min<size_t>(input_size ? input_size : 1,
                                   size_t(1) << 18);
    span = std::max<size_t>(span, 4096);
    size_t nb4 = size_t(1) << kn.bb, nb8 = size_t(1) << kn.bb8;
    size_t cap4 = (size_t)pow2(kn.k);
    size_t cap8 = kn.k8 ? (size_t)pow2(kn.k8) : 1;
    size_t rings = nb4 * cap4 * 8 + (kn.k8 ? nb8 * cap8 * 8 : 0);
    size_t cnts = nb4 * 2 + nb8 * 2;
    size_t hashes = 2 * (span + 320) * 4;
    size_t cmds = 4 * (span / 2 + 16) * 8;
    return base + rings + cnts + hashes + cmds + 4096 + 64 * 16;
}

// warm THIS thread's small store pools (histogram/length/command
// scratch in thread_local vectors) so subsequent prealloc compresses
// perform zero heap allocations — run before entering a jail, like
// the reference example constructs its StackAllocator up front.
// Two passes: a synthetic command stream at the COMMAND-COUNT CEILING
// (every command advances 3 bytes; any real fragment parse advances
// >= 4 per command) sizes the per-command pools, and a literal-heavy
// real encode sizes everything else.
extern "C" int64_t encode_metablock_native(
    const uint8_t*, int64_t, int64_t, int64_t, int64_t,
    const int64_t*, const int64_t*, const int64_t*, const int64_t*,
    int64_t*, int64_t, int64_t, int64_t, int64_t, int64_t, int64_t,
    int64_t, const int64_t*, const uint8_t*, const uint8_t*, int64_t,
    const int32_t*, int64_t, uint64_t*, int64_t, int64_t);

int BrotliEncoderCompressPrealloc(
    int quality, int lgwin, int mode, size_t input_size,
    const uint8_t* input, size_t* encoded_size,
    uint8_t* encoded_buffer, size_t scratch_size, uint8_t* scratch);

int BrotliEncoderPreallocWarmup(size_t max_input_size) {
    size_t span = std::min<size_t>(max_input_size, size_t(1) << 18);
    span = std::max<size_t>(span, 4096);
    // pass 1: command-ceiling synthetic metablock
    {
        std::vector<uint8_t> data(span);
        for (size_t i = 0; i < span; i++) data[i] = (uint8_t)(i & 1);
        int64_t n_cmds = (int64_t)(span - 1) / 3;
        std::vector<int64_t> ins(n_cmds, 1), cps(n_cmds, 2),
            dst(n_cmds, 2), adv(n_cmds, 2);
        ins[0] = 2;
        // total advance: sum(ins) + sum(copy) = 3*n_cmds + 1 <= span
        int64_t mlen = 3 * n_cmds + 1;
        static const int64_t kZeroMap[64] = {0};
        static const uint8_t kZeroLut[256] = {0};
        int64_t cache_io[4] = {4, 11, 15, 16};
        std::vector<uint64_t> words(mlen / 4 + 4096);
        encode_metablock_native(
            data.data(), 0, std::min<int64_t>(mlen, (int64_t)span), 1,
            n_cmds, ins.data(), cps.data(), dst.data(), adv.data(),
            cache_io, (int64_t(1) << 22) - 16, 0, 0, 64, 1, 0, 1,
            kZeroMap, kZeroLut, kZeroLut, 0, nullptr, 0, words.data(),
            (int64_t)(words.size() * 64 - 128), 0);
    }
    // pass 2: literal-heavy real encode through the prealloc driver
    size_t ss = BrotliEncoderPreallocScratchSize(max_input_size);
    std::vector<uint8_t> scratch(ss);
    std::vector<uint8_t> dummy(max_input_size);
    uint32_t x = 0x12345678u;
    for (size_t i = 0; i < max_input_size; i++) {
        x = x * 1664525u + 1013904223u;
        dummy[i] = (uint8_t)(x >> 24);
    }
    std::vector<uint64_t> words(ss / 8 + 16);
    int64_t r = compress_fragment_prealloc_native(
        dummy.data(), (int64_t)max_input_size, 22, 1, scratch.data(),
        (int64_t)ss, words.data(), (int64_t)(words.size() * 64 - 128));
    if (r < 0) return 0;
    // pass 3: ring-tier prealloc warmup.  The prealloc driver picks
    // ONE context mode per call, so each quality tier runs TWICE —
    // once on a text-shaped dummy (UTF8 store path) and once on the
    // original LCG noise (SIGNED path) — covering the basic tier
    // (q3), the q<=6 ring tier (q5) and the q<=9 tier (q9); every
    // quality in a tier shares its store pools
    std::vector<uint8_t> noise = dummy;
    for (size_t i = 0; i + 1 < max_input_size; i += 2) {
        dummy[i] = (uint8_t)('a' + (i / 2) % 26);
        dummy[i + 1] = ' ';
    }
    for (int q : {3, 5, 9}) {
        for (const auto* src : {&dummy, &noise}) {
            size_t ssq = BrotliEncoderPreallocScratchSizeQ(
                max_input_size, q);
            std::vector<uint8_t> sq(ssq);
            size_t esz = BrotliEncoderMaxCompressedSize(
                max_input_size);
            std::vector<uint8_t> enc(esz);
            int ok = BrotliEncoderCompressPrealloc(
                q, 22, 0, max_input_size, src->data(), &esz,
                enc.data(), ssq, sq.data());
            if (!ok) return 0;
        }
    }
    return 1;
}

// one-shot encode using ONLY the caller's scratch arena (q0/q1, the
// fragment tier): no threads, and — after PreallocWarmup on this
// thread — no heap allocation (mallinfo-gated in tests)
int BrotliEncoderCompressPrealloc(
    int quality, int lgwin, int mode, size_t input_size,
    const uint8_t* input, size_t* encoded_size, uint8_t* encoded_buffer,
    size_t scratch_size, uint8_t* scratch) {
    if (!encoded_size || !encoded_buffer || (!input && input_size))
        return 0;
    if (quality < 0) quality = 0;
    if (quality > 9) return 0;  // zopfli tiers stay heap-backed
    if (!scratch ||
        scratch_size < BrotliEncoderPreallocScratchSizeQ(input_size,
                                                         quality))
        return 0;
    // carve the staging words from the arena TAIL (8-byte aligned)
    size_t words_bytes = (9 * input_size + (1u << 18)) / 8 + 256;
    words_bytes &= ~size_t(7);
    if (scratch_size < words_bytes + (5u << 16)) return 0;
    size_t arena_sz = scratch_size - words_bytes;
    // align the words pointer to an ABSOLUTE 8-byte boundary — the
    // caller's scratch pointer itself need not be aligned, so aligning
    // the offset alone would leave misaligned u64 stores (UB on
    // strict-alignment targets)
    uintptr_t base = reinterpret_cast<uintptr_t>(scratch);
    uintptr_t waddr = (base + ((arena_sz + 7) & ~size_t(7)) + 7) &
                      ~uintptr_t(7);
    auto* words = reinterpret_cast<uint64_t*>(waddr);
    size_t words_n = (scratch_size - (size_t)(waddr - base)) / 8;
    int64_t bits;
    if (quality <= 1) {
        bits = compress_fragment_prealloc_native(
            input, (int64_t)input_size, lgwin, quality, scratch,
            (int64_t)arena_sz, words, (int64_t)(words_n * 64 - 128));
    } else {
        // ring-tier no-alloc mode: session buffers carve from the
        // arena; context modeling chosen once over the whole input
        // (per-metablock choice needs no allocation either, but one
        // choice keeps the driver lean — prealloc already trades a
        // sliver of ratio for the bounded footprint)
        if (lgwin < 10) lgwin = 10;
        if (lgwin > 24) lgwin = 24;
        int64_t span = std::min<int64_t>(int64_t(1) << lgwin,
                                         int64_t(1) << 18);
        capi::Knobs kn = capi::quality_knobs(quality);
        int ctx_mode = 0;
        int nlc = 1;
        const int64_t* smap = capi::kMapZero;
        static const uint8_t kZLut[256] = {0};
        const uint8_t* l0 = kZLut;
        const uint8_t* l1 = kZLut;
        if (quality >= 4) {
            ctx_mode = (mode != 2 &&
                        capi::is_mostly_utf8(input, (int64_t)input_size))
                           ? 2 : 3;
            if (ctx_mode == 2)
                nlc = capi::choose_literal_map(input, 0,
                                         (int64_t)input_size, quality,
                                         (int64_t)input_size, &smap);
            l0 = kCtxLut0 + ctx_mode * 256;
            l1 = kCtxLut1 + ctx_mode * 256;
        }
        bits = compress_session_prealloc_native(
            input, (int64_t)input_size, lgwin, span, quality,
            kn.k, kn.bb, kn.k8, kn.bb8, kn.hl, kn.nc, 135,
            ctx_mode, nlc, smap, l0, l1, scratch, (int64_t)arena_sz,
            words, (int64_t)(words_n * 64 - 128));
    }
    if (bits < 0) return 0;
    size_t out_bytes = (size_t)((bits + 7) / 8);
    if (out_bytes > *encoded_size) return 0;
    std::memcpy(encoded_buffer, words, out_bytes);
    *encoded_size = out_bytes;
    return 1;
}

int BrotliEncoderCompress(int quality, int lgwin, int mode,
                          size_t input_size, const uint8_t* input_buffer,
                          size_t* encoded_size, uint8_t* encoded_buffer) {
    if (!encoded_size || (!input_buffer && input_size) ||
        !encoded_buffer)
        return 0;
    std::vector<uint8_t> out;
    if (!capi::c_encode(input_buffer, (int64_t)input_size, quality,
                        lgwin, mode, false, false, false, false,
                        nullptr, 0, out))
        return 0;
    if (out.size() > *encoded_size) return 0;
    std::memcpy(encoded_buffer, out.data(), out.size());
    *encoded_size = out.size();
    return 1;
}

BrotliDecoderResult BrotliDecoderDecompress(
    size_t encoded_size, const uint8_t* encoded_buffer,
    size_t* decoded_size, uint8_t* decoded_buffer) {
    capi::ensure_decoder_dict();
    static thread_local std::vector<int32_t> tmem;
    if (tmem.size() < (1u << 23)) tmem.resize(1u << 23);
    int64_t r = decode_native(encoded_buffer, (int64_t)encoded_size,
                              decoded_buffer, (int64_t)*decoded_size,
                              nullptr, 0, 0, tmem.data(),
                              (int64_t)tmem.size());
    if (r >= 0) { *decoded_size = (size_t)r; return BROTLI_DECODER_RESULT_SUCCESS; }
    if (r == -1) return BROTLI_DECODER_RESULT_NEEDS_MORE_INPUT;
    if (r == -3) return BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT;
    return BROTLI_DECODER_RESULT_ERROR;
}

// one-shot decode with rich result info (reference
// BrotliDecoderDecompressWithReturnInfo, c/brotli/decode.h:223 and
// src/ffi/decompressor.rs); layout matches the reference header's
// BrotliDecoderReturnInfoStruct (decode.h:128)
typedef struct BrotliDecoderReturnInfoStruct {
    size_t decoded_size;
    char error[256];
    BrotliDecoderResult result;
    int32_t code;   // BrotliDecoderErrorCode (negative on error)
} BrotliDecoderReturnInfo;

BrotliDecoderReturnInfo BrotliDecoderDecompressWithReturnInfo(
    size_t encoded_size, const uint8_t* encoded_buffer,
    size_t decoded_size, uint8_t* decoded_buffer) {
    BrotliDecoderReturnInfo info;
    std::memset(&info, 0, sizeof(info));
    capi::ensure_decoder_dict();
    static thread_local std::vector<int32_t> tmem;
    if (tmem.size() < (1u << 23)) tmem.resize(1u << 23);
    int64_t r = decode_native(encoded_buffer, (int64_t)encoded_size,
                              decoded_buffer, (int64_t)decoded_size,
                              nullptr, 0, 0, tmem.data(),
                              (int64_t)tmem.size());
    if (r >= 0) {
        info.decoded_size = (size_t)r;
        info.result = BROTLI_DECODER_RESULT_SUCCESS;
        info.code = 1;  // BROTLI_DECODER_SUCCESS
        return info;
    }
    if (r == -1) {
        info.result = BROTLI_DECODER_RESULT_NEEDS_MORE_INPUT;
        info.code = 2;  // BROTLI_DECODER_NEEDS_MORE_INPUT
        std::snprintf(info.error, sizeof(info.error),
                      "needs more input");
    } else if (r == -3) {
        info.result = BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT;
        info.code = 3;  // BROTLI_DECODER_NEEDS_MORE_OUTPUT
        std::snprintf(info.error, sizeof(info.error),
                      "needs more output");
    } else {
        info.result = BROTLI_DECODER_RESULT_ERROR;
        info.code = -1;
        std::snprintf(info.error, sizeof(info.error),
                      "corrupt brotli stream");
    }
    return info;
}

// allocation-free one-shot decode: the caller provides every scratch
// buffer (reference BrotliDecoderDecompressPrealloc, decode.h:229 —
// the seccomp/no-alloc operation mode).  Our decoder needs one int32
// prefix-table arena; it maps onto the caller's u32 scratch.  The u8
// and HuffmanCode scratch parameters exist for ABI parity (the
// reference decoder shapes its scratch differently) and may be null.
BrotliDecoderReturnInfo BrotliDecoderDecompressPrealloc(
    size_t encoded_size, const uint8_t* encoded_buffer,
    size_t decoded_size, uint8_t* decoded_buffer,
    size_t scratch_u8_size, uint8_t* scratch_u8_buffer,
    size_t scratch_u32_size, uint32_t* scratch_u32_buffer,
    size_t scratch_hc_size, void* scratch_hc_buffer) {
    (void)scratch_u8_size; (void)scratch_u8_buffer;
    (void)scratch_hc_size; (void)scratch_hc_buffer;
    BrotliDecoderReturnInfo info;
    std::memset(&info, 0, sizeof(info));
    capi::ensure_decoder_dict();
    if (!scratch_u32_buffer || scratch_u32_size < (1u << 16)) {
        info.result = BROTLI_DECODER_RESULT_ERROR;
        info.code = -21;  // BROTLI_DECODER_ERROR_ALLOC_*
        std::snprintf(info.error, sizeof(info.error),
                      "u32 scratch too small (need >= 65536 entries)");
        return info;
    }
    int64_t r = decode_native(
        encoded_buffer, (int64_t)encoded_size, decoded_buffer,
        (int64_t)decoded_size, nullptr, 0, 0,
        reinterpret_cast<int32_t*>(scratch_u32_buffer),
        (int64_t)scratch_u32_size);
    if (r >= 0) {
        info.decoded_size = (size_t)r;
        info.result = BROTLI_DECODER_RESULT_SUCCESS;
        info.code = 1;
    } else if (r == -1) {
        info.result = BROTLI_DECODER_RESULT_NEEDS_MORE_INPUT;
        info.code = 2;
        std::snprintf(info.error, sizeof(info.error),
                      "needs more input");
    } else if (r == -3) {
        info.result = BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT;
        info.code = 3;
        std::snprintf(info.error, sizeof(info.error),
                      "needs more output");
    } else {
        info.result = BROTLI_DECODER_RESULT_ERROR;
        info.code = -1;
        std::snprintf(info.error, sizeof(info.error),
                      "corrupt brotli stream");
    }
    return info;
}

// ---- streaming decoder instance (buffering facade) ----

struct BrotliDecoderStateStruct {
    std::vector<uint8_t> in;      // undigested input tail (bounded by
    //                               one partial phase: <= a metablock
    //                               header, usually a few bytes)
    int64_t bit_pos = 0;          // bit offset into `in`
    void* mb = nullptr;           // resumable MbDecoder engine
    // legacy decode_stream_step_native state (kept for introspection)
    int64_t st[8] = {0, 0, 0, 0, 4, 11, 15, 16};
    std::vector<uint8_t> hist;    // retained window
    std::vector<uint8_t> out;     // decoded, not yet drained
    size_t out_off = 0;
    size_t drained_total = 0;
    int64_t step_cap = 1 << 20;   // per-step output bound (grows to
                                  // one max metablock, 16MiB + slack)
    std::vector<uint8_t> step_out;
    bool used = false;
    bool error = false;
    bool large_window = false;
    int64_t err_code = 0;
    std::vector<int32_t> tmem;
    bool finished() const {
        return mb ? stream_decoder_finished(mb) != 0 : st[1] != 0;
    }
};
typedef struct BrotliDecoderStateStruct BrotliDecoderState;

BrotliDecoderState* BrotliDecoderCreateInstance(void*, void*, void*) {
    capi::ensure_decoder_dict();
    return new BrotliDecoderStateStruct();
}
void BrotliDecoderDestroyInstance(BrotliDecoderState* s) {
    if (s->mb) stream_decoder_destroy(s->mb);
    delete s;
}

int BrotliDecoderSetParameter(BrotliDecoderState* s, uint32_t param,
                              uint32_t value) {
    if (param == 1) {  // BROTLI_DECODER_PARAM_LARGE_WINDOW
        s->large_window = value != 0;
    }
    return 1;
}

int BrotliDecoderIsFinished(const BrotliDecoderState* s) {
    return (s->finished() && s->out_off >= s->out.size()) ? 1 : 0;
}
int BrotliDecoderIsUsed(const BrotliDecoderState* s) {
    return s->used ? 1 : 0;
}
int BrotliDecoderHasMoreOutput(const BrotliDecoderState* s) {
    return s->out_off < s->out.size() ? 1 : 0;
}
int32_t BrotliDecoderGetErrorCode(const BrotliDecoderState* s) {
    return s->error ? (int32_t)s->err_code : 0;
}
const char* BrotliDecoderErrorString(int32_t c) {
    switch (c) {
        case -1: return "NEEDS_MORE_INPUT";
        case -2: return "CORRUPT_INPUT";
        case -3: return "OUTPUT_TOO_SMALL";
        default: return "OK";
    }
}

BrotliDecoderResult BrotliDecoderDecompressStream(
    BrotliDecoderState* s, size_t* available_in, const uint8_t** next_in,
    size_t* available_out, uint8_t** next_out, size_t* total_out) {
    if (s->error) return BROTLI_DECODER_RESULT_ERROR;
    if (available_in && *available_in) {
        s->used = true;
        s->in.insert(s->in.end(), *next_in, *next_in + *available_in);
        *next_in += *available_in;
        *available_in = 0;
    }
    if (!s->finished()) {
        // resumable engine: suspends at ANY input byte (true
        // mid-symbol resume), so the undigested tail stays bounded by
        // one partial phase and total state is O(window)
        if (s->tmem.size() < (1u << 23)) s->tmem.resize(1u << 23);
        if (!s->mb)
            s->mb = stream_decoder_create(s->large_window ? 1 : 0);
        for (;;) {
            // backpressure: suspend decoding once the undrained
            // backlog exceeds a bound, so a small high-ratio input
            // cannot balloon internal memory to O(decoded size); the
            // caller drains (NEEDS_MORE_OUTPUT) and the next
            // DecompressStream call resumes right here (the reference
            // likewise suspends when the caller's output is full)
            if ((int64_t)(s->out.size() - s->out_off) > s->step_cap)
                break;
            s->step_out.resize((size_t)s->step_cap);
            int64_t bits_before = s->bit_pos;
            int64_t r = stream_decoder_step(
                s->mb, s->in.data(), (int64_t)s->in.size(),
                &s->bit_pos, s->hist.data(), (int64_t)s->hist.size(),
                s->step_out.data(), s->step_cap, s->tmem.data(),
                (int64_t)s->tmem.size());
            if (r == -2) {
                s->error = true;
                s->err_code = r;
                return BROTLI_DECODER_RESULT_ERROR;
            }
            int64_t emitted = r > 0 ? r : 0;
            if (emitted > 0) {
                // compact drained output before appending
                if (s->out_off) {
                    s->out.erase(s->out.begin(),
                                 s->out.begin() + s->out_off);
                    s->out_off = 0;
                }
                s->out.insert(s->out.end(), s->step_out.data(),
                              s->step_out.data() + emitted);
                // retained window := tail of (hist + step output)
                int64_t w = stream_decoder_window_size(s->mb);
                if (w <= 0) w = 1ll << 24;
                if (emitted >= w) {
                    s->hist.assign(
                        s->step_out.data() + emitted - w,
                        s->step_out.data() + emitted);
                } else {
                    int64_t keep = std::min<int64_t>(
                        (int64_t)s->hist.size(), w - emitted);
                    s->hist.erase(s->hist.begin(),
                                  s->hist.end() - keep);
                    s->hist.insert(s->hist.end(), s->step_out.data(),
                                   s->step_out.data() + emitted);
                }
            }
            // drop consumed whole bytes of input
            int64_t drop = s->bit_pos >> 3;
            if (drop > 0) {
                s->in.erase(s->in.begin(), s->in.begin() + drop);
                s->bit_pos &= 7;
            }
            if (s->finished()) break;
            // keep stepping while progress is being made (output
            // emitted, or the step filled its buffer exactly)
            if (emitted > 0 || s->bit_pos != bits_before) continue;
            break;
        }
    }
    // drain
    size_t have = s->out.size() - s->out_off;
    size_t take = std::min(have, available_out ? *available_out : 0);
    if (take) {
        std::memcpy(*next_out, s->out.data() + s->out_off, take);
        *next_out += take;
        *available_out -= take;
        s->out_off += take;
        s->drained_total += take;
    }
    if (total_out) *total_out = s->drained_total;
    if (s->out_off < s->out.size())
        return BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT;
    return s->finished() ? BROTLI_DECODER_RESULT_SUCCESS
                         : BROTLI_DECODER_RESULT_NEEDS_MORE_INPUT;
}

const uint8_t* BrotliDecoderTakeOutput(BrotliDecoderState* s, size_t* size) {
    size_t have = s->out.size() - s->out_off;
    size_t take = (*size == 0 || *size > have) ? have : *size;
    const uint8_t* p = s->out.data() + s->out_off;
    s->out_off += take;
    s->drained_total += take;
    *size = take;
    return take ? p : nullptr;
}

// ---- streaming encoder instance (buffering facade) ----

struct BrotliEncoderStateStruct {
    int quality = 9;   // reference default is 11; kept at 9 so the
                       // streaming facade defaults to the speed tier
                       // (q10/11 requests run the native optimal parse)
    int lgwin = 22;
    int mode = 0;
    bool catable = false, appendable = false, bare = false,
         byte_align = false, magic = false;
    uint32_t size_hint = 0;
    std::vector<uint8_t> in;      // unencoded input tail
    std::vector<uint8_t> hist;    // retained window (LZ77 prefix)
    std::vector<uint8_t> dict;    // custom dictionary
    capi::ByteBW w;               // emitted bitstream (drains)
    size_t out_off = 0;
    size_t drained_total = 0;
    int64_t cache[4] = {4, 11, 15, 16};
    bool header_written = false;
    bool first_block = true;
    bool finished = false;
    bool failed = false;

    int64_t chunk_size() const {
        // one metablock per chunk (the Python Compressor's shape);
        // bounded latency and memory at speed tiers, bigger spans for
        // the optimal-parse tiers
        return int64_t(1) << (quality >= 10 ? 22 : 20);
    }
    size_t drainable() const {   // complete bytes only (bit carry
                                 // stays internal until aligned)
        return (size_t)(finished ? w.buf.size() : (w.bitpos >> 3));
    }
    // encode `take` bytes from the input tail as one metablock
    bool emit(int64_t take, bool is_last) {
        if (!header_written) {
            if (!(bare && catable))
                capi::write_stream_header(w, lgwin);
            if (magic)
                capi::write_magic_number(
                    w, size_hint ? size_hint
                                 : (uint32_t)(in.size()),
                    catable, appendable);
            header_written = true;
        }
        if (first_block) {
            first_block = false;
            if (catable && take > 0) {
                for (int i = 0; i < 4; i++)
                    cache[i] = capi::kPoisonedDistance;
                int64_t k = std::min<int64_t>(2, take);
                capi::store_uncompressed(w, in.data(), k);
                in.erase(in.begin(), in.begin() + k);
                take -= k;
                if (take == 0) return true;
            }
        }
        // LZ77 prefix: custom-dictionary tail + window history, as
        // much as the window can reach (the one-shot path keeps the
        // dictionary prepended the same way)
        int64_t wsz0 = (int64_t(1) << lgwin) - 16;
        static thread_local std::vector<uint8_t> prefix_buf;
        const uint8_t* prefix = hist.data();
        int64_t plen = (int64_t)hist.size();
        if (!dict.empty() && (int64_t)hist.size() < wsz0) {
            int64_t dkeep = std::min<int64_t>(
                (int64_t)dict.size(), wsz0 - (int64_t)hist.size());
            prefix_buf.resize((size_t)(dkeep + hist.size()));
            std::memcpy(prefix_buf.data(),
                        dict.data() + dict.size() - dkeep,
                        (size_t)dkeep);
            if (!hist.empty())
                std::memcpy(prefix_buf.data() + dkeep, hist.data(),
                            hist.size());
            prefix = prefix_buf.data();
            plen = dkeep + (int64_t)hist.size();
        }
        bool ok = capi::encode_stream_chunk(
            w, prefix, plen, in.data(), take, is_last, quality, lgwin,
            mode, !catable, cache);
        if (!ok) return false;
        // retained window := tail of (hist + chunk)
        int64_t wsz = (int64_t(1) << lgwin) - 16;
        if (take >= wsz) {
            hist.assign(in.data() + take - wsz, in.data() + take);
        } else {
            int64_t keep = std::min<int64_t>((int64_t)hist.size(),
                                             wsz - take);
            hist.erase(hist.begin(), hist.end() - keep);
            hist.insert(hist.end(), in.data(), in.data() + take);
        }
        in.erase(in.begin(), in.begin() + take);
        return true;
    }
};
typedef struct BrotliEncoderStateStruct BrotliEncoderState;

BrotliEncoderState* BrotliEncoderCreateInstance(void*, void*, void*) {
    return new BrotliEncoderStateStruct();
}
void BrotliEncoderDestroyInstance(BrotliEncoderState* s) { delete s; }

// parameter ids per reference src/enc/parameters.rs:3-35 (identical
// to google/brotli's encode.h for ids 0-6; 7-9 are accepted for
// google/brotli callers)
int BrotliEncoderSetParameter(BrotliEncoderState* s, uint32_t param,
                              uint32_t value) {
    switch (param) {
        case 0: s->mode = (int)value; return 1;          // MODE
        case 1: s->quality = (int)value; return 1;       // QUALITY
        case 2: s->lgwin = (int)value; return 1;         // LGWIN
        case 3: return 1;                                // LGBLOCK
        case 4: return 1;  // DISABLE_LITERAL_CONTEXT_MODELING (hint)
        case 5: s->size_hint = value; return 1;          // SIZE_HINT
        case 6: return 1;                                // LARGE_WINDOW
        //        (lgwin > 24 is honored directly; the flag is a
        //         permission bit in google/brotli, redundant here)
        case 150: if (value) s->quality = 10; return 1;  // Q9_5
        case 167: s->catable = value != 0; return 1;     // CATABLE
        case 168: s->appendable = value != 0; return 1;  // APPENDABLE
        case 169: s->magic = value != 0; return 1;       // MAGIC_NUMBER
        case 172: s->byte_align = value != 0; return 1;  // BYTE_ALIGN
        case 173: s->bare = value != 0; return 1;        // BARE_STREAM
        default: return 1;  // accepted, inert
    }
}

int BrotliEncoderSetCustomDictionary(BrotliEncoderState* s, size_t size,
                                     const uint8_t* dict) {
    s->dict.assign(dict, dict + size);
    return 1;
}

int BrotliEncoderIsFinished(const BrotliEncoderState* s) {
    return (s->finished && s->out_off >= s->drainable()) ? 1 : 0;
}
int BrotliEncoderHasMoreOutput(const BrotliEncoderState* s) {
    return s->out_off < s->drainable() ? 1 : 0;
}

int BrotliEncoderCompressStream(
    BrotliEncoderState* s, BrotliEncoderOperation op,
    size_t* available_in, const uint8_t** next_in,
    size_t* available_out, uint8_t** next_out, size_t* total_out) {
    if (s->failed) return 0;
    // compact the drained output prefix (whole bytes only) so the
    // emitted-bitstream buffer stays bounded on long streams
    if (s->out_off > (1u << 20)) {
        s->w.buf.erase(s->w.buf.begin(), s->w.buf.begin() + s->out_off);
        s->w.bitpos -= (int64_t)s->out_off * 8;
        s->out_off = 0;
    }
    if (available_in && *available_in) {
        s->in.insert(s->in.end(), *next_in, *next_in + *available_in);
        *next_in += *available_in;
        *available_in = 0;
    }
    if (!s->finished) {
        // incremental emission: full metablock-sized chunks encode as
        // soon as they are buffered (memory stays bounded by window +
        // chunk); FLUSH drains the tail and byte-aligns with an empty
        // metadata block; FINISH closes the stream
        int64_t chunk = s->chunk_size();
        bool finish = op == BROTLI_OPERATION_FINISH;
        bool flush = op == BROTLI_OPERATION_FLUSH;
        // catable implies appendable (SanitizeParams, encode.rs:546)
        bool suppress = s->appendable || s->byte_align || s->catable;
        while ((int64_t)s->in.size() >= chunk ||
               ((finish || flush) && !s->in.empty())) {
            int64_t take = std::min<int64_t>(chunk,
                                             (int64_t)s->in.size());
            bool last_piece = (int64_t)s->in.size() <= chunk;
            bool is_last = finish && last_piece && !suppress;
            if (!s->emit(take, is_last)) {
                s->failed = true;
                return 0;
            }
            if (is_last) s->finished = true;
        }
        if (flush && !s->finished && s->header_written &&
            (s->w.bitpos & 7) != 0) {
            // byte-aligning sync block — only when the stream is
            // mid-byte (repeated FLUSH with nothing pending is a
            // no-op, matching the reference)
            capi::write_padding_block(s->w);
        }
        if (finish && !s->finished) {
            // empty input or suppress-shaped tail
            if (!s->header_written) {
                if (!(s->bare && s->catable))
                    capi::write_stream_header(s->w, s->lgwin);
                s->header_written = true;
            }
            if (suppress) {
                if (s->byte_align) capi::write_padding_block(s->w);
                if (!s->bare) capi::write_empty_last(s->w);
            } else {
                capi::write_empty_last(s->w);
            }
            s->finished = true;
        }
        if (s->finished) s->w.align();
    }
    size_t have = s->drainable() - s->out_off;
    size_t take = std::min(have, available_out ? *available_out : 0);
    if (take) {
        std::memcpy(*next_out, s->w.buf.data() + s->out_off, take);
        *next_out += take;
        *available_out -= take;
        s->out_off += take;
        s->drained_total += take;
    }
    if (total_out) *total_out = s->drained_total;
    return 1;
}

const uint8_t* BrotliEncoderTakeOutput(BrotliEncoderState* s, size_t* size) {
    size_t have = s->drainable() - s->out_off;
    size_t take = (*size == 0 || *size > have) ? have : *size;
    const uint8_t* p = s->w.buf.data() + s->out_off;
    s->out_off += take;
    s->drained_total += take;
    *size = take;
    return take ? p : nullptr;
}

// install the embedded dictionary tables for the native sorted-index
// builder (the Python side calls this before zopfli_hq_sorted_index)
void BrotliTpuEnsureHqDict(void) {
    zopfli_hq_dict_init(kDictData, kDictOffsets, kDictSizeBits,
                        kDictTType, kDictTPrefix, kDictTPrefixLen,
                        kDictTSuffix, kDictTSuffixLen, 121);
}

// one-shot encode with stream-shaping flags + custom dictionary (used
// by the workpool/multi path and exposed for completeness)
int BrotliTpuEncodeOneshot(int quality, int lgwin, int mode,
                           int catable, int appendable, int bare,
                           int byte_align,
                           const uint8_t* dict, size_t dict_size,
                           size_t input_size, const uint8_t* input,
                           size_t* encoded_size, uint8_t* encoded_buffer) {
    std::vector<uint8_t> out;
    if (!capi::c_encode(input, (int64_t)input_size, quality, lgwin,
                        mode, catable != 0, appendable != 0, bare != 0,
                        byte_align != 0, dict, (int64_t)dict_size, out))
        return 0;
    if (out.size() > *encoded_size) return 0;
    std::memcpy(encoded_buffer, out.data(), out.size());
    *encoded_size = out.size();
    return 1;
}

}  // extern "C"
