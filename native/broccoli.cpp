// Broccoli C ABI: lossless bit-level concatenation of brotli streams.
//
// Native port of brotli_tpu/concat/brocatli.py (the tested oracle;
// tests assert byte-identical concatenation) exported with the
// reference's C surface (reference src/ffi/broccoli.rs:56-156, header
// c/brotli/broccoli.h): BroccoliCreateInstance[WithWindowSize],
// BroccoliNewBrotliFile, BroccoliConcatStream/Streaming,
// BroccoliConcatFinish/Finished, BroccoliDestroyInstance.
//
// BroccoliState is the reference's opaque value struct; we keep the
// engine on the heap behind state->unused (output is buffered in a
// std::vector, which cannot live inside a memcpy-able 248-byte blob).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kHeaderBytes = 5;

enum BroccoliResultE {
    kSuccess = 0,
    kNeedsMoreInput = 1,
    kNeedsMoreOutput = 2,
    kNotCraftedForAppend = 124,
    kInvalidWindowSize = 125,
    kWindowSizeLargerThanPreviousFile = 126,
    kNotCraftedForConcatenation = 127,
};

// (lgwin, bit offset past the WBITS code), or false (brocatli.py
// parse_window_size; reference concat/mod.rs:39)
static bool parse_window_size(const uint8_t* h, int n, int* lgwin,
                              int* off) {
    if (n == 0) return false;
    uint8_t b0 = h[0];
    if ((b0 & 1) == 0) { *lgwin = 16; *off = 1; return true; }
    switch (b0 & 15) {
        case 0x3: *lgwin = 18; *off = 4; return true;
        case 0x5: *lgwin = 19; *off = 4; return true;
        case 0x7: *lgwin = 20; *off = 4; return true;
        case 0x9: *lgwin = 21; *off = 4; return true;
        case 0xB: *lgwin = 22; *off = 4; return true;
        case 0xD: *lgwin = 23; *off = 4; return true;
        case 0xF: *lgwin = 24; *off = 4; return true;
        default: break;
    }
    switch (b0 & 127) {
        case 0x71: *lgwin = 15; *off = 7; return true;
        case 0x61: *lgwin = 14; *off = 7; return true;
        case 0x51: *lgwin = 13; *off = 7; return true;
        case 0x41: *lgwin = 12; *off = 7; return true;
        case 0x31: *lgwin = 11; *off = 7; return true;
        case 0x21: *lgwin = 10; *off = 7; return true;
        case 0x1:  *lgwin = 17; *off = 7; return true;
        default: break;
    }
    // large-window 14-bit form
    if (b0 & 0x80) return false;
    if (n < 2) return false;
    int w = h[1] & 0x3F;
    if (w < 10 || w > 30) return false;
    *lgwin = w;
    *off = 14;
    return true;
}

// bit offset of the first byte-alignable point after the header, or -1
// (brocatli.py detect_varlen_offset; reference concat/mod.rs:73)
static int detect_varlen_offset(const uint8_t* h, int n) {
    int lgwin, off;
    if (!parse_window_size(h, n, &lgwin, &off)) return -1;
    uint64_t bits = 0;
    for (int i = 0; i < n && i < 8; i++)
        bits |= (uint64_t)h[i] << (8 * i);
    bits >>= off;
    off += 1;
    if (bits & 1) {  // ISLAST
        bits >>= 1;
        off += 1;
        if (bits & 1) return off;  // ISLASTEMPTY
    }
    bits >>= 1;
    uint64_t mnibbles = bits & 3;
    bits >>= 2;
    off += 2;
    if (mnibbles == 3) {  // metadata block
        if (bits & 1) return -1;  // reserved bit set
        bits >>= 1;
        off += 1;
        uint64_t mskipbytes = bits & 3;
        off += 2;
        off += (int)mskipbytes * 8;
        return off;
    }
    int nibbles = (int)mnibbles + 4;
    off += nibbles * 4;
    bits >>= nibbles * 4;
    off += 1;
    if ((bits & 1) == 0) return -1;  // not uncompressed
    return off;
}

struct Engine {
    uint8_t last_bytes[2] = {0, 0};
    int last_bytes_len = 0;
    bool last_byte_sanitized = false;
    bool any_bytes_emitted = false;
    int last_byte_bit_offset = 0;
    int window_size = 0;
    // pending new-stream header
    bool has_pending = false;
    int p_read = 0;
    int p_written = -1;  // -1 = None
    uint8_t p_bytes[kHeaderBytes + 1] = {0};
    // buffered output not yet drained into caller buffers
    std::vector<uint8_t> out;
    size_t out_off = 0;
    bool finish_done = false;
    int finish_result = kSuccess;

    void init_window(int lgwin) {
        // seed last_bytes as if an empty stream with this window had
        // been emitted (brocatli.py _init_window, mod.rs:229)
        if (lgwin > 30 || lgwin < 10) return;
        if (lgwin > 24) {
            last_bytes[0] = 17;
            last_bytes[1] = (uint8_t)(lgwin | 64 | 128);
            last_bytes_len = 2;
        } else if (lgwin == 16) {
            last_bytes[0] = 1 | 2 | 4;
            last_bytes[1] = 0;
            last_bytes_len = 1;
        } else if (lgwin > 17) {
            last_bytes[0] = (uint8_t)((3 + (lgwin - 18) * 2) | 48);
            last_bytes[1] = 0;
            last_bytes_len = 1;
        } else {
            static const uint8_t first_tab[8] = {
                /*10*/ 0x21, /*11*/ 0x31, /*12*/ 0x41, /*13*/ 0x51,
                /*14*/ 0x61, /*15*/ 0x71, /*16*/ 0, /*17*/ 0x1};
            last_bytes[0] = (uint8_t)(first_tab[lgwin - 10] | 0x80);
            last_bytes[1] = 1;
            last_bytes_len = 2;
        }
        window_size = lgwin;
    }

    void new_brotli_file() {
        has_pending = true;
        p_read = 0;
        p_written = -1;
        std::memset(p_bytes, 0, sizeof(p_bytes));
    }

    int flush_previous_stream() {
        if (last_byte_sanitized) return kSuccess;
        if (last_bytes_len == 0) {  // first stream
            last_byte_sanitized = true;
            return kSuccess;
        }
        int last = last_bytes[0] | (last_bytes[1] << 8);
        int maxbit = last_bytes_len * 8;
        int index = 0;
        for (int i = maxbit - 1; i >= 0; i--) {
            if (last & (1 << i)) { index = i; break; }
        }
        if (index == 0) return kNotCraftedForAppend;
        if ((last >> (index - 1)) != 3) return kNotCraftedForAppend;
        index -= 1;
        last &= (1 << index) - 1;
        last_bytes[0] = (uint8_t)(last & 0xFF);
        last_bytes[1] = (uint8_t)((last >> 8) & 0xFF);
        if (index >= 8) {
            out.push_back(last_bytes[0]);
            any_bytes_emitted = true;
            last_bytes[0] = last_bytes[1];
            last_bytes[1] = 0;
            index -= 8;
            last_bytes_len -= 1;
        } else if (last_bytes_len == 2) {
            // the '11' straddled the byte boundary: the top byte is
            // now empty, keep only the partial low byte
            last_bytes[1] = 0;
            last_bytes_len = 1;
        }
        last_byte_bit_offset = index;
        last_byte_sanitized = true;
        return kSuccess;
    }

    int shift_new_stream_header() {
        if (p_written < 0) {
            int window_bits, window_offset;
            if (!parse_window_size(p_bytes, p_read, &window_bits,
                                   &window_offset))
                return kInvalidWindowSize;
            if (window_size == 0) {
                // first stream: copy verbatim
                window_size = window_bits;
                out.push_back(p_bytes[0]);
                any_bytes_emitted = true;
                p_written = 1;
            } else {
                if (window_bits > window_size)
                    return kWindowSizeLargerThanPreviousFile;
                int voff = detect_varlen_offset(p_bytes, p_read);
                if (voff < 0) return kNotCraftedForConcatenation;
                uint64_t bits = 0;
                for (int i = 0; i < p_read; i++)
                    bits |= (uint64_t)p_bytes[i] << (8 * i);
                bits >>= window_offset;
                int nbits = voff - window_offset;
                if (nbits < 64)
                    bits &= (1ull << nbits) - 1;
                // merge the unaligned header bits after the held byte
                uint8_t realigned[kHeaderBytes + 2] = {0};
                realigned[0] = last_bytes[0];
                int var_len_bytes = (nbits + 7) / 8;
                int sh = last_byte_bit_offset;
                for (int bi = 0; bi < var_len_bytes; bi++) {
                    int cur = (int)((bits >> (8 * bi)) & 0xFF);
                    realigned[bi] |= (uint8_t)((cur << sh) & 0xFF);
                    realigned[bi + 1] =
                        sh ? (uint8_t)((cur >> (8 - sh)) & 0xFF) : 0;
                }
                int dst = (sh + nbits + 7) / 8;
                int src = (voff + 7) / 8;
                if (src > p_read) return kNotCraftedForConcatenation;
                int ncopy = p_read - src;
                std::memcpy(realigned + dst, p_bytes + src,
                            (size_t)ncopy);
                out.push_back(realigned[0]);
                any_bytes_emitted = true;
                p_read = dst + ncopy - 1;
                p_written = 0;
                std::memmove(p_bytes, realigned + 1, kHeaderBytes + 1);
            }
        }
        if (p_read > p_written) {
            out.insert(out.end(), p_bytes + p_written, p_bytes + p_read);
            any_bytes_emitted = true;
        }
        has_pending = false;
        last_byte_sanitized = false;
        last_byte_bit_offset = 0;
        // hold back the final emitted byte: its tail may need
        // sanitizing when the next file arrives
        last_bytes[0] = out.back();
        last_bytes[1] = 0;
        last_bytes_len = 1;
        out.pop_back();
        return kSuccess;
    }

    // feed input; buffered output accumulates in `out`
    int stream(const uint8_t* in, size_t n) {
        size_t pos = 0;
        if (has_pending) {
            int r = flush_previous_stream();
            if (r != kSuccess) return r;
            int need = kHeaderBytes - p_read;
            size_t take = (size_t)need < n - pos ? (size_t)need
                                                 : n - pos;
            std::memcpy(p_bytes + p_read, in + pos, take);
            p_read += (int)take;
            pos += take;
            bool sufficient =
                p_read == kHeaderBytes ||
                (p_read == 4 && (p_bytes[0] & 127) != 17);
            if (!sufficient) return kNeedsMoreInput;
            int r2 = shift_new_stream_header();
            if (r2 != kSuccess) return r2;
        }
        // emit everything except the trailing 2 bytes, held for
        // end-of-stream sanitization
        uint8_t combined[2];
        int held = last_bytes_len;
        size_t body = n - pos;
        size_t total = (size_t)held + body;
        if (total > 2) {
            size_t emit = total - 2;
            size_t from_held = emit < (size_t)held ? emit : (size_t)held;
            out.insert(out.end(), last_bytes, last_bytes + from_held);
            out.insert(out.end(), in + pos, in + pos + (emit - from_held));
            any_bytes_emitted = true;
            pos += emit - from_held;
            // slide the remaining held bytes down
            int rem_held = held - (int)from_held;
            for (int i = 0; i < rem_held; i++)
                combined[i] = last_bytes[from_held + i];
            int tail = (int)(n - pos);
            for (int i = 0; i < tail; i++)
                combined[rem_held + i] = in[pos + i];
            last_bytes_len = rem_held + tail;
        } else {
            for (int i = 0; i < held; i++) combined[i] = last_bytes[i];
            int tail = (int)(n - pos);
            for (int i = 0; i < tail; i++)
                combined[held + i] = in[pos + i];
            last_bytes_len = held + tail;
        }
        last_bytes[0] = last_bytes_len > 0 ? combined[0] : 0;
        last_bytes[1] = last_bytes_len > 1 ? combined[1] : 0;
        return kNeedsMoreInput;
    }

    void append_eof_metablock() {
        int last = last_bytes[0] | (last_bytes[1] << 8);
        int bit_end = (last_bytes_len - 1) * 8 + last_byte_bit_offset;
        last |= 3 << bit_end;
        last_bytes[0] = (uint8_t)(last & 0xFF);
        last_bytes[1] = (uint8_t)((last >> 8) & 0xFF);
        last_byte_sanitized = false;
        last_byte_bit_offset += 2;
        if (last_byte_bit_offset >= 8) {
            last_byte_bit_offset -= 8;
            last_bytes_len += 1;
        }
    }

    int finish() {
        if (finish_done) return finish_result;
        finish_done = true;
        if (has_pending) {
            // a pending that never reached sufficiency is a complete
            // tiny (empty-content) stream — drop it, matching the
            // reference's finish (concat/mod.rs:581 never touches the
            // pending; see brocatli.py finish for the sanitization
            // failure shifting it would cause)
            has_pending = false;
        }
        if (!last_byte_sanitized) {
            int r = flush_previous_stream();
            if (r != kSuccess) return finish_result = r;
        }
        if (last_byte_sanitized && last_bytes_len != 0)
            append_eof_metablock();
        while (last_bytes_len) {
            out.push_back(last_bytes[0]);
            last_bytes[0] = last_bytes[1];
            last_bytes_len -= 1;
            any_bytes_emitted = true;
        }
        if (!any_bytes_emitted) {
            out.push_back(';');
            any_bytes_emitted = true;
        }
        return finish_result = kSuccess;
    }

    // drain buffered output into the caller's window; returns bytes
    // written
    size_t drain(uint8_t* dst, size_t cap) {
        size_t avail = out.size() - out_off;
        size_t take = avail < cap ? avail : cap;
        std::memcpy(dst, out.data() + out_off, take);
        out_off += take;
        if (out_off == out.size()) {
            out.clear();
            out_off = 0;
        }
        return take;
    }
    bool drained() const { return out_off == out.size(); }
};

}  // namespace

extern "C" {

typedef struct BroccoliState_ {
    void* unused;
    unsigned char data[248];
} BroccoliState;

BroccoliState BroccoliCreateInstance() {
    BroccoliState s;
    std::memset(&s, 0, sizeof(s));
    s.unused = new Engine();
    return s;
}

BroccoliState BroccoliCreateInstanceWithWindowSize(uint8_t window_size) {
    BroccoliState s = BroccoliCreateInstance();
    static_cast<Engine*>(s.unused)->init_window(window_size);
    return s;
}

void BroccoliDestroyInstance(BroccoliState state) {
    delete static_cast<Engine*>(state.unused);
}

void BroccoliNewBrotliFile(BroccoliState* state) {
    static_cast<Engine*>(state->unused)->new_brotli_file();
}

int32_t BroccoliConcatStream(BroccoliState* state, size_t* available_in,
                             const uint8_t** input_buf_ptr,
                             size_t* available_out,
                             uint8_t** output_buf_ptr) {
    Engine* e = static_cast<Engine*>(state->unused);
    int r = e->stream(*input_buf_ptr, *available_in);
    *input_buf_ptr += *available_in;
    *available_in = 0;
    size_t wrote = e->drain(*output_buf_ptr, *available_out);
    *output_buf_ptr += wrote;
    *available_out -= wrote;
    if (r != kNeedsMoreInput && r != kSuccess) return r;
    if (!e->drained()) return kNeedsMoreOutput;
    return r;
}

int32_t BroccoliConcatStreaming(BroccoliState* state,
                                size_t* available_in,
                                const uint8_t* input_buf,
                                size_t* available_out,
                                uint8_t* output_buf) {
    const uint8_t* in_ptr = input_buf;
    uint8_t* out_ptr = output_buf;
    return BroccoliConcatStream(state, available_in, &in_ptr,
                                available_out, &out_ptr);
}

int32_t BroccoliConcatFinish(BroccoliState* state, size_t* available_out,
                             uint8_t** output_buf) {
    Engine* e = static_cast<Engine*>(state->unused);
    int r = e->finish();
    size_t wrote = e->drain(*output_buf, *available_out);
    *output_buf += wrote;
    *available_out -= wrote;
    if (r != kSuccess) return r;
    return e->drained() ? kSuccess : kNeedsMoreOutput;
}

int32_t BroccoliConcatFinished(BroccoliState* state,
                               size_t* available_out,
                               uint8_t* output_buf) {
    uint8_t* out_ptr = output_buf;
    return BroccoliConcatFinish(state, available_out, &out_ptr);
}

}  // extern "C"
