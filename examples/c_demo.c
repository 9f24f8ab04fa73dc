/* C demo driver: round-trips a file through the brotli_tpu C ABI
 * (the analog of the reference's c/brotli.c + c/decompressor.c demos).
 *
 * Build:
 *   gcc examples/c_demo.c -Iinclude -Lnative -lbrotli_tpu_native \
 *       -Wl,-rpath,$PWD/native -o /tmp/c_demo
 * Run: /tmp/c_demo <file> [quality]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "brotli_tpu.h"

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <file> [quality]\n", argv[0]);
        return 2;
    }
    int quality = argc > 2 ? atoi(argv[2]) : 9;
    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror(argv[1]); return 1; }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t* input = malloc(n);
    if (fread(input, 1, n, f) != (size_t)n) { fclose(f); return 1; }
    fclose(f);

    /* one-shot encode */
    size_t enc_cap = BrotliEncoderMaxCompressedSize(n);
    uint8_t* enc = malloc(enc_cap);
    size_t enc_size = enc_cap;
    if (!BrotliEncoderCompress(quality, 22, 0, n, input, &enc_size, enc)) {
        fprintf(stderr, "encode failed\n");
        return 1;
    }

    /* one-shot decode */
    size_t dec_size = n + 16;
    uint8_t* dec = malloc(dec_size);
    if (BrotliDecoderDecompress(enc_size, enc, &dec_size, dec) !=
            BROTLI_DECODER_RESULT_SUCCESS ||
        dec_size != (size_t)n || memcmp(dec, input, n) != 0) {
        fprintf(stderr, "one-shot round-trip FAILED\n");
        return 1;
    }

    /* streaming decode, fed in 4KB chunks */
    BrotliDecoderState* ds = BrotliDecoderCreateInstance(NULL, NULL, NULL);
    uint8_t* dec2 = malloc(n + 16);
    size_t out_left = n + 16;
    uint8_t* next_out = dec2;
    const uint8_t* next_in = enc;
    size_t in_left = enc_size;
    size_t total_out = 0;
    BrotliDecoderResult r = BROTLI_DECODER_RESULT_NEEDS_MORE_INPUT;
    while (r != BROTLI_DECODER_RESULT_SUCCESS) {
        size_t feed = in_left < 4096 ? in_left : 4096;
        size_t avail = feed;
        const uint8_t* p = next_in;
        r = BrotliDecoderDecompressStream(ds, &avail, &p, &out_left,
                                          &next_out, &total_out);
        next_in += feed - avail;
        in_left -= feed - avail;
        if (r == BROTLI_DECODER_RESULT_ERROR) {
            fprintf(stderr, "stream decode error: %s\n",
                    BrotliDecoderErrorString(BrotliDecoderGetErrorCode(ds)));
            return 1;
        }
        if (r == BROTLI_DECODER_RESULT_NEEDS_MORE_INPUT && in_left == 0 &&
            feed == 0) {
            fprintf(stderr, "stream decode stuck\n");
            return 1;
        }
    }
    if (total_out != (size_t)n || memcmp(dec2, input, n) != 0 ||
        !BrotliDecoderIsFinished(ds)) {
        fprintf(stderr, "streaming round-trip FAILED\n");
        return 1;
    }
    BrotliDecoderDestroyInstance(ds);

    /* streaming encode facade */
    BrotliEncoderState* es = BrotliEncoderCreateInstance(NULL, NULL, NULL);
    BrotliEncoderSetParameter(es, BROTLI_PARAM_QUALITY, quality);
    const uint8_t* ein = input;
    size_t eavail = n;
    uint8_t* ebuf = malloc(enc_cap);
    uint8_t* eout = ebuf;
    size_t eout_left = enc_cap;
    BrotliEncoderCompressStream(es, BROTLI_OPERATION_FINISH, &eavail,
                                &ein, &eout_left, &eout, NULL);
    size_t stream_size = enc_cap - eout_left;
    if (!BrotliEncoderIsFinished(es)) {
        fprintf(stderr, "encoder not finished\n");
        return 1;
    }
    dec_size = n + 16;
    if (BrotliDecoderDecompress(stream_size, ebuf, &dec_size, dec) !=
            BROTLI_DECODER_RESULT_SUCCESS ||
        dec_size != (size_t)n || memcmp(dec, input, n) != 0) {
        fprintf(stderr, "streaming-encode round-trip FAILED\n");
        return 1;
    }
    BrotliEncoderDestroyInstance(es);

    /* fully-preallocated encode (the analog of the reference's
     * manual-memory-management / seccomp example, combined_alloc.rs):
     * after the per-thread warmup, the compress call performs zero
     * heap allocations — every buffer lives in the caller's arena */
    if (quality <= 9) {
        if (!BrotliEncoderPreallocWarmup(n)) {
            fprintf(stderr, "prealloc warmup failed\n");
            return 1;
        }
        size_t pss = BrotliEncoderPreallocScratchSizeQ(n, quality);
        uint8_t* parena = malloc(pss);
        size_t penc_size = enc_cap;
        if (!BrotliEncoderCompressPrealloc(quality, 22, 0, n, input,
                                           &penc_size, enc, pss,
                                           parena)) {
            fprintf(stderr, "prealloc encode failed\n");
            return 1;
        }
        dec_size = n + 16;
        if (BrotliDecoderDecompress(penc_size, enc, &dec_size, dec) !=
                BROTLI_DECODER_RESULT_SUCCESS ||
            dec_size != (size_t)n || memcmp(dec, input, n) != 0) {
            fprintf(stderr, "prealloc round-trip FAILED\n");
            return 1;
        }
        free(parena);
    }

    /* multithreaded encode over a persistent worker pool (the analog
     * of the reference's c/multiexample.c) */
    void* pool = BrotliEncoderCreateWorkPool(4, NULL, NULL, NULL);
    uint32_t keys[1] = {1 /* BROTLI_PARAM_QUALITY */};
    uint32_t vals[1] = {(uint32_t)quality};
    size_t multi_size = enc_cap;
    uint8_t* multi = malloc(enc_cap);
    if (!BrotliEncoderCompressWorkPool(pool, 1, keys, vals, n, input,
                                       &multi_size, multi, 4)) {
        fprintf(stderr, "workpool encode failed\n");
        return 1;
    }
    dec_size = n + 16;
    if (BrotliDecoderDecompress(multi_size, multi, &dec_size, dec) !=
            BROTLI_DECODER_RESULT_SUCCESS ||
        dec_size != (size_t)n || memcmp(dec, input, n) != 0) {
        fprintf(stderr, "workpool round-trip FAILED\n");
        return 1;
    }
    BrotliEncoderDestroyWorkPool(pool);

    /* Broccoli concatenation: compress the two halves independently
     * (appendable first, catable second), merge at the bit level, and
     * decode the merged stream (the reference's c/catbrotli.c analog).
     * Uses BrotliTpuEncodeOneshot for the stream-shaping flags. */
    long half = n / 2;
    size_t c1_size = enc_cap, c2_size = enc_cap;
    uint8_t* c1 = malloc(enc_cap);
    uint8_t* c2 = malloc(enc_cap);
    if (!BrotliTpuEncodeOneshot(quality, 22, 0, 0, 1, 0, 0, NULL, 0,
                                half, input, &c1_size, c1) ||
        !BrotliTpuEncodeOneshot(quality, 22, 0, 1, 0, 0, 0, NULL, 0,
                                n - half, input + half, &c2_size, c2)) {
        fprintf(stderr, "shaped encode failed\n");
        return 1;
    }
    BroccoliState bs = BroccoliCreateInstance();
    uint8_t* cat = malloc(c1_size + c2_size + 64);
    uint8_t* cat_out = cat;
    size_t cat_left = c1_size + c2_size + 64;
    const uint8_t* piece[2] = {c1, c2};
    size_t piece_size[2] = {c1_size, c2_size};
    for (int i = 0; i < 2; i++) {
        BroccoliNewBrotliFile(&bs);
        size_t ain = piece_size[i];
        const uint8_t* ip = piece[i];
        int32_t br = BroccoliConcatStream(&bs, &ain, &ip, &cat_left,
                                          &cat_out);
        if (br != BroccoliNeedsMoreInput && br != BroccoliSuccess) {
            fprintf(stderr, "broccoli stream failed: %d\n", br);
            return 1;
        }
    }
    if (BroccoliConcatFinish(&bs, &cat_left, &cat_out) !=
            BroccoliSuccess) {
        fprintf(stderr, "broccoli finish failed\n");
        return 1;
    }
    BroccoliDestroyInstance(bs);
    size_t cat_size = (size_t)(cat_out - cat);
    /* decode the concatenated stream via the return-info API */
    BrotliDecoderReturnInfo info = BrotliDecoderDecompressWithReturnInfo(
        cat_size, cat, (size_t)n + 16, dec);
    if (info.result != BROTLI_DECODER_RESULT_SUCCESS ||
        info.decoded_size != (size_t)n || memcmp(dec, input, n) != 0) {
        fprintf(stderr, "broccoli concat round-trip FAILED (%s)\n",
                info.error);
        return 1;
    }

    printf("OK %ld -> %zu bytes (q%d); workpool(4) -> %zu bytes; "
           "broccoli concat %zu bytes decodes\n",
           n, enc_size, quality, multi_size, cat_size);
    return 0;
}
