/* brotli_tpu C API — google/brotli-compatible surface exported by
 * libbrotli_tpu_native.so.
 *
 * Mirrors the reference's public C headers
 * (/root/reference/c/brotli/encode.h:256-457, decode.h:146-330); decls
 * written against that documented surface, not copied.
 *
 * The streaming decoder suspends at ANY input byte (mid-symbol
 * resume; state is O(window) plus one partial phase).  Documented
 * divergence: the streaming ENCODER emits per metablock-sized chunk
 * with FLUSH byte-alignment rather than per input byte.  Qualities
 * 10/11 run the native optimal parse (zopfli_hq.cpp) — same output
 * quality as the host pipeline.
 */
#ifndef BROTLI_TPU_H_
#define BROTLI_TPU_H_

#include <stddef.h>
#include <stdint.h>

#if defined(__cplusplus)
extern "C" {
#endif

#define BROTLI_BOOL int
#define BROTLI_TRUE 1
#define BROTLI_FALSE 0

/* ---- decoder ---- */

typedef enum {
    BROTLI_DECODER_RESULT_ERROR = 0,
    BROTLI_DECODER_RESULT_SUCCESS = 1,
    BROTLI_DECODER_RESULT_NEEDS_MORE_INPUT = 2,
    BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT = 3
} BrotliDecoderResult;

typedef struct BrotliDecoderStateStruct BrotliDecoderState;

typedef void* (*brotli_alloc_func)(void* opaque, size_t size);
typedef void (*brotli_free_func)(void* opaque, void* address);

uint32_t BrotliDecoderVersion(void);
BrotliDecoderState* BrotliDecoderCreateInstance(
    void* alloc_func, void* free_func, void* opaque);
void BrotliDecoderDestroyInstance(BrotliDecoderState* state);
BROTLI_BOOL BrotliDecoderSetParameter(
    BrotliDecoderState* state, uint32_t param, uint32_t value);
BrotliDecoderResult BrotliDecoderDecompress(
    size_t encoded_size, const uint8_t* encoded_buffer,
    size_t* decoded_size, uint8_t* decoded_buffer);
BrotliDecoderResult BrotliDecoderDecompressStream(
    BrotliDecoderState* state, size_t* available_in,
    const uint8_t** next_in, size_t* available_out, uint8_t** next_out,
    size_t* total_out);
BROTLI_BOOL BrotliDecoderIsUsed(const BrotliDecoderState* state);
BROTLI_BOOL BrotliDecoderIsFinished(const BrotliDecoderState* state);
BROTLI_BOOL BrotliDecoderHasMoreOutput(const BrotliDecoderState* state);
const uint8_t* BrotliDecoderTakeOutput(BrotliDecoderState* state,
                                       size_t* size);
int32_t BrotliDecoderGetErrorCode(const BrotliDecoderState* state);
const char* BrotliDecoderErrorString(int32_t code);

/* one-shot decode with rich result info (reference decode.h:223-240) */
typedef struct BrotliDecoderReturnInfoStruct {
    size_t decoded_size;
    char error[256];
    BrotliDecoderResult result;
    int32_t code; /* BrotliDecoderErrorCode: 1 success, negative error */
} BrotliDecoderReturnInfo;

BrotliDecoderReturnInfo BrotliDecoderDecompressWithReturnInfo(
    size_t encoded_size, const uint8_t* encoded_buffer,
    size_t decoded_size, uint8_t* decoded_buffer);

/* allocation-free decode: caller provides all scratch.  The int32
 * prefix-table arena maps onto scratch_u32 (>= 65536 entries; 1<<23
 * covers every stream).  scratch_u8/scratch_hc exist for reference
 * ABI parity and may be NULL. */
BrotliDecoderReturnInfo BrotliDecoderDecompressPrealloc(
    size_t encoded_size, const uint8_t* encoded_buffer,
    size_t decoded_size, uint8_t* decoded_buffer,
    size_t scratch_u8_size, uint8_t* scratch_u8_buffer,
    size_t scratch_u32_size, uint32_t* scratch_u32_buffer,
    size_t scratch_hc_size, void* scratch_hc_buffer);

/* ---- encoder ---- */

typedef enum {
    BROTLI_OPERATION_PROCESS = 0,
    BROTLI_OPERATION_FLUSH = 1,
    BROTLI_OPERATION_FINISH = 2,
    BROTLI_OPERATION_EMIT_METADATA = 3
} BrotliEncoderOperation;

/* parameter ids (reference src/enc/parameters.rs:3-35; ids 0-6 are
 * identical to google/brotli encode.h, so callers compiled against
 * either header set the same parameters) */
typedef enum {
    BROTLI_PARAM_MODE = 0,
    BROTLI_PARAM_QUALITY = 1,
    BROTLI_PARAM_LGWIN = 2,
    BROTLI_PARAM_LGBLOCK = 3,
    BROTLI_PARAM_DISABLE_LITERAL_CONTEXT_MODELING = 4,
    BROTLI_PARAM_SIZE_HINT = 5,
    BROTLI_PARAM_LARGE_WINDOW = 6,
    BROTLI_PARAM_Q9_5 = 150,
    BROTLI_PARAM_CATABLE = 167,
    BROTLI_PARAM_APPENDABLE = 168,
    BROTLI_PARAM_MAGIC_NUMBER = 169,
    BROTLI_PARAM_BYTE_ALIGN = 172,
    BROTLI_PARAM_BARE_STREAM = 173
} BrotliEncoderParameter;

typedef struct BrotliEncoderStateStruct BrotliEncoderState;

uint32_t BrotliEncoderVersion(void);
BrotliEncoderState* BrotliEncoderCreateInstance(
    void* alloc_func, void* free_func, void* opaque);
void BrotliEncoderDestroyInstance(BrotliEncoderState* state);
BROTLI_BOOL BrotliEncoderSetParameter(
    BrotliEncoderState* state, uint32_t param, uint32_t value);
BROTLI_BOOL BrotliEncoderSetCustomDictionary(
    BrotliEncoderState* state, size_t size, const uint8_t* dict);
size_t BrotliEncoderMaxCompressedSize(size_t input_size);
BROTLI_BOOL BrotliEncoderCompress(
    int quality, int lgwin, int mode, size_t input_size,
    const uint8_t* input_buffer, size_t* encoded_size,
    uint8_t* encoded_buffer);
/* Fully-preallocated encode (the reference's stack-allocator /
   seccomp mode, combined_alloc.rs): q0-q9, single-threaded, all big
   scratch (ring tables, hash scratch, command arrays, bit staging)
   carved from the caller's arena.  Call
   BrotliEncoderPreallocWarmup(max_input) once per thread BEFORE a
   jail so the small per-thread store pools are sized; compresses
   after that perform zero heap allocations.  Size the arena with the
   quality-aware BrotliEncoderPreallocScratchSizeQ (the plain
   ScratchSize covers q0/q1 only); the scratch pointer should be
   8-byte aligned (unaligned arenas work but waste a few bytes). */
size_t BrotliEncoderPreallocScratchSize(size_t input_size);
size_t BrotliEncoderPreallocScratchSizeQ(size_t input_size,
                                         int quality);
BROTLI_BOOL BrotliEncoderPreallocWarmup(size_t max_input_size);
BROTLI_BOOL BrotliEncoderCompressPrealloc(
    int quality, int lgwin, int mode, size_t input_size,
    const uint8_t* input_buffer, size_t* encoded_size,
    uint8_t* encoded_buffer, size_t scratch_size, uint8_t* scratch);
BROTLI_BOOL BrotliEncoderCompressStream(
    BrotliEncoderState* state, BrotliEncoderOperation op,
    size_t* available_in, const uint8_t** next_in,
    size_t* available_out, uint8_t** next_out, size_t* total_out);
BROTLI_BOOL BrotliEncoderIsFinished(const BrotliEncoderState* state);
BROTLI_BOOL BrotliEncoderHasMoreOutput(const BrotliEncoderState* state);
const uint8_t* BrotliEncoderTakeOutput(BrotliEncoderState* state,
                                       size_t* size);

/* ---- multithreaded encode (reference c/brotli/multiencode.h) ---- */

/* persistent worker pool, reused across compress calls */
void* BrotliEncoderCreateWorkPool(size_t num_threads,
                                  brotli_alloc_func alloc_func,
                                  brotli_free_func free_func,
                                  void* opaque);
void BrotliEncoderDestroyWorkPool(void* work_pool);
/* (param_keys, param_values) pairs use BrotliEncoderParameter ids */
BROTLI_BOOL BrotliEncoderCompressWorkPool(
    void* work_pool, size_t num_params, const uint32_t* param_keys,
    const uint32_t* param_values, size_t input_size,
    const uint8_t* input, size_t* encoded_size, uint8_t* encoded_buffer,
    size_t desired_num_threads);
/* one-off form: spawns threads per call */
BROTLI_BOOL BrotliEncoderCompressMulti(
    size_t num_params, const uint32_t* param_keys,
    const uint32_t* param_values, size_t input_size,
    const uint8_t* input, size_t* encoded_size, uint8_t* encoded_buffer,
    size_t desired_num_threads);

/* ---- Broccoli: bit-level stream concatenation ----
 * (reference c/brotli/broccoli.h, src/ffi/broccoli.rs:56-156) */

typedef struct BroccoliState_ {
    void* unused;
    unsigned char data[248];
} BroccoliState;

typedef enum BroccoliResult_ {
    BroccoliSuccess = 0,
    BroccoliNeedsMoreInput = 1,
    BroccoliNeedsMoreOutput = 2,
    BroccoliBrotliFileNotCraftedForAppend = 124,
    BroccoliInvalidWindowSize = 125,
    BroccoliWindowSizeLargerThanPreviousFile = 126,
    BroccoliBrotliFileNotCraftedForConcatenation = 127
} BroccoliResult;

BroccoliState BroccoliCreateInstance(void);
BroccoliState BroccoliCreateInstanceWithWindowSize(uint8_t window_size);
void BroccoliDestroyInstance(BroccoliState state);
void BroccoliNewBrotliFile(BroccoliState* state);
int32_t BroccoliConcatStream(
    BroccoliState* state, size_t* available_in,
    const uint8_t** input_buf_ptr, size_t* available_out,
    uint8_t** output_buf_ptr);
int32_t BroccoliConcatStreaming(
    BroccoliState* state, size_t* available_in,
    const uint8_t* input_buf, size_t* available_out,
    uint8_t* output_buf);
int32_t BroccoliConcatFinish(BroccoliState* state, size_t* available_out,
                             uint8_t** output_buf);
int32_t BroccoliConcatFinished(BroccoliState* state,
                               size_t* available_out,
                               uint8_t* output_buf);

/* ---- extensions ---- */

/* one-shot encode with stream-shaping flags + LZ77 custom dictionary */
BROTLI_BOOL BrotliTpuEncodeOneshot(
    int quality, int lgwin, int mode, int catable, int appendable,
    int bare, int byte_align, const uint8_t* dict, size_t dict_size,
    size_t input_size, const uint8_t* input, size_t* encoded_size,
    uint8_t* encoded_buffer);

#if defined(__cplusplus)
}
#endif

#endif /* BROTLI_TPU_H_ */
