// Package brotli wraps the brotli_tpu native C ABI
// (libbrotli_tpu_native.so) — the analog of the reference's Go binding
// (/root/reference/c/go/brotli/brotli.go:57): CompressionOptions with
// quality/window/threads, one-shot and streaming compression, workpool
// multi-threaded compression, and streaming decompression.
//
// Build (no Go toolchain ships in this image; the C ABI underneath is
// exercised by tests/test_capi.py and examples/c_demo.c):
//
//	CGO_LDFLAGS="-L$REPO/native -lbrotli_tpu_native" \
//	CGO_CFLAGS="-I$REPO/include" go build ./bindings/go
package brotli

/*
#cgo CFLAGS: -I${SRCDIR}/../../include
#cgo LDFLAGS: -L${SRCDIR}/../../native -lbrotli_tpu_native
#include <stdlib.h>
#include "brotli_tpu.h"

extern void* BrotliEncoderCreateWorkPool(size_t n, void* a, void* f, void* o);
extern void BrotliEncoderDestroyWorkPool(void* pool);
extern int BrotliEncoderCompressWorkPool(
    void* pool, size_t nparams, const unsigned int* keys,
    const unsigned int* values, size_t in_size, const unsigned char* in,
    size_t* out_size, unsigned char* out, size_t threads);
*/
import "C"

import (
	"errors"
	"runtime"
	"unsafe"
)

// CompressionOptions mirrors the reference binding's options struct
// (c/go/brotli/brotli.go:57).
type CompressionOptions struct {
	Quality    int
	Window     int
	Mode       int
	NumThreads int
}

func DefaultOptions() CompressionOptions {
	return CompressionOptions{Quality: 9, Window: 22, NumThreads: 1}
}

// CompressBuffer one-shot compresses data.
func CompressBuffer(opts CompressionOptions, data []byte) ([]byte, error) {
	cap_ := C.BrotliEncoderMaxCompressedSize(C.size_t(len(data)))
	out := make([]byte, int(cap_))
	outSize := C.size_t(len(out))
	var inPtr *C.uint8_t
	if len(data) > 0 {
		inPtr = (*C.uint8_t)(unsafe.Pointer(&data[0]))
	}
	ok := C.BrotliEncoderCompress(
		C.int(opts.Quality), C.int(opts.Window), C.int(opts.Mode),
		C.size_t(len(data)), inPtr, &outSize,
		(*C.uint8_t)(unsafe.Pointer(&out[0])))
	if ok == 0 {
		return nil, errors.New("brotli: compression failed")
	}
	return out[:int(outSize)], nil
}

// CompressBufferMulti compresses with the persistent worker pool
// (reference MultiCompressionWriter over the workpool FFI).
func CompressBufferMulti(opts CompressionOptions, data []byte) ([]byte, error) {
	n := opts.NumThreads
	if n < 1 {
		n = runtime.NumCPU()
	}
	pool := C.BrotliEncoderCreateWorkPool(C.size_t(n-1), nil, nil, nil)
	if pool == nil {
		return nil, errors.New("brotli: workpool creation failed")
	}
	defer C.BrotliEncoderDestroyWorkPool(pool)
	keys := [3]C.uint{1, 2, 3} // MODE, QUALITY, LGWIN
	vals := [3]C.uint{C.uint(opts.Mode), C.uint(opts.Quality),
		C.uint(opts.Window)}
	cap_ := C.BrotliEncoderMaxCompressedSize(C.size_t(len(data)))
	out := make([]byte, int(cap_)+64)
	outSize := C.size_t(len(out))
	var inPtr *C.uint8_t
	if len(data) > 0 {
		inPtr = (*C.uint8_t)(unsafe.Pointer(&data[0]))
	}
	ok := C.BrotliEncoderCompressWorkPool(
		pool, 3, &keys[0], &vals[0], C.size_t(len(data)), inPtr,
		&outSize, (*C.uint8_t)(unsafe.Pointer(&out[0])), C.size_t(n))
	if ok == 0 {
		return nil, errors.New("brotli: multi compression failed")
	}
	return out[:int(outSize)], nil
}

// DecompressBuffer one-shot decompresses; sizeHint grows the output
// buffer until the stream fits.
func DecompressBuffer(data []byte, sizeHint int) ([]byte, error) {
	if sizeHint <= 0 {
		sizeHint = 4*len(data) + 65536
	}
	for {
		out := make([]byte, sizeHint)
		outSize := C.size_t(len(out))
		r := C.BrotliDecoderDecompress(
			C.size_t(len(data)),
			(*C.uint8_t)(unsafe.Pointer(&data[0])), &outSize,
			(*C.uint8_t)(unsafe.Pointer(&out[0])))
		switch r {
		case C.BROTLI_DECODER_RESULT_SUCCESS:
			return out[:int(outSize)], nil
		case C.BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT:
			sizeHint *= 4
		default:
			return nil, errors.New("brotli: corrupt stream")
		}
	}
}
