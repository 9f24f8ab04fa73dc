// Package brotli wraps the brotli_tpu native C ABI
// (libbrotli_tpu_native.so) with the reference Go binding's surface
// (/root/reference/c/go/brotli/brotli.go:57-713): CompressionOptions
// (incl. float Quality and stream-shaping flags), CompressionReader/
// Writer over the streaming encoder, MultiCompressionReader/Writer
// over the persistent workpool, DecompressionReader/Writer over the
// streaming decoder, and BroccoliConcatReader over the native
// concatenation engine.
//
// Build (no Go toolchain ships in this image; the C ABI underneath is
// exercised by tests/test_capi.py and examples/c_demo.c — a gated Go
// test lives in brotli_test.go):
//
//	CGO_LDFLAGS="-L$REPO/native -lbrotli_tpu_native" \
//	CGO_CFLAGS="-I$REPO/include" go build ./bindings/go
package brotli

/*
#cgo CFLAGS: -I${SRCDIR}/../../include
#cgo LDFLAGS: -L${SRCDIR}/../../native -lbrotli_tpu_native
#include <stdlib.h>
#include "brotli_tpu.h"
*/
import "C"

import (
	"errors"
	"io"
	"runtime"
	"unsafe"
)

// CompressionOptions mirrors the reference binding's options struct
// (c/go/brotli/brotli.go:57).  Quality is a float like the reference:
// 9.5 selects the dense-ratio pseudo-quality family (9.5 -> q10,
// 9.5x/y are reachable with 10.5/11.5).
// Every field is sent to the engine as its encoder parameter
// (optionKeysValues).  Magic and SizeHint change the emitted stream
// (magic-number metadata header); DisableLiteralContextModeling,
// NumDirect, NumPostfix and LiteralByteScore are accepted by the
// engine as tuning hints — the stream stays valid if the engine's
// parameter search overrides them (it chooses distance parameters and
// context modeling itself, like the reference at quality >= 4).
type CompressionOptions struct {
	NumThreads                int
	Quality                   float32
	Catable                   bool
	Appendable                bool
	Magic                     bool
	Mode                      int
	LgWin                     int
	LgBlock                   int
	DisableLiteralContextModeling bool
	SizeHint                  uint
	NumDirect                 uint
	NumPostfix                uint
	LiteralByteScore          uint
}

func DefaultOptions() CompressionOptions {
	return CompressionOptions{Quality: 9, LgWin: 22, NumThreads: 1}
}

func BrotliEncoderVersion() uint32 {
	return uint32(C.BrotliEncoderVersion())
}

func BrotliDecoderVersion() uint32 {
	return uint32(C.BrotliDecoderVersion())
}

// qualityParams maps the float quality to (quality int, q9_5-ish
// deeper tiers ride the integer mapping like the reference CLI,
// bin/brotli.rs:658-680).
func qualityParams(q float32) uint32 {
	switch {
	case q > 9 && q < 10:
		return 10 // 9.5
	case q > 10 && q < 11:
		return 11 // 9.5x
	case q > 11 && q < 12:
		return 12 // 9.5y
	default:
		return uint32(q)
	}
}

// optionKeysValues maps every CompressionOptions field to its encoder
// parameter id (reference src/enc/parameters.rs numbering, identical
// to google/brotli encode.h for ids 0-6).  Fields whose parameter the
// engine accepts but does not act on are documented on the struct.
func optionKeysValues(o CompressionOptions) ([]C.uint32_t, []C.uint32_t) {
	keys := []C.uint32_t{0, 1, 2}
	vals := []C.uint32_t{C.uint32_t(o.Mode),
		C.uint32_t(qualityParams(o.Quality)), C.uint32_t(o.LgWin)}
	add := func(k, v C.uint32_t) {
		keys = append(keys, k)
		vals = append(vals, v)
	}
	if o.LgBlock != 0 {
		add(3, C.uint32_t(o.LgBlock))
	}
	if o.DisableLiteralContextModeling {
		add(4, 1)
	}
	if o.SizeHint != 0 {
		add(5, C.uint32_t(o.SizeHint))
	}
	if o.NumPostfix != 0 {
		add(7, C.uint32_t(o.NumPostfix))
	}
	if o.NumDirect != 0 {
		add(8, C.uint32_t(o.NumDirect))
	}
	if o.LiteralByteScore != 0 {
		add(154, C.uint32_t(o.LiteralByteScore))
	}
	if o.Catable {
		add(167, 1)
	}
	if o.Appendable {
		add(168, 1)
	}
	if o.Magic {
		add(169, 1)
	}
	return keys, vals
}

// ---------------------------------------------------------------------------
// one-shot helpers
// ---------------------------------------------------------------------------

// CompressBuffer one-shot compresses data.
func CompressBuffer(opts CompressionOptions, data []byte) ([]byte, error) {
	cap_ := C.BrotliEncoderMaxCompressedSize(C.size_t(len(data)))
	out := make([]byte, int(cap_))
	outSize := C.size_t(len(out))
	var inPtr *C.uint8_t
	if len(data) > 0 {
		inPtr = (*C.uint8_t)(unsafe.Pointer(&data[0]))
	}
	catable, appendable := 0, 0
	if opts.Catable {
		catable = 1
	}
	if opts.Appendable {
		appendable = 1
	}
	ok := C.BrotliTpuEncodeOneshot(
		C.int(qualityParams(opts.Quality)), C.int(opts.LgWin),
		C.int(opts.Mode), C.int(catable), C.int(appendable), 0, 0,
		nil, 0, C.size_t(len(data)), inPtr, &outSize,
		(*C.uint8_t)(unsafe.Pointer(&out[0])))
	if ok == 0 {
		return nil, errors.New("brotli: compression failed")
	}
	return out[:int(outSize)], nil
}

// CompressBufferMulti compresses with the persistent worker pool
// (reference BrotliEncoderCompressWorkPool, ffi/multicompress/mod.rs:312).
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
	keys, vals := optionKeysValues(opts)
	cap_ := C.BrotliEncoderMaxCompressedSize(C.size_t(len(data)))
	out := make([]byte, int(cap_)+64)
	outSize := C.size_t(len(out))
	var inPtr *C.uint8_t
	if len(data) > 0 {
		inPtr = (*C.uint8_t)(unsafe.Pointer(&data[0]))
	}
	ok := C.BrotliEncoderCompressWorkPool(
		pool, C.size_t(len(keys)), &keys[0], &vals[0],
		C.size_t(len(data)), inPtr, &outSize,
		(*C.uint8_t)(unsafe.Pointer(&out[0])), C.size_t(n))
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

// ---------------------------------------------------------------------------
// streaming compression (reference CompressionReader :159, Writer :340)
// ---------------------------------------------------------------------------

const bufSize = 128 << 10

// CompressionWriter compresses everything written to it into the
// downstream writer.  Close() finishes the stream.
type CompressionWriter struct {
	downstream io.Writer
	state      *C.BrotliEncoderState
	buf        []byte
	closed     bool
}

func NewCompressionWriter(downstream io.Writer, options CompressionOptions) *CompressionWriter {
	st := C.BrotliEncoderCreateInstance(nil, nil, nil)
	keys, vals := optionKeysValues(options)
	for i := range keys {
		C.BrotliEncoderSetParameter(st, C.uint32_t(keys[i]),
			C.uint32_t(vals[i]))
	}
	return &CompressionWriter{downstream: downstream, state: st,
		buf: make([]byte, bufSize)}
}

func (w *CompressionWriter) drive(op C.BrotliEncoderOperation,
	data []byte) error {
	availIn := C.size_t(len(data))
	var nextIn *C.uint8_t
	if len(data) > 0 {
		nextIn = (*C.uint8_t)(unsafe.Pointer(&data[0]))
	}
	for {
		availOut := C.size_t(len(w.buf))
		nextOut := (*C.uint8_t)(unsafe.Pointer(&w.buf[0]))
		ok := C.BrotliEncoderCompressStream(
			w.state, op, &availIn, &nextIn, &availOut, &nextOut, nil)
		if ok == 0 {
			return errors.New("brotli: encode stream failed")
		}
		produced := len(w.buf) - int(availOut)
		if produced > 0 {
			if _, err := w.downstream.Write(w.buf[:produced]); err != nil {
				return err
			}
		}
		if availIn == 0 && C.BrotliEncoderHasMoreOutput(w.state) == 0 {
			return nil
		}
	}
}

func (w *CompressionWriter) Write(data []byte) (int, error) {
	if w.closed {
		return 0, errors.New("brotli: write after close")
	}
	if err := w.drive(C.BROTLI_OPERATION_PROCESS, data); err != nil {
		return 0, err
	}
	return len(data), nil
}

func (w *CompressionWriter) Flush() error {
	return w.drive(C.BROTLI_OPERATION_FLUSH, nil)
}

func (w *CompressionWriter) Close() error {
	if w.closed {
		return nil
	}
	err := w.drive(C.BROTLI_OPERATION_FINISH, nil)
	C.BrotliEncoderDestroyInstance(w.state)
	w.closed = true
	return err
}

// CompressionReader compresses everything read from the upstream
// reader (reference :159).
type CompressionReader struct {
	upstream io.Reader
	state    *C.BrotliEncoderState
	in       []byte
	out      []byte
	pending  []byte
	eof      bool
	closed   bool
}

func NewCompressionReader(upstream io.Reader, options CompressionOptions) *CompressionReader {
	st := C.BrotliEncoderCreateInstance(nil, nil, nil)
	keys, vals := optionKeysValues(options)
	for i := range keys {
		C.BrotliEncoderSetParameter(st, C.uint32_t(keys[i]),
			C.uint32_t(vals[i]))
	}
	return &CompressionReader{upstream: upstream, state: st,
		in: make([]byte, bufSize), out: make([]byte, bufSize)}
}

func (r *CompressionReader) Close() error {
	if !r.closed {
		C.BrotliEncoderDestroyInstance(r.state)
		r.closed = true
	}
	return nil
}

func (r *CompressionReader) Read(data []byte) (int, error) {
	for len(r.pending) == 0 {
		if r.eof && C.BrotliEncoderIsFinished(r.state) != 0 {
			return 0, io.EOF
		}
		var chunk []byte
		op := C.BrotliEncoderOperation(C.BROTLI_OPERATION_PROCESS)
		if !r.eof {
			n, err := r.upstream.Read(r.in)
			chunk = r.in[:n]
			if err == io.EOF {
				r.eof = true
			} else if err != nil {
				return 0, err
			}
		}
		if r.eof {
			op = C.BROTLI_OPERATION_FINISH
		}
		availIn := C.size_t(len(chunk))
		var nextIn *C.uint8_t
		if len(chunk) > 0 {
			nextIn = (*C.uint8_t)(unsafe.Pointer(&chunk[0]))
		}
		for {
			availOut := C.size_t(len(r.out))
			nextOut := (*C.uint8_t)(unsafe.Pointer(&r.out[0]))
			ok := C.BrotliEncoderCompressStream(
				r.state, op, &availIn, &nextIn, &availOut, &nextOut, nil)
			if ok == 0 {
				return 0, errors.New("brotli: encode stream failed")
			}
			produced := len(r.out) - int(availOut)
			r.pending = append(r.pending, r.out[:produced]...)
			if availIn == 0 && C.BrotliEncoderHasMoreOutput(r.state) == 0 {
				break
			}
		}
	}
	n := copy(data, r.pending)
	r.pending = r.pending[n:]
	return n, nil
}

// MultiCompressionReader buffers the whole upstream and compresses it
// over the workpool on the first Read (reference :85 buffers the same
// way — CompressMulti needs the full input for range splitting).
type MultiCompressionReader struct {
	upstream io.Reader
	options  CompressionOptions
	pending  []byte
	done     bool
}

func NewMultiCompressionReader(upstream io.Reader,
	options CompressionOptions) *MultiCompressionReader {
	return &MultiCompressionReader{upstream: upstream, options: options}
}

func (m *MultiCompressionReader) Read(data []byte) (int, error) {
	if !m.done {
		raw, err := io.ReadAll(m.upstream)
		if err != nil {
			return 0, err
		}
		m.pending, err = CompressBufferMulti(m.options, raw)
		if err != nil {
			return 0, err
		}
		m.done = true
	}
	if len(m.pending) == 0 {
		return 0, io.EOF
	}
	n := copy(data, m.pending)
	m.pending = m.pending[n:]
	return n, nil
}

func (m *MultiCompressionReader) Close() error { return nil }

// MultiCompressionWriter buffers all writes and compresses on Close
// (reference :477).
type MultiCompressionWriter struct {
	downstream io.Writer
	options    CompressionOptions
	buf        []byte
}

func NewMultiCompressionWriter(downstream io.Writer,
	options CompressionOptions) *MultiCompressionWriter {
	return &MultiCompressionWriter{downstream: downstream, options: options}
}

func (m *MultiCompressionWriter) Write(data []byte) (int, error) {
	m.buf = append(m.buf, data...)
	return len(data), nil
}

func (m *MultiCompressionWriter) Close() error {
	out, err := CompressBufferMulti(m.options, m.buf)
	if err != nil {
		return err
	}
	_, err = m.downstream.Write(out)
	return err
}

// ---------------------------------------------------------------------------
// streaming decompression (reference DecompressionReader :535,
// Writer :626)
// ---------------------------------------------------------------------------

type DecompressionReader struct {
	upstream io.Reader
	state    *C.BrotliDecoderState
	in       []byte
	out      []byte
	pending  []byte
	eof      bool
	closed   bool
}

func NewDecompressionReader(upstream io.Reader) *DecompressionReader {
	return &DecompressionReader{upstream: upstream,
		state: C.BrotliDecoderCreateInstance(nil, nil, nil),
		in:    make([]byte, bufSize), out: make([]byte, bufSize)}
}

func (r *DecompressionReader) Close() error {
	if !r.closed {
		C.BrotliDecoderDestroyInstance(r.state)
		r.closed = true
	}
	return nil
}

func (r *DecompressionReader) Read(data []byte) (int, error) {
	for len(r.pending) == 0 {
		if C.BrotliDecoderIsFinished(r.state) != 0 {
			return 0, io.EOF
		}
		var chunk []byte
		if !r.eof {
			n, err := r.upstream.Read(r.in)
			chunk = r.in[:n]
			if err == io.EOF {
				r.eof = true
			} else if err != nil {
				return 0, err
			}
		} else {
			return 0, errors.New("brotli: truncated stream")
		}
		availIn := C.size_t(len(chunk))
		var nextIn *C.uint8_t
		if len(chunk) > 0 {
			nextIn = (*C.uint8_t)(unsafe.Pointer(&chunk[0]))
		}
		for {
			availOut := C.size_t(len(r.out))
			nextOut := (*C.uint8_t)(unsafe.Pointer(&r.out[0]))
			res := C.BrotliDecoderDecompressStream(
				r.state, &availIn, &nextIn, &availOut, &nextOut, nil)
			produced := len(r.out) - int(availOut)
			r.pending = append(r.pending, r.out[:produced]...)
			if res == C.BROTLI_DECODER_RESULT_ERROR {
				return 0, errors.New("brotli: corrupt stream")
			}
			if res == C.BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT {
				continue
			}
			break
		}
	}
	n := copy(data, r.pending)
	r.pending = r.pending[n:]
	return n, nil
}

type DecompressionWriter struct {
	downstream io.Writer
	state      *C.BrotliDecoderState
	out        []byte
	closed     bool
}

func NewDecompressionWriter(downstream io.Writer) *DecompressionWriter {
	return &DecompressionWriter{downstream: downstream,
		state: C.BrotliDecoderCreateInstance(nil, nil, nil),
		out:   make([]byte, bufSize)}
}

func (w *DecompressionWriter) Write(data []byte) (int, error) {
	if w.closed {
		return 0, errors.New("brotli: write after close")
	}
	availIn := C.size_t(len(data))
	var nextIn *C.uint8_t
	if len(data) > 0 {
		nextIn = (*C.uint8_t)(unsafe.Pointer(&data[0]))
	}
	for {
		availOut := C.size_t(len(w.out))
		nextOut := (*C.uint8_t)(unsafe.Pointer(&w.out[0]))
		res := C.BrotliDecoderDecompressStream(
			w.state, &availIn, &nextIn, &availOut, &nextOut, nil)
		produced := len(w.out) - int(availOut)
		if produced > 0 {
			if _, err := w.downstream.Write(w.out[:produced]); err != nil {
				return 0, err
			}
		}
		if res == C.BROTLI_DECODER_RESULT_ERROR {
			return 0, errors.New("brotli: corrupt stream")
		}
		if res == C.BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT {
			continue
		}
		break
	}
	return len(data), nil
}

func (w *DecompressionWriter) Close() error {
	if !w.closed {
		C.BrotliDecoderDestroyInstance(w.state)
		w.closed = true
	}
	return nil
}

// ---------------------------------------------------------------------------
// Broccoli concatenation (reference BroccoliConcatReader :713)
// ---------------------------------------------------------------------------

// BroccoliConcatReader losslessly concatenates multiple brotli streams
// (each appendable/catable-shaped) into one stream as it reads.
type BroccoliConcatReader struct {
	upstreams []io.Reader
	state     C.BroccoliState
	in        []byte
	out       []byte
	pending   []byte
	idx       int
	started   bool
	finished  bool
}

func NewBroccoliConcatReader(upstreams ...io.Reader) *BroccoliConcatReader {
	return &BroccoliConcatReader{upstreams: upstreams,
		state: C.BroccoliCreateInstance(),
		in:    make([]byte, bufSize), out: make([]byte, bufSize)}
}

func NewBroccoliConcatReaderWithWindowSize(windowSize byte,
	upstreams ...io.Reader) *BroccoliConcatReader {
	return &BroccoliConcatReader{upstreams: upstreams,
		state: C.BroccoliCreateInstanceWithWindowSize(C.uint8_t(windowSize)),
		in:    make([]byte, bufSize), out: make([]byte, bufSize)}
}

func (b *BroccoliConcatReader) Close() error {
	C.BroccoliDestroyInstance(b.state)
	return nil
}

func broccoliErr(r C.int32_t) error {
	switch r {
	case C.BroccoliBrotliFileNotCraftedForAppend:
		return errors.New("brotli: stream not crafted for append")
	case C.BroccoliInvalidWindowSize:
		return errors.New("brotli: invalid window size")
	case C.BroccoliWindowSizeLargerThanPreviousFile:
		return errors.New("brotli: window larger than previous file")
	case C.BroccoliBrotliFileNotCraftedForConcatenation:
		return errors.New("brotli: stream not crafted for concatenation")
	}
	return nil
}

func (b *BroccoliConcatReader) Read(data []byte) (int, error) {
	for len(b.pending) == 0 && !b.finished {
		if b.idx < len(b.upstreams) {
			if !b.started {
				C.BroccoliNewBrotliFile(&b.state)
				b.started = true
			}
			n, err := b.upstreams[b.idx].Read(b.in)
			if n > 0 {
				availIn := C.size_t(n)
				nextIn := (*C.uint8_t)(unsafe.Pointer(&b.in[0]))
				for {
					availOut := C.size_t(len(b.out))
					nextOut := (*C.uint8_t)(unsafe.Pointer(&b.out[0]))
					r := C.BroccoliConcatStream(&b.state, &availIn,
						&nextIn, &availOut, &nextOut)
					b.pending = append(b.pending,
						b.out[:len(b.out)-int(availOut)]...)
					if r == C.BroccoliNeedsMoreOutput {
						continue
					}
					if e := broccoliErr(r); e != nil {
						return 0, e
					}
					break
				}
			}
			if err == io.EOF {
				b.idx++
				b.started = false
			} else if err != nil {
				return 0, err
			}
		} else {
			for {
				availOut := C.size_t(len(b.out))
				nextOut := (*C.uint8_t)(unsafe.Pointer(&b.out[0]))
				r := C.BroccoliConcatFinish(&b.state, &availOut, &nextOut)
				b.pending = append(b.pending,
					b.out[:len(b.out)-int(availOut)]...)
				if r == C.BroccoliNeedsMoreOutput {
					continue
				}
				if e := broccoliErr(r); e != nil {
					return 0, e
				}
				break
			}
			b.finished = true
		}
	}
	if len(b.pending) == 0 {
		return 0, io.EOF
	}
	n := copy(data, b.pending)
	b.pending = b.pending[n:]
	return n, nil
}
