// Round-trip tests for the brotli_tpu Go binding (the analog of the
// reference's c/go/brotli tests).  Runs when a Go toolchain and the
// compiled libbrotli_tpu_native.so are present:
//
//	cd bindings/go && LD_LIBRARY_PATH=../../native go test .
package brotli

import (
	"bytes"
	"io"
	"strings"
	"testing"
)

var sample = []byte(strings.Repeat(
	"the quick brown fox jumps over the lazy dog. ", 4000))

func TestOneShotRoundTrip(t *testing.T) {
	opts := DefaultOptions()
	comp, err := CompressBuffer(opts, sample)
	if err != nil {
		t.Fatal(err)
	}
	plain, err := DecompressBuffer(comp, 0)
	if err != nil {
		t.Fatal(err)
	}
	if !bytes.Equal(plain, sample) {
		t.Fatal("one-shot round-trip mismatch")
	}
}

func TestMultiRoundTrip(t *testing.T) {
	opts := DefaultOptions()
	opts.NumThreads = 4
	comp, err := CompressBufferMulti(opts, sample)
	if err != nil {
		t.Fatal(err)
	}
	plain, err := DecompressBuffer(comp, 0)
	if err != nil || !bytes.Equal(plain, sample) {
		t.Fatal("multi round-trip mismatch")
	}
}

func TestWriterReaderRoundTrip(t *testing.T) {
	var buf bytes.Buffer
	w := NewCompressionWriter(&buf, DefaultOptions())
	if _, err := w.Write(sample); err != nil {
		t.Fatal(err)
	}
	if err := w.Close(); err != nil {
		t.Fatal(err)
	}
	r := NewDecompressionReader(&buf)
	defer r.Close()
	plain, err := io.ReadAll(r)
	if err != nil || !bytes.Equal(plain, sample) {
		t.Fatal("writer->reader round-trip mismatch")
	}
}

func TestCompressionReaderDecompressionWriter(t *testing.T) {
	cr := NewCompressionReader(bytes.NewReader(sample), DefaultOptions())
	defer cr.Close()
	comp, err := io.ReadAll(cr)
	if err != nil {
		t.Fatal(err)
	}
	var out bytes.Buffer
	dw := NewDecompressionWriter(&out)
	if _, err := dw.Write(comp); err != nil {
		t.Fatal(err)
	}
	dw.Close()
	if !bytes.Equal(out.Bytes(), sample) {
		t.Fatal("reader->writer round-trip mismatch")
	}
}

func TestBroccoliConcatReader(t *testing.T) {
	a := sample[:len(sample)/2]
	b := sample[len(sample)/2:]
	oa := DefaultOptions()
	oa.Appendable = true
	ob := DefaultOptions()
	ob.Catable = true
	ca, err := CompressBuffer(oa, a)
	if err != nil {
		t.Fatal(err)
	}
	cb, err := CompressBuffer(ob, b)
	if err != nil {
		t.Fatal(err)
	}
	r := NewBroccoliConcatReader(bytes.NewReader(ca), bytes.NewReader(cb))
	defer r.Close()
	joined, err := io.ReadAll(r)
	if err != nil {
		t.Fatal(err)
	}
	plain, err := DecompressBuffer(joined, 0)
	if err != nil || !bytes.Equal(plain, sample) {
		t.Fatal("broccoli concat round-trip mismatch")
	}
}
