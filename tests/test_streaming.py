"""Streaming API tests: incremental encode/decode, io wrappers, fast path.

Reference parity targets: compress_stream PROCESS/FLUSH/FINISH/
EMIT_METADATA ops (src/enc/encode.rs:1380), BrotliDecompressStream
resumability (ffi/decompressor.rs), reader/writer io wrappers
(src/enc/reader.rs, writer.rs), streaming byte-at-a-time decode
(src/bin/integration_tests.rs:756-798).
"""

import io

import pytest

from brotli_tpu import (Compressor, CompressorReader, CompressorWriter,
                        Decompressor, DecompressorWriter, StreamDecoder,
                        compress, decompress)
from brotli_tpu.decode.decoder import BrotliDecodeError

from . import oracle
from .conftest import TESTDATA


def load(name):
    with open(f"{TESTDATA}/{name}", "rb") as f:
        return f.read()


@pytest.mark.parametrize("feed", [1 << 12, 7001, 1 << 20])
def test_stream_compress_roundtrip(feed):
    data = load("alice29.txt")
    c = Compressor(quality=9, chunk_size=1 << 16)
    out = bytearray()
    for i in range(0, len(data), feed):
        out += c.process(data[i:i + feed])
    out += c.finish()
    assert decompress(bytes(out)) == data
    if oracle.available():
        assert oracle.decompress(bytes(out),
                                 max_size_hint=len(data)) == data


def test_stream_compress_flush_makes_prefix_decodable():
    data = load("asyoulik.txt")
    c = Compressor(quality=5, chunk_size=1 << 15)
    out = bytearray()
    out += c.process(data[:40000])
    out += c.flush()
    sd = StreamDecoder()
    assert bytes(sd.decompress(bytes(out))) == data[:40000]
    out += c.process(data[40000:])
    out += c.finish()
    assert decompress(bytes(out)) == data


def test_stream_compress_metadata():
    data = load("quickfox")
    c = Compressor(quality=5)
    out = c.process(data) + c.emit_metadata(b"meta-payload") + c.finish()
    assert decompress(out) == data


def test_stream_decode_chunked():
    """Resumable decode at arbitrary feed sizes.  The StreamDecoder
    suspends at metablock granularity, so byte-at-a-time feeding is
    exercised on a small stream (the reference's byte-by-byte test,
    integration_tests.rs:756, runs against its symbol-level decoder)."""
    data = load("alice29.txt")
    comp = compress(data, quality=9)
    for step in (997, 1 << 16):
        sd = StreamDecoder()
        got = bytearray()
        for i in range(0, len(comp), step):
            got += sd.decompress(comp[i:i + step])
        got += sd.finish()
        assert bytes(got) == data
        assert sd.finished
    small = load("ukkonooa")
    comp = compress(small, quality=9)
    for step in (1, 3):
        sd = StreamDecoder()
        got = bytearray()
        for i in range(0, len(comp), step):
            got += sd.decompress(comp[i:i + step])
        got += sd.finish()
        assert bytes(got) == small


def test_stream_decode_truncated_raises():
    comp = compress(load("alice29.txt"), quality=9)
    sd = StreamDecoder()
    sd.decompress(comp[:len(comp) // 2])
    with pytest.raises(BrotliDecodeError, match="truncated"):
        sd.finish()


def test_stream_decode_upstream_fixture():
    comp = load("alice29.txt.compressed")
    plain = load("alice29.txt")
    sd = StreamDecoder()
    got = sd.decompress(comp) + sd.finish()
    assert got == plain


def test_io_wrappers_roundtrip():
    data = load("asyoulik.txt")
    # CompressorWriter -> DecompressorWriter
    sink = io.BytesIO()
    w = CompressorWriter(sink, quality=7)
    for i in range(0, len(data), 9973):
        w.write(data[i:i + 9973])
    w.close()
    comp = sink.getvalue()
    assert decompress(comp) == data

    out_sink = io.BytesIO()
    dw = DecompressorWriter(out_sink)
    for i in range(0, len(comp), 4099):
        dw.write(comp[i:i + 4099])
    assert dw.into_inner().getvalue() == data

    # CompressorReader -> Decompressor
    r = CompressorReader(io.BytesIO(data), quality=7)
    comp2 = r.read()
    d = Decompressor(io.BytesIO(comp2))
    chunks = []
    while True:
        c = d.read(8192)
        if not c:
            break
        chunks.append(c)
    assert b"".join(chunks) == data


def test_custom_dictionary_streaming():
    data = load("alice29.txt")
    d, body = data[:50000], data[50000:]
    c = Compressor(quality=9, custom_dictionary=d)
    out = c.process(body) + c.finish()
    assert decompress(out, custom_dictionary=d) == body


def test_fast_path_small():
    from brotli_tpu.encode.fast import compress_fast
    data = load("ukkonooa") * 50
    out = compress_fast(data)
    assert decompress(out) == data
    if oracle.available():
        assert oracle.decompress(out, max_size_hint=len(data)) == data


def test_decompress_batch():
    from brotli_tpu import compress, decompress_batch
    datas = [load("alice29.txt"), load("asyoulik.txt"),
             load("quickfox") * 50, b"", b"x"]
    streams = [compress(d, quality=7) for d in datas]
    assert decompress_batch(streams, threads=4) == datas
    assert decompress_batch(streams, threads=1) == datas
    # error propagation: corrupt one stream
    bad = list(streams)
    bad[2] = bad[2][: len(bad[2]) // 2]
    import pytest as _pytest
    from brotli_tpu.core.bitio import NeedsMoreInput
    with _pytest.raises(Exception):
        decompress_batch(bad, threads=4)


def test_stream_q11_matches_oneshot_grade():
    """Streaming at q11 must run the optimal parser per chunk
    (reference applies the full quality tier when streaming,
    encode.rs:2026-2111): size within 2% of one-shot q11."""
    data = load("alice29.txt")
    one_shot = compress(data, quality=11)
    c = Compressor(quality=11, chunk_size=1 << 18)
    out = b"".join([c.process(data), c.finish()])
    assert decompress(out) == data
    assert len(out) <= int(len(one_shot) * 1.02)


def test_stream_chunk_size_clamped_to_mlen_limit():
    """chunk_size beyond the RFC 7932 MLEN cap (1<<24) must not emit
    an invalid metablock."""
    c = Compressor(quality=1, chunk_size=1 << 26)
    assert c.chunk_size == 1 << 24
    data = bytes(range(256)) * 64
    out = c.process(data) + c.finish()
    assert decompress(out) == data


def test_stream_decoder_max_output_throttling():
    """NeedsMoreOutput semantics (reference decode.h contract): output
    beyond max_output stays buffered; memory stays bounded."""
    data = load("alice29.txt")
    comp = compress(data, quality=9)
    sd = StreamDecoder()
    out = bytearray()
    out += sd.decompress(comp, max_output=1000)
    assert len(out) == 1000
    assert sd.has_more_output
    while sd.has_more_output or not sd.finished:
        got = sd.decompress(b"", max_output=1000)
        assert len(got) <= 1000
        out += got
        if not got and sd.finished:
            break
    assert bytes(out) == data


def test_stream_decoder_byte_at_a_time_large_block_linear():
    """Command-granular resume: feeding a ~1MiB single-metablock stream
    byte-at-a-time must be O(n), not O(n^2) block-start replay."""
    import time
    rng = __import__("numpy").random.default_rng(3)
    n = 1 << 20
    text = (b"incremental resume of large metablocks " * 40000)[:n]
    comp = compress(text, quality=5)
    sd = StreamDecoder()
    out = bytearray()
    t0 = time.perf_counter()
    step = 997  # prime-sized chunks, thousands of suspend/resume cycles
    for i in range(0, len(comp), step):
        out += sd.decompress(comp[i:i + step])
    out += sd.finish()
    dt = time.perf_counter() - t0
    assert bytes(out) == text
    # the old block-start rollback replayed ~0.5 * n * n/step command
    # decodes (minutes); command-granular resume stays in seconds
    assert dt < 60, f"streaming resume too slow: {dt:.1f}s"


def test_stream_decoder_bounded_window_memory():
    """Only window-size history is retained (plus undrained output)."""
    rng = __import__("numpy").random.default_rng(4)
    n = 1 << 20
    data = bytes(rng.integers(97, 123, n, dtype=__import__("numpy").uint8))
    comp = compress(data, quality=5, lgwin=16)
    sd = StreamDecoder()
    out = bytearray()
    for i in range(0, len(comp), 4096):
        out += sd.decompress(comp[i:i + 4096])
    out += sd.finish()
    assert bytes(out) == data
    # retained history is window + slack, not the whole 1MiB output
    assert len(sd._out._buf) <= (1 << 16) + 4096


def test_stream_compress_session_compaction():
    """The persistent parse session compacts its buffer back to the
    retained window when it fills; compaction points must keep the
    stream valid (distances crossing the compaction boundary stay
    window-legal) for ours AND the upstream decoder."""
    data = (load("alice29.txt") + load("asyoulik.txt")) * 4  # ~1.1 MB
    c = Compressor(quality=9, lgwin=16, chunk_size=1 << 13)
    out = bytearray()
    for i in range(0, len(data), 1 << 13):
        out += c.process(data[i:i + (1 << 13)])
    out += c.finish()
    assert decompress(bytes(out)) == data
    if oracle.available():
        assert oracle.decompress(bytes(out),
                                 max_size_hint=len(data)) == data


def test_stream_compress_ratio_near_oneshot():
    """Chunked streaming must stay within 0.5% of one-shot size at the
    greedy tiers (the persistent session carries exact cross-chunk
    match context; regression: per-chunk table rebuilds with strided
    prefix priming cost ~0.9%)."""
    data = (load("alice29.txt") + load("random_then_unicode")
            + load("asyoulik.txt"))
    for q in (5, 9):
        one = compress(data, quality=q)
        c = Compressor(quality=q, chunk_size=1 << 16)
        out = bytearray()
        for i in range(0, len(data), 1 << 16):
            out += c.process(data[i:i + (1 << 16)])
        out += c.finish()
        assert decompress(bytes(out)) == data
        assert len(out) <= len(one) * 1.005, (q, len(out), len(one))
