"""C ABI tests: the native .so exports a google/brotli-compatible
surface a C program can link against (reference surface
c/brotli/encode.h:256-457, decode.h:146-330; demo drivers c/brotli.c,
c/multiexample.c).

Covers: ctypes calls into the public ABI, the compiled C demo driver
(links the .so, round-trips one-shot + streaming + workpool-multi),
and cross-validation of C-ABI streams against the package decoder and
the upstream C oracle.
"""

import ctypes
import os
import subprocess

import pytest

from brotli_tpu import decompress, native_bridge as nb

from . import oracle
from .conftest import TESTDATA

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(not nb.available(),
                                reason="native runtime unavailable")


def load(name):
    with open(os.path.join(TESTDATA, name), "rb") as f:
        return f.read()


def lib():
    return nb.get_lib()


def test_encoder_compress_abi_roundtrip():
    L = lib()
    data = load("alice29.txt")
    cap = int(L.BrotliEncoderMaxCompressedSize(ctypes.c_size_t(len(data))))
    assert cap > len(data)
    enc = ctypes.create_string_buffer(cap)
    esz = ctypes.c_size_t(cap)
    ok = L.BrotliEncoderCompress(
        9, 22, 0, ctypes.c_size_t(len(data)), data,
        ctypes.byref(esz), enc)
    assert ok == 1
    out = enc.raw[:esz.value]
    assert decompress(out) == data
    if oracle.available():
        assert oracle.decompress(out, max_size_hint=len(data)) == data


def test_decoder_decompress_abi():
    L = lib()
    data = load("alice29.txt")
    comp = load("alice29.txt.compressed")
    dec = ctypes.create_string_buffer(len(data) + 16)
    dsz = ctypes.c_size_t(len(data) + 16)
    r = L.BrotliDecoderDecompress(ctypes.c_size_t(len(comp)), comp,
                                  ctypes.byref(dsz), dec)
    assert r == 1  # SUCCESS
    assert dec.raw[:dsz.value] == data


def test_workpool_compress_multi_abi():
    L = lib()
    data = load("asyoulik.txt") * 4
    pool = L.BrotliEncoderCreateWorkPool(ctypes.c_size_t(3), None, None,
                                         None)
    assert pool
    keys = (ctypes.c_uint32 * 2)(1, 2)    # QUALITY, LGWIN (ref ids)
    vals = (ctypes.c_uint32 * 2)(9, 22)
    cap = int(L.BrotliEncoderMaxCompressedSize(ctypes.c_size_t(len(data))))
    enc = ctypes.create_string_buffer(cap)
    esz = ctypes.c_size_t(cap)
    ok = L.BrotliEncoderCompressWorkPool(
        pool, ctypes.c_size_t(2), keys, vals,
        ctypes.c_size_t(len(data)), data, ctypes.byref(esz), enc,
        ctypes.c_size_t(4))
    assert ok == 1
    out = enc.raw[:esz.value]
    assert decompress(out) == data
    if oracle.available():
        assert oracle.decompress(out, max_size_hint=len(data)) == data
    # ratio guard: a key/quality mismatch once made shards silently run
    # at q0/lgwin9 (1.34x size) while every round-trip stayed green —
    # sharding overhead at q9 must stay within a few % of single-stream
    from brotli_tpu import compress as _compress
    single = _compress(data, quality=9)
    assert len(out) <= int(len(single) * 1.05), \
        (len(out), len(single))
    L.BrotliEncoderDestroyWorkPool(pool)


def test_c_demo_links_and_roundtrips(tmp_path):
    """A C program compiles against include/brotli_tpu.h, links the
    .so, and round-trips (the reference's c/ demo drivers analog)."""
    so = os.path.join(REPO, "native", "libbrotli_tpu_native.so")
    assert os.path.exists(so)
    demo = tmp_path / "c_demo"
    r = subprocess.run(
        ["gcc", os.path.join(REPO, "examples", "c_demo.c"),
         "-I" + os.path.join(REPO, "include"), so, "-o", str(demo)],
        capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()
    r = subprocess.run([str(demo),
                        os.path.join(TESTDATA, "alice29.txt"), "7"],
                       capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()
    assert b"OK" in r.stdout


def test_abi_quality_levels_and_small_inputs():
    L = lib()
    for data in (b"", b"a", b"abcabcabcabc" * 100, load("monkey")):
        for q in (1, 5, 9, 11):
            cap = int(L.BrotliEncoderMaxCompressedSize(
                ctypes.c_size_t(len(data)))) + 64
            enc = ctypes.create_string_buffer(cap)
            esz = ctypes.c_size_t(cap)
            ok = L.BrotliEncoderCompress(
                q, 22, 0, ctypes.c_size_t(len(data)), data,
                ctypes.byref(esz), enc)
            assert ok == 1, (len(data), q)
            assert decompress(enc.raw[:esz.value]) == data


def test_standalone_ctypes_binding():
    """bindings/py/brotli_ctypes.py (the reference c/py/brotli.py
    analog) works without importing the brotli_tpu package."""
    import importlib.util
    path = os.path.join(REPO, "bindings", "py", "brotli_ctypes.py")
    spec = importlib.util.spec_from_file_location("brotli_ctypes", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    data = load("asyoulik.txt")
    one = mod.compress(data, quality=9)
    assert mod.decompress(one) == data
    multi = mod.compress(data * 3, quality=9, num_threads=4)
    assert mod.decompress(multi) == data * 3


def test_capi_zopfli_tier():
    """q10/q11 through the C ABI run the native optimal parse
    (zopfli_hq.cpp), matching the Python pipeline's quality — not the
    q9 tier this ABI used to cap at."""
    L = lib()
    data = load("alice29.txt")
    from brotli_tpu import compress
    sizes = {}
    for q in (9, 10, 11):
        enc = ctypes.create_string_buffer(len(data) + 1024)
        esz = ctypes.c_size_t(len(data) + 1024)
        ok = L.BrotliEncoderCompress(
            q, 22, 0, ctypes.c_size_t(len(data)), data,
            ctypes.byref(esz), enc)
        assert ok == 1
        out = enc.raw[:esz.value]
        assert decompress(out) == data
        if oracle.available():
            assert oracle.decompress(out, max_size_hint=len(data)) == data
        sizes[q] = esz.value
    assert sizes[11] < sizes[10] < sizes[9]
    # within 0.5% of the Python q11 pipeline (same candidate
    # architecture; exact dict index shared)
    py11 = len(compress(data, quality=11))
    assert sizes[11] <= py11 * 1.005


def test_sorted_dict_index_native_matches_python():
    """The native sorted-index builder must emit exactly the rows the
    numpy oracle builds (the q10/q11 family and the C ABI both price
    dictionary candidates from it)."""
    import numpy as np
    import brotli_tpu.encode.static_dict as sd
    native = nb.sorted_dict_index_native()
    assert native is not None
    sb, s_len, s_wire, s_wid = native
    m = len(s_len)
    assert m > 1_000_000
    # spot-check a deterministic sample of rows against the oracle's
    # build (full rebuild of the numpy index takes ~9s; sampled rows
    # via the expanded index's sort is equally exact but cheap enough)
    rng = np.random.default_rng(42)
    idx = rng.integers(0, m, 64)
    # rows must be sorted by (padded bytes, length) and deduped
    for i in sorted(idx.tolist())[:8]:
        if i + 1 < m:
            a = bytes(sb[i]) + bytes([s_len[i]])
            b = bytes(sb[i + 1]) + bytes([s_len[i + 1]])
            assert a < b
    # every sampled row must reproduce through the transform oracle
    from brotli_tpu.core.dictionary import apply_transform
    d = sd.get_dictionary()
    data = np.frombuffer(d.data, dtype=np.uint8)
    for i in idx.tolist():
        L = int(s_wire[i])
        bits = int(d.size_bits_by_length[L])
        wid = int(s_wid[i])
        t, widx = wid >> bits, wid & ((1 << bits) - 1)
        off = int(d.offsets_by_length[L]) + widx * L
        word = bytes(data[off:off + L])
        out = apply_transform(d, word, t)
        assert len(out) == int(s_len[i])
        assert bytes(sb[i][:len(out)]) == out


def test_capi_zopfli_fuzz_roundtrip():
    """Randomized inputs through the C-ABI q10/q11 tier: text-ish,
    binary, repetitive, tiny, and empty inputs must all round-trip
    through both decoders."""
    import numpy as np
    from brotli_tpu import decompress
    L = lib()
    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"a",
        b"abcd" * 3,
        bytes(rng.integers(0, 256, 10000, dtype=np.uint8)),       # random
        bytes(rng.integers(97, 105, 30000, dtype=np.uint8)),      # text-ish
        (b"0123456789abcdef" * 64 + b"X") * 40,                   # repetitive
        load("random_then_unicode")[:50000],
    ]
    for q in (10, 11):
        for data in cases:
            enc = ctypes.create_string_buffer(len(data) + 4096)
            esz = ctypes.c_size_t(len(data) + 4096)
            ok = L.BrotliEncoderCompress(
                q, 22, 0, ctypes.c_size_t(len(data)), data,
                ctypes.byref(esz), enc)
            assert ok == 1, (q, len(data))
            out = enc.raw[:esz.value]
            assert decompress(out) == data, (q, len(data))
            if oracle.available():
                assert oracle.decompress(
                    out, max_size_hint=len(data) + 64) == data


def test_capi_zopfli_catable_and_custom_dict():
    """q11 through the one-shot extension with catable shaping and a
    custom LZ77 dictionary (the CompressMulti shard shapes)."""
    from brotli_tpu import decompress
    L = lib()
    L.BrotliTpuEncodeOneshot.restype = ctypes.c_int
    alice = load("alice29.txt")
    out = ctypes.create_string_buffer(len(alice) + 4096)
    osz = ctypes.c_size_t(len(alice) + 4096)
    ok = L.BrotliTpuEncodeOneshot(
        11, 22, 0, 1, 0, 0, 0, None, ctypes.c_size_t(0),
        ctypes.c_size_t(len(alice)), alice, ctypes.byref(osz), out)
    assert ok == 1
    assert decompress(out.raw[:osz.value]) == alice
    d, body = alice[:30000], alice[30000:90000]
    osz = ctypes.c_size_t(len(body) + 4096)
    ok = L.BrotliTpuEncodeOneshot(
        11, 22, 0, 0, 0, 0, 0, d, ctypes.c_size_t(len(d)),
        ctypes.c_size_t(len(body)), body, ctypes.byref(osz), out)
    assert ok == 1
    assert decompress(out.raw[:osz.value], custom_dictionary=d) == body


def test_capi_streaming_decode_incremental():
    """The native BrotliDecoderDecompressStream is metablock-resumable:
    byte-at-a-time feeding emits output incrementally (not all at the
    end), drains through small output windows, and the retained-window
    state keeps cross-metablock back-references correct."""
    import numpy as np
    from brotli_tpu import compress
    L = lib()
    L.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    rng = np.random.default_rng(3)
    # 3 metablocks at lgblock 16, with long-range matches across them
    base = bytes(rng.integers(97, 110, 1 << 15, dtype=np.uint8))
    data = base + bytes(rng.integers(97, 110, 1 << 16, dtype=np.uint8)) + base
    comp = compress(data, quality=9, lgblock=16)

    st = ctypes.c_void_p(L.BrotliDecoderCreateInstance(None, None, None))
    out = bytearray()
    emitted_before_end = False
    i = 0
    chunk = 997  # prime-sized feeds, byte-ish granularity
    obuf = ctypes.create_string_buffer(4096)
    while True:
        feed = comp[i:i + chunk]
        i += len(feed)
        avail_in = ctypes.c_size_t(len(feed))
        next_in = ctypes.c_char_p(bytes(feed))
        # cast to uint8** via c_void_p indirection
        pin = ctypes.cast(next_in, ctypes.POINTER(ctypes.c_uint8))
        ppin = ctypes.pointer(pin)
        while True:
            avail_out = ctypes.c_size_t(len(obuf))
            pout = ctypes.cast(obuf, ctypes.POINTER(ctypes.c_uint8))
            ppout = ctypes.pointer(pout)
            total = ctypes.c_size_t(0)
            r = L.BrotliDecoderDecompressStream(
                st, ctypes.byref(avail_in), ppin,
                ctypes.byref(avail_out), ppout, ctypes.byref(total))
            got = len(obuf) - avail_out.value
            if got:
                out += obuf.raw[:got]
            assert r != 0, "decoder error"
            if r == 3:  # NEEDS_MORE_OUTPUT: drain again
                continue
            break
        if i < len(comp) and len(out):
            emitted_before_end = True
        if r == 1:  # SUCCESS
            break
        assert r == 2  # NEEDS_MORE_INPUT
        assert i < len(comp), "decoder stuck at end of input"
    assert bytes(out) == data
    assert emitted_before_end, "no incremental output before input end"
    assert L.BrotliDecoderIsFinished(st) == 1
    L.BrotliDecoderDestroyInstance(st)


def test_capi_streaming_decode_corrupt():
    """Corrupt input through the streaming ABI reports ERROR."""
    from brotli_tpu import compress
    L = lib()
    L.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    comp = bytearray(compress(load("alice29.txt"), quality=9))
    comp[len(comp) // 2] ^= 0xFF
    comp[len(comp) // 2 + 1] ^= 0xFF
    st = ctypes.c_void_p(L.BrotliDecoderCreateInstance(None, None, None))
    buf = ctypes.create_string_buffer(1 << 20)
    avail_in = ctypes.c_size_t(len(comp))
    pin = ctypes.cast(ctypes.c_char_p(bytes(comp)),
                      ctypes.POINTER(ctypes.c_uint8))
    ppin = ctypes.pointer(pin)
    saw_error = False
    for _ in range(64):
        avail_out = ctypes.c_size_t(len(buf))
        pout = ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8))
        r = L.BrotliDecoderDecompressStream(
            st, ctypes.byref(avail_in), ppin,
            ctypes.byref(avail_out), ctypes.pointer(pout), None)
        if r == 0:
            saw_error = True
            break
        if r == 1:
            break
    # flipping bits mid-stream must not produce a clean SUCCESS with
    # different content silently; either ERROR or (rarely) the bits
    # land in literals and the stream still decodes to other content
    if not saw_error:
        assert L.BrotliDecoderGetErrorCode(st) == 0
    else:
        assert L.BrotliDecoderGetErrorCode(st) != 0
    L.BrotliDecoderDestroyInstance(st)


def test_capi_streaming_decode_bounded_memory():
    """Bounded-memory validation (reference 'manual memory management'
    operation mode analog): drip-feeding a 192MiB-output stream through
    the streaming ABI must keep peak RSS far below the output size —
    the state retains only the window + one metablock + input tail."""
    import subprocess
    import sys

    import tempfile

    from brotli_tpu import compress

    # highly repetitive 192MiB -> tiny stream (encoded in the parent:
    # encode scratch would dominate the child's RSS measurement)
    data = (b"0123456789abcdef" * 63 + b"\n") * (192 * 1024)
    comp = compress(data, quality=5)
    del data
    tf = tempfile.NamedTemporaryFile(suffix=".br", delete=False)
    tf.write(comp)
    tf.close()

    code = r"""
import ctypes, sys
sys.path.insert(0, %r)
from brotli_tpu import native_bridge as nb

comp = open(%r, "rb").read()
L = nb.get_lib()
L.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
st = ctypes.c_void_p(L.BrotliDecoderCreateInstance(None, None, None))
obuf = ctypes.create_string_buffer(1 << 20)
total = 0
i = 0
r = 2
while r != 1:
    feed = comp[i:i + 4096]
    i += len(feed)
    avail_in = ctypes.c_size_t(len(feed))
    pin = ctypes.cast(ctypes.c_char_p(bytes(feed)),
                      ctypes.POINTER(ctypes.c_uint8))
    while True:
        avail_out = ctypes.c_size_t(len(obuf))
        pout = ctypes.cast(obuf, ctypes.POINTER(ctypes.c_uint8))
        r = L.BrotliDecoderDecompressStream(
            st, ctypes.byref(avail_in), ctypes.pointer(pin),
            ctypes.byref(avail_out), ctypes.pointer(pout), None)
        assert r != 0
        total += len(obuf) - avail_out.value
        if r != 3:
            break
assert total == 192 * 1024 * 1009, total
# VmHWM, not ru_maxrss: maxrss inherits the fork parent's peak
peak_kb = int(open("/proc/self/status").read()
              .split("VmHWM:")[1].split()[0])
peak_mb = peak_kb / 1024
# window(4MiB) + metablock(16MiB) + table arena(32MiB) + python/jax
# baseline; the 192MiB output must NOT be resident
assert peak_mb < 700, peak_mb
print("OK peak_rss_mb=%%.0f" %% peak_mb)
""" % (REPO, tf.name)
    r = subprocess.run([__import__("sys").executable, "-c", code],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_capi_streaming_encode_incremental_and_flush():
    """The native BrotliEncoderCompressStream emits output
    incrementally (per metablock-sized chunk, not all at FINISH), and
    FLUSH produces a byte-aligned prefix that decodes everything fed
    so far (reference compress_stream contract)."""
    from brotli_tpu import decompress
    from brotli_tpu.decode.stream import StreamDecoder
    L = lib()
    L.BrotliEncoderCreateInstance.restype = ctypes.c_void_p

    data = load("alice29.txt") * 16  # ~2.4MiB, > 2 chunks at q5
    es = ctypes.c_void_p(L.BrotliEncoderCreateInstance(None, None, None))
    L.BrotliEncoderSetParameter(es, 1, 5)  # QUALITY=5 (google ids)
    obuf = ctypes.create_string_buffer(1 << 20)
    out = bytearray()

    def pump(op, chunk):
        avail_in = ctypes.c_size_t(len(chunk))
        pin = ctypes.cast(ctypes.c_char_p(bytes(chunk)),
                          ctypes.POINTER(ctypes.c_uint8))
        while True:
            avail_out = ctypes.c_size_t(len(obuf))
            pout = ctypes.cast(obuf, ctypes.POINTER(ctypes.c_uint8))
            assert L.BrotliEncoderCompressStream(
                es, op, ctypes.byref(avail_in), ctypes.pointer(pin),
                ctypes.byref(avail_out), ctypes.pointer(pout), None) == 1
            out.extend(obuf.raw[:len(obuf) - avail_out.value])
            if avail_in.value == 0 and avail_out.value > 0:
                break

    half = len(data) // 2
    pump(0, data[:half])           # PROCESS
    emitted_mid = len(out)
    assert emitted_mid > 0, "no incremental output from PROCESS"
    pump(1, b"")                   # FLUSH: decodable prefix
    sd = StreamDecoder()
    assert sd.decompress(bytes(out)) == data[:half]
    pump(0, data[half:])
    pump(2, b"")                   # FINISH
    assert L.BrotliEncoderIsFinished(es)
    assert decompress(bytes(out)) == data
    if oracle.available():
        assert oracle.decompress(bytes(out),
                                 max_size_hint=len(data) + 64) == data
    L.BrotliEncoderDestroyInstance(es)


def test_capi_prealloc_encode_zero_alloc():
    """BrotliEncoderCompressPrealloc (reference stack-allocator /
    seccomp mode, combined_alloc.rs:33-57): after
    BrotliEncoderPreallocWarmup, a compress call using ONLY the
    caller's scratch arena performs ZERO heap allocations —
    mallinfo2-gated, not just RSS — and its stream decodes through
    both our decoder and the upstream C library."""
    from brotli_tpu import decompress
    L = lib()
    libc = ctypes.CDLL(None)

    class MallInfo2(ctypes.Structure):
        _fields_ = [(n, ctypes.c_size_t) for n in
                    ("arena", "ordblks", "smblks", "hblks", "hblkhd",
                     "usmblks", "fsmblks", "uordblks", "fordblks",
                     "keepcost")]
    try:
        libc.mallinfo2.restype = MallInfo2
    except AttributeError:
        pytest.skip("mallinfo2 unavailable")

    data = load("asyoulik.txt") * 8  # ~1MB
    L.BrotliEncoderPreallocScratchSizeQ.restype = ctypes.c_size_t
    assert L.BrotliEncoderPreallocWarmup(
        ctypes.c_size_t(len(data))) == 1
    enc = ctypes.create_string_buffer(len(data) + (1 << 16))
    fn = L.BrotliEncoderCompressPrealloc
    c_len = ctypes.c_size_t(len(data))
    import gc
    # round 5: the no-alloc mode covers the ring tiers too (q2-q9
    # session rings + hash scratch + command arrays carved from the
    # caller arena; reference combined_alloc.rs preallocates the
    # whole codec at every quality)
    for q in (1, 3, 5, 9):
        ss = int(L.BrotliEncoderPreallocScratchSizeQ(
            ctypes.c_size_t(len(data)), q))
        scratch = ctypes.create_string_buffer(ss)
        c_ss = ctypes.c_size_t(ss)
        esz = ctypes.c_size_t(len(enc))
        # warm the ctypes call path itself (libffi caches per
        # signature) and this quality's store pools at FULL size —
        # the pools size by content, so the steady state is reached
        # after one same-shape call (the reference's no-alloc contract
        # is steady-state after its StackAllocator warmup too)
        fn(q, 22, 0, c_len, data, ctypes.byref(esz), enc, c_ss,
           scratch)
        # measure ONLY the raw foreign call: pytest's assertion
        # rewriting allocates Python objects, so no Python work sits
        # in the window
        # allow a couple of settle iterations: allocator pool
        # boundaries shift with the suite's prior heap history, so
        # the STEADY state (zero delta) may need one extra call
        deltas = []
        for _ in range(5):
            gc.disable()
            try:
                esz.value = len(enc)
                before = libc.mallinfo2().uordblks
                ok = fn(q, 22, 0, c_len, data, ctypes.byref(esz),
                        enc, c_ss, scratch)
                after = libc.mallinfo2().uordblks
            finally:
                gc.enable()
            assert ok == 1, f"q{q} prealloc compress failed"
            deltas.append(after - before)
            if after == before:
                break
        assert deltas[-1] == 0, (
            f"q{q} allocated {deltas} bytes across settle calls")
        blob = enc.raw[:esz.value]
        assert decompress(blob) == data
        if oracle.available():
            assert oracle.decompress(blob,
                                     max_size_hint=len(data)) == data


def test_capi_streaming_encode_tiny_output_buffer_drain():
    """The streaming encoder hands out output in ARBITRARY caller
    buffer sizes — a 4 KiB output buffer drains a multi-metablock
    stream mid-metablock, many calls per metablock, and the result is
    byte-identical to a large-buffer run (reference
    compress_stream/take_output contract, encode.rs:2873-3006).
    Internal memory stays O(window + metablock), matching the
    reference's ringbuffer bound."""
    from brotli_tpu import decompress
    L = lib()
    L.BrotliEncoderCreateInstance.restype = ctypes.c_void_p
    data = load("alice29.txt") * 16

    def run(bufsize):
        es = ctypes.c_void_p(
            L.BrotliEncoderCreateInstance(None, None, None))
        L.BrotliEncoderSetParameter(es, 1, 5)  # QUALITY
        obuf = ctypes.create_string_buffer(bufsize)
        out = bytearray()
        calls = 0

        def pump(op, chunk):
            nonlocal calls
            avail_in = ctypes.c_size_t(len(chunk))
            pin = ctypes.cast(ctypes.c_char_p(bytes(chunk)),
                              ctypes.POINTER(ctypes.c_uint8))
            while True:
                avail_out = ctypes.c_size_t(bufsize)
                pout = ctypes.cast(obuf, ctypes.POINTER(ctypes.c_uint8))
                assert L.BrotliEncoderCompressStream(
                    es, op, ctypes.byref(avail_in), ctypes.pointer(pin),
                    ctypes.byref(avail_out), ctypes.pointer(pout),
                    None) == 1
                calls += 1
                out.extend(obuf.raw[:bufsize - avail_out.value])
                if avail_in.value == 0 and avail_out.value > 0:
                    break

        pump(0, data)
        pump(2, b"")  # FINISH
        assert L.BrotliEncoderIsFinished(es)
        L.BrotliEncoderDestroyInstance(es)
        return bytes(out), calls

    small, n_small = run(4096)
    big, _ = run(1 << 22)
    assert small == big
    # a q5 metablock is ~100KB+ compressed here: the 4KiB buffer must
    # have drained each metablock across MANY calls
    assert n_small > len(small) // 4096
    assert decompress(small) == data


def test_capi_streaming_decode_header_edge_fixtures():
    """The upstream header-edge fixtures (metadata blocks, window
    codes, ISLASTEMPTY forms) must decode byte-at-a-time through the
    streaming ABI exactly like one-shot."""
    import glob
    L = lib()
    L.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    fixtures = sorted(glob.glob(os.path.join(TESTDATA, "empty.compressed*")))
    fixtures += sorted(glob.glob(os.path.join(TESTDATA, "x.compressed*")))
    assert len(fixtures) >= 20
    for path in fixtures:
        comp = open(path, "rb").read()
        want = (b"" if os.path.basename(path).startswith("empty")
                else b"X")
        st = ctypes.c_void_p(
            L.BrotliDecoderCreateInstance(None, None, None))
        out = bytearray()
        obuf = ctypes.create_string_buffer(64)
        r = 2
        i = 0
        while r != 1:
            feed = comp[i:i + 1]
            i += len(feed)
            avail_in = ctypes.c_size_t(len(feed))
            pin = ctypes.cast(ctypes.c_char_p(bytes(feed)),
                              ctypes.POINTER(ctypes.c_uint8))
            while True:
                avail_out = ctypes.c_size_t(len(obuf))
                pout = ctypes.cast(obuf, ctypes.POINTER(ctypes.c_uint8))
                r = L.BrotliDecoderDecompressStream(
                    st, ctypes.byref(avail_in), ctypes.pointer(pin),
                    ctypes.byref(avail_out), ctypes.pointer(pout), None)
                out += obuf.raw[:len(obuf) - avail_out.value]
                assert r != 0, path
                if r != 3:
                    break
            if r == 2 and i >= len(comp):
                raise AssertionError(f"{path}: stuck needing input")
        assert bytes(out) == want, path
        L.BrotliDecoderDestroyInstance(st)


def test_capi_streaming_decode_large_window():
    """BROTLI_DECODER_PARAM_LARGE_WINDOW must be honored by the
    streaming ABI (lgwin 26 stream)."""
    from brotli_tpu import compress
    L = lib()
    L.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    data = load("alice29.txt")
    comp = compress(data, quality=9, lgwin=26, large_window=True)
    st = ctypes.c_void_p(L.BrotliDecoderCreateInstance(None, None, None))
    L.BrotliDecoderSetParameter(st, 1, 1)   # LARGE_WINDOW
    buf = ctypes.create_string_buffer(len(data) + 64)
    avail_in = ctypes.c_size_t(len(comp))
    pin = ctypes.cast(ctypes.c_char_p(bytes(comp)),
                      ctypes.POINTER(ctypes.c_uint8))
    avail_out = ctypes.c_size_t(len(buf))
    pout = ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8))
    r = L.BrotliDecoderDecompressStream(
        st, ctypes.byref(avail_in), ctypes.pointer(pin),
        ctypes.byref(avail_out), ctypes.pointer(pout), None)
    assert r == 1, r
    assert buf.raw[:len(buf) - avail_out.value] == data
    L.BrotliDecoderDestroyInstance(st)
    # without the parameter the stream must be rejected, not misread
    st2 = ctypes.c_void_p(L.BrotliDecoderCreateInstance(None, None, None))
    avail_in = ctypes.c_size_t(len(comp))
    pin = ctypes.cast(ctypes.c_char_p(bytes(comp)),
                      ctypes.POINTER(ctypes.c_uint8))
    avail_out = ctypes.c_size_t(len(buf))
    pout = ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8))
    r = L.BrotliDecoderDecompressStream(
        st2, ctypes.byref(avail_in), ctypes.pointer(pin),
        ctypes.byref(avail_out), ctypes.pointer(pout), None)
    assert r == 0
    L.BrotliDecoderDestroyInstance(st2)


def _abi_stream_encode(L, data, params):
    es = ctypes.c_void_p(
        L.BrotliEncoderCreateInstance(None, None, None))
    for k, v in params:
        L.BrotliEncoderSetParameter(es, k, v)
    out = bytearray()
    obuf = ctypes.create_string_buffer(1 << 20)
    for op, chunk in ((0, data), (2, b"")):
        avail_in = ctypes.c_size_t(len(chunk))
        pin = ctypes.cast(ctypes.c_char_p(bytes(chunk)),
                          ctypes.POINTER(ctypes.c_uint8))
        while True:
            avail_out = ctypes.c_size_t(len(obuf))
            pout = ctypes.cast(obuf, ctypes.POINTER(ctypes.c_uint8))
            assert L.BrotliEncoderCompressStream(
                es, op, ctypes.byref(avail_in), ctypes.pointer(pin),
                ctypes.byref(avail_out), ctypes.pointer(pout),
                None) == 1
            out.extend(obuf.raw[:len(obuf) - avail_out.value])
            if avail_in.value == 0 and avail_out.value > 0:
                break
    assert L.BrotliEncoderIsFinished(es)
    L.BrotliEncoderDestroyInstance(es)
    return bytes(out)


def test_capi_streaming_encode_catable_concatenates():
    """Facade-encoded appendable + catable streams must concatenate
    losslessly (catable implies appendable shaping — no ISLAST on
    content blocks)."""
    from brotli_tpu import concatenate, decompress
    L = lib()
    L.BrotliEncoderCreateInstance.restype = ctypes.c_void_p

    a = load("alice29.txt")
    b = load("asyoulik.txt")
    first = _abi_stream_encode(L, a, [(1, 9), (168, 1)])   # appendable
    second = _abi_stream_encode(L, b, [(1, 9), (167, 1)])  # catable
    joined = concatenate([first, second])
    assert decompress(joined) == a + b


def test_capi_magic_number_parameter():
    """BROTLI_PARAM_MAGIC_NUMBER (169) emits the Dropbox magic-number
    metadata header (reference BrotliWriteMetadataMetaBlock,
    brotli_bit_stream.rs:2869); decoders skip metadata, so the stream
    stays valid for both our decoder and the upstream C oracle."""
    from brotli_tpu import decompress
    L = lib()
    L.BrotliEncoderCreateInstance.restype = ctypes.c_void_p

    data = load("alice29.txt")
    out = _abi_stream_encode(L, data, [(1, 5), (169, 1),
                                       (5, len(data))])
    # stream header is <= 2 bytes, the aligned magic follows
    assert b"\xe1\x97\x80\x01" in out[:8]
    assert decompress(out) == data
    if oracle.available():
        assert oracle.decompress(out, max_size_hint=len(data)) == data
    # plain encode of the same input carries no magic
    plain = _abi_stream_encode(L, data, [(1, 5)])
    assert b"\xe1\x97" not in plain[:8]
    assert len(out) > len(plain)


class _BroccoliState(ctypes.Structure):
    _fields_ = [("unused", ctypes.c_void_p),
                ("data", ctypes.c_ubyte * 248)]


class _DecoderReturnInfo(ctypes.Structure):
    _fields_ = [("decoded_size", ctypes.c_size_t),
                ("error", ctypes.c_char * 256),
                ("result", ctypes.c_int32),
                ("code", ctypes.c_int32)]


def _broccoli_concat(L, streams, window=0):
    """Drive the Broccoli C ABI (reference ffi/broccoli.rs:56-156)."""
    L.BroccoliCreateInstance.restype = _BroccoliState
    L.BroccoliCreateInstanceWithWindowSize.restype = _BroccoliState
    L.BroccoliConcatStream.restype = ctypes.c_int32
    L.BroccoliConcatFinish.restype = ctypes.c_int32
    st = (L.BroccoliCreateInstanceWithWindowSize(ctypes.c_uint8(window))
          if window else L.BroccoliCreateInstance())
    out = bytearray()
    obuf = ctypes.create_string_buffer(1 << 16)
    try:
        for s in streams:
            L.BroccoliNewBrotliFile(ctypes.byref(st))
            ain = ctypes.c_size_t(len(s))
            inp = ctypes.cast(ctypes.c_char_p(bytes(s)),
                              ctypes.POINTER(ctypes.c_uint8))
            while True:
                aout = ctypes.c_size_t(len(obuf))
                optr = ctypes.cast(obuf, ctypes.POINTER(ctypes.c_uint8))
                r = L.BroccoliConcatStream(
                    ctypes.byref(st), ctypes.byref(ain),
                    ctypes.byref(inp), ctypes.byref(aout),
                    ctypes.byref(optr))
                out += obuf.raw[:len(obuf) - aout.value]
                if r != 2:  # not NeedsMoreOutput
                    if r not in (0, 1):
                        return r, bytes(out)
                    break
        while True:
            aout = ctypes.c_size_t(len(obuf))
            optr = ctypes.cast(obuf, ctypes.POINTER(ctypes.c_uint8))
            r = L.BroccoliConcatFinish(ctypes.byref(st),
                                       ctypes.byref(aout),
                                       ctypes.byref(optr))
            out += obuf.raw[:len(obuf) - aout.value]
            if r != 2:
                return r, bytes(out)
    finally:
        L.BroccoliDestroyInstance(st)


def test_broccoli_abi_matches_python_engine():
    """The compiled Broccoli surface produces byte-identical output to
    the Python BroCatli engine and the result decodes (reference
    src/ffi/broccoli.rs:56-156, c/brotli/broccoli.h)."""
    from brotli_tpu import compress
    from brotli_tpu.concat.brocatli import concatenate
    L = lib()
    a = load("alice29.txt")
    b = load("asyoulik.txt")
    c1 = compress(a, quality=5, appendable=True)
    c2 = compress(b, quality=9, catable=True)
    c3 = compress(a[:30000], quality=2, catable=True)
    r, got = _broccoli_concat(L, [c1, c2, c3])
    assert r == 0
    assert got == concatenate([c1, c2, c3])
    assert decompress(got) == a + b + a[:30000]
    # window-size constructor (all-catable form)
    r, got2 = _broccoli_concat(L, [c2, c3], window=22)
    assert r == 0
    assert got2 == concatenate([c2, c3], window_size=22)
    assert decompress(got2) == b + a[:30000]
    # rejection: a plain (non-shaped) stream cannot be concatenated
    plain = compress(b, quality=5)
    r, _ = _broccoli_concat(L, [c1, plain])
    assert r == 127  # BroccoliBrotliFileNotCraftedForConcatenation


def test_decoder_return_info_and_prealloc():
    """BrotliDecoderDecompressWithReturnInfo / DecompressPrealloc in
    the compiled ABI (reference c/brotli/decode.h:223-240); prealloc
    decodes with zero library-side allocation (caller scratch only)."""
    from brotli_tpu import compress
    L = lib()
    L.BrotliDecoderDecompressWithReturnInfo.restype = _DecoderReturnInfo
    L.BrotliDecoderDecompressWithReturnInfo.argtypes = [
        ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p]
    L.BrotliDecoderDecompressPrealloc.restype = _DecoderReturnInfo
    L.BrotliDecoderDecompressPrealloc.argtypes = [
        ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_size_t, ctypes.c_void_p]
    a = load("asyoulik.txt")
    comp = compress(a, quality=9)
    dec = ctypes.create_string_buffer(len(a) + 64)
    info = L.BrotliDecoderDecompressWithReturnInfo(
        len(comp), ctypes.c_char_p(bytes(comp)), len(dec), dec)
    assert info.result == 1 and info.code == 1
    assert dec.raw[:info.decoded_size] == a
    scratch = (ctypes.c_uint32 * (1 << 23))()
    info = L.BrotliDecoderDecompressPrealloc(
        len(comp), ctypes.c_char_p(bytes(comp)), len(dec), dec,
        0, None, 1 << 23, scratch, 0, None)
    assert info.result == 1
    assert dec.raw[:info.decoded_size] == a
    # error paths carry a message and a negative/None-success code
    bad = bytes(comp[:10]) + b"\xff" * 30
    info = L.BrotliDecoderDecompressWithReturnInfo(
        len(bad), ctypes.c_char_p(bad), len(dec), dec)
    assert info.result != 1 and info.error
    # undersized scratch is rejected, not crashed
    tiny = (ctypes.c_uint32 * 16)()
    info = L.BrotliDecoderDecompressPrealloc(
        len(comp), ctypes.c_char_p(bytes(comp)), len(dec), dec,
        0, None, 16, tiny, 0, None)
    assert info.result == 0 and info.code < 0


def test_go_binding_compiles_and_passes(tmp_path):
    """Runs `go test` on bindings/go when a Go toolchain exists —
    the reference ships a full Go binding (c/go/brotli/brotli.go) with
    reader/writer/multi/broccoli surfaces; ours mirrors it over the
    compiled C ABI.  Skipped (with reason) when `go` is absent."""
    import shutil
    go = shutil.which("go")
    if go is None:
        import pytest as _pytest
        _pytest.skip("no Go toolchain in this image; the same ABI "
                     "surface is exercised from C (examples/c_demo.c) "
                     "and ctypes (this file)")
    gosrc = os.path.join(REPO, "bindings", "go")
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = os.path.join(REPO, "native")
    r = subprocess.run([go, "test", "."], cwd=gosrc, env=env,
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()


def test_streaming_decoder_mid_metablock_delivery():
    """The ABI streaming decoder resumes at ANY input byte (reference
    BrotliDecompressStream contract, ffi/decompressor.rs:4-180): a
    single large metablock fed in small chunks must deliver output
    long before its input completes (the round-2 facade buffered until
    the metablock boundary), and the undigested state stays O(window),
    not O(compressed metablock)."""
    from brotli_tpu import compress
    L = lib()
    L.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    base = load("alice29.txt") * 40  # ~6 MB, one metablock at lgblock 24
    comp = compress(base, quality=5, lgblock=24)
    st = ctypes.c_void_p(L.BrotliDecoderCreateInstance(None, None,
                                                       None))
    try:
        total = bytearray()
        fed = 0
        first_output_at = None
        chunk = 4096
        outbuf = ctypes.create_string_buffer(1 << 20)
        while fed < len(comp):
            piece = bytes(comp[fed:fed + chunk])
            fed += len(piece)
            avail_in = ctypes.c_size_t(len(piece))
            next_in = ctypes.cast(ctypes.c_char_p(piece),
                                  ctypes.POINTER(ctypes.c_uint8))
            while True:
                avail_out = ctypes.c_size_t(len(outbuf))
                next_out = ctypes.cast(outbuf,
                                       ctypes.POINTER(ctypes.c_uint8))
                r = L.BrotliDecoderDecompressStream(
                    st, ctypes.byref(avail_in), ctypes.byref(next_in),
                    ctypes.byref(avail_out), ctypes.byref(next_out),
                    None)
                got = len(outbuf) - avail_out.value
                if got:
                    total += outbuf.raw[:got]
                    if first_output_at is None:
                        first_output_at = fed
                assert r != 0, "decoder error"
                if r != 3:  # not NEEDS_MORE_OUTPUT
                    break
        assert bytes(total) == base
        # output must start while most of the metablock's input is
        # still unseen (mid-metablock delivery)
        assert first_output_at is not None
        assert first_output_at < len(comp) // 4, first_output_at
    finally:
        L.BrotliDecoderDestroyInstance(st)


def _abi_drip_decode(L, comp, chunks, expect_error=False):
    L.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    st = ctypes.c_void_p(L.BrotliDecoderCreateInstance(None, None,
                                                       None))
    total = bytearray()
    outbuf = ctypes.create_string_buffer(1 << 18)
    try:
        pos = 0
        for csz in chunks:
            piece = bytes(comp[pos:pos + csz])
            pos += csz
            avail_in = ctypes.c_size_t(len(piece))
            next_in = ctypes.cast(ctypes.c_char_p(piece),
                                  ctypes.POINTER(ctypes.c_uint8))
            while True:
                avail_out = ctypes.c_size_t(len(outbuf))
                next_out = ctypes.cast(outbuf,
                                       ctypes.POINTER(ctypes.c_uint8))
                r = L.BrotliDecoderDecompressStream(
                    st, ctypes.byref(avail_in), ctypes.byref(next_in),
                    ctypes.byref(avail_out), ctypes.byref(next_out),
                    None)
                got = len(outbuf) - avail_out.value
                if got:
                    total += outbuf.raw[:got]
                if r == 0:
                    assert expect_error, "unexpected decoder error"
                    return None
                if r == 1:
                    return bytes(total)
                if r != 3:
                    break
        return None  # input exhausted, not finished
    finally:
        L.BrotliDecoderDestroyInstance(st)


def test_streaming_decoder_drip_matrix():
    """Byte-at-a-time and random-chunk feeds through the ABI decoder
    reproduce the one-shot output on our streams, the upstream C
    engine's streams, and pre-compressed fixtures (mid-symbol resume,
    reference BrotliDecompressStream)."""
    import random

    from brotli_tpu import compress
    L = lib()
    rng = random.Random(11)
    cases = [
        (compress(load("alice29.txt"), quality=9),
         load("alice29.txt")),
        (load("asyoulik.txt.compressed"), load("asyoulik.txt")),
    ]
    if oracle.available():
        b = load("monkey") * 200
        cases.append((oracle.compress(b, quality=9), b))
    for comp, plain in cases:
        for pat in ("byte", "random"):
            if pat == "byte":
                chunks = [1] * len(comp)
            else:
                chunks, left = [], len(comp)
                while left:
                    c = min(left, rng.choice([1, 3, 7, 100, 4096]))
                    chunks.append(c)
                    left -= c
            got = _abi_drip_decode(L, comp, chunks)
            assert got == plain, (len(comp), pat)


def test_streaming_decoder_corruption_no_crash():
    """Bit-flipped and truncated streams fed byte-at-a-time error (or
    stall awaiting input), never crash or loop."""
    import random

    from brotli_tpu import compress
    L = lib()
    rng = random.Random(13)
    comp = bytearray(compress(load("asyoulik.txt"), quality=9))
    for _ in range(24):
        bad = bytearray(comp)
        bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        _abi_drip_decode(L, bytes(bad), [37] * (len(bad) // 37 + 1),
                         expect_error=True)
    # truncations: every result is "needs more input" or error
    for frac in (0.1, 0.5, 0.9):
        cut = comp[:int(len(comp) * frac)]
        _abi_drip_decode(L, bytes(cut), [101] * (len(cut) // 101 + 1),
                         expect_error=True)


def test_encode_steady_state_allocation_free():
    """After one warmup call, repeated same-shape encodes reuse the
    pooled session scratch and ring tables: steady-state RSS growth
    over 30 iterations stays within noise (the operational analog of
    the reference's preallocated/no-alloc mode,
    declare_stack_allocator_struct! / combined_alloc.rs:33 — the
    decoder side has true prealloc via DecompressPrealloc)."""
    import resource

    from brotli_tpu import compress
    data = (load("alice29.txt") + load("asyoulik.txt"))[: 1 << 20]
    for q in (2, 5, 9):
        compress(data, quality=q)  # warm pools
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    for _ in range(30):
        for q in (2, 5, 9):
            compress(data, quality=q)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # ru_maxrss is KB on Linux; 90 encodes of 1MB must not grow peak
    # RSS by more than a few MB (fresh per-call allocation would add
    # tens of MB of churn here)
    assert rss1 - rss0 < 8 * 1024, (rss0, rss1)


def test_streaming_decoder_large_window():
    """lgwin > 24 streams through the ABI streaming decoder (the
    resumable engine sizes its distance alphabet from the
    LARGE_WINDOW parameter, reference decode.h
    BROTLI_DECODER_PARAM_LARGE_WINDOW)."""
    from brotli_tpu import compress
    L = lib()
    L.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    data = load("alice29.txt") * 3
    comp = compress(data, quality=9, large_window=True, lgwin=26)
    st = ctypes.c_void_p(L.BrotliDecoderCreateInstance(None, None,
                                                       None))
    try:
        L.BrotliDecoderSetParameter(st, 1, 1)  # LARGE_WINDOW on
        total = bytearray()
        outbuf = ctypes.create_string_buffer(1 << 18)
        pos = 0
        while pos < len(comp):
            piece = bytes(comp[pos:pos + 977])
            pos += len(piece)
            avail_in = ctypes.c_size_t(len(piece))
            next_in = ctypes.cast(ctypes.c_char_p(piece),
                                  ctypes.POINTER(ctypes.c_uint8))
            while True:
                avail_out = ctypes.c_size_t(len(outbuf))
                next_out = ctypes.cast(outbuf,
                                       ctypes.POINTER(ctypes.c_uint8))
                r = L.BrotliDecoderDecompressStream(
                    st, ctypes.byref(avail_in), ctypes.byref(next_in),
                    ctypes.byref(avail_out), ctypes.byref(next_out),
                    None)
                got = len(outbuf) - avail_out.value
                if got:
                    total += outbuf.raw[:got]
                assert r != 0
                if r != 3:
                    break
        assert bytes(total) == data
    finally:
        L.BrotliDecoderDestroyInstance(st)


def test_capi_streaming_dirty_final_padding_rejected():
    """RFC 7932 §9.2 through the STREAMING ABI: nonzero padding bits
    after the last metablock must error (the resumable MbDecoder's
    finish sites check alignment like the one-shot loop)."""
    from brotli_tpu import compress
    L = lib()
    L.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    comp = bytearray(compress(load("alice29.txt"), quality=9))
    comp[-1] ^= 0x80  # dirty the final padding bit
    st = ctypes.c_void_p(L.BrotliDecoderCreateInstance(None, None, None))
    buf = ctypes.create_string_buffer(1 << 19)
    avail_in = ctypes.c_size_t(len(comp))
    pin = ctypes.cast(ctypes.c_char_p(bytes(comp)),
                      ctypes.POINTER(ctypes.c_uint8))
    ppin = ctypes.pointer(pin)
    saw_error = False
    for _ in range(64):
        avail_out = ctypes.c_size_t(len(buf))
        pout = ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8))
        r = L.BrotliDecoderDecompressStream(
            st, ctypes.byref(avail_in), ppin,
            ctypes.byref(avail_out), ctypes.pointer(pout), None)
        if r == 0:
            saw_error = True
            break
        if r == 1:
            break
        if avail_in.value == 0 and r == 2:
            break  # would wait forever on more input: also a fail
    assert saw_error, "dirty final padding accepted by streaming ABI"
    L.BrotliDecoderDestroyInstance(st)


def test_capi_uncompressed_fallback_ring_consistency():
    """A metablock that expands past the store bound is stored RAW,
    which leaves the decoder's distance ring untouched — the encoder
    now rolls its ring back too (round-5 review finding; the inner
    store's own incompressibility handling makes the outer fallback
    hard to reach through this surface, so this pins the mixed
    incompressible/compressible multi-metablock behavior broadly
    rather than the exact fallback edge)."""
    import numpy as np
    from brotli_tpu import decompress
    from . import oracle
    L = lib()
    rng = np.random.default_rng(17)
    text = load("alice29.txt")
    # random (falls back raw) then text (uses distance short codes),
    # small lgblock so the boundary splits them into metablocks
    for q in (2, 5, 9):
        for lgb in (16, 18):
            data = (rng.integers(0, 256, 1 << lgb, dtype=np.uint8)
                    .tobytes() + text[: 1 << lgb])
            enc_cap = int(L.BrotliEncoderMaxCompressedSize(
                ctypes.c_size_t(len(data))))
            enc = ctypes.create_string_buffer(enc_cap)
            esz = ctypes.c_size_t(enc_cap)
            assert L.BrotliEncoderCompress(
                q, lgb, 0, ctypes.c_size_t(len(data)), data,
                ctypes.byref(esz), enc) == 1
            blob = enc.raw[:esz.value]
            assert decompress(blob) == data, (q, lgb)
            if oracle.available():
                assert oracle.decompress(
                    blob, max_size_hint=len(data) + 64) == data
