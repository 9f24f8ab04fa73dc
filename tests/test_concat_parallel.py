"""BroCatli concatenation + CompressMulti tests.

Mirrors the reference's test strategy: src/bin/test_broccoli.rs
(concat orders, window mismatch, tiny files, serialization),
src/bin/test_threading.rs (1-16 part round-trips),
src/enc/threading/test.rs (error-path joining).
"""

import numpy as np
import pytest

from brotli_tpu import (BroCatli, compress, compress_multi, concatenate,
                        decompress)
from brotli_tpu.concat.brocatli import BroCatliResult

from . import oracle
from .conftest import TESTDATA


def load(name):
    with open(f"{TESTDATA}/{name}", "rb") as f:
        return f.read()


def test_concat_basic():
    a = load("alice29.txt")[:30000]
    b = load("asyoulik.txt")[:30000]
    s1 = compress(a, quality=9, appendable=True)
    s2 = compress(b, quality=9, catable=True)
    j = concatenate([s1, s2])
    assert decompress(j) == a + b
    if oracle.available():
        assert oracle.decompress(j, max_size_hint=70000) == a + b


def test_concat_many_tiny():
    parts = [b"a", b"bc", b"def", b"x" * 100, b"", b"yz"]
    streams = [compress(parts[0], quality=5, appendable=True)]
    streams += [compress(p, quality=5, catable=True) for p in parts[1:]]
    j = concatenate(streams)
    assert decompress(j) == b"".join(parts)


def test_concat_window_mismatch_rejected():
    a = compress(b"hello" * 100, quality=5, appendable=True, lgwin=18)
    b = compress(b"world" * 100, quality=5, catable=True, lgwin=22)
    with pytest.raises(ValueError, match="WindowSize"):
        concatenate([a, b])


def test_concat_plain_file_rejected():
    """Plain (non-appendable) first file ends with ISLAST content block,
    not the '11' empty-last — BroCatli must reject it."""
    a = compress(b"hello" * 2000, quality=5)  # plain
    b = compress(b"world" * 2000, quality=5, catable=True)
    with pytest.raises(ValueError):
        concatenate([a, b])


def test_concat_serialization_resume():
    a = load("alice29.txt")[:20000]
    b = load("asyoulik.txt")[:20000]
    s1 = compress(a, quality=7, appendable=True)
    s2 = compress(b, quality=7, catable=True)
    bc = BroCatli()
    out = bytearray()
    bc.new_brotli_file()
    bc.stream(s1, out)
    state = bc.serialize_to_buffer()
    bc2 = BroCatli.deserialize_from_buffer(state)
    bc2.new_brotli_file()
    bc2.stream(s2, out)
    assert bc2.finish(out) == BroCatliResult.Success
    assert decompress(bytes(out)) == a + b


def test_concat_corrupt_state_rejected():
    state = bytearray(BroCatli().serialize_to_buffer())
    state[8] = 7  # invalid last_bytes_len
    with pytest.raises(ValueError):
        BroCatli.deserialize_from_buffer(bytes(state))


def test_concat_window_size_constructor():
    a = load("alice29.txt")[:20000]
    s = compress(a, quality=9, catable=True, lgwin=22)
    j = concatenate([s], window_size=22)
    assert decompress(j) == a


def test_bare_byte_align_manual_concat():
    """README 'Stream Concatenation' simple path: -bare -appendable
    first + -bare -catable rest + literal 0x03 terminator."""
    a = load("alice29.txt")[:25000]
    b = load("asyoulik.txt")[:25000]
    f1 = compress(a, quality=9, appendable=True, bare=True,
                  byte_align=True)
    f2 = compress(b, quality=9, catable=True, bare=True, byte_align=True)
    joined = bytes(f1) + bytes(f2) + b"\x03"
    assert decompress(joined) == a + b
    if oracle.available():
        assert oracle.decompress(joined, max_size_hint=60000) == a + b


@pytest.mark.parametrize("parts", [1, 2, 3, 8, 16])
def test_compress_multi_roundtrip(parts):
    data = load("alice29.txt")
    out = compress_multi(data, parts, quality=9)
    assert decompress(out) == data
    if oracle.available():
        assert oracle.decompress(out, max_size_hint=len(data)) == data


def test_compress_multi_size_overhead_bounded():
    """Prefix-dictionary priming keeps cross-shard matches: multi-part
    output stays close to single-part (reference claims lossless-ish
    sharding via dictionary priming, threading/mod.rs:354-366)."""
    data = load("alice29.txt")
    single = len(compress_multi(data, 1, quality=9))
    multi = len(compress_multi(data, 8, quality=9))
    assert multi <= single * 1.03


def test_compress_multi_serial_backend_matches():
    data = load("asyoulik.txt")[:60000]
    a = compress_multi(data, 4, quality=7, backend="thread")
    b = compress_multi(data, 4, quality=7, backend="serial")
    assert a == b  # deterministic across backends


def test_compress_multi_error_propagation():
    """All workers join even when one fails; first error surfaces
    (reference threading/mod.rs:506-533)."""
    from brotli_tpu.parallel import multi

    original = multi.compress_part

    def boom(data, i, n, params):
        if i == 2:
            raise RuntimeError("injected shard failure")
        return original(data, i, n, params)

    multi.compress_part = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            compress_multi(np.zeros(200000, np.uint8).tobytes(), 4,
                           quality=5)
    finally:
        multi.compress_part = original


def test_concat_mixed_quality_streams():
    """Streams produced at different quality tiers concatenate
    losslessly (reference BroCatli is quality-agnostic)."""
    from brotli_tpu import compress, concatenate, decompress
    parts = [load("quickfox") * 20, load("ukkonooa") * 10,
             load("asyoulik.txt")[:30000]]
    streams = [compress(p, quality=q, catable=True)
               for p, q in zip(parts, (1, 5, 11))]
    merged = concatenate(streams)
    assert decompress(merged) == b"".join(parts)
    if oracle.available():
        assert oracle.decompress(
            merged, max_size_hint=sum(map(len, parts))) == b"".join(parts)


def test_compress_multi_process_backend():
    from brotli_tpu import compress_multi, decompress
    data = load("asyoulik.txt")
    out = compress_multi(data, 3, quality=7, backend="process")
    assert decompress(out) == data
    if oracle.available():
        assert oracle.decompress(out, max_size_hint=len(data)) == data


def test_compress_multi_zopfli_tiers():
    """CompressMulti at the optimal-parse tiers: every backend's shards
    run q10/q11 (catable + prefix dictionary) and merge losslessly."""
    from brotli_tpu import compress_multi, decompress

    from . import oracle
    from .conftest import TESTDATA
    import os as _os
    with open(_os.path.join(TESTDATA, "alice29.txt"), "rb") as f:
        data = f.read()
    for q in (10, 11):
        out = compress_multi(data, 3, quality=q, backend="workpool")
        assert decompress(out) == data
        if oracle.available():
            assert oracle.decompress(out,
                                     max_size_hint=len(data) + 64) == data


def test_compress_batch_serving_path():
    """compress_batch: independent payloads encoded concurrently,
    results in input order, first error surfaced after join-all."""
    import numpy as np
    import pytest as _pytest

    from brotli_tpu import compress_batch, decompress

    from .conftest import TESTDATA
    import os as _os
    with open(_os.path.join(TESTDATA, "alice29.txt"), "rb") as f:
        text = f.read()
    rng = np.random.default_rng(4)
    payloads = [text[:50000],
                bytes(rng.integers(0, 256, 30000, dtype=np.uint8)),
                b"", b"x" * 100000]
    outs = compress_batch(payloads, threads=3, quality=9)
    assert [decompress(o) for o in outs] == payloads
    # error propagation: a bad quality raises after all workers drain
    with _pytest.raises(Exception):
        compress_batch([text, object()], threads=2, quality=9)


def test_concat_empty_and_tiny_streams_all_positions():
    """Empty/1-byte payloads in every position (reference
    test_broccoli.rs empty/one_byte/two_byte cases): a pending header
    that never reaches sufficiency is a complete empty-content stream
    and is dropped at the next file / at finish, like the reference's
    finish (concat/mod.rs:581) — shifting it would split its trailing
    '11' across the held byte and fail sanitization."""
    from brotli_tpu import compress, decompress
    from brotli_tpu.concat.brocatli import concatenate
    big = b"the quick brown fox jumps " * 300
    for lgwin in (10, 16, 22):
        for a, b in ((b"", b""), (b"", big), (big, b""), (b"x", b""),
                     (b"", b"y"), (b"a", b"b")):
            c1 = compress(a, quality=5, lgwin=lgwin, appendable=True)
            c2 = compress(b, quality=5, lgwin=lgwin, catable=True)
            out = concatenate([c1, c2])
            assert decompress(out) == a + b, (lgwin, len(a), len(b))
    for mid in (b"", b"z"):
        out = concatenate([compress(big, quality=9, appendable=True),
                           compress(mid, quality=2, catable=True),
                           compress(big[::-1], quality=5, catable=True)])
        assert decompress(out) == big + mid + big[::-1]
