"""Encoder round-trip and capability tests.

Mirrors the reference's test strategy (SURVEY.md §4): round-trip is the
universal oracle — every quality, every fixture, decoded both by our own
decoder and by the upstream C library (bit-exact stream validity).
Reference: src/enc/test.rs oneshot tests, src/bin/integration_tests.rs
total_roundtrip_helper.
"""

import os

import numpy as np
import pytest

from brotli_tpu import compress, decompress
from brotli_tpu.encode.encoder import make_uncompressed_stream
from brotli_tpu.encode.params import EncoderParams

from . import oracle
from .conftest import TESTDATA

FIXTURES = [
    "alice29.txt", "asyoulik.txt", "10x10y", "aaabaaaa", "64x",
    "monkey", "quickfox_repeated", "ukkonooa", "backward65536",
    "random_org_10k.bin", "empty", "xyzzy", "quickfox",
]


def load(name):
    with open(os.path.join(TESTDATA, name), "rb") as f:
        return f.read()


@pytest.mark.parametrize("name", FIXTURES)
@pytest.mark.parametrize("quality", [1, 5, 9, 11])
def test_roundtrip_self(name, quality):
    data = load(name)
    out = compress(data, quality=quality)
    assert decompress(out) == data


@pytest.mark.parametrize("name", ["alice29.txt", "asyoulik.txt", "monkey",
                                  "random_org_10k.bin", "quickfox_repeated"])
@pytest.mark.parametrize("quality", [5, 9, 11])
def test_roundtrip_upstream_oracle(name, quality):
    if not oracle.available():
        pytest.skip("system brotli unavailable")
    data = load(name)
    out = compress(data, quality=quality)
    assert oracle.decompress(out, max_size_hint=len(data) + 64) == data


@pytest.mark.parametrize("quality", [1, 5, 9, 11])
def test_window_sizes(quality):
    data = load("alice29.txt")
    for lgwin in (10, 16, 18, 22, 24):
        out = compress(data, quality=quality, lgwin=lgwin)
        assert decompress(out) == data


def test_size_competitive_q9():
    """Compressed size should be within 10% of the C engine at q9
    (north-star: <= reference; gap closes with context modeling)."""
    if not oracle.available():
        pytest.skip("system brotli unavailable")
    data = load("alice29.txt")
    ours = len(compress(data, quality=9))
    ref = len(oracle.compress(data, quality=9))
    assert ours <= ref * 1.10, (ours, ref)


def test_incompressible_bounded():
    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    out = compress(data, quality=9)
    assert len(out) <= len(data) + 16
    assert decompress(out) == data


def test_empty_input():
    out = compress(b"")
    assert decompress(out) == b""
    assert len(out) <= 2


def test_tiny_inputs():
    for k in range(1, 40):
        data = bytes(range(k))
        out = compress(data, quality=9)
        assert decompress(out) == data


def test_uncompressed_stream():
    data = load("alice29.txt")
    p = EncoderParams(quality=9).sanitize(len(data))
    out = make_uncompressed_stream(np.frombuffer(data, np.uint8), p)
    assert decompress(out) == data
    if oracle.available():
        assert oracle.decompress(out, max_size_hint=len(data)) == data


def test_custom_dictionary_roundtrip():
    data = load("alice29.txt")
    d, body = data[:50000], data[50000:]
    out = compress(body, quality=9, custom_dictionary=d)
    assert decompress(out, custom_dictionary=d) == body
    # dictionary must actually help
    assert len(out) < len(compress(body, quality=9))


def test_custom_dictionary_wrong_dict_differs():
    data = load("alice29.txt")
    d, body = data[:50000], data[50000:]
    out = compress(body, quality=9, custom_dictionary=d)
    try:
        got = decompress(out, custom_dictionary=bytes(50000))
        assert got != body
    except Exception:
        pass  # failing outright is also acceptable


@pytest.mark.parametrize("quality", [5, 11])
def test_appendable_stream_is_prefix(quality):
    """Appendable streams lack ISLAST; appending an empty-last block makes
    them decodable (reference README 'Stream Concatenation')."""
    data = load("asyoulik.txt")
    out = compress(data, quality=quality, appendable=True, byte_align=True)
    finished = bytes(out) + b"\x03"  # empty last metablock, byte-aligned
    assert decompress(finished) == data
    if oracle.available():
        assert oracle.decompress(finished, max_size_hint=len(data)) == data


def test_catable_plus_appendable_concat():
    """Simple concatenation path (reference README 'Stream
    Concatenation'): '-bare -appendable' first + '-bare -catable' rest
    + literal 0x03 terminator decodes to the concatenation."""
    a = load("alice29.txt")[:40000]
    b = load("asyoulik.txt")[:40000]
    first = compress(a, quality=9, appendable=True, bare=True,
                     byte_align=True)
    second = compress(b, quality=9, catable=True, byte_align=True,
                      bare=True)
    joined = bytes(first) + bytes(second) + b"\x03"
    assert decompress(joined) == a + b
    if oracle.available():
        assert oracle.decompress(joined, max_size_hint=len(a) + len(b)) \
            == a + b


def test_magic_number_header():
    data = load("quickfox")
    out = compress(data, quality=9, magic_number=True)
    assert decompress(out) == data


@pytest.mark.parametrize("quality", [5, 9])
def test_large_window(quality):
    data = load("alice29.txt") * 2
    out = compress(data, quality=quality, large_window=True, lgwin=26)
    assert decompress(out, large_window=True) == data


def test_all_byte_values():
    data = bytes(range(256)) * 64
    out = compress(data, quality=9)
    assert decompress(out) == data
    assert len(out) < 1200  # highly repetitive


def test_deterministic():
    data = load("alice29.txt")
    assert compress(data, quality=9) == compress(data, quality=9)


def test_multi_metablock_large_input():
    """Inputs spanning several metablocks exercise boundary breaking,
    cache carry, and per-segment serialization."""
    base = load("alice29.txt") + load("asyoulik.txt")
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, 1 << 18, dtype=np.uint8).tobytes()
    data = (base * 24)[: 5 << 20] + noise
    for q in (1, 5, 9):
        out = compress(data, quality=q)
        assert decompress(out) == data
    if oracle.available():
        assert oracle.decompress(out, max_size_hint=len(data) + 64) == data


def test_q9_5_family():
    """The 9.5 pseudo-quality: greedy match finding + full metablock
    optimization (reference encode.rs:2064-2111)."""
    data = load("alice29.txt")
    out95 = compress(data, quality=10, q9_5=True)
    assert decompress(out95) == data
    out9 = compress(data, quality=9)
    out11 = compress(data, quality=11)
    # 9.5 sits between q9 and q11 in both effort and size
    assert len(out11) <= len(out95) <= len(out9) * 1.02
    if oracle.available():
        assert oracle.decompress(out95, max_size_hint=len(data)) == data


def test_golden_sizes():
    """Compression-ratio regression pins, EXACT like the reference's
    alice q10/q11 goldens (integration_tests.rs:404-418): the encoder
    is deterministic, so any byte drift is a real behavior change and
    must be re-pinned deliberately (reference goldens for comparison:
    q10 = 47,488; q11 = 46,493)."""
    from brotli_tpu import native_bridge as _nb
    if not _nb.available():
        pytest.skip("goldens pin the native production path")
    data = load("alice29.txt")
    # C engine at the same qualities: q5 52,809 / q9 51,054 — both
    # greedy tiers beat it (q5 re-pinned twice in round 4: first the
    # L2-resident 2^16x8 compact-ring geometry, then the k=7/n_cache=4
    # re-sweep — -12% row scan for +91 bytes on alice, still beats C)
    assert len(compress(data, quality=5)) == 52_266
    assert len(compress(data, quality=9)) == 51_046
    # q10 default runs ONE refinement iteration on the top-K rows (the
    # reference maps one-shot q10 to the 9.5 tier, encode.rs:1470) —
    # still beats C's q10 golden (47,488); q10_deep keeps the full
    # 2-iteration q11-architecture refinement
    # re-pinned in round 4: the q10 fast tier runs the narrow start
    # queue (+16% speed for +33 bytes on alice; still beats C's 47,488)
    assert len(compress(data, quality=10)) == 46_976
    assert len(compress(data, quality=10, q10_deep=True)) == 46_080
    # beats the reference's own q11 golden (46,493) since the exact
    # sorted-output dictionary index restored full transform coverage.
    # re-pinned in round 5: Q11_ITERS 5 -> 3 (+51 bytes on alice for
    # ~40% less wall time; BROTLI_TPU_Q11_ITERS=5 restores 45,907)
    assert len(compress(data, quality=11)) == 45_958
    # the 9.5 family: -q9.5y (quality 12) runs one refinement deeper
    # than -q9.5x (quality 11) and produces distinct output
    # (reference bin/brotli.rs:658-680)
    x = compress(data, quality=11, q9_5=True)
    y = compress(data, quality=12, q9_5=True)
    assert x != y and len(y) <= len(x)


def test_lgblock_changes_metablock_spans():
    """-l / lgblock bounds each metablock's input (reference
    ComputeLgBlock, encode.rs:570-589): an explicit small lgblock must
    change the emitted stream and still round-trip."""
    import numpy as np
    rng = np.random.default_rng(7)
    # compressible text-ish data large enough for >1 metablock at lgblock=16
    data = bytes(rng.integers(97, 110, 1 << 17, dtype=np.uint8))
    default = compress(data, quality=9)
    small = compress(data, quality=9, lgblock=16)
    assert decompress(small) == data
    assert small != default  # two metablocks vs one


def test_dual_parse_large_input():
    """The dual-session parse (>= 2MiB ring-tier inputs: two parse
    workers over half-metablocks with insert-primed rings) must
    round-trip, stay within a whisker of the serial parse's size, and
    remain upstream-decodable; small inputs and explicit small
    metablocks take it per metablock."""
    import os
    import numpy as np
    from brotli_tpu import compress, decompress
    rng = np.random.default_rng(11)
    words = [bytes(rng.integers(97, 123, rng.integers(3, 9),
                                dtype=np.uint8)) for _ in range(300)]
    idx = rng.zipf(1.4, size=1 << 19) % len(words)
    data = b" ".join(words[int(i)] for i in idx)[:5 << 19]  # 2.5 MiB
    for q in (5, 9):
        for lgblock in (0, 20):
            out = compress(data, quality=q, lgblock=lgblock)
            assert decompress(out) == data
            os.environ["BROTLI_TPU_DUAL_PARSE"] = "0"
            try:
                ser = compress(data, quality=q, lgblock=lgblock)
            finally:
                del os.environ["BROTLI_TPU_DUAL_PARSE"]
            assert len(out) <= len(ser) * 1.005


def test_q10_large_metablock_deterministic():
    """The overlapped q10 chunked DP carries state across chunk calls;
    at a 4 MiB metablock its node-cache buffer crosses the scratch
    pool's size cap, where pooling would silently hand each chunk a
    fresh uninitialized buffer (round-5 review finding).  Determinism
    at this size pins the caller-held-state fix."""
    from brotli_tpu import compress, decompress
    base = load("alice29.txt") + load("asyoulik.txt")
    data = (base * 18)[: (4 << 20) + (1 << 18)]  # > one 4 MiB metablock
    a = compress(data, quality=10)
    b = compress(data, quality=10)
    assert a == b
    assert decompress(a) == data
