"""Decoder tests: upstream fixtures, oracle round-trips at all qualities.

Fixture decodes pin compatibility with google/brotli-produced streams
(same oracle strategy as reference src/bin/integration_tests.rs).
"""

import os

import pytest

from brotli_tpu.decode.decoder import decompress, BrotliDecodeError
from .conftest import TESTDATA, fixture_path
from . import oracle

FIXTURES = [
    "64x", "alice29.txt", "asyoulik.txt", "backward65536",
    "compressed_file", "compressed_repeated", "empty", "quickfox",
    "quickfox_repeated", "random_then_unicode", "ukkonooa", "monkey",
]


def read(name):
    with open(fixture_path(name), "rb") as f:
        return f.read()


@pytest.mark.parametrize("name", [n for n in FIXTURES
                                  if os.path.exists(
                                      fixture_path(n + ".compressed"))])
def test_fixture_decodes(name):
    compressed = read(name + ".compressed")
    expected = read(name)
    assert decompress(compressed) == expected


@pytest.mark.parametrize("nn", [f"{i:02d}" for i in range(19)])
def test_empty_variants(nn):
    path = fixture_path(f"empty.compressed.{nn}")
    if not os.path.exists(path):
        pytest.skip("missing fixture")
    with open(path, "rb") as f:
        data = f.read()
    assert decompress(data) == b""


@pytest.mark.parametrize("nn", ["00", "01", "02", "03"])
def test_x_variants(nn):
    path = fixture_path(f"x.compressed.{nn}")
    if not os.path.exists(path):
        pytest.skip("missing fixture")
    with open(path, "rb") as f:
        data = f.read()
    assert decompress(data) == read("x")


@pytest.mark.parametrize("quality", list(range(12)))
@pytest.mark.parametrize("name", ["alice29.txt", "backward65536",
                                  "random_then_unicode", "monkey",
                                  "aaabaaaa", "10x10y", "ukkonooa"])
def test_oracle_encoded_roundtrip(quality, name):
    if not oracle.available():
        pytest.skip("no system brotli")
    data = read(name)
    compressed = oracle.compress(data, quality=quality, lgwin=22)
    assert decompress(compressed) == data


@pytest.mark.parametrize("lgwin", [10, 14, 18, 24])
def test_oracle_windows(lgwin):
    if not oracle.available():
        pytest.skip("no system brotli")
    data = read("asyoulik.txt")
    compressed = oracle.compress(data, quality=9, lgwin=lgwin)
    assert decompress(compressed) == data


def test_truncated_input_fails():
    compressed = read("alice29.txt.compressed")
    from brotli_tpu.core.bitio import NeedsMoreInput
    with pytest.raises((BrotliDecodeError, NeedsMoreInput)):
        decompress(compressed[:len(compressed) // 2])


def test_garbage_fails():
    with pytest.raises((BrotliDecodeError, Exception)):
        decompress(b"\x13\x37" * 50)


def test_nonzero_final_padding_rejected():
    """RFC 7932 §9.2: bits after the last metablock up to the byte
    boundary must be zero — the reference decoder rejects them (the
    one-byte stream 0xFF parses as wbits=24 + ISLASTEMPTY with 1s in
    the padding).  Trailing garbage BYTES stay tolerated."""
    if not oracle.available():
        pytest.skip("system brotli unavailable")
    # bare ISLASTEMPTY with dirty padding
    with pytest.raises(Exception):
        decompress(b"\xff")
    # dirty padding after a real final metablock
    payload = read("alice29.txt")
    comp = bytearray(oracle.compress(payload, quality=5))
    comp[-1] ^= 0x80
    with pytest.raises(Exception):
        decompress(bytes(comp))
    # zero padding + trailing garbage bytes: still accepted
    good = oracle.compress(payload, quality=5)
    assert decompress(good + b"\x00junk") == payload
    # native facade agrees
    from brotli_tpu import native_bridge as nb
    if nb.available():
        import ctypes
        lib = nb.get_lib()
        out = ctypes.create_string_buffer(len(payload) + 64)
        sz = ctypes.c_size_t(len(payload) + 64)
        bad = bytes(comp)
        r = lib.BrotliDecoderDecompress(
            ctypes.c_size_t(len(bad)), bad, ctypes.byref(sz), out)
        assert r != 1


def test_c_engine_mode_matrix():
    """Decoder conformance across the C engine's quality/mode/window
    matrix (text/font context modes, all window encodings)."""
    import ctypes

    try:
        enc = ctypes.CDLL("libbrotlienc.so.1")
    except OSError:
        import pytest
        pytest.skip("system brotli unavailable")
    with open(fixture_path("alice29.txt"), "rb") as f:
        data = f.read()

    def c_compress(payload, quality, lgwin, mode):
        enc.BrotliEncoderCompress.restype = ctypes.c_int
        ms = len(payload) + (len(payload) >> 2) + 1024
        out = ctypes.create_string_buffer(ms)
        osz = ctypes.c_size_t(ms)
        assert enc.BrotliEncoderCompress(quality, lgwin, mode,
                                         len(payload), payload,
                                         ctypes.byref(osz), out)
        return out.raw[:osz.value]

    from brotli_tpu import decompress
    for q in (0, 2, 6, 11):
        for mode in (0, 1, 2):
            for lgwin in (10, 24):
                comp = c_compress(data, q, lgwin, mode)
                assert decompress(comp) == data, (q, mode, lgwin)
