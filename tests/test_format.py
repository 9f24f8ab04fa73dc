"""Format-layer unit tests: bit IO, tables, prefix codes, huffman."""

import numpy as np
import pytest

from brotli_tpu.core import constants as C
from brotli_tpu.core.bitio import BitReader, BitWriter, NeedsMoreInput
from brotli_tpu.core.huffman import build_huffman_lengths
from brotli_tpu.core.prefix import (
    PrefixDecoder, check_complete, encoding_table, lengths_to_codes,
    read_prefix_code, write_prefix_code,
)


def test_bitio_roundtrip():
    rng = np.random.default_rng(0)
    w = BitWriter()
    items = []
    for _ in range(2000):
        n = int(rng.integers(0, 25))
        v = int(rng.integers(0, 1 << n)) if n else 0
        items.append((v, n))
        w.write(v, n)
    r = BitReader(w.getvalue())
    for v, n in items:
        assert r.read(n) == v


def test_bitio_needs_more():
    r = BitReader(b"\x01")
    assert r.read(8) == 1
    with pytest.raises(NeedsMoreInput):
        r.read(1)


def test_append_packed_aligned_and_unaligned():
    rng = np.random.default_rng(1)
    for initial_bits in range(0, 9):
        w = BitWriter()
        w.write((1 << initial_bits) - 1, initial_bits)
        total_bits = int(rng.integers(1, 200))
        words = rng.integers(0, 1 << 63, size=(total_bits + 63) // 64,
                             dtype=np.uint64)
        w.append_packed(words, total_bits)
        r = BitReader(w.getvalue())
        assert r.read(initial_bits) == (1 << initial_bits) - 1
        for k in range(total_bits):
            expect = int(words[k // 64] >> (k % 64)) & 1
            assert r.read(1) == expect, (initial_bits, k)


def test_insert_copy_code_tables():
    # Spot checks against RFC section 5 ranges.
    assert C.get_insert_length_code(0) == 0
    assert C.get_insert_length_code(5) == 5
    assert C.get_insert_length_code(6) == 6
    assert C.get_insert_length_code(130) == 16
    assert C.get_insert_length_code(22594) == 23
    assert C.get_copy_length_code(2) == 0
    assert C.get_copy_length_code(9) == 7
    assert C.get_copy_length_code(10) == 8
    assert C.get_copy_length_code(2118) == 23
    # base+extra reconstruct the length
    for il in [0, 1, 5, 6, 7, 8, 100, 1000, 22593, 22594, 100000]:
        code = int(C.get_insert_length_code(il))
        assert C.INSERT_BASE[code] <= il
        assert il - C.INSERT_BASE[code] < (1 << C.INSERT_EXTRA[code])
    for cl in [2, 3, 9, 10, 127, 2117, 2118, 16000000]:
        code = int(C.get_copy_length_code(cl))
        assert C.COPY_BASE[code] <= cl
        assert cl - C.COPY_BASE[code] < (1 << C.COPY_EXTRA[code])


def test_command_code_mapping_inverse():
    # combine_length_codes must invert the CMD_TO_* tables.
    for cmd in range(704):
        ic = int(C.CMD_TO_INSERT_CODE[cmd])
        cc = int(C.CMD_TO_COPY_CODE[cmd])
        imp = bool(C.CMD_IMPLICIT_DIST0[cmd])
        back = int(C.combine_length_codes(ic, cc, imp))
        assert back == cmd, (cmd, ic, cc, imp, back)


def test_distance_code_inverse():
    rng = np.random.default_rng(2)
    for npostfix in range(4):
        for ndirect_q in [0, 1, 5, 15]:
            ndirect = ndirect_q << npostfix
            dists = rng.integers(ndirect + 1, 1 << 24, size=500)
            sym, extra, nbits = C.encode_distance(dists, npostfix, ndirect)
            assert (sym >= 16 + ndirect).all()
            back = C.decode_distance(sym, npostfix, ndirect, extra)
            assert (back == dists).all()
            assert (C.num_distance_extra_bits(sym, npostfix, ndirect)
                    == nbits).all()
            assert (extra >= 0).all()
            assert (extra < (1 << nbits)).all()


def test_block_len_codes():
    for bl in [1, 4, 5, 16624, 16625, 1 << 20]:
        code = int(C.get_block_length_code(bl))
        assert C.BLOCK_LEN_BASE[code] <= bl
        assert bl - C.BLOCK_LEN_BASE[code] < (1 << C.BLOCK_LEN_EXTRA[code])


def test_huffman_lengths_complete_and_limited():
    rng = np.random.default_rng(3)
    for n, max_bits in [(18, 5), (256, 15), (704, 15), (26, 15)]:
        for trial in range(20):
            hist = rng.integers(0, 1000, size=n)
            hist[rng.random(n) < 0.6] = 0
            if hist.sum() == 0:
                hist[0] = 1
            lengths = build_huffman_lengths(hist, max_bits=max_bits)
            assert lengths.max() <= max_bits
            assert check_complete(lengths)
            assert ((lengths > 0) == (hist > 0)).all() or \
                (hist > 0).sum() == 1
    # skewed distribution forcing the depth limit
    hist = (2 ** np.arange(30)).astype(np.int64)
    lengths = build_huffman_lengths(hist, max_bits=15)
    assert lengths.max() <= 15 and check_complete(lengths)


def test_prefix_code_wire_roundtrip():
    rng = np.random.default_rng(4)
    for alphabet in [8, 26, 256, 704, 520]:
        for trial in range(25):
            hist = rng.integers(0, 100, size=alphabet)
            hist[rng.random(alphabet) < rng.random()] = 0
            if (hist > 0).sum() == 0:
                hist[int(rng.integers(alphabet))] = 5
            lengths = build_huffman_lengths(hist)
            w = BitWriter()
            write_prefix_code(w, lengths)
            w.write(0x2A, 6)  # trailing sentinel
            r = BitReader(w.getvalue())
            got = read_prefix_code(r, alphabet)
            assert r.read(6) == 0x2A, (alphabet, trial)
            assert (got == lengths).all(), (alphabet, trial)


def test_prefix_decode_symbols():
    rng = np.random.default_rng(5)
    hist = rng.integers(1, 50, size=40)
    lengths = build_huffman_lengths(hist)
    codes, emit = encoding_table(lengths)
    dec = PrefixDecoder(lengths)
    syms = rng.integers(0, 40, size=300)
    w = BitWriter()
    for s in syms:
        w.write(int(codes[s]), int(emit[s]))
    r = BitReader(w.getvalue())
    for s in syms:
        assert dec.decode(r) == s


def test_single_symbol_code():
    lengths = np.zeros(256, dtype=np.int64)
    lengths[42] = 1
    w = BitWriter()
    write_prefix_code(w, lengths)
    r = BitReader(w.getvalue())
    got = read_prefix_code(r, 256)
    dec = PrefixDecoder(got)
    assert dec.decode(r) == 42  # reads zero bits


def test_window_bits_roundtrip():
    from brotli_tpu.decode.decoder import _read_window_bits
    for lgwin in range(10, 25):
        if lgwin == 16:
            continue
        bits, n = C.encode_window_bits(lgwin)
        r = BitReader(int.to_bytes(bits, 4, "little"))
        assert _read_window_bits(r, False) == lgwin
    bits, n = C.encode_window_bits(16)
    assert (bits, n) == (0, 1)
    for lgwin in [10, 18, 28, 30]:
        bits, n = C.encode_window_bits(lgwin, large_window=True)
        r = BitReader(int.to_bytes(bits, 4, "little"))
        assert _read_window_bits(r, True) == lgwin


def test_context_lut_sanity():
    # UTF8 mode: 'e' after 'h' (lowercase after lowercase) context
    assert C.CONTEXT_LUT0.shape == (4, 256)
    assert (C.literal_context(C.CONTEXT_LSB6, np.arange(256), 0)
            == np.arange(256) % 64).all()
    assert (C.literal_context(C.CONTEXT_MSB6, np.arange(256), 0)
            == np.arange(256) // 4).all()
    assert C.CONTEXT_LUT0[C.CONTEXT_UTF8].max() < 64
    # signed mode: ctx = (class(p1) << 3) | class(p2), classes 0..7
    assert C.CONTEXT_LUT1[C.CONTEXT_SIGNED].max() == 7
    assert C.CONTEXT_LUT0[C.CONTEXT_SIGNED].max() == 7 << 3


def test_dictionary_words():
    from brotli_tpu.core.dictionary import get_dictionary
    d = get_dictionary()
    assert d.num_words(4) > 0
    assert d.word(4, 0) != b""
    # "the " style common words should exist at some small index
    words = [d.word(4, i) for i in range(16)]
    assert all(len(w) == 4 for w in words)
    out = d.resolve(5, 0)  # first 5-letter word, identity transform
    assert len(out) >= 1
