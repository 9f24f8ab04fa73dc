#!/usr/bin/env python
"""Extract RFC 7932 format data tables into brotli_tpu/data/.

Brotli's wire format depends on fixed data tables specified by RFC 7932:
  - the 122,784-byte static dictionary (RFC 7932 Appendix A)
  - the 121 word transforms (RFC 7932 Appendix B)
  - the literal context lookup tables (RFC 7932 Section 7.1)

These are *format constants*: every conforming implementation must embed
byte-identical copies.  We extract the dictionary and transforms from the
system libbrotlicommon (exported via BrotliGetDictionary/BrotliGetTransforms,
see google/brotli common/dictionary.h and common/transform.h), and the
context LUTs from the RFC data tables.  Outputs are committed binary files
under brotli_tpu/data/ so the framework has no runtime dependency on either
source.

Run from the repo root:  python tools/extract_tables.py
"""

import ctypes
import hashlib
import os
import re
import sys

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "brotli_tpu", "data")

LIBS = [
    "libbrotlicommon.so.1",
    "/usr/lib/x86_64-linux-gnu/libbrotlicommon.so.1",
]


class BrotliDictionaryStruct(ctypes.Structure):
    # Mirrors google/brotli common/dictionary.h (struct BrotliDictionary).
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


class BrotliTransformsStruct(ctypes.Structure):
    # Mirrors google/brotli common/transform.h (struct BrotliTransforms).
    _fields_ = [
        ("prefix_suffix_size", ctypes.c_uint16),
        ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
        ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
        ("num_transforms", ctypes.c_uint32),
        ("transforms", ctypes.POINTER(ctypes.c_uint8)),
        ("params", ctypes.POINTER(ctypes.c_uint8)),
        ("cutOffTransforms", ctypes.c_int16 * 10),
    ]


def load_lib():
    for name in LIBS:
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    raise SystemExit("libbrotlicommon not found")


def extract_dictionary(lib):
    lib.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionaryStruct)
    d = lib.BrotliGetDictionary().contents
    assert d.data_size == 122784, d.data_size
    data = ctypes.string_at(d.data, d.data_size)
    size_bits = bytes(d.size_bits_by_length[:25])
    offsets = np.ctypeslib.as_array(d.offsets_by_length)[:25].copy()
    return data, size_bits, offsets


def extract_transforms(lib):
    lib.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransformsStruct)
    t = lib.BrotliGetTransforms().contents
    n = t.num_transforms
    assert n == 121, n
    blob = ctypes.string_at(t.prefix_suffix, t.prefix_suffix_size)
    triplets = ctypes.string_at(t.transforms, 3 * n)
    pmap = [t.prefix_suffix_map[i] for i in range(256)]

    def string_at(idx):
        # prefix_suffix blob stores length-prefixed strings; the map gives
        # the offset of the length byte.
        off = pmap[idx]
        n = blob[off]
        return blob[off + 1:off + 1 + n]

    prefixes, types, suffixes = [], [], []
    for i in range(n):
        p_id, ttype, s_id = triplets[3 * i], triplets[3 * i + 1], triplets[3 * i + 2]
        assert ttype <= 20, ttype
        prefixes.append(string_at(p_id))
        types.append(ttype)
        suffixes.append(string_at(s_id))
    return prefixes, types, suffixes


def verify_transforms(lib, prefixes, types, suffixes, dict_data):
    """Cross-check extracted transforms with BrotliTransformDictionaryWord."""
    lib.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransformsStruct)
    t = lib.BrotliGetTransforms()
    fn = lib.BrotliTransformDictionaryWord
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                   ctypes.POINTER(BrotliTransformsStruct), ctypes.c_int]

    def ferment(buf, i):
        c = buf[i]
        if c < 192:
            if ord('a') <= c <= ord('z'):
                buf[i] = c ^ 32
            return 1
        elif c < 224:
            if i + 1 < len(buf):
                buf[i + 1] ^= 32
            return 2
        else:
            if i + 2 < len(buf):
                buf[i + 2] ^= 5
            return 3

    def apply_py(word, idx):
        p, ty, s = prefixes[idx], types[idx], suffixes[idx]
        w = bytearray(word)
        if 12 <= ty <= 20:  # OmitFirstN
            w = w[ty - 11:]
        elif 1 <= ty <= 9:  # OmitLastN
            w = w[:max(0, len(w) - ty)] if len(w) > ty else bytearray()
        if ty == 10:  # UppercaseFirst
            if w:
                ferment(w, 0)
        elif ty == 11:  # UppercaseAll
            i = 0
            while i < len(w):
                i += ferment(w, i)
        return bytes(p) + bytes(w) + bytes(s)

    words = [dict_data[100:110], dict_data[5000:5024], b"testword", b"\xc3\xa9abc"]
    buf = ctypes.create_string_buffer(64)
    for word in words:
        for idx in range(121):
            m = fn(buf, word, len(word), t, idx)
            got = buf.raw[:m]
            want = apply_py(word, idx)
            assert got == want, (idx, word, got, want)


RUST_ARRAY_RE = r"static\s+{name}\s*:\s*\[[^\]]+\]\s*=\s*\[(.*?)\];"


def parse_rust_array(src, name):
    m = re.search(RUST_ARRAY_RE.format(name=name), src, re.S)
    assert m, name
    body = re.sub(r"//[^\n]*", "", m.group(1))
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    vals = [int(x) for x in re.findall(r"-?\d+", body)]
    return np.array(vals)


def extract_context_lut():
    """RFC 7932 section 7.1 literal context lookup table (4 modes x 512).

    Extracted from the RFC data table as embedded in the reference tree
    (reference/src/enc/constants.rs kContextLookup) — pure format data.
    Layout: for mode m, LUT0 = table[512*m : 512*m+256] (indexed by p1)
    and LUT1 = table[512*m+256 : 512*(m+1)] (indexed by p2);
    context = LUT0[p1] | LUT1[p2].
    """
    path = "/root/reference/src/enc/constants.rs"
    with open(path) as f:
        src = f.read()
    lut = parse_rust_array(src, "kContextLookup").astype(np.uint8)
    assert lut.shape == (2048,)
    # Sanity: LSB6 mode (0): ctx = p1 & 0x3f ; MSB6 (1): ctx = p1 >> 2.
    assert (lut[:256] == (np.arange(256) & 0x3F)).all()
    assert (lut[256:512] == 0).all()
    assert (lut[512:768] == (np.arange(256) >> 2)).all()
    return lut


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    lib = load_lib()

    dict_data, size_bits, offsets = extract_dictionary(lib)
    with open(os.path.join(OUT_DIR, "dictionary.bin"), "wb") as f:
        f.write(dict_data)
    np.savez(
        os.path.join(OUT_DIR, "dictionary_meta.npz"),
        size_bits_by_length=np.frombuffer(size_bits, dtype=np.uint8),
        offsets_by_length=offsets.astype(np.uint32),
    )
    print("dictionary.bin sha256:", hashlib.sha256(dict_data).hexdigest())

    prefixes, types, suffixes = extract_transforms(lib)
    verify_transforms(lib, prefixes, types, suffixes, dict_data)
    # Store transforms as fixed-width byte arrays + lengths.
    maxp = max(len(p) for p in prefixes)
    maxs = max(len(s) for s in suffixes)
    parr = np.zeros((121, maxp), dtype=np.uint8)
    sarr = np.zeros((121, maxs), dtype=np.uint8)
    plen = np.zeros(121, dtype=np.int32)
    slen = np.zeros(121, dtype=np.int32)
    for i, (p, s) in enumerate(zip(prefixes, suffixes)):
        parr[i, :len(p)] = np.frombuffer(p, dtype=np.uint8)
        sarr[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
        plen[i], slen[i] = len(p), len(s)
    np.savez(
        os.path.join(OUT_DIR, "transforms.npz"),
        prefix=parr, prefix_len=plen, suffix=sarr, suffix_len=slen,
        type=np.array(types, dtype=np.uint8),
    )
    print("transforms: 121 verified against BrotliTransformDictionaryWord")

    lut = extract_context_lut()
    np.save(os.path.join(OUT_DIR, "context_lut.npy"), lut)
    print("context_lut.npy written (2048 bytes)")


if __name__ == "__main__":
    sys.exit(main())
