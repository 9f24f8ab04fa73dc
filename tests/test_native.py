"""Native (C++) runtime vs Python-oracle equivalence tests.

The Python implementations are the specification; the native hot loops
and decoder must match them command-for-command / byte-for-byte
(mirrors the reference's hasher equivalence tests,
src/enc/backward_references/test.rs).
"""

import numpy as np
import pytest

from brotli_tpu import compress, native_bridge as nb
from brotli_tpu.decode.decoder import Decoder

from .conftest import TESTDATA

pytestmark = pytest.mark.skipif(not nb.available(),
                                reason="native lib unavailable")


def load(name):
    with open(f"{TESTDATA}/{name}", "rb") as f:
        return f.read()


def test_greedy_walk_matches_python_oracle():
    from brotli_tpu.encode.match import find_best_matches, greedy_parse_py
    data = np.frombuffer(load("alice29.txt"), np.uint8)
    w = (1 << 22) - 16
    bl, bd, bs, isd, bw = find_best_matches(data, w, k=8, k8=4)
    py = greedy_parse_py(data, bl, bd, bs, [70000, len(data)],
                         best_isdict=isd, window_size=w, best_wire=bw)
    nt = nb.greedy_parse(data, bl, bd, bs, [70000, len(data)],
                         best_isdict=isd, window_size=w, best_wire=bw)
    for a, b in zip(py, nt):
        assert list(map(list, a)) == list(map(list, b))


def test_greedy_walk_small_window_matches_python_oracle():
    """Small windows put the +-3 short-code deltas right at the window
    edge (regression: the Python walk emitted an out-of-window distance
    that decodes as a dictionary reference)."""
    from brotli_tpu.encode.match import find_best_matches, greedy_parse_py
    data = np.frombuffer(load("alice29.txt"), np.uint8)
    for lgwin in (10, 14, 16):
        w = (1 << lgwin) - 16
        bl, bd, bs, isd, bw = find_best_matches(data, w, k=1,
                                                bucket_bits=15, k8=0)
        py = greedy_parse_py(data, bl, bd, bs, [70000, len(data)],
                             best_isdict=isd, window_size=w,
                             best_wire=bw)
        nt = nb.greedy_parse(data, bl, bd, bs, [70000, len(data)],
                             best_isdict=isd, window_size=w,
                             best_wire=bw)
        for a, b in zip(py, nt):
            assert list(map(list, a)) == list(map(list, b)), lgwin


def test_resolve_matches_python_oracle():
    import os
    from brotli_tpu.encode.command import resolve_commands
    from brotli_tpu.encode.match import find_best_matches, greedy_parse
    from brotli_tpu.encode.params import DistanceParams
    data = np.frombuffer(load("asyoulik.txt"), np.uint8)
    w = (1 << 22) - 16
    bl, bd, bs, isd, bw = find_best_matches(data, w, k=8, k8=4)
    segs = greedy_parse(data, bl, bd, bs, [len(data)], best_isdict=isd,
                        window_size=w, best_wire=bw)
    ins, cps, dst, adv = segs[0]
    dp = DistanceParams(npostfix=1, ndirect=8)
    native_cmds, nc = resolve_commands(ins, cps, dst, dp, advance=adv,
                                       window_size=w)
    os.environ["BROTLI_TPU_NO_NATIVE"] = "1"
    nb._lib, nb._tried = None, True
    try:
        py_cmds, pc = resolve_commands(ins, cps, dst, dp, advance=adv,
                                       window_size=w)
    finally:
        del os.environ["BROTLI_TPU_NO_NATIVE"]
        nb._tried = False
    assert np.array_equal(native_cmds.dist_code, py_cmds.dist_code)
    assert np.array_equal(native_cmds.dist_extra, py_cmds.dist_extra)
    assert np.array_equal(native_cmds.cmd_sym, py_cmds.cmd_sym)
    assert nc == pc


@pytest.mark.parametrize("name", ["alice29.txt", "asyoulik.txt",
                                  "monkey", "random_org_10k.bin"])
@pytest.mark.parametrize("quality", [1, 5, 9, 11])
def test_native_decode_matches_python(name, quality):
    data = load(name)
    comp = compress(data, quality=quality)
    got_native = nb.decode(comp)
    got_python = Decoder().decompress(comp)
    assert got_native == got_python == data


def test_native_decode_fixtures():
    for name in ("alice29.txt", "asyoulik.txt", "64x",
                 "compressed_file", "backward65536"):
        comp = load(name + ".compressed")
        assert nb.decode(comp) == load(name)


def test_native_decode_custom_dict_and_large_window():
    data = load("alice29.txt")
    d, body = data[:30000], data[30000:]
    cd = compress(body, quality=9, custom_dictionary=d)
    assert nb.decode(cd, custom_dictionary=d) == body
    lw = compress(data, quality=5, large_window=True, lgwin=25)
    assert nb.decode(lw, large_window=True) == data


def test_native_decode_error_codes():
    comp = bytearray(compress(load("quickfox"), quality=9))
    with pytest.raises(ValueError):
        nb.decode(bytes(comp[: len(comp) // 2]))  # truncated -> -1
    comp[8] ^= 0xFF
    try:
        out = nb.decode(bytes(comp))
        assert out != load("quickfox")  # or decodes differently
    except ValueError:
        pass


def test_native_decoder_fuzz_equivalence():
    from brotli_tpu import BrotliDecodeError
    from brotli_tpu.core.bitio import NeedsMoreInput
    data = load("asyoulik.txt")[:30000]
    comp = bytearray(compress(data, quality=7))
    rng = np.random.default_rng(3)

    def run(f):
        try:
            return ("ok", f())
        except NeedsMoreInput:
            return ("more", None)
        except ValueError as e:
            if e.args and e.args[0] == -1:  # native truncation code
                return ("more", None)
            return ("err", None)
        except BrotliDecodeError:
            return ("err", None)

    for trial in range(60):
        c = bytearray(comp)
        kind = trial % 3
        if kind == 0:
            c[int(rng.integers(0, len(c)))] ^= int(rng.integers(1, 256))
        elif kind == 1:
            c = c[: int(rng.integers(1, len(c)))]
        else:
            c += bytes(rng.integers(0, 256, 4, dtype=np.uint8))
        rn = run(lambda: nb.decode(bytes(c)))
        rp = run(lambda: Decoder().decompress(bytes(c)))
        assert rn[0] == rp[0], (trial, rn[0], rp[0])
        if rn[0] == "ok":
            assert rn[1] == rp[1]


def test_collect_dict_matches_python_oracle():
    """Native transform-aware dictionary probe vs the numpy oracle
    (static_dict.collect_dict_matches's chunked path)."""
    from brotli_tpu.encode import static_dict as sd
    data = np.frombuffer(load("alice29.txt")[:40000], np.uint8)
    native = sd.collect_dict_matches(data, 0, (1 << 22) - 16)
    # force the numpy path by calling the chunk loop directly
    import unittest.mock as mock
    with mock.patch.object(nb, "available", return_value=False):
        py = sd.collect_dict_matches(data, 0, (1 << 22) - 16)
    sn = set(zip(*[a.tolist() for a in native]))
    sp = set(zip(*[a.tolist() for a in py]))
    assert sn == sp


def test_collect_matches_validity():
    """Every (pos, len, dist) from the all-matches collector is a real
    match in the data."""
    data = np.frombuffer(load("asyoulik.txt")[:60000], np.uint8)
    pos, lens, dists = nb.collect_matches(data, (1 << 22) - 16)
    assert len(pos) > 0
    rng = np.random.default_rng(7)
    for i in rng.integers(0, len(pos), 200):
        p, l, d = int(pos[i]), int(lens[i]), int(dists[i])
        assert d <= p
        assert bytes(data[p:p + l]) == bytes(data[p - d:p - d + l])


def test_zopfli_cands_caps_and_dedup():
    """zopfli_cands_native groups by position, dedupes distances, caps
    per-position counts, and its distance symbols match
    constants.encode_distance."""
    from brotli_tpu.core import constants as C
    rng = np.random.default_rng(11)
    m, n = 5000, 300
    pos = rng.integers(0, n, m)
    lens = rng.integers(2, 200, m)
    dists = rng.integers(1, 1 << 20, m)
    isdict = rng.random(m) < 0.2
    wire = lens.copy()
    off, packed = nb.zopfli_cands(pos, lens, dists, isdict, wire, n,
                                  0, 0)
    total = off[n]
    assert total > 0 and len(packed) == total
    for p in range(n):
        a, b = int(off[p]), int(off[p + 1])
        ds = packed["dist"][a:b].tolist()
        assert len(ds) == len(set(ds))          # deduped
        dic = (packed["flags"][a:b] & 1) > 0
        assert dic.sum() <= 4 and (~dic).sum() <= 12  # capped
    sym, extra, nbits = C.encode_distance(
        packed["dist"].astype(np.int64), 0, 0)
    assert (packed["sym"] == sym).all()
    assert (packed["nbits"] == nbits).all()


def test_q11_native_roundtrip_and_band():
    """q11 through the native candidate DP round-trips and stays within
    the expected size band."""
    from brotli_tpu import decompress
    data = load("asyoulik.txt")[:50000]
    out = compress(data, quality=11)
    assert decompress(out) == data
    assert len(out) < 20000


def test_native_store_vs_python_store():
    """The native metablock backend (store_metablock_native) must
    produce streams both decoders accept, with size close to the
    Python build_meta_block/store_meta_block oracle."""
    import os
    from brotli_tpu import decompress
    for name in ("alice29.txt", "random_then_unicode"):
        data = load(name)
        native_out = compress(data, quality=9)
        assert decompress(native_out) == data
        env = os.environ.copy()
        # python oracle path in a subprocess (env flag is read at import)
        import subprocess, sys
        code = (
            "import brotli_tpu,sys;"
            f"d=open('{TESTDATA}/{name}','rb').read();"
            "sys.stdout.write(str(len(brotli_tpu.compress(d, quality=9))))"
        )
        env["BROTLI_TPU_NO_NATIVE"] = "1"
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=600)
        py_size = int(r.stdout.strip())
        assert abs(len(native_out) - py_size) < 0.02 * py_size + 64, \
            (len(native_out), py_size)


def test_fragment_parse_coverage_and_validity():
    """fragment_parse_native covers each boundary segment exactly,
    caps copies at metablock bounds, honors pos0, and its matches are
    real (reference compress_fragment.rs contract)."""
    data = load("asyoulik.txt")[:120000]
    arr = np.frombuffer(data, np.uint8)
    n = len(arr)
    bounds = [50000, 100000, n]
    for pos0 in (0, 2):
        segs = nb.fragment_parse(arr, (1 << 22) - 16, bounds, pos0=pos0)
        prev = pos0
        for (ins, cps, dst, adv), b in zip(segs, bounds):
            total = int((ins + adv).sum())
            assert total == b - prev
            pos = prev
            for i in range(len(ins)):
                pos += int(ins[i])
                if cps[i] > 0:
                    d, l = int(dst[i]), int(adv[i])
                    assert 1 <= d <= pos
                    assert pos + l <= b  # capped at the boundary
                    src = bytes(arr[pos - d:pos - d + l]) if d >= l else \
                        bytes((arr[pos - d + (j % d)] for j in range(l)))
                    assert src == bytes(arr[pos:pos + l])
                    pos += l
            assert pos == b
            prev = b


def test_store_splits_off_with_context_map():
    """Splits-off store with a multi-tree literal context map must not
    touch the empty cmd_split.types array (regression: segfault when
    nct == 1 but num_lit_ctx > 1 routed emission off the 1-tree path)."""
    from brotli_tpu import compress, decompress
    from brotli_tpu import native_bridge as nb2
    data = load("alice29.txt")
    orig = nb2.encode_metablock

    def no_splits(*a, **k):
        k["enable_splits"] = False
        return orig(*a, **k)

    nb2.encode_metablock = no_splits
    try:
        out = compress(data, quality=5)
    finally:
        nb2.encode_metablock = orig
    assert decompress(out) == data


def test_encode_bounded_memory():
    """The sliding hash window keeps encode scratch O(metablock), not
    O(input): a 64MiB q5 encode in a fresh subprocess stays far below
    the old 8-bytes-per-input-byte hash footprint."""
    import os
    import subprocess
    import sys

    code = r"""
import sys
sys.path.insert(0, %r)
from brotli_tpu import compress
data = (b"0123456789abcdef" * 63 + b"\n") * (64 * 1024)
out = compress(data, quality=5)
assert len(out) < len(data)
peak_kb = int(open("/proc/self/status").read()
              .split("VmHWM:")[1].split()[0])
# input (63MB) + tables + interpreter; the old whole-buffer hash
# precompute alone added ~500MB here
assert peak_kb // 1024 < 520, peak_kb
print("OK", peak_kb // 1024)
""" % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    assert "OK" in r.stdout


def test_store_many_block_types_with_context_map():
    """Literal block types x static contexts must fit the 256-tree wire
    limit (regression: at q9 the splitter could return >19 types with a
    13-context UTF8 map; the num_lit_ctx collapse kept building the wire
    context map from the old static map, overflowing write_context_map's
    histogram — heap corruption + invalid stream).  The external-split
    path forces the collapse deterministically."""
    from brotli_tpu import decompress
    from brotli_tpu.core import constants as C
    from brotli_tpu.core.bitio import BitWriter
    from brotli_tpu.encode import bitstream as bs
    from brotli_tpu.encode.metablock import choose_literal_context_map
    from tests import oracle

    rng = np.random.default_rng(7)
    # 32 regimes of distinct ASCII distributions -> the splitter wants
    # many literal block types
    chunks = []
    for t in range(32):
        alpha = np.frombuffer(bytes(range(40 + t, 80 + t)), dtype=np.uint8)
        chunks.append(rng.choice(alpha, size=2048).astype(np.uint8))
    data = np.concatenate(chunks)
    n = len(data)
    nlc, smap = choose_literal_context_map(data, 0, n, 9, n)
    if nlc == 1:
        nlc, smap = 13, np.arange(64, dtype=np.int64) % 13

    # all-literals command stream + an external 32-type literal split:
    # 32 types x nlc > 256 forces the num_lit_ctx collapse
    ins = np.array([n], dtype=np.int64)
    cps = np.zeros(1, dtype=np.int64)
    dst = np.zeros(1, dtype=np.int64)
    adv = np.zeros(1, dtype=np.int64)
    ext_types = np.repeat(np.arange(32, dtype=np.int32), 2048)
    res = nb.encode_metablock(
        data, 0, n, True, ins, cps, dst, adv,
        list(C.INITIAL_DISTANCE_CACHE), (1 << 22) - 16, 0, 0, 64,
        9, C.CONTEXT_UTF8, nlc, smap,
        C.CONTEXT_LUT0[C.CONTEXT_UTF8], C.CONTEXT_LUT1[C.CONTEXT_UTF8],
        enable_splits=True, ext_lit_split=(ext_types, 32))
    assert res is not None
    words, nbits, _ = res
    w = BitWriter()
    bs.write_stream_header(w, 22, False)
    w.append_packed(words, nbits)
    stream = w.getvalue()
    assert decompress(stream) == data.tobytes()
    if oracle.available():
        assert oracle.decompress(stream, max_size_hint=n) == data.tobytes()


def test_q9_small_lgblock_roundtrip():
    """q9 with explicit small metablocks on heterogeneous data (the
    configuration that used to corrupt the heap via the context-map
    collapse) round-trips through ours and the upstream decoder."""
    from brotli_tpu import decompress
    from tests import oracle

    rng = np.random.default_rng(3)
    parts = [load("alice29.txt"), load("asyoulik.txt")]
    for t in range(24):
        alpha = np.frombuffer(bytes(range(32 + 2 * t, 96 + 2 * t)),
                              dtype=np.uint8)
        parts.append(rng.choice(alpha, size=16384).astype(np.uint8)
                     .tobytes())
    data = b"".join(parts)
    for lgb in (17, 18):
        out = compress(data, quality=9, lgblock=lgb)
        assert decompress(out) == data
        if oracle.available():
            assert oracle.decompress(out, max_size_hint=len(data)) == data


def test_invert_perm32_matches_numpy():
    """Native radix permutation-apply == numpy scatter, including the
    merged two-fold form (exact9's host merge: B wins on sc_b > sc_a)."""
    from brotli_tpu import native_bridge as nb
    if not nb.available():
        pytest.skip("native unavailable")
    rng = np.random.default_rng(7)
    for n in (5, 8192, 8193, 100_000, 1 << 18):
        pos_a = rng.permutation(n).astype(np.int32)
        val_a = rng.integers(-2**31, 2**31, n, dtype=np.int32)
        out = np.array(nb.invert_perm32(pos_a, val_a))
        ref = np.empty(n, np.int32)
        ref[pos_a] = val_a
        assert (out == ref).all()

        sc_a = rng.integers(0, 1 << 30, n, dtype=np.int32)
        pos_b = rng.permutation(n).astype(np.int32)
        val_b = rng.integers(-2**31, 2**31, n, dtype=np.int32)
        sc_b = rng.integers(0, 1 << 30, n, dtype=np.int32)
        got = np.array(nb.invert_merge32(pos_a, val_a, sc_a,
                                         pos_b, val_b, sc_b))
        rv = np.empty(n, np.int32); rs = np.empty(n, np.int32)
        rv[pos_a] = val_a; rs[pos_a] = sc_a
        bv = np.empty(n, np.int32); bs_ = np.empty(n, np.int32)
        bv[pos_b] = val_b; bs_[pos_b] = sc_b
        upd = bs_ > rs
        rv[upd] = bv[upd]
        assert (got == rv).all()
