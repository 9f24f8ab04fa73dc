"""Loader/bindings for the native (C++) runtime hot loops.

Compiles native/hotloops.cpp on first use (g++, cached next to the
source), binds with ctypes, and exposes drop-in replacements for the
Python serial loops.  The Python implementations remain the oracles;
tests assert command-for-command equality.  Set BROTLI_TPU_NO_NATIVE=1
to force the Python paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
import warnings

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRCS = [os.path.join(_NATIVE_DIR, "hotloops.cpp"),
         os.path.join(_NATIVE_DIR, "broccoli.cpp"),
         os.path.join(_NATIVE_DIR, "decoder.cpp"),
         os.path.join(_NATIVE_DIR, "storeblock.cpp"),
         os.path.join(_NATIVE_DIR, "capi.cpp"),
         os.path.join(_NATIVE_DIR, "workpool.cpp"),
         os.path.join(_NATIVE_DIR, "zopfli_hq.cpp")]
_SRC = _SRCS[0]
_LIB = os.path.join(_NATIVE_DIR, "libbrotli_tpu_native.so")

_lib = None
_tried = False

I64 = ctypes.POINTER(ctypes.c_int64)
U8 = ctypes.POINTER(ctypes.c_uint8)
F64 = ctypes.POINTER(ctypes.c_double)


def _ptr(a, t=I64):
    return a.ctypes.data_as(t)


_scratch_tls = threading.local()

#: buffers above this size are allocated fresh (returned to the OS on
#: free) instead of parked in the per-thread pool forever
_SCRATCH_CAP = 64 << 20


def _scratch(name, size, dtype):
    """Reusable per-thread output buffer for native calls.  Fresh numpy
    allocations above the malloc mmap threshold are returned to the OS
    on free, so every hot-loop call re-faults its output pages; parking
    one buffer per (call-site, dtype) keeps the pages mapped.  The
    returned view aliases the pool: it is valid until the same call
    site runs again on this thread, so callers that retain results
    across calls must copy."""
    nbytes = int(size) * np.dtype(dtype).itemsize
    if nbytes > _SCRATCH_CAP:
        return np.empty(size, dtype)
    pool = getattr(_scratch_tls, "pool", None)
    if pool is None:
        pool = _scratch_tls.pool = {}
    buf = pool.get(name)
    if buf is None or buf.nbytes < nbytes:
        cap = max(nbytes, 1 << 12)
        if buf is not None:
            cap = max(cap, buf.nbytes * 2)
        buf = pool[name] = np.empty(cap, np.uint8)
    return buf[:nbytes].view(dtype)


def _src_hash() -> str:
    h = hashlib.sha256()
    for s in _SRCS:
        with open(s, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


_BASE_FLAGS = ["-O3", "-g", "-march=native", "-shared", "-fPIC",
               "-pthread"]


def _compile(out_path: str, extra_flags: list[str]) -> None:
    subprocess.run(
        ["g++", *_BASE_FLAGS, *extra_flags, *_SRCS, "-o", out_path],
        check=True, capture_output=True, timeout=300)


def _build_lib() -> None:
    """Build the native runtime, profile-guided when possible.

    Two-phase PGO: compile instrumented, run a ~10s training workload
    (encode q1/q5/q9/q11 + decode of text/binary-shaped streams) in a
    subprocess so gcc flushes the .gcda at exit, then recompile with
    -fprofile-use.  Measured on the bench corpus this is worth ~8% on
    decode (branchy binary streams) and keeps encode at full speed —
    a decode-only profile REGRESSES encode ~25%, hence the combined
    workload.  Any failure falls back to the plain -O3 build."""
    tmp = _LIB + ".tmp"
    if not os.environ.get("BROTLI_TPU_NO_PGO"):
        pgo_dir = os.path.join(_NATIVE_DIR, ".pgo")
        try:
            os.makedirs(pgo_dir, exist_ok=True)
            for f in os.listdir(pgo_dir):
                os.unlink(os.path.join(pgo_dir, f))
            _compile(tmp, ["-fprofile-generate",
                           f"-fprofile-dir={pgo_dir}"])
            env = dict(os.environ)
            env["BROTLI_TPU_LIB_OVERRIDE"] = tmp
            import sys
            subprocess.run(
                [sys.executable, "-c",
                 "from brotli_tpu.native_bridge import _pgo_train; "
                 "_pgo_train()"],
                check=True, capture_output=True, timeout=300,
                env=env, cwd=os.path.dirname(_NATIVE_DIR))
            _compile(tmp, ["-fprofile-use", f"-fprofile-dir={pgo_dir}",
                           "-fprofile-correction"])
            return
        except Exception:
            pass  # fall through to the plain build
    _compile(tmp, [])


def _pgo_train() -> None:
    """Training workload for the PGO build (runs in a subprocess with
    BROTLI_TPU_LIB_OVERRIDE pointing at the instrumented .so)."""
    import numpy as _np

    from . import decode as _  # noqa: F401  (import side effects)
    from .decode.decoder import decompress
    from .encode.encoder import compress

    rng = _np.random.default_rng(12345)
    # text-shaped: words over a small alphabet with repeats
    words = [bytes(rng.integers(97, 122, size=rng.integers(2, 9),
                                dtype=_np.uint8))
             for _ in range(400)]
    text = b" ".join(words[int(i)] for i in
                     rng.zipf(1.3, size=120_000) % len(words))[:1 << 20]
    # binary-shaped: structured records with noise
    rec = rng.integers(0, 256, size=64, dtype=_np.uint8)
    recs = _np.tile(rec, 6000)
    noise_idx = rng.integers(0, len(recs), size=len(recs) // 3)
    recs[noise_idx] = rng.integers(0, 256, size=len(noise_idx),
                                   dtype=_np.uint8)
    binary = recs.tobytes()[:1 << 20]
    # real machine code when available: ELF sections drive the decoder
    # through many live context trees and short far copies — a shape
    # the synthetic corpora miss (branch layout for the context-literal
    # path trains on it)
    workloads = [text, binary]
    for elf in ("/lib/x86_64-linux-gnu/libc.so.6", "/usr/bin/python3"):
        try:
            with open(elf, "rb") as f:
                workloads.append(f.read(1 << 20))
            break
        except OSError:
            continue
    for data in workloads:
        for q in (1, 3, 5, 9):
            out = compress(data, quality=q)
            assert decompress(out) == data
        out = compress(data[:1 << 17], quality=11)
        assert decompress(out) == data[:1 << 17]
        # q10 fast tier at >= 256K: trains the top-K collectors
        # (find_matches_native), the sorted-dictionary probe, and the
        # overlapped chunked dense/DP range entries — none of which
        # the q5/q9/q11 legs touch
        out = compress(data[:1 << 18], quality=10)
        assert decompress(out) == data[:1 << 18]

    # decode branch layout must also train on the SYSTEM encoder's
    # streams: C q5 output averages ~2 literals/command (short-insert
    # path) with different command/context statistics than our own
    # streams, and the production decode A/B runs on exactly those
    def _c_compress(payload: bytes, quality: int) -> bytes | None:
        try:
            enc = ctypes.CDLL("libbrotlienc.so.1")
        except OSError:
            return None
        enc.BrotliEncoderCompress.restype = ctypes.c_int
        ms = len(payload) + (len(payload) >> 2) + 1024
        buf = ctypes.create_string_buffer(ms)
        osz = ctypes.c_size_t(ms)
        ok = enc.BrotliEncoderCompress(quality, 22, 0, len(payload),
                                       payload, ctypes.byref(osz), buf)
        return buf.raw[:osz.value] if ok else None

    for data in workloads:
        for q in (5, 9):
            cs = _c_compress(bytes(data), q)
            if cs is not None:
                assert decompress(cs) == data


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("BROTLI_TPU_NO_NATIVE"):
        return None
    try:
        override = os.environ.get("BROTLI_TPU_LIB_OVERRIDE")
        if override:
            _lib = ctypes.CDLL(override)
            _bind(_lib)
            return _lib
        # Rebuild keyed on a content hash of the sources (not mtimes:
        # a fresh checkout sets all mtimes at clone time, and a stale
        # foreign-ISA .so would SIGILL at first call).
        stamp = _LIB + ".hash"
        want = _src_hash()
        have = None
        if os.path.exists(stamp):
            with open(stamp) as f:
                have = f.read().strip()
        if not os.path.exists(_LIB) or have != want:
            _build_lib()
            os.replace(_LIB + ".tmp", _LIB)
            with open(stamp, "w") as f:
                f.write(want)
        _lib = ctypes.CDLL(_LIB)
        _bind(_lib)
    except Exception as e:
        detail = ""
        if isinstance(e, subprocess.CalledProcessError) and e.stderr:
            detail = ": " + e.stderr.decode("utf-8", "replace")[:500]
        warnings.warn(
            "brotli_tpu native runtime unavailable (falling back to "
            f"the 10-100x slower pure-Python paths) — {e!r}{detail}",
            RuntimeWarning)
        _lib = None
    return _lib


def _bind(_lib) -> None:
    _lib.greedy_parse_native.restype = ctypes.c_int64
    _lib.resolve_commands_native.restype = None
    _lib.zopfli_dp_native.restype = None
    _lib.decode_native.restype = ctypes.c_int64
    _lib.combined_parse_native.restype = ctypes.c_int64
    _lib.parse_session_begin.restype = ctypes.c_void_p
    _lib.parse_session_next.restype = ctypes.c_int64
    _lib.parse_session_cache.restype = None
    _lib.parse_session_end.restype = None
    _lib.parse_session_extend.restype = None
    _lib.parse_session_prime.restype = None
    _lib.zopfli_dp_cache_native.restype = None
    _lib.pack_bits_native.restype = ctypes.c_int64
    _lib.collect_matches_native.restype = ctypes.c_int64
    _lib.collect_dict_native.restype = ctypes.c_int64
    _lib.dict_sorted_init_native.restype = None
    _lib.collect_dict_sorted_native.restype = ctypes.c_int64
    _lib.zopfli_cands_native.restype = ctypes.c_int64
    _lib.zopfli_cands_dense_native.restype = ctypes.c_int64
    _lib.zopfli_cands_dense_range_native.restype = ctypes.c_int64
    _lib.est_lit_native.restype = None
    _lib.fragment_parse_native.restype = ctypes.c_int64
    _lib.fragment_parse_seg_native.restype = ctypes.c_int64
    _lib.compress_fragment_pipeline_native.restype = ctypes.c_int64
    _lib.compress_session_pipeline_native.restype = ctypes.c_int64
    _lib.zopfli_dp_cands_native.restype = None
    _lib.zopfli_dp_cands_range_native.restype = None
    _lib.zopfli_backtrack_native.restype = ctypes.c_int64
    _lib.store_metablock_native.restype = ctypes.c_int64
    _lib.encode_metablock_native.restype = ctypes.c_int64
    # public C ABI (capi.cpp / workpool.cpp)
    _lib.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
    _lib.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]
    _lib.BrotliEncoderCreateWorkPool.restype = ctypes.c_void_p
    _lib.BrotliEncoderDestroyWorkPool.argtypes = [ctypes.c_void_p]
    _lib.BrotliEncoderCompressWorkPool.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_size_t,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_char_p, ctypes.c_size_t]
    _lib.extend_caps_native.restype = None
    _lib.extend_caps_range_native.restype = None
    _lib.decoder_set_dictionary.restype = None
    _install_decoder_dictionary(_lib)


_dict_refs = []


def _install_decoder_dictionary(lib):
    """Hand the RFC dictionary + transforms + context LUTs to the native
    decoder (kept alive on the module)."""
    from .core import constants as C
    from .core.dictionary import get_dictionary
    d = get_dictionary()
    data = np.frombuffer(d.data, dtype=np.uint8)
    n_len = 25
    offsets = np.zeros(n_len, dtype=np.int64)
    size_bits = np.zeros(n_len, dtype=np.int64)
    for length in range(4, n_len):
        offsets[length] = int(d.offsets_by_length[length])
        size_bits[length] = int(d.size_bits_by_length[length])
    tp = np.zeros((121, 16), dtype=np.uint8)
    ts = np.zeros((121, 16), dtype=np.uint8)
    tpl = np.zeros(121, dtype=np.int64)
    tsl = np.zeros(121, dtype=np.int64)
    tt = np.zeros(121, dtype=np.int64)
    for i in range(121):
        p = d.t_prefix[i]
        sfx = d.t_suffix[i]
        tp[i, :len(p)] = np.frombuffer(p, np.uint8)
        ts[i, :len(sfx)] = np.frombuffer(sfx, np.uint8)
        tpl[i] = len(p)
        tsl[i] = len(sfx)
        tt[i] = d.t_type[i]
    lut0 = np.ascontiguousarray(C.CONTEXT_LUT0, dtype=np.uint8)
    lut1 = np.ascontiguousarray(C.CONTEXT_LUT1, dtype=np.uint8)
    refs = (data, offsets, size_bits, tp, tpl, ts, tsl, tt, lut0, lut1)
    _dict_refs.append(refs)
    lib.decoder_set_dictionary(
        _ptr(data, U8), _ptr(offsets), _ptr(size_bits),
        _ptr(tp, U8), _ptr(tpl), _ptr(ts, U8), _ptr(tsl), _ptr(tt),
        _ptr(lut0, U8), _ptr(lut1, U8))


_table_mem = None
_decode_out = None  # pooled output buffer: fresh multi-MB allocations
#                     pay a page-fault per 4KiB of decoded output


def decode(data: bytes, custom_dictionary: bytes = b"",
           large_window: bool = False, size_hint: int | None = None):
    """Native one-shot decode.  Returns bytes.
    Raises ValueError(code) with code -1 (truncated) or -2 (corrupt)."""
    global _table_mem, _decode_out
    lib = get_lib()
    if _table_mem is None:
        _table_mem = np.zeros(1 << 23, dtype=np.int32)
    src = np.frombuffer(bytes(data), dtype=np.uint8)
    cd = np.frombuffer(bytes(custom_dictionary), dtype=np.uint8)
    cap = max(size_hint or 0, 4 * len(src) + (1 << 16))
    while True:
        # reuse the pooled buffer for common sizes; huge outputs fall
        # back to a transient allocation so the pool stays bounded
        if cap <= (1 << 26):
            if _decode_out is None or len(_decode_out) < cap:
                _decode_out = np.empty(
                    max(cap, 1 << 22), dtype=np.uint8)
            out = _decode_out
            cap = len(out)
        else:
            out = np.empty(cap, dtype=np.uint8)
        r = lib.decode_native(
            _ptr(src, U8), ctypes.c_int64(len(src)),
            _ptr(out, U8), ctypes.c_int64(cap),
            _ptr(cd, U8) if len(cd) else ctypes.POINTER(
                ctypes.c_uint8)(),
            ctypes.c_int64(len(cd)), ctypes.c_int64(int(large_window)),
            _ptr(_table_mem), ctypes.c_int64(len(_table_mem)))
        if r == -3:
            if cap >= 1 << 40:
                raise MemoryError(
                    "brotli_tpu: decoded output exceeds 1 TiB cap")
            cap *= 8
            continue
        if r < 0:
            raise ValueError(int(r))
        return out[:r].tobytes()


def decode_into(data: bytes, out, custom_dictionary: bytes = b"",
                large_window: bool = False) -> int:
    """Preallocated decode (reference BrotliDecoderDecompressPrealloc,
    decode.h): decode into the caller's buffer, no allocation beyond
    the shared table arena.  Returns the decoded length; raises
    BufferError if the buffer is too small, ValueError on corrupt or
    truncated input."""
    global _table_mem
    lib = get_lib()
    if _table_mem is None:
        _table_mem = np.zeros(1 << 23, dtype=np.int32)
    src = np.frombuffer(bytes(data), dtype=np.uint8)
    cd = np.frombuffer(bytes(custom_dictionary), dtype=np.uint8)
    out_arr = np.frombuffer(out, dtype=np.uint8)
    r = lib.decode_native(
        _ptr(src, U8), ctypes.c_int64(len(src)),
        out_arr.ctypes.data_as(U8), ctypes.c_int64(len(out_arr)),
        _ptr(cd, U8) if len(cd) else ctypes.POINTER(ctypes.c_uint8)(),
        ctypes.c_int64(len(cd)), ctypes.c_int64(int(large_window)),
        _ptr(_table_mem), ctypes.c_int64(len(_table_mem)))
    if r == -3:
        raise BufferError("output buffer too small")
    if r < 0:
        raise ValueError(int(r))
    return int(r)


def available() -> bool:
    return get_lib() is not None


def greedy_parse(data, best_len, best_dist, best_score, boundaries,
                 dict_len=0, pos0=0, initial_cache=(4, 11, 15, 16),
                 best_isdict=None, window_size=1 << 62,
                 match_cap=320, min_score=100, cost_diff_lazy=175,
                 last_dist_bonus=15, cache_probe_span=16, lbs=135,
                 best_wire=None):
    """Native greedy walk; same contract as match.greedy_parse.
    Segments are (insert[], wire_copy[], distance[], advance[])."""
    lib = get_lib()
    n = len(data) - dict_len
    bl = np.ascontiguousarray(best_len, dtype=np.int64)
    bd = np.ascontiguousarray(best_dist, dtype=np.int64)
    bs = np.ascontiguousarray(best_score, dtype=np.int64)
    isd = np.ascontiguousarray(
        best_isdict if best_isdict is not None
        else np.zeros(n, dtype=bool), dtype=np.uint8)
    bw = np.ascontiguousarray(
        best_wire if best_wire is not None else bl, dtype=np.int64)
    mpos = np.nonzero(bs > min_score)[0].astype(np.int64)
    bnd = np.asarray(boundaries, dtype=np.int64)
    cache = np.asarray(initial_cache, dtype=np.int64)
    max_cmds = n + len(bnd) + 1
    out_i = np.empty(max_cmds, dtype=np.int64)
    out_c = np.empty(max_cmds, dtype=np.int64)
    out_d = np.empty(max_cmds, dtype=np.int64)
    out_a = np.empty(max_cmds, dtype=np.int64)
    seg_counts = np.zeros(len(bnd), dtype=np.int64)
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n_out = lib.greedy_parse_native(
        _ptr(data, U8), ctypes.c_int64(len(data)),
        ctypes.c_int64(dict_len),
        _ptr(bl), _ptr(bd), _ptr(bs), _ptr(isd, U8), _ptr(bw),
        _ptr(mpos), ctypes.c_int64(len(mpos)),
        _ptr(bnd), ctypes.c_int64(len(bnd)), ctypes.c_int64(pos0),
        _ptr(cache), ctypes.c_int64(window_size),
        ctypes.c_int64(match_cap), ctypes.c_int64(min_score),
        ctypes.c_int64(cost_diff_lazy), ctypes.c_int64(last_dist_bonus),
        ctypes.c_int64(cache_probe_span), ctypes.c_int64(lbs),
        _ptr(out_i), _ptr(out_c), _ptr(out_d), _ptr(out_a),
        _ptr(seg_counts), ctypes.c_int64(max_cmds))
    segments = []
    off = 0
    for cnt in seg_counts.tolist():
        segments.append((out_i[off:off + cnt].copy(),
                         out_c[off:off + cnt].copy(),
                         out_d[off:off + cnt].copy(),
                         out_a[off:off + cnt].copy()))
        off += cnt
    assert off == n_out
    return segments


def resolve_distance_codes(insert_len, copy_len, distance, npostfix,
                           ndirect, initial_cache, pos_offset,
                           window_size, wire_copy=None):
    """Native distance-code + command-symbol resolution; returns
    (code, extra, extra_bits, use_last, cmd_sym, final_cache).
    copy_len is the ADVANCE (position-stepping) length; wire_copy the
    wire copy length (defaults to copy_len)."""
    lib = get_lib()
    il = np.ascontiguousarray(insert_len, dtype=np.int64)
    cl = np.ascontiguousarray(copy_len, dtype=np.int64)
    dl = np.ascontiguousarray(distance, dtype=np.int64)
    wc = cl if wire_copy is None else np.ascontiguousarray(
        wire_copy, dtype=np.int64)
    n = len(il)
    cache = np.asarray(initial_cache, dtype=np.int64).copy()
    out_code = np.empty(n, dtype=np.int64)
    out_extra = np.empty(n, dtype=np.int64)
    out_bits = np.empty(n, dtype=np.int64)
    out_ul = np.empty(n, dtype=np.uint8)
    out_sym = np.empty(n, dtype=np.int64)
    lib.resolve_commands_native(
        _ptr(il), _ptr(cl), _ptr(dl), _ptr(wc), ctypes.c_int64(n),
        ctypes.c_int64(npostfix), ctypes.c_int64(ndirect),
        _ptr(cache), ctypes.c_int64(pos_offset),
        ctypes.c_int64(window_size),
        _ptr(out_code), _ptr(out_extra), _ptr(out_bits),
        _ptr(out_ul, U8), _ptr(out_sym))
    return out_code, out_extra, out_bits, out_ul.astype(bool), \
        out_sym, cache.tolist()


def collect_matches(data, window_size, dict_len=0, k=48,
                    bucket_bits=17, k8=24, bucket_bits8=18, min_len=4,
                    max_per_pos=16):
    """All useful matches per position (the optimal parser's candidate
    source).  Returns (pos, len, dist) arrays, positions relative to
    the region start (index 0 == absolute dict_len)."""
    lib = get_lib()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = len(data)
    cap = max(1, (n - dict_len)) * max_per_pos // 2 + 1024
    out_pos = np.empty(cap, dtype=np.int64)
    out_len = np.empty(cap, dtype=np.int64)
    out_dist = np.empty(cap, dtype=np.int64)
    m = lib.collect_matches_native(
        _ptr(data, U8), ctypes.c_int64(n), ctypes.c_int64(dict_len),
        ctypes.c_int64(window_size), ctypes.c_int64(k),
        ctypes.c_int64(bucket_bits), ctypes.c_int64(k8),
        ctypes.c_int64(bucket_bits8), ctypes.c_int64(min_len),
        ctypes.c_int64(max_per_pos),
        _ptr(out_pos), _ptr(out_len), _ptr(out_dist),
        ctypes.c_int64(cap))
    return out_pos[:m], out_len[:m], out_dist[:m]


def extend_caps(data, dict_len, pos, dist, lens):
    """Amortized exact-length extension of cap-hit matches (native
    extend_caps_native; same contract as the zopfli_segment loop)."""
    lib = get_lib()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    pos = np.ascontiguousarray(pos, np.int64)
    dist = np.ascontiguousarray(dist, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    out = np.empty(len(pos), np.int64)
    lib.extend_caps_native(_ptr(data, U8), ctypes.c_int64(len(data)),
                           ctypes.c_int64(dict_len), _ptr(pos),
                           _ptr(dist), _ptr(lens),
                           ctypes.c_int64(len(pos)), _ptr(out))
    return out


def store_metablock(data, start, mlen, is_last, cmds, npostfix, ndirect,
                    dist_alpha, quality, context_mode, num_lit_ctx,
                    lit_static_map, lut0, lut1, enable_splits=True):
    """Native metablock plan + serialize (store_metablock_native).
    Returns (words uint64[], nbits) or None if the output overflowed
    the worst-case buffer (caller falls back to the Python path)."""
    lib = get_lib()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    # a compressed metablock larger than 8*mlen+40 bits is replaced by
    # an uncompressed block by the caller, so the worst useful size is
    # bounded; overflow returns None -> Python fallback
    cap_bits = 9 * int(mlen) + (1 << 17)
    words = _scratch("sb_words", cap_bits // 64 + 2, np.uint64)
    words[:] = 0
    U64 = ctypes.POINTER(ctypes.c_uint64)
    smap = np.ascontiguousarray(lit_static_map, np.int64)
    lut0 = np.ascontiguousarray(lut0, np.uint8)
    lut1 = np.ascontiguousarray(lut1, np.uint8)
    r = lib.store_metablock_native(
        _ptr(data, U8), ctypes.c_int64(start), ctypes.c_int64(mlen),
        ctypes.c_int64(int(is_last)),
        ctypes.c_int64(len(cmds.insert_len)),
        _ptr(cmds.insert_len), _ptr(cmds.copy_len),
        _ptr(cmds.dist_code), _ptr(cmds.dist_extra),
        _ptr(cmds.dist_extra_bits), _ptr(cmds.cmd_sym),
        _ptr(cmds.copy_advance),
        ctypes.c_int64(npostfix), ctypes.c_int64(ndirect),
        ctypes.c_int64(dist_alpha), ctypes.c_int64(quality),
        ctypes.c_int64(context_mode), ctypes.c_int64(num_lit_ctx),
        _ptr(smap), _ptr(lut0, U8), _ptr(lut1, U8),
        ctypes.c_int64(int(enable_splits)),
        ctypes.c_void_p(None), ctypes.c_int64(0),
        words.ctypes.data_as(U64), ctypes.c_int64(cap_bits),
        ctypes.c_int64(0))
    if r < 0:
        return None
    return words, int(r)


def encode_metablock(data, start, mlen, is_last, ins, wire, dist, adv,
                     cache, window_size, npostfix, ndirect, dist_alpha,
                     quality, context_mode, num_lit_ctx, lit_static_map,
                     lut0, lut1, enable_splits=True,
                     ext_lit_split=None):
    """Fused per-metablock resolve + plan + serialize
    (encode_metablock_native).  Returns (words, nbits, new_cache) or
    None on overflow (caller falls back to an uncompressed block;
    cache is unchanged in that case).

    ext_lit_split: optional (types_per_literal int32[], num_types) —
    an externally planned literal block split (the device Lloyd
    planner, ops/split.py); command/distance splits stay native."""
    lib = get_lib()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = len(ins)
    ins = np.ascontiguousarray(ins, np.int64)
    wire = np.ascontiguousarray(wire, np.int64)
    dist = np.ascontiguousarray(dist, np.int64)
    adv = np.ascontiguousarray(adv, np.int64)
    cache_io = np.asarray(cache, dtype=np.int64).copy()
    cap_bits = 9 * int(mlen) + (1 << 17)
    words = _scratch("em_words", cap_bits // 64 + 2, np.uint64)
    words[:] = 0
    U64 = ctypes.POINTER(ctypes.c_uint64)
    smap = np.ascontiguousarray(lit_static_map, np.int64)
    lut0 = np.ascontiguousarray(lut0, np.uint8)
    lut1 = np.ascontiguousarray(lut1, np.uint8)
    if ext_lit_split is not None:
        ext_types = np.ascontiguousarray(ext_lit_split[0], np.int32)
        ext_ptr = ext_types.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32))
        ext_n = int(ext_lit_split[1])
    else:
        ext_ptr = ctypes.c_void_p(None)
        ext_n = 0
    r = lib.encode_metablock_native(
        _ptr(data, U8), ctypes.c_int64(start), ctypes.c_int64(mlen),
        ctypes.c_int64(int(is_last)), ctypes.c_int64(n),
        _ptr(ins), _ptr(wire), _ptr(dist), _ptr(adv),
        _ptr(cache_io), ctypes.c_int64(window_size),
        ctypes.c_int64(npostfix), ctypes.c_int64(ndirect),
        ctypes.c_int64(dist_alpha), ctypes.c_int64(quality),
        ctypes.c_int64(context_mode), ctypes.c_int64(num_lit_ctx),
        _ptr(smap), _ptr(lut0, U8), _ptr(lut1, U8),
        ctypes.c_int64(int(enable_splits)),
        ext_ptr, ctypes.c_int64(ext_n),
        words.ctypes.data_as(U64), ctypes.c_int64(cap_bits),
        ctypes.c_int64(0))
    if r < 0:
        return None
    return words, int(r), cache_io.tolist()


#: packed native Zopfli candidate record (mirrors ZCand in
#: hotloops.cpp — one 16-byte struct per candidate)
ZCAND_DTYPE = np.dtype([("len", "<i4"), ("wire", "<i4"),
                        ("dist", "<i4"), ("sym", "<i2"),
                        ("nbits", "u1"), ("flags", "u1")])


def zopfli_cands(pos, lens, dists, isdict, wire, n, npostfix, ndirect,
                 k_win=12, k_dict=4, ladder_top=4):
    """Counting-sort + dedupe + cap the concatenated match sources into
    per-position packed Zopfli candidates (native zopfli_cands_native).
    Returns (cand_off, packed) where packed is a ZCAND_DTYPE array."""
    lib = get_lib()
    m = len(pos)
    pos = np.ascontiguousarray(pos, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    dists = np.ascontiguousarray(dists, np.int64)
    isdict = np.ascontiguousarray(isdict, np.uint8)
    wire = np.ascontiguousarray(wire, np.int64)
    cand_off = np.zeros(n + 1, np.int64)
    packed = np.empty(m, dtype=ZCAND_DTYPE)
    cnt = lib.zopfli_cands_native(
        _ptr(pos), _ptr(lens), _ptr(dists), _ptr(isdict, U8),
        _ptr(wire), ctypes.c_int64(m), ctypes.c_int64(n),
        ctypes.c_int64(npostfix), ctypes.c_int64(ndirect),
        ctypes.c_int64(k_win), ctypes.c_int64(k_dict),
        ctypes.c_int64(ladder_top),
        _ptr(cand_off), ctypes.c_void_p(packed.ctypes.data))
    return cand_off, packed[:cnt]


def zopfli_cands_dense(d_len, d_dist, d_isdict, d_wire, extra, n,
                       npostfix, ndirect, k_win=12, k_dict=4,
                       ladder_top=4):
    """zopfli_cands over the dense [rows, n] top-K tables plus sparse
    extra sources — no nonzero/concatenate on the Python side.  `extra`
    is None, one (pos, len, dist, isdict, wire) tuple, or a list of up
    to two such tuples (window + dictionary sources, merged natively)."""
    lib = get_lib()
    d_len = np.ascontiguousarray(d_len, np.int64)
    d_dist = np.ascontiguousarray(d_dist, np.int64)
    d_isdict = np.ascontiguousarray(d_isdict, np.uint8)
    d_wire = np.ascontiguousarray(d_wire, np.int64)
    n_rows = d_len.shape[0]
    if extra is None:
        sources = []
    elif isinstance(extra, list):
        sources = extra
    else:
        sources = [extra]
    assert len(sources) <= 2
    empty64 = np.zeros(0, np.int64)
    empty8 = np.zeros(0, np.uint8)
    prepped = []
    m = int((d_len >= 2).sum())
    for src in sources:
        s_pos, s_len, s_dist, s_isdict, s_wire = src
        s = (np.ascontiguousarray(s_pos, np.int64),
             np.ascontiguousarray(s_len, np.int64),
             np.ascontiguousarray(s_dist, np.int64),
             np.ascontiguousarray(s_isdict, np.uint8),
             np.ascontiguousarray(s_wire, np.int64))
        m += len(s[0])
        prepped.append(s)
    while len(prepped) < 2:
        prepped.append((empty64, empty64, empty64, empty8, empty64))
    (x_pos, x_len, x_dist, x_isdict, x_wire) = prepped[0]
    (y_pos, y_len, y_dist, y_isdict, y_wire) = prepped[1]
    cand_off = _scratch("zc_off", n + 1, np.int64)
    cand_off[:] = 0
    packed = _scratch("zc_packed", max(m, 1), ZCAND_DTYPE)
    cnt = lib.zopfli_cands_dense_native(
        _ptr(d_len), _ptr(d_dist), _ptr(d_isdict, U8), _ptr(d_wire),
        ctypes.c_int64(n_rows),
        _ptr(x_pos), _ptr(x_len), _ptr(x_dist), _ptr(x_isdict, U8),
        _ptr(x_wire), ctypes.c_int64(len(x_pos)),
        _ptr(y_pos), _ptr(y_len), _ptr(y_dist), _ptr(y_isdict, U8),
        _ptr(y_wire), ctypes.c_int64(len(y_pos)),
        ctypes.c_int64(n), ctypes.c_int64(npostfix),
        ctypes.c_int64(ndirect), ctypes.c_int64(k_win),
        ctypes.c_int64(k_dict), ctypes.c_int64(ladder_top),
        _ptr(cand_off), ctypes.c_void_p(packed.ctypes.data))
    if cnt < 0:
        return None  # unsorted extra runs: caller uses zopfli_cands
    return cand_off, packed[:cnt]


def zopfli_cands_dense_range(d_len, d_dist, d_isdict, d_wire,
                             x_src, xm, n, npostfix, ndirect,
                             cand_off, packed, p_start, p_end,
                             k_win=12, k_dict=4, ladder_top=4):
    """Chunked zopfli_cands_dense over positions [p_start, p_end).
    Caller owns every buffer and guarantees dtype/contiguity; x_src is
    one (pos, len, dist, isdict, wire) source whose first xm entries
    are valid (ascending positions).  Returns the cumulative candidate
    count (also written to cand_off[p_end])."""
    lib = get_lib()
    x_pos, x_len, x_dist, x_isdict, x_wire = x_src
    e64 = np.zeros(0, np.int64)
    e8 = np.zeros(0, np.uint8)
    cnt = lib.zopfli_cands_dense_range_native(
        _ptr(d_len), _ptr(d_dist), _ptr(d_isdict, U8), _ptr(d_wire),
        ctypes.c_int64(d_len.shape[0]),
        _ptr(x_pos), _ptr(x_len), _ptr(x_dist), _ptr(x_isdict, U8),
        _ptr(x_wire), ctypes.c_int64(xm),
        _ptr(e64), _ptr(e64), _ptr(e64), _ptr(e8), _ptr(e64),
        ctypes.c_int64(0),
        ctypes.c_int64(n), ctypes.c_int64(npostfix),
        ctypes.c_int64(ndirect), ctypes.c_int64(k_win),
        ctypes.c_int64(k_dict), ctypes.c_int64(ladder_top),
        _ptr(cand_off), ctypes.c_void_p(packed.ctypes.data),
        ctypes.c_int64(p_start), ctypes.c_int64(p_end))
    return int(cnt)


def extend_caps_range(data, dict_len, pos, dist, lens, state):
    """Chunked extend_caps: the amortized-skip state (last_end) is
    carried in state[0] across calls so chunked extension matches the
    one-shot walk byte for byte."""
    lib = get_lib()
    data = np.ascontiguousarray(data, np.uint8)
    pos = np.ascontiguousarray(pos, np.int64)
    dist = np.ascontiguousarray(dist, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    out = np.empty(len(pos), np.int64)
    lib.extend_caps_range_native(
        _ptr(data, U8), ctypes.c_int64(len(data)),
        ctypes.c_int64(dict_len), _ptr(pos), _ptr(dist), _ptr(lens),
        ctypes.c_int64(len(pos)), _ptr(out), _ptr(state))
    return out


def fragment_parse(data, window_size, bounds, pos0=0, table_bits=17):
    """q0/q1 one-pass greedy fragment parse (fragment_parse_native).
    Returns one (ins, cps, dst, adv) tuple per boundary segment, or
    None on overflow (caller uses the generic path)."""
    lib = get_lib()
    data = np.ascontiguousarray(data, np.uint8)
    n = len(data)
    table_bits = min(table_bits, max(9, n.bit_length()))
    bounds = np.ascontiguousarray(bounds, np.int64)
    cap = n // 4 + len(bounds) + 2
    ins = _scratch("fp_ins", cap, np.int64)
    cps = _scratch("fp_cps", cap, np.int64)
    dst = _scratch("fp_dst", cap, np.int64)
    adv = _scratch("fp_adv", cap, np.int64)
    seg_counts = _scratch("fp_segc", len(bounds), np.int64)
    seg_counts[:] = 0
    m = lib.fragment_parse_native(
        _ptr(data, U8), ctypes.c_int64(n), ctypes.c_int64(pos0),
        ctypes.c_int64(window_size),
        ctypes.c_int64(table_bits), _ptr(bounds),
        ctypes.c_int64(len(bounds)),
        _ptr(ins), _ptr(cps), _ptr(dst), _ptr(adv), _ptr(seg_counts),
        ctypes.c_int64(cap))
    if m < 0:
        return None
    segs = []
    o = 0
    for c in seg_counts:
        c = int(c)
        segs.append((ins[o:o + c], cps[o:o + c], dst[o:o + c],
                     adv[o:o + c]))
        o += c
    return segs


def compress_fragment_pipeline(data, window_size, span, quality,
                               suppress_last, initial_cache,
                               bit_phase=0, table_bits=17):
    """Whole-stream q0/q1 encode (compress_fragment_pipeline_native):
    fragment parse on a worker thread, trivial store + bit-level
    assembly on the caller thread, no Python per metablock.
    `bit_phase` is the writer's current bit-within-byte position so
    ISUNCOMPRESSED alignment lands on true stream bytes.  Returns
    (words, nbits, cache) with nbits counting from bit 0 of `words`
    (the first bit_phase bits are zero — append with
    append_packed_phased), or None on overflow."""
    lib = get_lib()
    data = np.ascontiguousarray(data, np.uint8)
    n = len(data)
    table_bits = min(table_bits, max(9, n.bit_length()))
    cap_bits = 9 * n + (1 << 18)
    words = _scratch("frag_words", cap_bits // 64 + 2, np.uint64)
    words[:] = 0
    cache_io = np.asarray(initial_cache, dtype=np.int64).copy()
    U64 = ctypes.POINTER(ctypes.c_uint64)
    r = lib.compress_fragment_pipeline_native(
        _ptr(data, U8), ctypes.c_int64(n), ctypes.c_int64(window_size),
        ctypes.c_int64(span), ctypes.c_int64(table_bits),
        ctypes.c_int64(quality), ctypes.c_int64(int(suppress_last)),
        ctypes.c_int64(bit_phase & 7),
        _ptr(cache_io), words.ctypes.data_as(U64),
        ctypes.c_int64(cap_bits))
    if r < 0:
        return None
    return words, int(r), cache_io.tolist()


def fragment_parse_seg(data, window_size, pos0, bound, reset,
                       table_bits=17):
    """One-segment fragment parse with a persistent direct-mapped
    table (fragment_parse_seg_native).  All calls for one stream must
    come from the SAME thread (the table is thread-local); reset=True
    on the first segment.  Returns (ins, cps, dst, adv) or None on
    overflow."""
    lib = get_lib()
    data = np.ascontiguousarray(data, np.uint8)
    n = len(data)
    table_bits = min(table_bits, max(9, n.bit_length()))
    cap = (bound - pos0) // 4 + 16
    ins = np.empty(cap, np.int64)
    cps = np.empty(cap, np.int64)
    dst = np.empty(cap, np.int64)
    adv = np.empty(cap, np.int64)
    m = lib.fragment_parse_seg_native(
        _ptr(data, U8), ctypes.c_int64(n), ctypes.c_int64(pos0),
        ctypes.c_int64(window_size), ctypes.c_int64(table_bits),
        ctypes.c_int64(bound), ctypes.c_int64(1 if reset else 0),
        _ptr(ins), _ptr(cps), _ptr(dst), _ptr(adv),
        ctypes.c_int64(cap))
    if m < 0:
        return None
    return ins[:m].copy(), cps[:m].copy(), dst[:m].copy(), adv[:m].copy()


def est_lit(data, cls, half, utf8_ramp, bias):
    """Sliding-window literal bit-cost estimate (est_lit_native)."""
    lib = get_lib()
    data = np.ascontiguousarray(data, np.uint8)
    n = len(data)
    cost = np.empty(n, np.float64)
    F64 = ctypes.POINTER(ctypes.c_double)
    cls_ptr = (ctypes.c_void_p(None) if cls is None
               else _ptr(np.ascontiguousarray(cls, np.uint8), U8))
    lib.est_lit_native(
        _ptr(data, U8), ctypes.c_int64(n), cls_ptr,
        ctypes.c_int64(half), ctypes.c_int(1 if utf8_ramp else 0),
        ctypes.c_double(bias), cost.ctypes.data_as(F64))
    return cost


def zopfli_dp_cands(n, lcp, cost_cmd, cost_dist_short, cost_dist4,
                    cands, ins_code, ins_extra, cmd_sym, cmd_sym_last,
                    data, dict_len, window_size, initial_cache,
                    n_starts=2, cand_cap=0, max_zopfli_len=0,
                    p_range=None, qstate=None, state_bufs=None):
    """Cache-aware DP over prepared candidates with inline sub-length
    ladder (native zopfli_dp_cands_native)."""
    lib = get_lib()
    cand_off, packed = cands
    lcp = np.ascontiguousarray(lcp, np.float64)
    cost_cmd = np.ascontiguousarray(cost_cmd, np.float64)
    cds = np.ascontiguousarray(cost_dist_short, np.float64)
    cd4 = np.ascontiguousarray(cost_dist4, np.float64)
    dist_alpha = cd4.shape[1]
    data = np.ascontiguousarray(data, np.uint8)
    cache0 = np.ascontiguousarray(initial_cache, np.int64)
    # float32 costs / int32 node records (the reference's ZopfliNode
    # is f32+u32 too): the DP's rejected-relax loads dominate its
    # runtime, so halving the randomly-accessed arrays pays directly
    if state_bufs is not None:
        # chunked callers MUST hold the DP state across calls
        # themselves: _scratch hands out a FRESH buffer whenever a
        # request exceeds its pooling cap (node_cache crosses it at
        # the default 4 MiB metablock span), which would silently
        # reset the cost/backpointer/cache state between chunks
        (cost, prev_start, prev_len, prev_wire, prev_dist,
         node_cache) = state_bufs
    else:
        cost = _scratch("dp_cost", n + 1, np.float32)
        prev_start = _scratch("dp_ps", n + 1, np.int32)
        prev_len = _scratch("dp_pl", n + 1, np.int32)
        prev_wire = _scratch("dp_pw", n + 1, np.int32)
        prev_dist = _scratch("dp_pd", n + 1, np.int32)
        node_cache = _scratch("dp_nc", 4 * (n + 1), np.int32)
    F64 = ctypes.POINTER(ctypes.c_double)
    F32 = ctypes.POINTER(ctypes.c_float)
    I32 = ctypes.POINTER(ctypes.c_int32)
    range_args = ()
    fn = lib.zopfli_dp_cands_native
    if p_range is not None:
        # chunked DP (overlapped collection): [p_start, p_end) with
        # the start-queue state carried in caller-held qstate[18]
        fn = lib.zopfli_dp_cands_range_native
        range_args = (ctypes.c_int64(p_range[0]),
                      ctypes.c_int64(p_range[1]), _ptr(qstate))
    fn(
        ctypes.c_int64(n), ctypes.c_int64(n_starts),
        ctypes.c_int64(cand_cap),
        ctypes.c_int64(max_zopfli_len),
        lcp.ctypes.data_as(F64),
        cost_cmd.ctypes.data_as(F64), cds.ctypes.data_as(F64),
        cd4.ctypes.data_as(F64), ctypes.c_int64(dist_alpha),
        _ptr(cand_off), ctypes.c_void_p(packed.ctypes.data),
        _ptr(np.ascontiguousarray(ins_code, np.int64)),
        _ptr(np.ascontiguousarray(ins_extra, np.int64)),
        _ptr(np.ascontiguousarray(cmd_sym, np.int64)),
        _ptr(np.ascontiguousarray(cmd_sym_last, np.int64)),
        _ptr(data, U8), ctypes.c_int64(len(data)),
        ctypes.c_int64(dict_len), ctypes.c_int64(window_size),
        _ptr(cache0),
        cost.ctypes.data_as(F32), prev_start.ctypes.data_as(I32),
        prev_len.ctypes.data_as(I32), prev_wire.ctypes.data_as(I32),
        prev_dist.ctypes.data_as(I32), node_cache.ctypes.data_as(I32),
        *range_args)
    return cost, prev_start, prev_len, prev_wire, prev_dist


def collect_dict(data, dict_len, window_size, entry_bytes, e_out,
                 e_wire, e_wid, table, hash_bits):
    """Transform-aware dictionary matches via the native probe over the
    expanded index (same contract as static_dict.collect_dict_matches)."""
    lib = get_lib()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = len(data)
    table2 = np.ascontiguousarray(table, dtype=np.int32)
    slots = table.shape[1]
    cap = max(16, (n - dict_len) * 6)
    out_p = np.empty(cap, dtype=np.int64)
    out_l = np.empty(cap, dtype=np.int64)
    out_d = np.empty(cap, dtype=np.int64)
    out_w = np.empty(cap, dtype=np.int64)
    I32 = ctypes.POINTER(ctypes.c_int32)
    m = lib.collect_dict_native(
        _ptr(data, U8), ctypes.c_int64(n), ctypes.c_int64(dict_len),
        ctypes.c_int64(window_size),
        _ptr(entry_bytes, U8), ctypes.c_int64(entry_bytes.shape[1]),
        _ptr(e_out), _ptr(e_wire), _ptr(e_wid),
        table2.ctypes.data_as(I32), ctypes.c_int64(hash_bits),
        ctypes.c_int64(slots),
        _ptr(out_p), _ptr(out_l), _ptr(out_d), _ptr(out_w),
        ctypes.c_int64(cap))
    return out_p[:m], out_l[:m], out_d[:m], out_w[:m]


def sorted_dict_index_native():
    """The sorted (word x transform) dictionary index built by the
    native runtime (zopfli_hq.cpp build_sorted_index) — same rows as
    static_dict.sorted_dict_index's numpy builder at ~10x the speed.
    Returns (sb[m, 38], out_len, wire, wid) as zero-copy views over
    process-lifetime native buffers, or None."""
    lib = get_lib()
    lib.zopfli_hq_sorted_index.restype = ctypes.c_int64
    lib.BrotliTpuEnsureHqDict()
    U8P = ctypes.POINTER(ctypes.c_uint8)
    I64P = ctypes.POINTER(ctypes.c_int64)
    sb_p = U8P()
    len_p = I64P()
    wire_p = I64P()
    wid_p = I64P()
    m = lib.zopfli_hq_sorted_index(
        ctypes.byref(sb_p), ctypes.byref(len_p), ctypes.byref(wire_p),
        ctypes.byref(wid_p))
    if m <= 0:
        return None
    sb = np.ctypeslib.as_array(sb_p, shape=(m, 38))
    s_len = np.ctypeslib.as_array(len_p, shape=(m,))
    s_wire = np.ctypeslib.as_array(wire_p, shape=(m,))
    s_wid = np.ctypeslib.as_array(wid_p, shape=(m,))
    return sb, s_len, s_wire, s_wid


_DICT_SORTED_STATE = None  # (lpf, bloom, key8, range16), built once


def collect_dict_sorted(data, dict_len, window_size, progress=None,
                        out=None):
    """Exact transform-aware dictionary matches via the native
    predecessor search over the sorted-output index (same contract as
    static_dict.collect_dict_matches)."""
    global _DICT_SORTED_STATE
    from .encode.static_dict import sorted_dict_index
    lib = get_lib()
    sb, s_len, s_wire, s_wid = sorted_dict_index()
    m = len(s_len)
    I32 = ctypes.POINTER(ctypes.c_int32)
    U64 = ctypes.POINTER(ctypes.c_uint64)
    if _DICT_SORTED_STATE is None:
        lpf = np.empty(m, dtype=np.int32)
        bloom = np.empty(1 << 21, dtype=np.uint8)
        key8 = np.empty(m, dtype=np.uint64)
        range16 = np.empty(65537, dtype=np.int32)
        lib.dict_sorted_init_native(
            _ptr(sb, U8), _ptr(s_len), ctypes.c_int64(m),
            lpf.ctypes.data_as(I32), _ptr(bloom, U8),
            key8.ctypes.data_as(U64), range16.ctypes.data_as(I32))
        _DICT_SORTED_STATE = (lpf, bloom, key8, range16)
    lpf, bloom, key8, range16 = _DICT_SORTED_STATE
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = len(data)
    cap = max(64, (n - dict_len) * 6)
    while True:
        if out is not None:
            out_p, out_l, out_d, out_w = out
            cap = len(out_p)
        else:
            out_p = np.empty(cap, dtype=np.int64)
            out_l = np.empty(cap, dtype=np.int64)
            out_d = np.empty(cap, dtype=np.int64)
            out_w = np.empty(cap, dtype=np.int64)
        cnt = lib.collect_dict_sorted_native(
            _ptr(data, U8), ctypes.c_int64(n), ctypes.c_int64(dict_len),
            ctypes.c_int64(window_size),
            _ptr(sb, U8), _ptr(s_len), _ptr(s_wire), _ptr(s_wid),
            lpf.ctypes.data_as(I32), ctypes.c_int64(m), _ptr(bloom, U8),
            key8.ctypes.data_as(U64), range16.ctypes.data_as(I32),
            _ptr(out_p), _ptr(out_l), _ptr(out_d), _ptr(out_w),
            ctypes.c_int64(cap),
            _ptr(progress) if progress is not None else
            ctypes.POINTER(ctypes.c_int64)())
        if cnt >= 0:
            return out_p[:cnt], out_l[:cnt], out_d[:cnt], out_w[:cnt]
        if out is not None:
            # caller-provided buffers (overlapped path): signal
            # overflow instead of reallocating under the consumer
            return None
        cap *= 2


def pack_bits(bits, nbits):
    """Native bit packer; same contract as bitstream.pack_bits."""
    lib = get_lib()
    bits = np.ascontiguousarray(bits, dtype=np.uint64)
    nbits = np.ascontiguousarray(nbits, dtype=np.int64)
    total = int(nbits.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint64), 0
    words = _scratch("pb_words", total // 64 + 2, np.uint64)
    words[:] = 0
    U64 = ctypes.POINTER(ctypes.c_uint64)
    lib.pack_bits_native(bits.ctypes.data_as(U64), _ptr(nbits),
                         ctypes.c_int64(len(bits)),
                         words.ctypes.data_as(U64))
    return words, total


def find_best_matches(data, window_size, k=8, bucket_bits=17, k8=4,
                      bucket_bits8=18, hash_len=4, min_length=4,
                      literal_byte_score=540, dict_len=0,
                      use_dictionary=True, match_cap=320,
                      want_top2=False, miss_economy=False,
                      out=None, progress=None):
    """Native match finder; same contract as match.find_best_matches.
    With want_top2, also returns the runner-up (len, dist) arrays
    (distinct distance) for Zopfli candidate diversity.
    miss_economy enables the incompressible-span scan economy (scan
    depth backs off over matchless runs — collection callers only; it
    deviates from the numpy oracle on sparse spans)."""
    lib = get_lib()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = len(data)
    if out is not None:
        # caller-provided output rows (overlapped collection): each
        # must be contiguous and n long; b2 slots may be None
        (best_len, best_dist, best_score, best_isdict, best_wire,
         b2l, b2d) = out
    else:
        best_len = np.zeros(n, dtype=np.int64)
        best_dist = np.zeros(n, dtype=np.int64)
        best_score = np.zeros(n, dtype=np.int64)
        best_isdict = np.zeros(n, dtype=np.uint8)
        best_wire = np.zeros(n, dtype=np.int64)
        b2l = np.zeros(n, dtype=np.int64) if want_top2 else None
        b2d = np.zeros(n, dtype=np.int64) if want_top2 else None
    if use_dictionary:
        from .encode.static_dict import (DICT_HASH_BITS, dict_index,
                                         omit_last_transform_ids)
        word_bytes, word_len, word_idx, table, size_bits = dict_index()
        word_bytes = np.ascontiguousarray(word_bytes, dtype=np.uint8)
        word_len = np.ascontiguousarray(word_len, dtype=np.int64)
        word_idx = np.ascontiguousarray(word_idx, dtype=np.int64)
        table = np.ascontiguousarray(table, dtype=np.int64)
        size_bits = np.ascontiguousarray(size_bits, dtype=np.int64)
        omit_ids = np.ascontiguousarray(omit_last_transform_ids(),
                                        dtype=np.int64)
        dict_args = (_ptr(table), ctypes.c_int64(DICT_HASH_BITS),
                     ctypes.c_int64(table.shape[1]),
                     _ptr(word_bytes, U8), _ptr(word_len),
                     _ptr(word_idx), _ptr(size_bits), _ptr(omit_ids))
    else:
        null = ctypes.POINTER(ctypes.c_int64)()
        dict_args = (null, ctypes.c_int64(0), ctypes.c_int64(0),
                     ctypes.POINTER(ctypes.c_uint8)(), null, null,
                     null, null)
    lib.find_matches_native(
        _ptr(data, U8), ctypes.c_int64(n), ctypes.c_int64(dict_len),
        ctypes.c_int64(window_size), ctypes.c_int64(k),
        ctypes.c_int64(bucket_bits), ctypes.c_int64(k8),
        ctypes.c_int64(bucket_bits8), ctypes.c_int64(hash_len),
        ctypes.c_int64(literal_byte_score // 4),
        ctypes.c_int64(match_cap),
        *dict_args,
        _ptr(best_len), _ptr(best_dist), _ptr(best_score),
        _ptr(best_isdict, U8), _ptr(best_wire),
        _ptr(b2l) if want_top2 else I64(),
        _ptr(b2d) if want_top2 else I64(),
        ctypes.c_int64(1 if miss_economy else 0),
        _ptr(progress) if progress is not None else I64())
    ibd = best_isdict.astype(bool)
    sl = slice(dict_len, None) if dict_len else slice(None)
    base = (best_len[sl], best_dist[sl], best_score[sl], ibd[sl],
            best_wire[sl])
    if want_top2:
        return base + (b2l[sl], b2d[sl])
    return base


def compress_session_pipeline(data, window_size, span, quality,
                              suppress_last, initial_cache,
                              bit_phase=0, use_dictionary=True,
                              k=1, bucket_bits=16, k8=0,
                              bucket_bits8=15, hash_len=4, n_cache=1,
                              literal_byte_score=540):
    """Whole-stream q2/q3 encode (compress_session_pipeline_native):
    basic-tier parse session on a worker thread, trivial store +
    bit-level assembly on the caller thread, no Python per metablock
    (the basic-tier analog of compress_fragment_pipeline).  Returns
    (words, nbits, cache) like compress_fragment_pipeline, or None on
    overflow."""
    lib = get_lib()
    data = np.ascontiguousarray(data, np.uint8)
    n = len(data)
    cap_bits = 9 * n + (1 << 18)
    words = _scratch("sess_words", cap_bits // 64 + 2, np.uint64)
    words[:] = 0
    cache_io = np.asarray(initial_cache, dtype=np.int64).copy()
    dict_args, dict_refs = _dict_index_args(use_dictionary)
    U64 = ctypes.POINTER(ctypes.c_uint64)
    r = lib.compress_session_pipeline_native(
        _ptr(data, U8), ctypes.c_int64(n), ctypes.c_int64(window_size),
        ctypes.c_int64(span), ctypes.c_int64(quality),
        ctypes.c_int64(k), ctypes.c_int64(bucket_bits),
        ctypes.c_int64(k8), ctypes.c_int64(bucket_bits8),
        ctypes.c_int64(hash_len), ctypes.c_int64(n_cache),
        ctypes.c_int64(literal_byte_score // 4),
        *dict_args,
        ctypes.c_int64(int(suppress_last)),
        ctypes.c_int64(bit_phase & 7), _ptr(cache_io),
        words.ctypes.data_as(U64), ctypes.c_int64(cap_bits))
    del dict_refs
    if r < 0:
        return None
    return words, int(r), cache_io.tolist()


def _dict_index_args(use_dictionary):
    if use_dictionary:
        from .encode.static_dict import (DICT_HASH_BITS, dict_index,
                                         omit_last_transform_ids)
        word_bytes, word_len, word_idx, table, size_bits = dict_index()
        refs = (np.ascontiguousarray(table, dtype=np.int64),
                np.ascontiguousarray(word_bytes, dtype=np.uint8),
                np.ascontiguousarray(word_len, dtype=np.int64),
                np.ascontiguousarray(word_idx, dtype=np.int64),
                np.ascontiguousarray(size_bits, dtype=np.int64),
                np.ascontiguousarray(omit_last_transform_ids(),
                                     dtype=np.int64))
        args = (_ptr(refs[0]), ctypes.c_int64(DICT_HASH_BITS),
                ctypes.c_int64(refs[0].shape[1]), _ptr(refs[1], U8),
                _ptr(refs[2]), _ptr(refs[3]), _ptr(refs[4]),
                _ptr(refs[5]))
        return args, refs
    null = ctypes.POINTER(ctypes.c_int64)()
    return (null, ctypes.c_int64(0), ctypes.c_int64(0),
            ctypes.POINTER(ctypes.c_uint8)(), null, null, null,
            null), ()


class ParseSession:
    """Incremental form of combined_parse: state (hash tables, distance
    cache, walk position) persists across next() calls, so delivering
    the parse one metablock at a time is byte-identical to one whole-
    input call.  next() must be called serially in boundary order; the
    encoder runs it on a worker thread to overlap parse(g+1) with
    metablock serialization(g) (ctypes releases the GIL)."""

    def __init__(self, data, window_size, dict_len=0, pos0=0,
                 initial_cache=(4, 11, 15, 16), k=8, bucket_bits=17,
                 k8=4, bucket_bits8=18, hash_len=4, n_cache=4,
                 literal_byte_score=540, use_dictionary=True):
        lib = get_lib()
        assert lib is not None
        self._lib = lib
        self._data = np.ascontiguousarray(data, dtype=np.uint8)
        self._dict_args, self._dict_refs = _dict_index_args(
            use_dictionary)
        self._cache = np.asarray(initial_cache, dtype=np.int64)
        self._handle = lib.parse_session_begin(
            _ptr(self._data, U8), ctypes.c_int64(len(self._data)),
            ctypes.c_int64(dict_len), ctypes.c_int64(window_size),
            ctypes.c_int64(k), ctypes.c_int64(bucket_bits),
            ctypes.c_int64(k8), ctypes.c_int64(bucket_bits8),
            ctypes.c_int64(hash_len), ctypes.c_int64(n_cache),
            ctypes.c_int64(literal_byte_score // 4),
            *self._dict_args,
            ctypes.c_int64(pos0), _ptr(self._cache))

    def next(self, boundary_rel: int, max_cmds: int | None = None):
        """Parse up to boundary_rel (region-relative); returns one
        segment (insert[], wire[], dist[], advance[])."""
        assert self._handle is not None
        if max_cmds is None:
            max_cmds = boundary_rel // 2 + 2
        out_i = np.empty(max_cmds, dtype=np.int64)
        out_c = np.empty(max_cmds, dtype=np.int64)
        out_d = np.empty(max_cmds, dtype=np.int64)
        out_a = np.empty(max_cmds, dtype=np.int64)
        cnt = self._lib.parse_session_next(
            ctypes.c_void_p(self._handle),
            ctypes.c_int64(boundary_rel),
            _ptr(out_i), _ptr(out_c), _ptr(out_d), _ptr(out_a),
            ctypes.c_int64(max_cmds))
        return (out_i[:cnt], out_c[:cnt], out_d[:cnt], out_a[:cnt])

    def prime(self, boundary_rel):
        """Advance the session to boundary_rel by ring inserts only
        (no searching, no commands) — the dual-session parse uses this
        to skip the half-metablocks the OTHER session parses."""
        assert self._handle is not None
        self._lib.parse_session_prime(ctypes.c_void_p(self._handle),
                                      ctypes.c_int64(boundary_rel))

    def extend(self, data):
        """Append input to a live session (streaming PROCESS): `data`
        must contain the session's previous bytes unchanged as a
        prefix.  Keeps a reference so the walk's pointer stays valid."""
        assert self._handle is not None
        self._data = np.ascontiguousarray(data, dtype=np.uint8)
        self._lib.parse_session_extend(
            ctypes.c_void_p(self._handle), _ptr(self._data, U8),
            ctypes.c_int64(len(self._data)))

    def close(self):
        if self._handle is not None:
            self._lib.parse_session_end(ctypes.c_void_p(self._handle))
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def combined_parse(data, window_size, boundaries, dict_len=0, pos0=0,
                   initial_cache=(4, 11, 15, 16), k=8, bucket_bits=17,
                   k8=4, bucket_bits8=18, hash_len=4, n_cache=4,
                   literal_byte_score=540, use_dictionary=True):
    """One-pass native search+parse (the reference's
    CreateBackwardReferences shape).  Returns segments like
    match.greedy_parse: (insert[], wire[], dist[], advance[])."""
    lib = get_lib()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = len(data) - dict_len
    dict_args, _refs = _dict_index_args(use_dictionary)
    bnd = np.asarray(boundaries, dtype=np.int64)
    cache = np.asarray(initial_cache, dtype=np.int64)
    max_cmds = n // 2 + len(bnd) + 2
    out_i = np.empty(max_cmds, dtype=np.int64)
    out_c = np.empty(max_cmds, dtype=np.int64)
    out_d = np.empty(max_cmds, dtype=np.int64)
    out_a = np.empty(max_cmds, dtype=np.int64)
    seg_counts = np.zeros(len(bnd), dtype=np.int64)
    n_out = lib.combined_parse_native(
        _ptr(data, U8), ctypes.c_int64(len(data)),
        ctypes.c_int64(dict_len), ctypes.c_int64(window_size),
        ctypes.c_int64(k), ctypes.c_int64(bucket_bits),
        ctypes.c_int64(k8), ctypes.c_int64(bucket_bits8),
        ctypes.c_int64(hash_len), ctypes.c_int64(n_cache),
        ctypes.c_int64(literal_byte_score // 4),
        *dict_args,
        _ptr(bnd), ctypes.c_int64(len(bnd)), ctypes.c_int64(pos0),
        _ptr(cache),
        _ptr(out_i), _ptr(out_c), _ptr(out_d), _ptr(out_a),
        _ptr(seg_counts), ctypes.c_int64(max_cmds))
    segments = []
    off = 0
    for cnt in seg_counts.tolist():
        segments.append((out_i[off:off + cnt].copy(),
                         out_c[off:off + cnt].copy(),
                         out_d[off:off + cnt].copy(),
                         out_a[off:off + cnt].copy()))
        off += cnt
    assert off == n_out
    return segments


def zopfli_dp_cache(n, lcp, cost_cmd, cost_dist_short, edge_off,
                    e_len, e_wire, e_dist, e_ccode, e_base, e_dcost,
                    ins_code_tab, ins_extra_tab, cmd_sym_tab,
                    cmd_sym_last_tab, data, dict_len, window_size,
                    initial_cache):
    """Cache-aware native Zopfli relaxation (short-code edge costs +
    cache-continuation edges); returns (cost, prev_start, prev_len,
    prev_wire, prev_dist)."""
    lib = get_lib()
    arrs = dict(
        lcp=np.ascontiguousarray(lcp, dtype=np.float64),
        cost_cmd=np.ascontiguousarray(cost_cmd, dtype=np.float64),
        cds=np.ascontiguousarray(cost_dist_short, dtype=np.float64),
        eo=np.ascontiguousarray(edge_off, dtype=np.int64),
        el=np.ascontiguousarray(e_len, dtype=np.int64),
        ew=np.ascontiguousarray(e_wire, dtype=np.int64),
        ed=np.ascontiguousarray(e_dist, dtype=np.int64),
        ec=np.ascontiguousarray(e_ccode, dtype=np.int64),
        eb=np.ascontiguousarray(e_base, dtype=np.float64),
        edc=np.ascontiguousarray(e_dcost, dtype=np.float64),
        ict=np.ascontiguousarray(ins_code_tab, dtype=np.int64),
        iet=np.ascontiguousarray(ins_extra_tab, dtype=np.int64),
        cst=np.ascontiguousarray(cmd_sym_tab, dtype=np.int64),
        cslt=np.ascontiguousarray(cmd_sym_last_tab, dtype=np.int64),
        data=np.ascontiguousarray(data, dtype=np.uint8),
        cache=np.ascontiguousarray(initial_cache, dtype=np.int64),
    )
    cost = np.empty(n + 1, dtype=np.float64)
    prev_start = np.empty(n + 1, dtype=np.int64)
    prev_len = np.empty(n + 1, dtype=np.int64)
    prev_wire = np.empty(n + 1, dtype=np.int64)
    prev_dist = np.empty(n + 1, dtype=np.int64)
    node_cache = np.empty(4 * (n + 1), dtype=np.int64)
    lib.zopfli_dp_cache_native(
        ctypes.c_int64(n), _ptr(arrs["lcp"], F64),
        _ptr(arrs["cost_cmd"], F64), _ptr(arrs["cds"], F64),
        _ptr(arrs["eo"]), _ptr(arrs["el"]), _ptr(arrs["ew"]),
        _ptr(arrs["ed"]), _ptr(arrs["ec"]), _ptr(arrs["eb"], F64),
        _ptr(arrs["edc"], F64),
        _ptr(arrs["ict"]), _ptr(arrs["iet"]), _ptr(arrs["cst"]),
        _ptr(arrs["cslt"]),
        _ptr(arrs["data"], U8), ctypes.c_int64(len(arrs["data"])),
        ctypes.c_int64(dict_len), ctypes.c_int64(window_size),
        _ptr(arrs["cache"]),
        _ptr(cost, F64), _ptr(prev_start), _ptr(prev_len),
        _ptr(prev_wire), _ptr(prev_dist), _ptr(node_cache))
    return cost, prev_start, prev_len, prev_wire, prev_dist


def zopfli_dp(n, lcp, cost_cmd, edge_off, e_len, e_wire, e_dist,
              e_ccode, e_base, ins_code_tab, ins_extra_tab,
              cmd_sym_tab):
    """Native Zopfli relaxation; returns (cost, prev_start, prev_len,
    prev_wire, prev_dist)."""
    lib = get_lib()
    lcp = np.ascontiguousarray(lcp, dtype=np.float64)
    cost_cmd = np.ascontiguousarray(cost_cmd, dtype=np.float64)
    edge_off = np.ascontiguousarray(edge_off, dtype=np.int64)
    e_len = np.ascontiguousarray(e_len, dtype=np.int64)
    e_wire = np.ascontiguousarray(e_wire, dtype=np.int64)
    e_dist = np.ascontiguousarray(e_dist, dtype=np.int64)
    e_ccode = np.ascontiguousarray(e_ccode, dtype=np.int64)
    e_base = np.ascontiguousarray(e_base, dtype=np.float64)
    ins_code_tab = np.ascontiguousarray(ins_code_tab, dtype=np.int64)
    ins_extra_tab = np.ascontiguousarray(ins_extra_tab, dtype=np.int64)
    cmd_sym_tab = np.ascontiguousarray(cmd_sym_tab, dtype=np.int64)
    cost = np.empty(n + 1, dtype=np.float64)
    prev_start = np.empty(n + 1, dtype=np.int64)
    prev_len = np.empty(n + 1, dtype=np.int64)
    prev_wire = np.empty(n + 1, dtype=np.int64)
    prev_dist = np.empty(n + 1, dtype=np.int64)
    lib.zopfli_dp_native(
        ctypes.c_int64(n), _ptr(lcp, F64), _ptr(cost_cmd, F64),
        _ptr(edge_off), _ptr(e_len), _ptr(e_wire), _ptr(e_dist),
        _ptr(e_ccode),
        _ptr(e_base, F64), _ptr(ins_code_tab), _ptr(ins_extra_tab),
        _ptr(cmd_sym_tab),
        _ptr(cost, F64), _ptr(prev_start), _ptr(prev_len),
        _ptr(prev_wire), _ptr(prev_dist))
    return cost, prev_start, prev_len, prev_wire, prev_dist


def invert_perm32(pos_s, val_s):
    """Apply a device-returned permutation on the host: out[pos_s[j]]
    = val_s[j] (two-pass radix over L1-resident regions; pos_s is an
    exact permutation of [0, n))."""
    lib = get_lib()
    I32 = ctypes.POINTER(ctypes.c_int32)
    pos_s = np.ascontiguousarray(pos_s, np.int32)
    val_s = np.ascontiguousarray(val_s, np.int32)
    n = len(pos_s)
    out = _scratch("invperm_out", n, np.int32)
    lib.invert_perm32_native(_ptr(pos_s, I32), _ptr(val_s, I32),
                             ctypes.c_int64(n), _ptr(out, I32))
    return out


def invert_merge32(pos_a, val_a, sc_a, pos_b, val_b, sc_b):
    """Merged double inversion for the exact9 two-fold device form:
    apply permutation A, then B where B's score strictly wins."""
    lib = get_lib()
    I32 = ctypes.POINTER(ctypes.c_int32)
    args = [np.ascontiguousarray(a, np.int32)
            for a in (pos_a, val_a, sc_a, pos_b, val_b, sc_b)]
    n = len(args[0])
    out_val = _scratch("invmerge_val", n, np.int32)
    out_sc = _scratch("invmerge_sc", n, np.int32)
    lib.invert_merge32_native(
        *[_ptr(a, I32) for a in args], ctypes.c_int64(n),
        _ptr(out_val, I32), _ptr(out_sc, I32))
    return out_val


def lz_execute(prefix, lits, cmds, ncmd, window, mlen):
    """Apply device-decoded (literals, commands) over the retained
    prefix (native memcpy-speed LZ execution for the TPU batch
    decoder).  Returns the body bytes, or None on inconsistency."""
    lib = get_lib()
    I32 = ctypes.POINTER(ctypes.c_int32)
    lits = np.ascontiguousarray(lits, np.uint8)
    cmds = np.ascontiguousarray(cmds, np.int32)
    buf = np.empty(len(prefix) + int(mlen) + 64, np.uint8)
    if len(prefix):
        buf[:len(prefix)] = np.frombuffer(prefix, np.uint8)
    r = lib.lz_execute_native(
        _ptr(lits, U8), ctypes.c_int64(len(lits)),
        _ptr(cmds, I32), ctypes.c_int64(int(ncmd)),
        ctypes.c_int64(len(prefix)), ctypes.c_int64(int(window)),
        ctypes.c_int64(int(mlen)), _ptr(buf, U8))
    if r != mlen:
        return None
    return buf[len(prefix):len(prefix) + int(mlen)].tobytes()


def parse_lane_header(data: bytes):
    """Native lane-header walk for the TPU batch decoder (mirrors
    decode.batch_tpu._try_parse_stream).  Returns None when the stream
    is ineligible for the device tier, else (meta, pre_segments,
    lit_len, cmd_len, dist_len) with meta = (bit0, mlen, wbits,
    npostfix, ndirect, dist_alpha, n_pre, out_prefix_len)."""
    lib = get_lib()
    buf = np.frombuffer(data, np.uint8)
    meta = np.zeros(8, np.int64)
    pre = np.zeros(2 * 64, np.int64)
    lit = np.zeros(256, np.uint8)
    cmd = np.zeros(704, np.uint8)
    dl = np.zeros(1024, np.uint8)
    r = lib.parse_lane_header_native(
        _ptr(buf, U8), ctypes.c_int64(len(buf)), _ptr(meta),
        _ptr(pre), ctypes.c_int64(64), _ptr(lit, U8), _ptr(cmd, U8),
        _ptr(dl, U8))
    if r != 1:
        return None
    n_pre = int(meta[6])
    segs = [(int(pre[2 * i]), int(pre[2 * i + 1]))
            for i in range(n_pre)]
    return meta, segs, lit, cmd, dl[:int(meta[5])]
