"""Standalone ctypes binding of the brotli_tpu C ABI — the analog of
the reference's Python binding (/root/reference/c/py/brotli.py): no
brotli_tpu package import, just libbrotli_tpu_native.so.

Usage:
    from bindings.py.brotli_ctypes import compress, decompress
    blob = compress(b"data", quality=9, num_threads=4)
    assert decompress(blob) == b"data"
"""

from __future__ import annotations

import ctypes
import os

_LIB_PATH = os.environ.get(
    "BROTLI_TPU_SO",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native",
        "libbrotli_tpu_native.so"))

_lib = None


def _get():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_LIB_PATH)
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
    return _lib


def compress(data: bytes, quality: int = 9, lgwin: int = 22,
             mode: int = 0, num_threads: int = 1) -> bytes:
    lib = _get()
    cap = int(lib.BrotliEncoderMaxCompressedSize(
        ctypes.c_size_t(len(data)))) + 64
    out = ctypes.create_string_buffer(cap)
    size = ctypes.c_size_t(cap)
    if num_threads > 1:
        pool = lib.BrotliEncoderCreateWorkPool(
            ctypes.c_size_t(num_threads - 1), None, None, None)
        try:
            keys = (ctypes.c_uint32 * 3)(1, 2, 3)
            vals = (ctypes.c_uint32 * 3)(mode, quality, lgwin)
            ok = lib.BrotliEncoderCompressWorkPool(
                pool, ctypes.c_size_t(3), keys, vals,
                ctypes.c_size_t(len(data)), data, ctypes.byref(size),
                out, ctypes.c_size_t(num_threads))
        finally:
            lib.BrotliEncoderDestroyWorkPool(pool)
    else:
        ok = lib.BrotliEncoderCompress(
            quality, lgwin, mode, ctypes.c_size_t(len(data)), data,
            ctypes.byref(size), out)
    if not ok:
        raise RuntimeError("brotli compression failed")
    return out.raw[:size.value]


def decompress(data: bytes, size_hint: int = 0) -> bytes:
    lib = _get()
    cap = max(size_hint, 4 * len(data) + 65536)
    while True:
        out = ctypes.create_string_buffer(cap)
        size = ctypes.c_size_t(cap)
        r = lib.BrotliDecoderDecompress(
            ctypes.c_size_t(len(data)), data, ctypes.byref(size), out)
        if r == 1:      # SUCCESS
            return out.raw[:size.value]
        if r == 3:      # NEEDS_MORE_OUTPUT
            cap *= 4
            continue
        raise ValueError("corrupt brotli stream" if r == 0
                         else "truncated brotli stream")
