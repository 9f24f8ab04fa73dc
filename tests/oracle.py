"""Upstream brotli oracle via the system C library (test-only).

Wraps libbrotlienc/libbrotlidec with ctypes so tests can verify:
  - our decoder against upstream-encoded streams at every quality
  - our encoder's output through the upstream decoder (bit-exact round trip)
  - compressed-size baselines (the reference claims q0-q9 bit-parity with
    the C engine, so C sizes stand in for reference sizes: see
    /root/reference/README.md "Compression Usage").
"""

import ctypes

_enc = None
_dec = None


def _libs():
    global _enc, _dec
    if _enc is None:
        _enc = ctypes.CDLL("libbrotlienc.so.1")
        _dec = ctypes.CDLL("libbrotlidec.so.1")
    return _enc, _dec


BROTLI_PARAM_MODE = 0
BROTLI_PARAM_QUALITY = 1
BROTLI_PARAM_LGWIN = 2
BROTLI_PARAM_LGBLOCK = 3
BROTLI_PARAM_LARGE_WINDOW = 6

BROTLI_OPERATION_FINISH = 2


def available() -> bool:
    try:
        _libs()
        return True
    except OSError:
        return False


def compress(data: bytes, quality: int = 5, lgwin: int = 22) -> bytes:
    enc, _ = _libs()
    enc.BrotliEncoderCompress.restype = ctypes.c_int
    max_size = len(data) + (len(data) >> 2) + 1024
    out = ctypes.create_string_buffer(max_size)
    out_size = ctypes.c_size_t(max_size)
    ok = enc.BrotliEncoderCompress(
        ctypes.c_int(quality), ctypes.c_int(lgwin), ctypes.c_int(0),
        ctypes.c_size_t(len(data)), data,
        ctypes.byref(out_size), out)
    if not ok:
        raise RuntimeError("oracle compress failed")
    return out.raw[:out_size.value]


def decompress(data: bytes, max_size_hint: int = None) -> bytes:
    _, dec = _libs()
    dec.BrotliDecoderDecompress.restype = ctypes.c_int
    size = max(1024, (max_size_hint or len(data) * 64))
    while True:
        out = ctypes.create_string_buffer(size)
        out_size = ctypes.c_size_t(size)
        rc = dec.BrotliDecoderDecompress(
            ctypes.c_size_t(len(data)), data, ctypes.byref(out_size), out)
        if rc == 1:  # BROTLI_DECODER_RESULT_SUCCESS
            return out.raw[:out_size.value]
        if size > 1 << 30:
            raise RuntimeError(f"oracle decompress failed rc={rc}")
        size *= 8
