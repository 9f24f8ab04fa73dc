"""Batched decompression: independent streams decoded in parallel.

The serving-path analog of the framework's sharded encode: brotli
decoding is serial within a stream, so throughput scales by decoding
many streams at once.  The native decoder releases the GIL during the
ctypes call, so a thread pool gives near-linear scaling; each worker
gets its own prefix-table arena.

(The reference's parallelism story is encode-side only; batched decode
is this framework's production-serving addition.)
"""

from __future__ import annotations

import ctypes
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .decoder import BrotliDecodeError, Decoder
from ..core.bitio import NeedsMoreInput

_tls = threading.local()


def _decode_one(stream: bytes, custom_dictionary: bytes,
                large_window: bool, size_hint) -> bytes:
    from .. import native_bridge as nb
    if not nb.available():
        return Decoder(custom_dictionary, large_window).decompress(stream)
    # per-thread table arena
    if not hasattr(_tls, "table_mem"):
        _tls.table_mem = np.zeros(1 << 23, dtype=np.int32)
    lib = nb.get_lib()
    src = np.frombuffer(bytes(stream), dtype=np.uint8)
    cd = np.frombuffer(bytes(custom_dictionary), dtype=np.uint8)
    cap = max(size_hint or 0, 4 * len(src) + (1 << 16))
    while True:
        # pooled per-thread output buffer: a fresh np.empty above the
        # malloc mmap threshold re-faults every page per call
        buf = getattr(_tls, "out_buf", None)
        if buf is None or len(buf) < cap:
            buf = _tls.out_buf = np.empty(cap, dtype=np.uint8)
        out = buf
        r = lib.decode_native(
            nb._ptr(src, nb.U8), ctypes.c_int64(len(src)),
            nb._ptr(out, nb.U8), ctypes.c_int64(cap),
            nb._ptr(cd, nb.U8) if len(cd)
            else ctypes.POINTER(ctypes.c_uint8)(),
            ctypes.c_int64(len(cd)),
            ctypes.c_int64(int(large_window)),
            nb._ptr(_tls.table_mem), ctypes.c_int64(len(_tls.table_mem)))
        if r == -3:
            if cap >= 1 << 31:
                raise BrotliDecodeError("output too large")
            cap *= 8
            continue
        if r == -1:
            raise NeedsMoreInput()
        if r < 0:
            raise BrotliDecodeError(f"corrupt stream (code {r})")
        return out[:r].tobytes()


def decompress_batch(streams, custom_dictionary: bytes = b"",
                     large_window: bool = False, threads: int = 8,
                     size_hints=None):
    """Decode a list of independent brotli streams concurrently.

    Returns a list of bytes in input order.  Raises the first error
    encountered (all workers still drain, like the reference's
    join-all semantics)."""
    streams = list(streams)
    hints = size_hints or [None] * len(streams)
    if threads <= 1 or len(streams) <= 1:
        return [_decode_one(s, custom_dictionary, large_window, h)
                for s, h in zip(streams, hints)]
    results = [None] * len(streams)
    first_err = None
    with ThreadPoolExecutor(max_workers=threads) as pool:
        futs = {pool.submit(_decode_one, s, custom_dictionary,
                            large_window, h): i
                for i, (s, h) in enumerate(zip(streams, hints))}
        for f, i in futs.items():
            try:
                results[i] = f.result()
            except Exception as e:  # noqa: BLE001
                if first_err is None:
                    first_err = e
    if first_err is not None:
        raise first_err
    return results
