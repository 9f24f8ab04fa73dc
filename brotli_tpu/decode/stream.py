"""Resumable streaming decode (BrotliDecompressStream parity).

API surface matches the reference's re-exported decompressor
(src/lib.rs:33-52, src/ffi/decompressor.rs): feed input in arbitrary
chunks, get output incrementally, suspend/resume at any byte boundary.
Granularity is the metablock: on input exhaustion mid-block the reader
position, output length, and distance cache roll back to the block
start and decoding resumes when more input arrives.
"""

from __future__ import annotations

from enum import IntEnum

from ..core import constants as C
from ..core.bitio import BitReader, NeedsMoreInput
from ..core.dictionary import get_dictionary
from .decoder import BrotliDecodeError, Decoder, _read_window_bits


class Result(IntEnum):
    """Reference BrotliResult (ffi/decompressor.rs)."""
    ResultFailure = 0
    ResultSuccess = 1
    NeedsMoreInput = 2
    NeedsMoreOutput = 3


class StreamDecoder:
    """Incremental RFC 7932 decoder."""

    def __init__(self, custom_dictionary: bytes = b"",
                 large_window: bool = False):
        self._dec = Decoder(custom_dictionary, large_window)
        self._reader = BitReader(b"")
        self._out = bytearray()
        self._emitted = 0
        self._dist_cache = list(C.INITIAL_DISTANCE_CACHE)
        self._window_size = None
        self._static_dict = get_dictionary()
        self.finished = False
        self.error = None

    @property
    def total_out(self) -> int:
        return len(self._out)

    def decompress(self, chunk: bytes) -> bytes:
        """Feed more input; returns newly available output bytes."""
        if self.error:
            raise self.error
        if chunk:
            self._reader.extend(bytes(chunk))
        r = self._reader
        dec = self._dec
        while not self.finished:
            ckpt = r.checkpoint()
            out_len = len(self._out)
            cache_snapshot = list(self._dist_cache)
            try:
                if self._window_size is None:
                    wbits = _read_window_bits(r, dec.large_window)
                    self._window_size = (1 << wbits) - 16
                    continue
                islast = r.read(1)
                if islast and r.read(1):  # ISLASTEMPTY
                    self.finished = True
                    break
                mnibbles = r.read(2)
                if mnibbles == 3:
                    if r.read(1):
                        raise BrotliDecodeError("reserved bit set")
                    mskip = r.read(2)
                    skip = (r.read(8 * mskip) + 1) if mskip else 0
                    if r.align_to_byte():
                        raise BrotliDecodeError("nonzero metadata padding")
                    r.read_bytes(skip)
                    if islast:
                        self.finished = True
                    continue
                mlen = r.read(16 + 4 * mnibbles) + 1
                if not islast and r.read(1):  # ISUNCOMPRESSED
                    r.align_to_byte()
                    self._out += r.read_bytes(mlen)
                    continue
                dec._decode_compressed_metablock(
                    r, self._out, mlen, self._window_size,
                    self._dist_cache, dec.custom_dictionary,
                    self._static_dict)
                if islast:
                    self.finished = True
            except NeedsMoreInput:
                r.restore(ckpt)
                del self._out[out_len:]
                self._dist_cache[:] = cache_snapshot
                break
            except (ValueError, BrotliDecodeError) as e:
                self.error = e if isinstance(e, BrotliDecodeError) \
                    else BrotliDecodeError(str(e))
                raise self.error from None
        new = bytes(self._out[self._emitted:])
        self._emitted = len(self._out)
        return new

    def finish(self) -> bytes:
        """Signal end of input; raises if the stream is incomplete."""
        out = self.decompress(b"")
        if not self.finished:
            raise BrotliDecodeError("truncated brotli stream")
        return out
