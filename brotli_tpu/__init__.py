"""tpu-brotli: a TPU-native Brotli (RFC 7932) codec framework.

Capability parity with dropbox/rust-brotli (reference src/lib.rs):

  compress(data, quality=..., lgwin=..., catable=..., ...) -> bytes
  decompress(data, custom_dictionary=..., large_window=...) -> bytes
  Compressor / StreamDecoder            — incremental push APIs
  CompressorReader / CompressorWriter   — file-object wrappers
  Decompressor / DecompressorWriter
  compress_multi                        — parallel sharded compression
  BroCatli / concatenate                — lossless stream concatenation
  brotli_tpu.encode.fast.compress_fast  — jit-compiled TPU fast path
  brotli_tpu.parallel.mesh              — multi-chip shard_map pipeline
"""

def _tune_malloc():
    """Keep large allocations on the heap free-lists instead of mmap.

    The hot paths hand multi-MB numpy buffers back and forth; glibc's
    default 128 KiB mmap threshold returns each one to the OS on free,
    so every encode re-faults its working set (~15% of q11 wall time
    measured as minor faults).  Raising M_MMAP_THRESHOLD/-TRIM keeps the
    pages mapped across calls.  Opt out with BROTLI_TPU_NO_MALLOC_TUNE=1.
    """
    import ctypes
    import ctypes.util
    import os
    if os.environ.get("BROTLI_TPU_NO_MALLOC_TUNE"):
        return
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6",
                           use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 128 << 20)
        libc.mallopt(M_TRIM_THRESHOLD, 128 << 20)
    except Exception:
        pass  # non-glibc platforms: default allocator behavior


_tune_malloc()

from .concat.brocatli import BroCatli, BroCatliResult, concatenate
from .decode.decoder import BrotliDecodeError, Decoder, decompress
from .decode.batch import decompress_batch
from .decode.batch_tpu import decompress_batch_tpu
from .encode.batch import compress_batch
from .decode.stream import StreamDecoder
from .encode.encoder import compress
from .encode.params import EncoderParams
from .encode.streaming import Compressor
from .io_wrappers import (CompressorReader, CompressorWriter, Decompressor,
                          DecompressorWriter)
from .parallel.multi import compress_multi

__version__ = "0.1.0"

__all__ = [
    "BroCatli",
    "BroCatliResult",
    "BrotliDecodeError",
    "Compressor",
    "CompressorReader",
    "CompressorWriter",
    "Decoder",
    "Decompressor",
    "DecompressorWriter",
    "EncoderParams",
    "StreamDecoder",
    "__version__",
    "compress",
    "compress_multi",
    "concatenate",
    "decompress",
    "compress_batch",
    "decompress_batch",
    "decompress_batch_tpu",
]
