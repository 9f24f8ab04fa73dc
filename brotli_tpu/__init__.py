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

from .concat.brocatli import BroCatli, BroCatliResult, concatenate
from .decode.decoder import BrotliDecodeError, Decoder, decompress
from .decode.batch import decompress_batch
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
    "decompress_batch",
]
