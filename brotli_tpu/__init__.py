"""tpu-brotli: a TPU-native Brotli (RFC 7932) codec framework.

Public API (capability parity with dropbox/rust-brotli, src/lib.rs):
  decompress(data, custom_dictionary=..., large_window=...) -> bytes
  compress(data, quality=..., lgwin=..., ...) -> bytes        (encode/)
  Streaming and parallel APIs live in brotli_tpu.encode / .parallel.
"""

from .decode.decoder import BrotliDecodeError, Decoder, decompress
from .encode.encoder import compress
from .encode.params import EncoderParams

__version__ = "0.1.0"

__all__ = [
    "BrotliDecodeError",
    "Decoder",
    "EncoderParams",
    "compress",
    "decompress",
    "__version__",
]
