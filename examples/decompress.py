"""Example: streaming decompression (reference examples/decompress.rs)."""
import sys

from brotli_tpu import Decompressor


def main():
    r = Decompressor(sys.stdin.buffer)
    while True:
        chunk = r.read(1 << 16)
        if not chunk:
            break
        sys.stdout.buffer.write(chunk)


if __name__ == "__main__":
    main()
