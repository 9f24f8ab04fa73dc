"""Example: file compression through the streaming writer
(reference examples/compress.rs)."""
import sys

from brotli_tpu import CompressorWriter


def main():
    quality = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    w = CompressorWriter(sys.stdout.buffer, quality=quality)
    while True:
        chunk = sys.stdin.buffer.read(1 << 16)
        if not chunk:
            break
        w.write(chunk)
    w.close()


if __name__ == "__main__":
    main()
