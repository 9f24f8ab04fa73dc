"""On-chip throughput of the batched symbol-layer decoder
(ops/decode_tpu) on the real TPU: N single-tree streams decode their
entropy layer in one while_loop; report decoded MB/s for the device
leg (jit call wall time after warm-up) and end-to-end."""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from brotli_tpu import compress
    from brotli_tpu.decode.batch_tpu import decompress_batch_tpu

    blob = b""
    for p in ("/usr/lib/x86_64-linux-gnu/libc.so.6",
              "/usr/lib/x86_64-linux-gnu/libstdc++.so.6",
              "/usr/bin/python3", "/usr/bin/g++"):
        try:
            import os
            with open(os.path.realpath(p), "rb") as f:
                blob += f.read()
        except OSError:
            pass
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    seg = 64 << 10
    assert len(blob) >= n_streams * seg, "corpus too small"
    payloads = [blob[i * seg:(i + 1) * seg] for i in range(n_streams)]
    streams = [compress(p, quality=3) for p in payloads]
    total = sum(len(p) for p in payloads)

    # warm (compiles the while loop for this shape set)
    outs, ndev = decompress_batch_tpu(streams)
    assert outs == payloads
    print(f"device lanes: {ndev}/{n_streams}", file=sys.stderr)

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs, _ = decompress_batch_tpu(streams)
        best = min(best, time.perf_counter() - t0)
    print(f"end-to-end: {total / best / 1e6:.2f} MB/s "
          f"({n_streams} x {seg >> 10} KiB, {ndev} device lanes)")


if __name__ == "__main__":
    main()
