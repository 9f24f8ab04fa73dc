"""Benchmark: end-to-end encode throughput of the TPU fast path vs the
system C brotli engine at the same quality tier, plus compression-ratio
cross-check at q5/q9 against the C engine (which the reference claims
bit-parity with at q0-q9; /root/reference/README.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

TESTDATA = "/root/reference/testdata"


def build_corpus(target=8 << 20) -> bytes:
    """Silesia stand-in: mixed text/binary from the reference testdata."""
    names = ["alice29.txt", "asyoulik.txt", "plrabn12.txt", "lcet10.txt",
             "random_then_unicode", "monkey", "backward65536",
             "compressed_file", "random_org_10k.bin"]
    parts = []
    total = 0
    while total < target:
        for n in names:
            p = os.path.join(TESTDATA, n)
            if os.path.exists(p):
                with open(p, "rb") as f:
                    b = f.read()
                parts.append(b)
                total += len(b)
            if total >= target:
                break
    return b"".join(parts)[:target]


def bench_c_baseline(data: bytes, quality: int) -> float:
    """C engine single-thread encode throughput (bytes/s)."""
    from tests import oracle
    if not oracle.available():
        return 0.0
    oracle.compress(data[:1 << 16], quality=quality)  # warm
    t0 = time.perf_counter()
    oracle.compress(data, quality=quality)
    return len(data) / (time.perf_counter() - t0)


def main():
    from brotli_tpu import decompress
    from brotli_tpu.encode.fast import compress_fast

    corpus = build_corpus()
    n = len(corpus)

    # warm up (compile cache)
    compress_fast(corpus[: 1 << 22])
    t0 = time.perf_counter()
    out = compress_fast(corpus)
    dt = time.perf_counter() - t0
    ours_bps = n / dt

    # round-trip sanity (on a slice to keep bench fast)
    assert decompress(out[:]) == corpus, "round-trip failed"

    base_bps = bench_c_baseline(corpus, quality=1)
    vs = ours_bps / base_bps if base_bps else 0.0

    # host (native C++ runtime) path at q9: size + speed vs C engine
    from brotli_tpu import compress
    sl = corpus[:1 << 20]
    t0 = time.perf_counter()
    out9 = compress(sl, quality=9)
    q9_dt = time.perf_counter() - t0
    assert decompress(out9) == sl
    from tests import oracle
    c9 = oracle.compress(sl, quality=9) if oracle.available() else b"x"

    # decode throughput (native C++ decoder) vs C engine
    decompress(out9)  # warm
    t0 = time.perf_counter()
    decompress(out9)
    dec_dt = time.perf_counter() - t0
    if oracle.available():
        t0 = time.perf_counter()
        oracle.decompress(out9, max_size_hint=len(sl))
        c_dec_dt = time.perf_counter() - t0
    else:
        c_dec_dt = 0.0

    print(json.dumps({
        "metric": "fast-path (q1-tier) end-to-end encode throughput, "
                  "8MiB mixed corpus, 1 chip",
        "value": round(ours_bps / 1e9, 4),
        "unit": "GB/s",
        "vs_baseline": round(vs, 3),
        "detail": {
            "compressed_bytes": len(out),
            "ratio": round(n / len(out), 3),
            "c_engine_q1_GBps": round(base_bps / 1e9, 4),
            "seconds": round(dt, 3),
            "q9_host_MBps": round(len(sl) / q9_dt / 1e6, 3),
            "q9_size_vs_c": round(len(out9) / len(c9), 4),
            "decode_MBps": round(len(sl) / dec_dt / 1e6, 1),
            "decode_vs_c": round(c_dec_dt / dec_dt, 3) if c_dec_dt
            else 0.0,
        },
    }))


if __name__ == "__main__":
    main()
