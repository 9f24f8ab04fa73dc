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
    from brotli_tpu import compress, decompress
    from tests import oracle

    corpus = build_corpus()

    # ---- north-star: q5/q9 encode + decode round-trip throughput ----
    results = {}
    sl = corpus[: 4 << 20]
    for q in (5, 9):
        compress(sl[: 1 << 16], quality=q)  # warm
        t0 = time.perf_counter()
        out = compress(sl, quality=q)
        enc_dt = time.perf_counter() - t0
        plain = decompress(out)  # warm decode path too
        assert plain == sl, "round-trip failed"
        dec_dt = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            decompress(out)
            dec_dt = min(dec_dt, time.perf_counter() - t0)

        if oracle.available():
            t0 = time.perf_counter()
            cout = oracle.compress(sl, quality=q)
            c_enc = time.perf_counter() - t0
            t0 = time.perf_counter()
            oracle.decompress(cout, max_size_hint=len(sl))
            c_dec = time.perf_counter() - t0
            c_rt = len(sl) / (c_enc + c_dec)
            size_vs = len(out) / len(cout)
        else:
            c_rt, size_vs = 0.0, 0.0
        rt_bps = len(sl) / (enc_dt + dec_dt)
        results[q] = dict(
            enc_MBps=round(len(sl) / enc_dt / 1e6, 2),
            dec_MBps=round(len(sl) / dec_dt / 1e6, 1),
            roundtrip_MBps=round(rt_bps / 1e6, 2),
            vs_c_roundtrip=round(rt_bps / c_rt, 3) if c_rt else 0.0,
            size_vs_c=round(size_vs, 4),
        )

    # ---- CompressMulti (reference threading/mod.rs parity) ----
    try:
        from brotli_tpu import compress_multi
        compress_multi(sl[: 1 << 18], 4, quality=9)  # warm
        mt = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            mout = compress_multi(sl, 4, quality=9)
            mt = min(mt, time.perf_counter() - t0)
        assert decompress(mout) == sl
        multi_mbps = round(len(sl) / mt / 1e6, 1)
    except Exception:
        multi_mbps = 0.0

    # ---- TPU fast path (q1 tier) on one chip ----
    try:
        from brotli_tpu.encode.fast import compress_fast
        compress_fast(corpus[: 1 << 22])  # compile
        t0 = time.perf_counter()
        fout = compress_fast(corpus)
        fdt = time.perf_counter() - t0
        assert decompress(fout) == corpus
        fast_mbps = round(len(corpus) / fdt / 1e6, 2)
    except Exception:
        fast_mbps = 0.0

    q9 = results[9]
    print(json.dumps({
        "metric": "q9 encode+decode round-trip throughput, 4MiB mixed "
                  "corpus, 1 chip host path (native runtime)",
        "value": q9["roundtrip_MBps"],
        "unit": "MB/s",
        "vs_baseline": q9["vs_c_roundtrip"],
        "detail": {
            "q9": q9,
            "q5": results[5],
            "compress_multi4_enc_MBps": multi_mbps,
            "tpu_fast_path_MBps": fast_mbps,
        },
    }))


if __name__ == "__main__":
    main()
