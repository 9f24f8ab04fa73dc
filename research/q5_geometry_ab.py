"""A/B q5 ring-table geometries against the C engine.

The q5 search is latency-bound on ring-row loads: the 8MB ring4
(2^17 buckets x 8 slots x 8B) misses the 2MB/core L2 and pays L3
latency per probe, where the C engine's 2MB H5 table stays in L2.
Sweep (k, bucket_bits, k8, bucket_bits8) and report MB/s + size vs C.

Run: python research/q5_geometry_ab.py
"""

import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build_corpus  # noqa: E402
import brotli_tpu.encode.encoder as enc  # noqa: E402

GEOMS = [
    ("base 8/17+2/15 (8.5MB)", dict(k=8, bucket_bits=17, k8=2,
                                    bucket_bits8=15, hash_len=4)),
    ("A 8/16+2/15 (4.5MB)", dict(k=8, bucket_bits=16, k8=2,
                                 bucket_bits8=15, hash_len=4)),
    ("B 4/17+2/15 (4.5MB)", dict(k=4, bucket_bits=17, k8=2,
                                 bucket_bits8=15, hash_len=4)),
    ("C 8/15+2/15 (2.5MB)", dict(k=8, bucket_bits=15, k8=2,
                                 bucket_bits8=15, hash_len=4)),
    ("D 4/16+2/15 (2.5MB)", dict(k=4, bucket_bits=16, k8=2,
                                 bucket_bits8=15, hash_len=4)),
    ("E 16/15+2/15 (4.5MB)", dict(k=16, bucket_bits=15, k8=2,
                                  bucket_bits8=15, hash_len=4)),
    ("F 8/14+2/14 (1.3MB)", dict(k=8, bucket_bits=14, k8=2,
                                 bucket_bits8=14, hash_len=4)),
]


def time_best(fn, reps=3):
    best, out = float("inf"), None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    data = build_corpus()
    n = len(data)

    # C baseline (tests/oracle.py: upstream libbrotlienc)
    from tests import oracle
    oracle.compress(data[: 1 << 16], quality=5)  # warm
    c_t, c_blob = time_best(lambda: oracle.compress(data, quality=5))
    c_size = len(c_blob)
    print(f"{'C q5':28s} {n/c_t/1e6:7.2f} MB/s  size {c_size:,}")

    orig = enc._quality_knobs
    for name, g in GEOMS:
        enc._quality_knobs = lambda p, g=g: g
        try:
            enc.compress(data, quality=5)  # warm
            t, blob = time_best(lambda: enc.compress(data, quality=5))
            print(f"{name:28s} {n/t/1e6:7.2f} MB/s  size {len(blob):,}"
                  f"  vs_c speed {c_t/t:.3f} size {len(blob)/c_size:.4f}")
        finally:
            enc._quality_knobs = orig


if __name__ == "__main__":
    main()
