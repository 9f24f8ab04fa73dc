"""Interleaved q5 A/B vs the C engine (VM wall clock drifts +-30%
between runs, so ours/C legs alternate within each rep, min-of-N both).

Usage: python research/q5_ab.py [reps] -- runs the candidate geometry
list below at quality 5 on the 4MiB bench slice.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build_corpus  # noqa: E402
import brotli_tpu.encode.encoder as enc  # noqa: E402
from tests import oracle  # noqa: E402

GEOMS = [
    ("base 8/17+2/15", dict(k=8, bucket_bits=17, k8=2,
                            bucket_bits8=15, hash_len=4)),
    ("A 8/16+2/15", dict(k=8, bucket_bits=16, k8=2,
                         bucket_bits8=15, hash_len=4)),
]


def run(data, quality, geoms, reps=5):
    orig = enc._quality_knobs
    # warm everything once
    c_blob = oracle.compress(data, quality=quality)
    blobs = {}
    for name, g in geoms:
        enc._quality_knobs = lambda p, g=g: g
        blobs[name] = enc.compress(data, quality=quality)
    enc._quality_knobs = orig

    c_t = float("inf")
    t = {name: float("inf") for name, _ in geoms}
    for _ in range(reps):
        t0 = time.perf_counter()
        oracle.compress(data, quality=quality)
        c_t = min(c_t, time.perf_counter() - t0)
        for name, g in geoms:
            enc._quality_knobs = lambda p, g=g: g
            try:
                t0 = time.perf_counter()
                enc.compress(data, quality=quality)
                t[name] = min(t[name], time.perf_counter() - t0)
            finally:
                enc._quality_knobs = orig
    n = len(data)
    print(f"{'C q' + str(quality):24s} {n/c_t/1e6:7.2f} MB/s  "
          f"size {len(c_blob):,}")
    for name, _ in geoms:
        print(f"{name:24s} {n/t[name]/1e6:7.2f} MB/s  "
              f"size {len(blobs[name]):,}  vs_c {c_t/t[name]:.3f} "
              f"size {len(blobs[name])/len(c_blob):.4f}")


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    run(build_corpus()[: 4 << 20], 5, GEOMS, reps)
