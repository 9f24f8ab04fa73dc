"""A/B the lazy/dict gates at q5/q9: interleaved min-of-N, plus size.

Usage: python research/lazy_gate_ab.py [q] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402
from brotli_tpu import compress  # noqa: E402

q = int(sys.argv[1]) if len(sys.argv) > 1 else 5
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
corpus = bench.build_corpus()
data = np.frombuffer(corpus, dtype=np.uint8)

variants = {
    "base": {},
    "lz64": {"BROTLI_TPU_LAZY_GATE": "64"},
    "lz32": {"BROTLI_TPU_LAZY_GATE": "32"},
    "lz16": {"BROTLI_TPU_LAZY_GATE": "16"},
    "lz10": {"BROTLI_TPU_LAZY_GATE": "10"},
}
best = {k: 1e9 for k in variants}
size = {}
for r in range(reps):
    for name, env in variants.items():
        for k in ("BROTLI_TPU_LAZY_GATE", "BROTLI_TPU_DICT_GATE"):
            os.environ.pop(k, None)
        os.environ.update(env)
        t0 = time.perf_counter()
        out = compress(data, quality=q)
        dt = time.perf_counter() - t0
        best[name] = min(best[name], dt)
        size[name] = len(out)
for name in variants:
    mbps = len(corpus) / best[name] / 1e6
    print(f"{name:6s} {mbps:7.2f} MB/s  size={size[name]}  "
          f"({size[name] / size['base'] - 1:+.4%} vs base)")
