"""Time the Pallas-fold matchers vs the XLA-fold matchers on the real
TPU (5M rows, chain timing per the repo measurement rule)."""

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N = 5 << 20
W = (1 << 22) - 16


def chain_time(step, x0, reps=7):
    x = step(x0)
    np.asarray(jax.tree_util.tree_leaves(x)[0][:16])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        x = step(x0)
        np.asarray(jax.tree_util.tree_leaves(x)[0][:16])
        t1 = time.perf_counter()
        x = x0
        for _ in range(reps):
            x = step(x)
        np.asarray(jax.tree_util.tree_leaves(x)[0][:16])
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (reps - 1))
    return best


def main():
    from bench import build_corpus
    from brotli_tpu.ops import matching as M
    from brotli_tpu.ops import fold_pallas as F

    data = np.frombuffer(build_corpus()[:N], np.uint8)
    d0 = jax.device_put(jnp.asarray(data))
    out = {}

    cases = [
        ("greedy_old", lambda d: M.best_matches_exact(
            d, W, k=32, k8=0, rounds=4)),
        ("greedy_pallas", lambda d: F.best_matches_exact_p(
            d, W, k=32, rounds=4)),
        ("exact8_old", lambda d: M.best_matches_exact8(
            d, W, k=16, rounds=4)),
        ("exact8_pallas", lambda d: F.best_matches_exact8_p(
            d, W, k=16, rounds=4)),
        ("exact9_old", lambda d: M.best_matches_exact9(
            d, W, k=16, k_short=16, rounds=4)),
        ("exact9_pallas", lambda d: F.best_matches_exact9_p(
            d, W, k=16, k_short=16, rounds=4)),
        ("greedy_pallas_noinv", lambda d: F.best_matches_exact_p(
            d, W, k=32, rounds=4, invert=False)[1]),
    ]
    for name, fn in cases:
        @jax.jit
        def step(d, fn=fn):
            p = fn(d)
            return d ^ (p == -123456789).astype(jnp.uint8)
        t = chain_time(step, d0)
        out[name + "_ms"] = round(t * 1e3, 1)
        out[name + "_MBps"] = round(N / t / 1e6, 1)
        print(json.dumps({name: out[name + "_ms"]}), file=sys.stderr)

    # equivalence spot check on-device (first 1M rows)
    dsm = d0[: 1 << 20]
    a = np.asarray(M.best_matches_exact8(dsm, W, k=16, rounds=4))
    b = np.asarray(F.best_matches_exact8_p(dsm, W, k=16, rounds=4))
    out["exact8_device_mismatches"] = int((a != b).sum())
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
