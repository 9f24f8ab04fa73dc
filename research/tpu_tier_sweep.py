"""Sweep the Pallas matcher tier knobs (k, rounds) on the real TPU:
on-chip MB/s at 5M rows (chain timing) + end-to-end compress_tpu size
on the 4MiB bench slice, to pick the production knobs."""

import json
import sys
import time

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
    from brotli_tpu.ops import fold_pallas as F
    import brotli_tpu.encode.tpu_path as tp

    corpus = build_corpus()
    data = np.frombuffer(corpus[:N], np.uint8)
    d0 = jax.device_put(jnp.asarray(data))
    sl = corpus[: 1 << 20]
    out = {}

    def loopify(body):
        def step(d):
            r = body(d)
            return d ^ (r[:1] == -123).astype(jnp.uint8)
        return jax.jit(step)

    sweeps = {
        "greedy": [(32, 4), (32, 2), (24, 2), (16, 2)],
        "exact8": [(16, 4), (16, 2), (12, 2)],
        "exact9": [(16, 4), (16, 2)],
    }
    fns = {
        "greedy": lambda d, k, r: F.best_matches_exact_p(
            d, W, k=k, rounds=r),
        "exact8": lambda d, k, r: F.best_matches_exact8_p(
            d, W, k=k, rounds=r),
        "exact9": lambda d, k, r: F.best_matches_exact9_p(
            d, W, k=k, k_short=k, rounds=r),
    }
    quality = {"greedy": 5, "exact8": 7, "exact9": 9}
    for tier, cfgs in sweeps.items():
        for k, r in cfgs:
            t = chain_time(loopify(
                lambda d, k=k, r=r: fns[tier](d, k, r)), d0)
            key = f"{tier}_k{k}_r{r}"
            out[key] = {"onchip_MBps": round(N / t / 1e6, 1)}
            # end-to-end size through compress_tpu with patched knobs
            orig = tp._device_knobs
            variant = {"greedy": "exact", "exact8": "exact8",
                       "exact9": "exact9"}[tier]
            tp._device_knobs = lambda q, k=k, r=r, v=variant: dict(
                k=k, k8=k, rounds=r, variant=v)
            try:
                blob = tp.compress_tpu(sl, quality=quality[tier],
                                       span=1 << 19)
                out[key]["size"] = len(blob)
            finally:
                tp._device_knobs = orig
            print(key, out[key], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
