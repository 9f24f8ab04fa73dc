"""Decompose the greedy Pallas matcher's on-chip time: extraction,
sort, fold, inversion — to aim the next optimization. Chain timing."""

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
    from brotli_tpu.ops.matching import u32_values_at
    from brotli_tpu.ops import fold_pallas as F

    data = np.frombuffer(build_corpus()[:N], np.uint8)
    d0 = jax.device_put(jnp.asarray(data))
    out = {}

    def loopify(body):
        # data-dependent chain: xor a bit of the result back into data
        def step(d):
            r = body(d)
            return d ^ (r[:1] == -123).astype(jnp.uint8), r
        return jax.jit(lambda d: step(d)[0])

    # extraction only (4 rounds of u32 values + iota)
    def extract(d):
        v = [u32_values_at(d, 4 * r) for r in range(4)]
        return (v[0] ^ v[1] ^ v[2] ^ v[3]).astype(jnp.int32)
    out["extract_ms"] = chain_time(loopify(extract), d0) * 1e3

    # extraction + 1-key stable sort (5 operands)
    def ex_sort(d):
        v = [u32_values_at(d, 4 * r) for r in range(4)]
        pos = jnp.arange(N, dtype=jnp.int32)
        ops = jax.lax.sort((v[0].astype(jnp.int32), pos) + tuple(v[1:]),
                           num_keys=1, is_stable=True)
        return ops[1]
    out["extract_sort_ms"] = chain_time(loopify(ex_sort), d0) * 1e3

    # + Pallas fold, sorted-space output
    def ex_sort_fold(d):
        pos_s, packed_s = F.best_matches_exact_p(
            d, W, k=32, rounds=4, invert=False)
        return packed_s
    out["extract_sort_fold_ms"] = chain_time(
        loopify(ex_sort_fold), d0) * 1e3

    # full (invert=True)
    def full(d):
        return F.best_matches_exact_p(d, W, k=32, rounds=4)
    out["full_ms"] = chain_time(loopify(full), d0) * 1e3

    # unstable variant of the sort (is_stable=False)
    def ex_sort_unstable(d):
        v = [u32_values_at(d, 4 * r) for r in range(4)]
        pos = jnp.arange(N, dtype=jnp.int32)
        ops = jax.lax.sort((v[0].astype(jnp.int32), pos) + tuple(v[1:]),
                           num_keys=1, is_stable=False)
        return ops[1]
    out["extract_sort_unstable_ms"] = chain_time(
        loopify(ex_sort_unstable), d0) * 1e3

    # 2-key (v0, pos) sort — stability by explicit second key,
    # payloads along
    def ex_sort_2key(d):
        v = [u32_values_at(d, 4 * r) for r in range(4)]
        pos = jnp.arange(N, dtype=jnp.int32)
        ops = jax.lax.sort((v[0].astype(jnp.int32), pos) + tuple(v[1:]),
                           num_keys=2, is_stable=False)
        return ops[1]
    out["extract_sort_2key_ms"] = chain_time(
        loopify(ex_sort_2key), d0) * 1e3

    for k, v in out.items():
        print(f"{k:28s} {v:8.2f}")
    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
