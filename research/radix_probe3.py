"""Find exact9's composition overhead.

probe2: legs sum to 24.7 ms (prep .88 + sort8 11.9 + fold8 2.7 +
sort_short 8.3 + fold_short 1.0) but whole best_matches_exact9_p
measures 42.3 ms.  Bisect where the extra ~17 ms lives:

  C1  manual composition of the legs in ONE jit from the raw bytes
  C2  sort8 + fold8 only (exact8_p whole)
  C3  the two sorts only, one jit
  C4  whole exact9 with rounds=2 (3-operand sort8)
  C5  whole exact9 again (control; dtype-stable chain this time)

Run: python research/radix_probe3.py   (real chip)
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N = 5 << 20
CHAIN = 7


def chain_time(step, x0, reps=CHAIN):
    x = step(x0)
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:16])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        x = step(x0)
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:16])
        t1 = time.perf_counter()
        x = x0
        for _ in range(reps):
            x = step(x)
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:16])
        t2 = time.perf_counter()
        per = ((t2 - t1) - (t1 - t0)) / (reps - 1)
        best = min(best, per)
    return best


def main():
    from bench import build_corpus
    raw = np.frombuffer(build_corpus()[:N], np.uint8)
    from brotli_tpu.ops.matching import u32_values_at, u32_values
    from brotli_tpu.ops.fold_pallas import (fold_sorted_pallas,
                                            best_matches_exact8_p,
                                            best_matches_exact9_p)
    data = jax.device_put(jnp.asarray(raw))
    W = (1 << 22) - 16
    results = {}

    def mutate(d):
        # dtype-stable chain step: uint8 in, uint8 out
        return d

    # C1: manual composition in one jit, uint8 -> uint8 chain
    @jax.jit
    def manual(d):
        pos = jnp.arange(N, dtype=jnp.int32)
        v = [u32_values_at(d, 4 * r) for r in range(4)]
        ops8 = jax.lax.sort((v[0], v[1], pos, v[2], v[3]),
                            num_keys=2, is_stable=True)
        p8, s8 = fold_sorted_pallas(
            ops8, 0, n_keys=2, k_fwd=16, k_back=8, window=W, lbs=135,
            len_shift=26, n_real=N)
        v0i = u32_values(d).astype(jnp.int32)
        opss = jax.lax.sort((v0i, pos, v[1]), num_keys=1,
                            is_stable=True)
        ps_, ss_ = fold_sorted_pallas(
            opss, 0, n_keys=1, k_fwd=16, k_back=0, window=W, lbs=135,
            len_shift=26, n_real=N)
        mix = (p8 ^ s8 ^ ps_ ^ ss_ ^ ops8[2] ^ opss[1])
        return d ^ (mix == -12345).astype(jnp.uint8)

    results["manual_one_jit_ms"] = round(
        chain_time(manual, data) * 1e3, 2)
    print("C1 manual", results["manual_one_jit_ms"], flush=True)

    # C2: exact8_p whole (sort8 + fold8 + prep)
    @jax.jit
    def whole8(d):
        ps, p, s = best_matches_exact8_p(d, W, k=16, rounds=4,
                                         invert=False)
        return d ^ ((p ^ s ^ ps) == -12345).astype(jnp.uint8)

    results["whole_exact8_ms"] = round(
        chain_time(whole8, data) * 1e3, 2)
    print("C2 whole8", results["whole_exact8_ms"], flush=True)

    # C3: the two sorts only
    @jax.jit
    def sorts_only(d):
        pos = jnp.arange(N, dtype=jnp.int32)
        v = [u32_values_at(d, 4 * r) for r in range(4)]
        ops8 = jax.lax.sort((v[0], v[1], pos, v[2], v[3]),
                            num_keys=2, is_stable=True)
        v0i = u32_values(d).astype(jnp.int32)
        opss = jax.lax.sort((v0i, pos, v[1]), num_keys=1,
                            is_stable=True)
        mix = ops8[2] ^ opss[1]
        return d ^ (mix == -12345).astype(jnp.uint8)

    results["sorts_only_ms"] = round(
        chain_time(sorts_only, data) * 1e3, 2)
    print("C3 sorts_only", results["sorts_only_ms"], flush=True)

    # C4: whole exact9, rounds=2
    @jax.jit
    def whole9_r2(d):
        r = best_matches_exact9_p(d, W, k=16, k_short=16, rounds=2,
                                  invert=False)
        return d ^ ((r[1] ^ r[4]) == -12345).astype(jnp.uint8)

    results["whole9_rounds2_ms"] = round(
        chain_time(whole9_r2, data) * 1e3, 2)
    print("C4 whole9 r2", results["whole9_rounds2_ms"], flush=True)

    # C5: whole exact9 control, dtype-stable chain
    @jax.jit
    def whole9(d):
        r = best_matches_exact9_p(d, W, k=16, k_short=16, rounds=4,
                                  invert=False)
        return d ^ ((r[1] ^ r[4]) == -12345).astype(jnp.uint8)

    results["whole9_ms"] = round(chain_time(whole9, data) * 1e3, 2)
    print("C5 whole9", results["whole9_ms"], flush=True)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
