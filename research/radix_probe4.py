"""Pin the exact9 composition overhead: layout conversions around the
Pallas fold custom-call.

probe3: fold8 standalone 2.7 ms, composed after the sort in one jit
~12 ms.  Hypotheses: XLA inserts layout-conversion copies between the
sort and the custom call, or the fold's pad/reshape materializes
copies when fused.  Tests:

  S1  split jits: jit_sorts(d) -> device tuples; jit_folds(ops) ->
      packed.  If split == legs sum, production adopts the split.
  S2  one-jit whole9 compiled HLO: count copy/transpose/bitcast ops
      around custom-calls (no timing, just the op census).

Run: python research/radix_probe4.py   (real chip)
"""

import sys
import time
from collections import Counter
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N = 5 << 20
CHAIN = 7


def chain_time_multi(step, x0, reps=CHAIN):
    """Chain over a pytree: feed output back as input."""
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
    from brotli_tpu.ops.fold_pallas import fold_sorted_pallas
    data = jax.device_put(jnp.asarray(raw))
    W = (1 << 22) - 16
    results = {}

    @jax.jit
    def jit_sorts(d):
        pos = jnp.arange(N, dtype=jnp.int32)
        v = [u32_values_at(d, 4 * r) for r in range(4)]
        ops8 = jax.lax.sort((v[0], v[1], pos, v[2], v[3]),
                            num_keys=2, is_stable=True)
        v0i = u32_values(d).astype(jnp.int32)
        opss = jax.lax.sort((v0i, pos, v[1]), num_keys=1,
                            is_stable=True)
        return ops8, opss

    @jax.jit
    def jit_folds(ops8, opss):
        p8, s8 = fold_sorted_pallas(
            ops8, 0, n_keys=2, k_fwd=16, k_back=8, window=W, lbs=135,
            len_shift=26, n_real=N)
        ps_, ss_ = fold_sorted_pallas(
            opss, 0, n_keys=1, k_fwd=16, k_back=0, window=W, lbs=135,
            len_shift=26, n_real=N)
        return p8 ^ s8 ^ ps_ ^ ss_

    def split_step(d):
        ops8, opss = jit_sorts(d)
        mix = jit_folds(ops8, opss)
        return d ^ (mix == -12345).astype(jnp.uint8)

    results["split_two_jits_ms"] = round(
        chain_time_multi(split_step, data) * 1e3, 2)
    print("S1 split", results["split_two_jits_ms"], flush=True)

    # S1b: sorts-jit alone for reference
    def sorts_step(d):
        ops8, opss = jit_sorts(d)
        return d ^ ((ops8[2] ^ opss[1]) == -12345).astype(jnp.uint8)

    results["split_sorts_only_ms"] = round(
        chain_time_multi(sorts_step, data) * 1e3, 2)
    print("S1b sorts jit", results["split_sorts_only_ms"], flush=True)

    # S2: HLO census of the one-jit composition
    @jax.jit
    def whole(d):
        ops8, opss = jit_sorts.__wrapped__(d)
        p8, s8 = fold_sorted_pallas(
            ops8, 0, n_keys=2, k_fwd=16, k_back=8, window=W, lbs=135,
            len_shift=26, n_real=N)
        ps_, ss_ = fold_sorted_pallas(
            opss, 0, n_keys=1, k_fwd=16, k_back=0, window=W, lbs=135,
            len_shift=26, n_real=N)
        mix = p8 ^ s8 ^ ps_ ^ ss_
        return d ^ (mix == -12345).astype(jnp.uint8)

    txt = whole.lower(data).compile().as_text()
    ops = Counter()
    for ln in txt.splitlines():
        ln = ln.strip()
        for op in ("copy(", "transpose(", "bitcast(", "custom-call(",
                   "sort(", "pad(", "concatenate(", "slice(",
                   "dynamic-slice("):
            if (" = " + op) in ln or ln.startswith(op):
                ops[op[:-1]] += 1
        if " = " in ln:
            name = ln.split(" = ")[1].split("(")[0]
            if name.startswith(("f32", "s32", "u32", "u8", "pred",
                                "s8", "bf16", "(")):
                name = ln.split(" = ")[1].split("(")[0]
        # fusion kinds
    for k in ("copy", "transpose", "custom-call", "sort", "pad",
              "concatenate", "slice", "dynamic-slice", "bitcast"):
        print("HLO", k, ops.get(k, 0))
    results["hlo_counts"] = dict(ops)
    copies = [ln.strip()[:160] for ln in txt.splitlines()
              if " = " in ln and ("copy(" in ln)]
    print("copy ops (first 12):")
    for c in copies[:12]:
        print("  ", c)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
