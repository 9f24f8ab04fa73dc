"""Profile the device-matcher primitives on the real TPU.

Round-4 question: the matcher's cost is its lax.sort(s) (memory:
~60-90 ms fixed at 5M rows).  Before building a replacement, measure
what each primitive actually costs on this chip:

  - flat lax.sort at 5M (1 key + 0/2/4 payload operands)
  - SEGMENTED lax.sort: (S, C) rows sorted independently along the
    last axis — if rows sort near-linearly this is the radix-partition
    shortcut (sort segments + halo instead of the whole array)
  - permutation scatter / gather at 5M (the cost of leaving sorted
    space, and the floor for any radix scatter pass)
  - the existing exact8 kernel end-to-end for scale

Timing per the repo rule (memory: axon block_until_ready lies): a
data-dependent chain of R calls, report (chain_R - chain_1) / (R - 1).

Run:  python research/sort_profile.py        (talks to the real chip)
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N = 5 << 20
CHAIN = 7


def build_input():
    from bench import build_corpus
    raw = build_corpus()[:N]
    return np.frombuffer(raw, np.uint8)


def chain_time(step, x0, reps=CHAIN):
    """(time of reps-chain - time of 1-chain) / (reps - 1), min of 2."""
    x = step(x0)
    np.asarray(jax.tree_util.tree_leaves(x)[0][:16])  # compile+warm
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
        per = ((t2 - t1) - (t1 - t0)) / (reps - 1)
        best = min(best, per)
    return best


def main():
    data = build_input()
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    d0 = jax.device_put(jnp.asarray(data))
    out = {}

    from brotli_tpu.ops.matching import u32_values, u32_values_at

    # --- flat sorts, varying payload count ---
    for npay in (0, 2, 4):
        @jax.jit
        def step(d, npay=npay):
            v0 = u32_values(d).astype(jnp.int32)
            pos = jnp.arange(N, dtype=jnp.int32)
            pays = tuple(u32_values_at(d, 4 * r).astype(jnp.int32)
                         for r in range(1, npay + 1))
            ops = jax.lax.sort((v0, pos) + pays, num_keys=1,
                               is_stable=True)
            # feed a data-dependent byte back into the next input
            m = (ops[1] == -123456789).astype(jnp.uint8)
            return d ^ m
        t = chain_time(step, d0)
        out[f"sort_flat_5M_pay{npay}_ms"] = round(t * 1e3, 1)

    # --- two-key flat sort (exact8 shape) ---
    @jax.jit
    def step2k(d):
        v0 = u32_values(d).astype(jnp.int32)
        v1 = u32_values_at(d, 4).astype(jnp.int32)
        pos = jnp.arange(N, dtype=jnp.int32)
        v2 = u32_values_at(d, 8).astype(jnp.int32)
        v3 = u32_values_at(d, 12).astype(jnp.int32)
        ops = jax.lax.sort((v0, v1, pos, v2, v3), num_keys=2,
                           is_stable=True)
        return d ^ (ops[2] == -123456789).astype(jnp.uint8)
    out["sort_flat_5M_2key_pay3_ms"] = round(chain_time(step2k, d0) * 1e3, 1)

    # --- segmented sorts: (S, C) rows sorted along the last axis ---
    for C in (1 << 17, 1 << 15, 1 << 13, 1 << 11):
        S = N // C

        @jax.jit
        def stepseg(d, S=S, C=C):
            v0 = u32_values(d).astype(jnp.int32).reshape(S, C)
            pos = jnp.arange(N, dtype=jnp.int32).reshape(S, C)
            v1 = u32_values_at(d, 4).astype(jnp.int32).reshape(S, C)
            v2 = u32_values_at(d, 8).astype(jnp.int32).reshape(S, C)
            ops = jax.lax.sort((v0, pos, v1, v2), num_keys=1,
                               is_stable=True, dimension=-1)
            return d ^ (ops[1] == -123456789).astype(
                jnp.uint8).reshape(-1)
        t = chain_time(stepseg, d0)
        out[f"sort_seg_{S}x{C}_pay2_ms"] = round(t * 1e3, 1)

    # --- permutation scatter and gather at 5M ---
    @jax.jit
    def mkperm(d):
        v0 = u32_values(d).astype(jnp.int32)
        pos = jnp.arange(N, dtype=jnp.int32)
        _, p = jax.lax.sort((v0, pos), num_keys=1, is_stable=True)
        return p
    perm = jax.block_until_ready(mkperm(d0))

    @jax.jit
    def stepscat(p):
        vals = p ^ 1
        o = jnp.zeros(N, jnp.int32).at[p].set(vals)
        return jnp.where(o == -9, p ^ 2, p)
    out["scatter_perm_5M_ms"] = round(chain_time(stepscat, perm) * 1e3, 1)

    @jax.jit
    def stepgat(p):
        g = p[p]
        return jnp.where(g == -9, p ^ 2, p)
    out["gather_perm_5M_ms"] = round(chain_time(stepgat, perm) * 1e3, 1)

    # --- existing kernels for scale ---
    from brotli_tpu.ops.matching import (best_matches_exact,
                                         best_matches_exact8)
    W = (1 << 22) - 16

    @jax.jit
    def stepg(d):
        p = best_matches_exact(d, W, k=32, k8=0, rounds=4)
        return d ^ (p == -123456789).astype(jnp.uint8)
    out["kernel_exact_greedy_ms"] = round(chain_time(stepg, d0) * 1e3, 1)

    @jax.jit
    def step8(d):
        p = best_matches_exact8(d, W, k=16, rounds=4)
        return d ^ (p == -123456789).astype(jnp.uint8)
    out["kernel_exact8_ms"] = round(chain_time(step8, d0) * 1e3, 1)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
