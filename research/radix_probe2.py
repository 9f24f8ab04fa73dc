"""Probe follow-ups for the radix-sort feasibility question.

radix_probe.py round 1 measured: lax.sort 8.37/11.77 ms (1/2-key @5M),
DMA run-copies 0.14 us each, roll-based compare-exchange 0.063 ms per
full-array stage (a hand bitonic would be ~4x lax.sort), and
dynamic_gather axis=0 FAILED to lower at (1024,128).

This round answers:
  Q1  does ax0 dynamic_gather lower at small sublane counts
      ((8,128), (32,128), (256,128))?  If yes, what speed?
  Q2  vmapped/segmented lax.sort: (8, 640K) rows sorted independently
      — the local-sort leg of any samplesort/radix hybrid
  Q3  exact9 leg-by-leg: where do its ~41 ms actually go
      (prep / sort8 / fold8 / sort-short / fold-short)?

Run: python research/radix_probe2.py   (real chip)
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    from brotli_tpu.ops.matching import u32_values_at
    data = jax.device_put(jnp.asarray(raw))
    v0 = u32_values_at(data, 0).astype(jnp.int32)
    x2d = v0.reshape(N // 128, 128)
    results = {}

    # ---- Q1: ax0 gather at small sublane counts ----
    def gather_kernel(x_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...],
                                           axis=0)

    for rows in (8, 32, 256):
        try:
            g = pl.pallas_call(
                gather_kernel,
                grid=(N // (rows * 128),),
                in_specs=[
                    pl.BlockSpec((rows, 128), lambda i: (i, 0)),
                    pl.BlockSpec((rows, 128), lambda i: (i, 0)),
                ],
                out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((N // 128, 128),
                                               jnp.int32),
            )
            idx = jax.device_put(jnp.asarray(
                np.random.default_rng(rows).integers(
                    0, rows, size=(N // 128, 128), dtype=np.int32)))

            @jax.jit
            def gstep(x, g=g, idx=idx):
                return g(x, idx)

            results[f"gather_ax0_R{rows}_ms"] = round(
                chain_time(gstep, x2d) * 1e3, 3)
            print(f"gather_ax0_R{rows}",
                  results[f"gather_ax0_R{rows}_ms"], "ms", flush=True)
        except Exception as e:
            results[f"gather_ax0_R{rows}_ms"] = \
                f"FAIL {type(e).__name__}"
            print(f"gather_ax0_R{rows} FAIL", str(e)[:200], flush=True)

    # ---- Q2: segmented sort, 8 x 640K ----
    xs = v0.reshape(8, N // 8)
    ps = jnp.broadcast_to(jnp.arange(N // 8, dtype=jnp.int32),
                          (8, N // 8))

    @jax.jit
    def seg_sort(x):
        o = jax.lax.sort((x, ps), num_keys=1, is_stable=True,
                         dimension=1)
        return o[0] ^ o[1]

    results["segsort_8x640K_ms"] = round(
        chain_time(seg_sort, xs) * 1e3, 2)
    print("segsort_8x640K", results["segsort_8x640K_ms"], "ms",
          flush=True)

    # 64 x 80K segments
    xs64 = v0.reshape(64, N // 64)
    ps64 = jnp.broadcast_to(jnp.arange(N // 64, dtype=jnp.int32),
                            (64, N // 64))

    @jax.jit
    def seg_sort64(x):
        o = jax.lax.sort((x, ps64), num_keys=1, is_stable=True,
                         dimension=1)
        return o[0] ^ o[1]

    results["segsort_64x80K_ms"] = round(
        chain_time(seg_sort64, xs64) * 1e3, 2)
    print("segsort_64x80K", results["segsort_64x80K_ms"], "ms",
          flush=True)

    # ---- Q3: exact9 legs ----
    from brotli_tpu.ops.fold_pallas import (fold_sorted_pallas,
                                            best_matches_exact9_p)
    v1 = u32_values_at(data, 4)
    v2 = u32_values_at(data, 8)
    v3 = u32_values_at(data, 12)
    pos = jnp.arange(N, dtype=jnp.int32)
    W = (1 << 22) - 16

    @jax.jit
    def leg_prep(d):
        a = u32_values_at(d, 0)
        b = u32_values_at(d, 4)
        c = u32_values_at(d, 8)
        e = u32_values_at(d, 12)
        return a ^ b ^ c ^ e

    results["leg_prep_ms"] = round(chain_time(
        leg_prep, data) * 1e3, 2)
    print("prep", results["leg_prep_ms"], flush=True)

    @jax.jit
    def leg_sort8(x):
        o = jax.lax.sort((x.astype(jnp.uint32), v1, pos, v2, v3),
                         num_keys=2, is_stable=True)
        return (o[0] ^ o[1]).astype(jnp.int32)

    results["leg_sort8_ms"] = round(chain_time(
        leg_sort8, v0) * 1e3, 2)
    print("sort8", results["leg_sort8_ms"], flush=True)

    ops8 = jax.lax.sort((v0.astype(jnp.uint32), v1, pos, v2, v3),
                        num_keys=2, is_stable=True)
    ops8 = jax.tree_util.tree_map(jax.device_put, ops8)

    @partial(jax.jit, donate_argnums=())
    def leg_fold8(k0):
        p, s = fold_sorted_pallas(
            (k0, ops8[1], ops8[2], ops8[3], ops8[4]), 0, n_keys=2,
            k_fwd=16, k_back=8, window=W, lbs=135, len_shift=26,
            n_real=N)
        return p ^ s

    results["leg_fold8_ms"] = round(chain_time(
        leg_fold8, ops8[0]) * 1e3, 2)
    print("fold8", results["leg_fold8_ms"], flush=True)

    @jax.jit
    def leg_sort_short(x):
        o = jax.lax.sort((x, pos, v1), num_keys=1, is_stable=True)
        return o[0] ^ o[1]

    results["leg_sort_short_ms"] = round(chain_time(
        leg_sort_short, v0) * 1e3, 2)
    print("sort_short", results["leg_sort_short_ms"], flush=True)

    opss = jax.lax.sort((v0, pos, v1), num_keys=1, is_stable=True)
    opss = jax.tree_util.tree_map(jax.device_put, opss)

    @jax.jit
    def leg_fold_short(k0):
        p, s = fold_sorted_pallas(
            (k0, opss[1], opss[2]), 0, n_keys=1, k_fwd=16, k_back=0,
            window=W, lbs=135, len_shift=26, n_real=N)
        return p ^ s

    results["leg_fold_short_ms"] = round(chain_time(
        leg_fold_short, opss[0]) * 1e3, 2)
    print("fold_short", results["leg_fold_short_ms"], flush=True)

    @jax.jit
    def whole_exact9(d):
        r = best_matches_exact9_p(d, W, k=16, k_short=16, rounds=4,
                                  invert=False)
        return r[1] ^ r[4]

    results["whole_exact9_ms"] = round(chain_time(
        whole_exact9, data) * 1e3, 2)
    print("whole_exact9", results["whole_exact9_ms"], flush=True)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
