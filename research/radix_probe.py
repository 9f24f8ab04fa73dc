"""Probe the primitives a Mosaic radix sort would be built from.

Round-5 question (VERDICT next-steps #1): can the matcher's lax.sort
legs (~8.5 ms 1-key / ~13.5 ms 2-key at 5M rows) be beaten by a
VMEM-tiled counting sort?  The candidate building blocks, measured on
the real chip before any design is committed:

  P1  lax.sort baselines (1-key+1pay, 1-key+3pay, 2-key+3pay) @5M
  P2  tpu.dynamic_gather: jnp.take_along_axis(axis=0) inside a Pallas
      kernel over (R,128) blocks — the only VMEM gather Mosaic has;
      any counting-sort APPLY step rides on it
  P3  per-lane compare-histogram: 256 equality sweeps per tile — the
      COUNT step's cost (scales with B, bounds digit width)
  P4  HBM->HBM run copies: K dynamic-offset DMA copies of C rows —
      the DISTRIBUTE step's issue-rate floor
  P5  within-kernel compare-exchange sweep (roll + min/max), per
      stage — the floor for any bitonic/merge leg we keep

Timing: data-dependent chain, (chain_R - chain_1)/(R-1), min of 2
(memory: block before t1; VM wall clock drifts +-30%).

Run: python research/radix_probe.py   (real chip)
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
    v1 = u32_values_at(data, 4)
    pos = jnp.arange(N, dtype=jnp.int32)

    results = {}

    # ---- P1: lax.sort baselines ----
    @jax.jit
    def sort_1k_1p(k):
        o = jax.lax.sort((k, pos), num_keys=1, is_stable=True)
        return o[0] ^ o[1]

    @jax.jit
    def sort_1k_3p(k):
        o = jax.lax.sort((k, pos, v1, v1), num_keys=1, is_stable=True)
        return o[0] ^ o[1]

    @jax.jit
    def sort_2k_3p(k):
        o = jax.lax.sort((k.astype(jnp.uint32), v1, pos, v1, v1),
                         num_keys=2, is_stable=True)
        return (o[0] ^ o[2].astype(jnp.uint32)).astype(jnp.int32)

    for nm, f in (("sort_1k_1p", sort_1k_1p), ("sort_1k_3p", sort_1k_3p),
                  ("sort_2k_3p", sort_2k_3p)):
        results[nm + "_ms"] = round(chain_time(f, v0) * 1e3, 2)
        print(nm, results[nm + "_ms"], "ms", flush=True)

    # ---- P2: dynamic_gather in pallas, (R,128) blocks ----
    R = 1024  # rows per block

    def gather_kernel(x_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...],
                                           axis=0)

    def make_gather(rows):
        grid = N // (rows * 128)
        return pl.pallas_call(
            gather_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((rows, 128), lambda i: (i, 0)),
                pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
        )

    idx_np = np.random.default_rng(0).integers(
        0, R, size=(N // 128, 128), dtype=np.int32)
    idxg = jax.device_put(jnp.asarray(idx_np))
    x2d = v0.reshape(N // 128, 128)

    try:
        g = make_gather(R)

        @jax.jit
        def gather_step(x):
            return g(x, idxg)

        results["gather_ax0_R1024_ms"] = round(
            chain_time(gather_step, x2d) * 1e3, 2)
        print("gather_ax0_R1024", results["gather_ax0_R1024_ms"], "ms",
              flush=True)
    except Exception as e:
        results["gather_ax0_R1024_ms"] = f"FAIL {type(e).__name__}: {e}"
        print(results["gather_ax0_R1024_ms"][:300], flush=True)

    # larger blocks (VMEM budget ~16MB: 8192x128x4B x3 = 12MB)
    for rows in (4096, 8192):
        try:
            g = make_gather(rows)
            idx2 = jax.device_put(jnp.asarray(
                np.random.default_rng(1).integers(
                    0, rows, size=(N // 128, 128), dtype=np.int32)))

            @jax.jit
            def gather_step2(x, g=g, idx2=idx2):
                return g(x, idx2)

            results[f"gather_ax0_R{rows}_ms"] = round(
                chain_time(gather_step2, x2d) * 1e3, 2)
            print(f"gather_ax0_R{rows}",
                  results[f"gather_ax0_R{rows}_ms"], "ms", flush=True)
        except Exception as e:
            results[f"gather_ax0_R{rows}_ms"] = \
                f"FAIL {type(e).__name__}"
            print(rows, f"FAIL {type(e).__name__}: {e}"[:300],
                  flush=True)

    # axis=1 variant (per-row gather along lanes)
    def gather1_kernel(x_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...],
                                           axis=1)

    try:
        g1 = pl.pallas_call(
            gather1_kernel,
            grid=(N // (1024 * 128),),
            in_specs=[
                pl.BlockSpec((1024, 128), lambda i: (i, 0)),
                pl.BlockSpec((1024, 128), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1024, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
        )
        idx1 = jax.device_put(jnp.asarray(
            np.random.default_rng(2).integers(
                0, 128, size=(N // 128, 128), dtype=np.int32)))

        @jax.jit
        def gather1_step(x):
            return g1(x, idx1)

        results["gather_ax1_ms"] = round(
            chain_time(gather1_step, x2d) * 1e3, 2)
        print("gather_ax1", results["gather_ax1_ms"], "ms", flush=True)
    except Exception as e:
        results["gather_ax1_ms"] = f"FAIL {type(e).__name__}"
        print("ax1 FAIL", str(e)[:300], flush=True)

    # ---- P3: compare-histogram, 256 sweeps (count step, B=256) ----
    def hist_kernel(x_ref, out_ref):
        x = x_ref[...] & 0xFF
        acc = jnp.zeros((8, 128), jnp.int32)
        # 256 equality sweeps accumulated into (8,128) partials:
        # digit d counted at (d // 32, d % 32 * 4 ... ) — layout is
        # irrelevant for the cost probe, only the sweep count is
        for d in range(256):
            m = (x == d).astype(jnp.int32)
            acc = acc.at[d % 8].add(jnp.sum(m, axis=0, keepdims=True)
                                    [0].reshape(1, 128))
        out_ref[...] = acc

    try:
        h = pl.pallas_call(
            hist_kernel,
            grid=(N // (2048 * 128),),
            in_specs=[pl.BlockSpec((2048, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (8 * N // (2048 * 128), 128), jnp.int32),
        )

        @jax.jit
        def hist_step(x):
            return h(x)

        results["hist256_ms"] = round(chain_time(hist_step, x2d) * 1e3,
                                      2)
        print("hist256", results["hist256_ms"], "ms", flush=True)
    except Exception as e:
        results["hist256_ms"] = f"FAIL {type(e).__name__}"
        print("hist FAIL", str(e)[:300], flush=True)

    # ---- P4: HBM->HBM dynamic run copies ----
    # K copies of C rows of (128 lanes x 4B): issue-rate floor for the
    # distribute pass.  K=2048, C=16 rows(=2048 elements=8KB) mimics
    # (10 tiles x 256 buckets) runs of ~2K elements each.
    K, C = 2048, 16
    off_np = np.random.default_rng(3).integers(
        0, N // 128 - C, size=(K,), dtype=np.int32)
    offs = jax.device_put(jnp.asarray(off_np))

    def copy_kernel(off_ref, src_ref, dst_ref, sem):
        def body(i, _):
            o = off_ref[i]
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(o, C)], dst_ref.at[pl.ds(o, C)], sem)
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, K, body, 0)

    try:
        cpy = pl.pallas_call(
            copy_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True),
        )

        @jax.jit
        def copy_step(x):
            return cpy(offs, x)

        dt = chain_time(copy_step, x2d)
        results["dma_2048x8KB_ms"] = round(dt * 1e3, 2)
        results["dma_per_copy_us"] = round(dt / K * 1e6, 2)
        print("dma runs", results["dma_2048x8KB_ms"], "ms =",
              results["dma_per_copy_us"], "us/copy", flush=True)
    except Exception as e:
        results["dma_2048x8KB_ms"] = f"FAIL {type(e).__name__}"
        print("dma FAIL", str(e)[:300], flush=True)

    # ---- P5: compare-exchange sweep cost (per bitonic-ish stage) ----
    def cmpex_kernel(x_ref, out_ref):
        x = x_ref[...]
        for s in (1, 2, 4):
            y = pltpu.roll(x, s, 0)
            lo = jnp.minimum(x, y)
            hi = jnp.maximum(x, y)
            x = jnp.where((jax.lax.broadcasted_iota(
                jnp.int32, x.shape, 0) // s) % 2 == 0, lo, hi)
        out_ref[...] = x

    try:
        ce = pl.pallas_call(
            cmpex_kernel,
            grid=(N // (2048 * 128),),
            in_specs=[pl.BlockSpec((2048, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((2048, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
        )

        @jax.jit
        def ce_step(x):
            return ce(x)

        dt = chain_time(ce_step, x2d)
        results["cmpex_3stage_ms"] = round(dt * 1e3, 2)
        results["cmpex_per_stage_ms"] = round(dt / 3 * 1e3, 3)
        print("cmpex 3 stages", results["cmpex_3stage_ms"], "ms",
              flush=True)
    except Exception as e:
        results["cmpex_3stage_ms"] = f"FAIL {type(e).__name__}"
        print("cmpex FAIL", str(e)[:300], flush=True)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
