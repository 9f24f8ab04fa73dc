"""Feasibility probe for a Pallas batch-decode STEP KERNEL.

The TPU batch-decode tier is while_loop step-latency bound (2-3 MB/s
at 128 lanes).  The proposed fix is one Pallas kernel holding the 128
lanes' streams, root LUTs, and decoder state in VMEM, with an
internal fori_loop over symbol steps.  Its critical operations per
step are PER-LANE dynamic reads (each lane's bit window refill and
root-table lookup index differ), which Mosaic can only express as a
scalar loop over lanes — so the whole idea stands or falls on the
scalar-core throughput of dynamic VMEM reads.

This probe measures, on the real chip:

  P1  a fori_loop of STEPS iterations, each doing 128 per-lane scalar
      dynamic reads from a (128, 1024) VMEM table + a vector update —
      the shape of one root-LUT symbol decode across lanes
  P2  the same with 2 reads per lane (symbol + next-byte refill)
  P3  a pure-vector step (no scalar reads) for the overhead floor

Result interpretation: per-step wall = the kernel's symbol-step cost
across 128 lanes; 64KiB q2 streams average ~0.55 symbols/byte, so
MB/s ~= 128 lanes * bytes-per-symbol / per-step-seconds / 1e6.

Run: python research/decode_step_kernel_probe.py   (real chip)
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

LANES = 128
STEPS = 2048


def chain_time(step, x0, reps=5):
    x = step(x0)
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:8])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        x = step(x0)
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:8])
        t1 = time.perf_counter()
        x = x0
        for _ in range(reps):
            x = step(x)
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:8])
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (reps - 1))
    return best


def make_kernel(reads_per_lane: int):
    def kernel(tab_ref, st_ref, out_ref):
        def body(step, st):
            # vector part: advance per-lane "bit positions"
            st = (st * 1103515245 + 12345) & 0x3FF
            # scalar part: per-lane dynamic reads (the root-LUT /
            # refill analog) — Mosaic has no cross-lane gather at
            # this shape, so this is the honest cost model
            acc = jnp.zeros((1, LANES), jnp.int32)
            for r in range(reads_per_lane):
                vals = []
                for lane in range(LANES):
                    idx = st[0, lane]
                    vals.append(tab_ref[lane, idx + r])
                acc = acc + jnp.stack(vals).reshape(1, LANES)
            return (st + acc) & 0x3FF

        st = st_ref[...]
        st = jax.lax.fori_loop(0, STEPS, body, st)
        out_ref[...] = st

    return kernel


def main():
    tab = np.arange(LANES * 1056, dtype=np.int32).reshape(LANES, 1056)
    tab = jax.device_put(jnp.asarray(tab % 997))
    st0 = jax.device_put(
        jnp.asarray(np.arange(LANES, dtype=np.int32).reshape(1, LANES)))
    results = {}
    for nm, rpl in (("P3_vector_only", 0), ("P1_one_read", 1),
                    ("P2_two_reads", 2)):
        try:
            k = pl.pallas_call(
                make_kernel(rpl),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            )

            @jax.jit
            def step(s, k=k):
                return k(tab, s)

            dt = chain_time(step, st0)
            per_step = dt / STEPS
            results[nm] = dict(us_per_step=round(per_step * 1e6, 3))
            if rpl:
                # q2-grade streams: ~1.8 bytes/symbol; 128 lanes
                mbps = 128 * 1.8 / per_step / 1e6
                results[nm]["est_MBps_128lanes"] = round(mbps, 1)
            print(nm, results[nm], flush=True)
        except Exception as e:
            results[nm] = f"FAIL {type(e).__name__}: {str(e)[:200]}"
            print(nm, results[nm], flush=True)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
