"""True sort-operand cost model + q9/greedy tier re-sweep.

probe4 exposed that every earlier 'payloads are nearly free' sort
measurement was an XLA dead-code artifact: unused variadic-sort
outputs are elided, so only fully-consumed outputs measure the real
cost.  This sweep:

  A  true lax.sort cost vs operand count (ALL outputs consumed):
     1-key x {2,3} ops, 2-key x {3,4,5} ops @5M
  B  production-form (invert=False) on-chip MB/s for tier variants:
     exact9 r4 (base) / r3 / r2, exact8-only r4 / r2,
     greedy r2 (base) / r1
  C  end-to-end compress_tpu size on a 1MiB slice per variant vs the
     host engine's size (ratio gate: <= 1.005x host)

Run: python research/sort_ops_sweep.py   (real chip)
"""

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
        best = min(best, ((t2 - t1) - (t1 - t0)) / (reps - 1))
    return best


def main():
    from bench import build_corpus
    from brotli_tpu.ops.matching import u32_values_at
    from brotli_tpu.ops import fold_pallas as F
    import brotli_tpu.encode.tpu_path as tp
    from brotli_tpu import compress

    corpus = build_corpus()
    data = np.frombuffer(corpus[:N], np.uint8)
    d0 = jax.device_put(jnp.asarray(data))
    out = {}

    # ---- A: true sort costs (consume every output) ----
    v1c = u32_values_at(jnp.asarray(data), 4)
    v2c = u32_values_at(jnp.asarray(data), 8)
    v3c = u32_values_at(jnp.asarray(data), 12)
    posc = jnp.arange(N, dtype=jnp.int32)

    def consume(outs):
        m = outs[0].astype(jnp.uint32)
        for o in outs[1:]:
            m = m ^ o.astype(jnp.uint32)
        return m

    def sort_case(name, nkeys, ops):
        @jax.jit
        def step(k0):
            o = jax.lax.sort((k0,) + ops, num_keys=nkeys,
                             is_stable=True)
            m = consume(o)
            return (k0 ^ (m == 99991).astype(k0.dtype))

        k0 = u32_values_at(jnp.asarray(data), 0).astype(jnp.int32)
        k0 = jax.device_put(k0)
        out[name] = round(chain_time(step, k0) * 1e3, 2)
        print(name, out[name], "ms", flush=True)

    sort_case("sort_1k_2op_ms", 1, (posc,))
    sort_case("sort_1k_3op_ms", 1, (posc, v1c))
    sort_case("sort_2k_3op_ms", 2, (v1c, posc))
    sort_case("sort_2k_4op_ms", 2, (v1c, posc, v2c))
    sort_case("sort_2k_5op_ms", 2, (v1c, posc, v2c, v3c))

    # ---- B: production-form variants ----
    def loopify(body):
        def step(d):
            r = body(d)
            m = None
            for a in jax.tree_util.tree_leaves(r):
                x = a.astype(jnp.int32)
                m = x if m is None else m ^ x
            return d ^ (m == -12345).astype(jnp.uint8)
        return jax.jit(step)

    variants = {
        "exact9_k16_r4": lambda d: F.best_matches_exact9_p(
            d, W, k=16, k_short=16, rounds=4, invert=False),
        "exact9_k16_r3": lambda d: F.best_matches_exact9_p(
            d, W, k=16, k_short=16, rounds=3, invert=False),
        "exact9_k16_r2": lambda d: F.best_matches_exact9_p(
            d, W, k=16, k_short=16, rounds=2, invert=False),
        "exact8_k16_r4": lambda d: F.best_matches_exact8_p(
            d, W, k=16, rounds=4, invert=False),
        "exact8_k16_r2": lambda d: F.best_matches_exact8_p(
            d, W, k=16, rounds=2, invert=False),
        "greedy_k32_r2": lambda d: F.best_matches_exact_p(
            d, W, k=32, rounds=2, invert=False),
        "greedy_k32_r1": lambda d: F.best_matches_exact_p(
            d, W, k=32, rounds=1, invert=False),
        "greedy_k24_r2": lambda d: F.best_matches_exact_p(
            d, W, k=24, rounds=2, invert=False),
    }
    for name, fn in variants.items():
        t = chain_time(loopify(fn), d0)
        out[name] = {"onchip_MBps": round(N / t / 1e6, 1)}
        print(name, out[name], flush=True)

    # ---- C: e2e sizes on 1MiB ----
    sl = corpus[: 1 << 20]
    host9 = len(compress(sl, quality=9))
    host5 = len(compress(sl, quality=5))
    out["host_q9_size"] = host9
    out["host_q5_size"] = host5
    cfgs = {
        "exact9_k16_r4": (9, dict(k=16, k8=16, rounds=4,
                                  variant="exact9")),
        "exact9_k16_r3": (9, dict(k=16, k8=16, rounds=3,
                                  variant="exact9")),
        "exact9_k16_r2": (9, dict(k=16, k8=16, rounds=2,
                                  variant="exact9")),
        "exact8_k16_r4": (9, dict(k=16, k8=0, rounds=4,
                                  variant="exact8")),
        "greedy_k32_r2": (5, dict(k=32, k8=0, rounds=2,
                                  variant="exact")),
        "greedy_k32_r1": (5, dict(k=32, k8=0, rounds=1,
                                  variant="exact")),
        "greedy_k24_r2": (5, dict(k=24, k8=0, rounds=2,
                                  variant="exact")),
    }
    for name, (q, kn) in cfgs.items():
        orig = tp._device_knobs
        tp._device_knobs = lambda qq, kn=kn: dict(kn)
        try:
            blob = tp.compress_tpu(sl, quality=q, span=1 << 19)
            ref = host9 if q == 9 else host5
            out[name]["size"] = len(blob)
            out[name]["size_vs_host"] = round(len(blob) / ref, 4)
        except Exception as e:
            out[name]["size"] = f"FAIL {type(e).__name__}"
        finally:
            tp._device_knobs = orig
        print(name, out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
