"""Max-device offload experiment: how far can the DEVICE fraction of
the encode pipeline grow before ratio/wall-clock pay for it?

Pipeline under test: device match (exact tier, rounds=6 as of round
5 — 24 bytes attested; rounds 7/8 exceed the fold kernel's scoped-
VMEM budget and fail to compile) + device committed_parse
(ops/parse.py pointer-doubling commitment, 4096 sub-blocks) in ONE
jit; the host only converts (visited, take, dist) to command arrays
vectorized and runs the native store — serialization glue, per the
round-3 verdict's framing.  Compare against the production offload
(device match + host walk) and the host encoder.

encode/fast.py already records the qualitative finding ("the native
host walk beats the pointer-doubling device parse on wall-clock and
parse quality"); this script puts NUMBERS on it so the trade is
recorded, not asserted.

Run: python research/max_device_mode.py [size_mb]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_corpus  # noqa: E402

LEN_SHIFT = 26
SUB_BLOCK = 4096


@partial(jax.jit, static_argnames=("window", "rounds", "k"))
def device_match_parse(data, window: int, rounds: int = 6,
                       k: int = 32):
    from brotli_tpu.ops.fold_pallas import best_matches_exact_p
    from brotli_tpu.ops.parse import committed_parse
    packed = best_matches_exact_p(data, window, k=k, rounds=rounds,
                                  len_shift=LEN_SHIFT)
    bl = (packed >> LEN_SHIFT).astype(jnp.int32)
    bd = (packed & ((1 << LEN_SHIFT) - 1)).astype(jnp.int32)
    logd = 31 - jax.lax.clz(jnp.maximum(bd, 1).astype(jnp.int32))
    score = jnp.where(bl > 0, 135 * bl - 30 * logd, 0)
    visited, take = committed_parse(bl, score, SUB_BLOCK)
    return visited, take, bd


def commands_from_parse(visited, take, dist, real):
    """Vectorized (ins, cps, dst, adv) from the device commitment."""
    vis = np.nonzero(visited[:real])[0]
    tk = take[vis]
    cp = tk >= 2
    cp_pos = vis[cp].astype(np.int64)
    cp_len = tk[cp].astype(np.int64)
    cp_dist = dist[cp_pos].astype(np.int64)
    prev_end = np.concatenate([[0], cp_pos + cp_len])
    ins = cp_pos - prev_end[:-1]
    tail = real - (prev_end[-1] if len(cp_pos) else 0)
    if tail > 0:
        ins = np.concatenate([ins, [tail]])
        cp_len = np.concatenate([cp_len, [0]])
        cp_dist = np.concatenate([cp_dist, [1]])
    return ins, cp_len, cp_dist, cp_len.copy()


def main():
    from brotli_tpu import compress, decompress
    from brotli_tpu import native_bridge as nb
    from brotli_tpu.core import constants as C
    from brotli_tpu.core.bitio import BitWriter
    from brotli_tpu.encode import bitstream as bs
    from brotli_tpu.encode.metablock import (choose_context_mode,
                                             choose_literal_context_map)
    from brotli_tpu.encode.params import EncoderParams
    from brotli_tpu.encode.tpu_path import compress_tpu

    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    n = int(mb * (1 << 20)) // SUB_BLOCK * SUB_BLOCK
    data = build_corpus()[:n]
    raw = np.frombuffer(data, np.uint8)
    params = EncoderParams(quality=5, lgwin=22).sanitize(n)
    window = params.window_size

    d = jax.device_put(jnp.asarray(raw))
    visited, take, dist = [np.asarray(a) for a in
                           device_match_parse(d, window)]

    def run():
        t0 = time.perf_counter()
        vis, tk, dst_ = device_match_parse(d, window)
        vis, tk, dst_ = (np.asarray(vis), np.asarray(tk),
                         np.asarray(dst_))
        t_dev = time.perf_counter() - t0
        ins, cps, dst2, adv = commands_from_parse(vis, tk, dst_, n)
        ctx_mode = choose_context_mode(raw, 5, 0)
        if ctx_mode == C.CONTEXT_UTF8:
            nlc, smap = choose_literal_context_map(raw, 0, n, 5, 0)
        else:
            nlc, smap = 1, np.zeros(64, np.int64)
        cache = list(C.INITIAL_DISTANCE_CACHE)
        w = BitWriter()
        bs.write_stream_header(w, params.lgwin, False)
        res = nb.encode_metablock(
            raw, 0, n, True, ins, cps, dst2, adv, cache, window,
            0, 0, C.distance_alphabet_size(0, 0, 24), 5, ctx_mode,
            nlc, smap, C.CONTEXT_LUT0[ctx_mode],
            C.CONTEXT_LUT1[ctx_mode], True)
        words, nbits, _ = res
        w.append_packed(words, nbits)
        t_all = time.perf_counter() - t0
        return w.getvalue(), t_dev, t_all

    out, t_dev, t_all = run()
    assert decompress(out) == data, "round-trip failed"
    best_dev, best_all = t_dev, t_all
    for _ in range(2):
        out, t_dev, t_all = run()
        best_dev, best_all = min(best_dev, t_dev), min(best_all, t_all)

    host = compress(data, quality=5)
    t0 = time.perf_counter()
    prod = compress_tpu(data, quality=5, span=1 << 20)
    t_prod = time.perf_counter() - t0

    print(f"max-device: {len(out)} bytes ({len(out)/len(host):.4f}x "
          f"host q5), wall {best_all*1e3:.0f} ms "
          f"(device+transfer {best_dev*1e3:.0f}, host store "
          f"{(best_all-best_dev)*1e3:.0f}) -> device fraction "
          f"{best_dev/best_all:.2f}")
    print(f"production offload (device match + host walk): "
          f"{len(prod)} bytes ({len(prod)/len(host):.4f}x), "
          f"wall {t_prod*1e3:.0f} ms")
    print(f"host q5: {len(host)} bytes")


if __name__ == "__main__":
    main()
