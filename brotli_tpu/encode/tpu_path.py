"""TPU production encode path: device match finding, host serialization.

The q5-q9 pipeline with the heavy pass on the chip: for each metablock
span, the device runs the batched match kernel (ops.matching
best_matches_block — hash, top-K candidate fold in sort space, capped
XOR match lengths, reference scoring) over the span plus a
window-covering halo of preceding bytes, and returns ONE packed int32
per position ((len << 26) | dist).  The host decodes the dense array,
runs the greedy walk with live distance-cache probes (match.greedy_parse
— the same walk the host path uses), and serializes through the fused
native metablock encoder.

Pipelining: device dispatches are ASYNC (JAX queues them); the host
serializes metablock j while the chip computes j+1, so link transfers
and host entropy coding overlap device compute.  Transfers are compact:
input bytes up (plus halo), 4 bytes per position down.

Reference functional bar: CreateBackwardReferences
(src/enc/backward_references/mod.rs:2376-2552) feeding
WriteMetaBlockInternal (encode.rs:1941).
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..core import constants as C
from ..core.bitio import BitWriter
from . import bitstream as bs
from .params import EncoderParams

LEN_SHIFT = 26  # dist < 2^26 covers lgwin <= 24 (dist < 2^24 + slack)
_MAX_INFLIGHT = 3


@partial(__import__("jax").jit,
         static_argnames=("window_size", "halo", "k", "k8", "rounds",
                          "variant", "device_invert"))
def _match_dense(row, min_pos, window_size: int, halo: int, k: int,
                 k8: int, rounds: int, variant: str = "exact",
                 device_invert: bool = False):
    """Device kernel: packed (len << 26 | dist) per shard position.
    Content-sorted exact matchers with the Pallas VMEM fold
    (ops.fold_pallas): multi-operand sort(s), one fused fold kernel,
    permutation-apply inversion.  Bit-identical to the ops.matching
    XLA folds (tests assert equality); ~2x on-chip.  The host extends
    length-capped matches exactly (every reported byte is key- or
    value-attested)."""
    from ..ops.fold_pallas import (best_matches_exact_p,
                                   best_matches_exact8_p,
                                   best_matches_exact9_p)
    # production form: CONTENT-SORTED space (invert=False) — the
    # on-chip inversion sort (~9 ms per 5M rows per fold) moves to the
    # host pull loop as a native radix permutation-apply that overlaps
    # the next shard's device work — greedy/exact8 241/245 -> ~370
    # MB/s on-chip, exact9 86.5 -> ~115 (the two folds' sorted outputs
    # merge on host).  device_invert=True keeps the old on-device
    # inversion: it transfers one span-sized array instead of 2-6
    # full-row arrays, which wins when the host link is the bottleneck
    # (this rig's tunneled chip: BROTLI_TPU_DEVICE_INVERT=1)
    if device_invert:
        if variant == "exact8":
            return (best_matches_exact8_p(
                row, window_size, k=k, rounds=rounds, min_pos=min_pos,
                len_shift=LEN_SHIFT)[halo:],)
        if variant == "exact9":
            return (best_matches_exact9_p(
                row, window_size, k=k, k_short=max(k8, 8),
                rounds=rounds, min_pos=min_pos,
                len_shift=LEN_SHIFT)[halo:],)
        return (best_matches_exact_p(
            row, window_size, k=k, rounds=rounds, min_pos=min_pos,
            len_shift=LEN_SHIFT)[halo:],)
    if variant == "exact8":
        pos_s, packed_s, _ = best_matches_exact8_p(
            row, window_size, k=k, rounds=rounds, min_pos=min_pos,
            len_shift=LEN_SHIFT, invert=False)
        return pos_s, packed_s
    if variant == "exact9":
        # two-sort form: the fused single-pass variant was measured
        # ratio-neutral vs plain exact8 (v0-only candidates are never
        # near their position in (v0,v1) adjacency), so the q9 tier
        # keeps the separate v0-recency short fold
        return best_matches_exact9_p(row, window_size, k=k,
                                     k_short=max(k8, 8), rounds=rounds,
                                     min_pos=min_pos,
                                     len_shift=LEN_SHIFT,
                                     invert=False)
    return best_matches_exact_p(row, window_size, k=k,
                                rounds=rounds, min_pos=min_pos,
                                len_shift=LEN_SHIFT, invert=False)


@partial(__import__("jax").jit,
         static_argnames=("window_size", "halo", "k", "rounds"))
def _match_parse_dense(row, min_pos, window_size: int, halo: int,
                       k: int, rounds: int):
    """max_device form: match AND commit the greedy parse on the chip
    (ops.parse.committed_parse pointer doubling over 4096 sub-blocks).
    Returns (visited, take, dist) for the [halo:] span — the host's
    only work is vectorized command assembly + the native store
    (serialization glue).  Trades ratio for device fraction: copies
    cap at 4*rounds bytes (no host extension pass), parses truncate at
    sub-block seams, and the static dictionary is off — measured
    ~+11% vs host q5 on the mixed corpus at device fraction ~0.97
    (research/max_device_mode.py)."""
    import jax
    import jax.numpy as jnp

    from ..ops.fold_pallas import best_matches_exact_p
    from ..ops.parse import committed_parse
    packed = best_matches_exact_p(row, window_size, k=k,
                                  rounds=rounds, min_pos=min_pos,
                                  len_shift=LEN_SHIFT)[halo:]
    bl = (packed >> LEN_SHIFT).astype(jnp.int32)
    bd = (packed & ((1 << LEN_SHIFT) - 1)).astype(jnp.int32)
    logd = 31 - jax.lax.clz(jnp.maximum(bd, 1).astype(jnp.int32))
    score = jnp.where(bl > 0, 135 * bl - 30 * logd, 0)
    visited, take = committed_parse(bl, score, 4096)
    return visited, take, bd


def _commands_from_parse(visited, take, dist, real):
    """Vectorized (ins, cps, dst, adv) from a device commitment."""
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


_link_cache: dict = {}


def _pick_device_invert(dev) -> bool:
    """Transfer-aware config: the sorted-space form (host applies the
    permutation) minimizes CHIP time but ships 2-6 full-row arrays
    back; the on-device inversion ships one span-sized array.  On a
    normal PCIe/ICI attachment (GB/s) sorted-space wins — the chip is
    the scarce resource; on a slow link (this rig's tunneled dev chip,
    ~4-12 MB/s d2h) the transfer dominates and device_invert wins.
    Probed once per process; BROTLI_TPU_DEVICE_INVERT=0/1 overrides."""
    import os as _os
    ev = _os.environ.get("BROTLI_TPU_DEVICE_INVERT")
    if ev is not None and ev != "":
        return ev not in ("0", "false", "no")
    if "di" not in _link_cache:
        import time as _t

        import jax as _jax
        try:
            probe = np.zeros(1 << 20, np.uint8)
            d = _jax.device_put(probe, dev)
            np.asarray(d)  # warm
            t0 = _t.perf_counter()
            np.asarray(_jax.device_put(probe, dev))
            bw = (1 << 20) / max(_t.perf_counter() - t0, 1e-9) / 1e6
            _link_cache["di"] = bw < 200.0  # MB/s round-trip
        except Exception:
            _link_cache["di"] = False
    return _link_cache["di"]


def _device_knobs(quality: int):
    """Per-tier device matcher knobs from the round-4 Pallas sweep
    (research/tpu_tier_sweep.py, 5M rows on a v5e): the speed tiers
    run rounds=2 (attest 8 bytes, host extends at the cap) — +49%
    on-chip for ~+0.9% size — while q9 keeps rounds=4 for ratio.
    Measured: greedy k32/r2 241 MB/s, exact8 k16/r2 245 MB/s,
    exact9 (two-sort) k16/r4 86.5 MB/s at 1.004x host size."""
    if quality <= 6:
        return dict(k=32, k8=0, rounds=2, variant="exact")
    if quality <= 8:
        return dict(k=16, k8=0, rounds=2, variant="exact8")
    return dict(k=16, k8=16, rounds=4, variant="exact9")


def _extract_literals(region, dlen, ins, adv):
    """Literal byte stream of a parsed segment (vectorized insert-run
    gather through the command list)."""
    ins = np.asarray(ins, np.int64)
    adv = np.asarray(adv, np.int64)
    total = int(ins.sum())
    if total == 0:
        return np.zeros(0, np.uint8)
    step = ins + adv
    cmd_start = np.zeros(len(ins), np.int64)
    np.cumsum(step[:-1], out=cmd_start[1:])
    owner = np.repeat(np.arange(len(ins)), ins)
    run_off = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(ins)[:-1]]), ins)
    return np.asarray(region)[dlen + cmd_start[owner] + run_off]


def compress_tpu(data, quality: int = 9, lgwin: int = 22,
                 mode: int = 0, span: int | None = None,
                 stats: dict | None = None,
                 max_device: bool = False) -> bytes:
    """One-shot TPU-path compress for q2-q9 (q0/1 use the trivial-tier
    fast path; q10/11's optimal parse stays on host).

    stats: pass a dict to receive the pipeline shape — wall_s,
    host_busy_s (serialization leg), device_wait_s (blocked on the
    chip/link), and device_fraction = device_wait / wall.

    max_device: commit the greedy parse ON THE CHIP too
    (_match_parse_dense) — host work drops to command assembly + the
    native store, device fraction ~0.97, at a measured ratio cost
    (~+11% vs host q5 on the mixed corpus: copies cap at 4*rounds
    bytes, sub-block parse seams, no static dictionary)."""
    import time as _time

    import jax

    from .. import native_bridge as nb
    from ..encode.match import greedy_parse
    from ..encode.metablock import (choose_context_mode,
                                    choose_literal_context_map)

    raw = np.frombuffer(bytes(data), dtype=np.uint8)
    params = EncoderParams(quality=quality, lgwin=lgwin,
                           mode=mode).sanitize(len(raw))
    n = len(raw)
    w = BitWriter()
    bs.write_stream_header(w, params.lgwin, params.large_window)
    if n == 0:
        bs.write_empty_last_meta_block(w)
        return w.getvalue()

    if span is None:
        span = 1 << params.lgblock
    # the halo always covers the window, so (a) every in-window match
    # is visible to the chip and (b) row-local positions p >= halo have
    # min(p, window) == min(abs_pos, window) — dictionary
    # pseudo-distances computed row-locally are exact
    halo = -(-(params.window_size + 16) // 4096) * 4096
    dev = jax.devices()[0]
    knobs = _device_knobs(params.quality)

    # fixed-shape rows so every dispatch reuses one executable
    starts = list(range(0, n, span))
    rows = np.zeros((len(starts), halo + span), dtype=np.uint8)
    min_pos = np.zeros(len(starts), np.int32)
    for j, s0 in enumerate(starts):
        real = min(span, n - s0)
        rows[j, halo:halo + real] = raw[s0:s0 + real]
        ctx_lo = max(0, s0 - halo)
        fill = s0 - ctx_lo
        if fill:
            rows[j, halo - fill:halo] = raw[ctx_lo:s0]
        min_pos[j] = halo - fill

    # async pipeline: keep a few dispatches in flight
    inflight = {}

    device_invert = _pick_device_invert(dev)

    def dispatch(j):
        row_d = jax.device_put(rows[j], dev)
        if max_device:
            inflight[j] = _match_parse_dense(
                row_d, np.int32(min_pos[j]), params.window_size, halo,
                k=knobs["k"], rounds=max(knobs["rounds"], 6))
        else:
            inflight[j] = _match_dense(row_d, np.int32(min_pos[j]),
                                       params.window_size, halo,
                                       device_invert=device_invert,
                                       **knobs)

    for j in range(min(_MAX_INFLIGHT, len(starts))):
        dispatch(j)

    cache = list(C.INITIAL_DISTANCE_CACHE)
    t_start = _time.perf_counter()
    device_wait = 0.0
    for j, s0 in enumerate(starts):
        t0 = _time.perf_counter()
        # blocks on this shard only; device results arrive in
        # content-sorted space (pos_s, packed_s[, score_s] per fold)
        sorted_out = [np.asarray(a) for a in inflight.pop(j)]
        device_wait += _time.perf_counter() - t0
        if j + _MAX_INFLIGHT < len(starts):
            dispatch(j + _MAX_INFLIGHT)
        real = min(span, n - s0)
        if max_device:
            # device commitment: host = command assembly + store only
            vis, tk, dd = sorted_out
            ins, cps, dst, adv = _commands_from_parse(vis, tk, dd,
                                                      real)
            mp0 = int(min_pos[j])
            dlen = halo - mp0
            row = rows[j]
            region = row[mp0:halo + real]
            segs = [(ins, cps, dst, adv)]
        elif len(sorted_out) == 1:   # device_invert: position space
            packed = sorted_out[0][:real].astype(np.int64)
        else:
            if len(sorted_out) == 6:  # exact9: two folds, host merge
                packed = nb.invert_merge32(*sorted_out)
            else:
                packed = nb.invert_perm32(*sorted_out)
            packed = packed[halo:halo + real].astype(np.int64)
        if not max_device:
            bl = packed >> LEN_SHIFT
            bd = packed & ((1 << LEN_SHIFT) - 1)
            row = rows[j]
            # exact extension of device length-capped matches (every
            # reported length is byte-attested by the kernel's exact
            # chunk-value payloads, so extension resumes at the cap)
            cap = 4 * knobs["rounds"]
            if nb.available():
                capped = bl >= cap
                if knobs["variant"] == "exact9":
                    # the exact9 short-match fold caps its lengths at 8
                    # (base 4 + one payload round): a winning 8-capped
                    # short-fold match may really be longer, so len == 8
                    # is an extension candidate too (extension is an exact
                    # byte compare, so extending a genuinely-8 match from
                    # the main fold is merely a no-op)
                    capped |= bl == 8
                if capped.any():
                    pos_c = np.nonzero(capped)[0]
                    ext = nb.extend_caps(row[:halo + real], 0,
                                         pos_c + halo, bd[pos_c],
                                         bl[pos_c])
                    bl[pos_c] = ext
            with np.errstate(divide="ignore"):
                bsc = np.where(
                    bl > 0,
                    135 * bl - 30 * np.floor(
                        np.log2(np.maximum(bd, 2))).astype(np.int64),
                    0)
            # drop the zero-filled part of the halo on host: with
            # dlen = halo - min_pos (== min(s0, halo)) every row-local
            # position maps exactly to its absolute stream position (the
            # halo covers the window, so both clamp to the window beyond
            # it) — the walk's max_distance tests and dictionary
            # pseudo-distances are absolute-exact for every shard
            mp0 = int(min_pos[j])
            dlen = halo - mp0
            region = row[mp0:halo + real]
            # union static-dictionary candidates on host (the device
            # kernel searches the window only)
            isd = np.zeros(real, bool)
            bwire = bl.copy()
            from .static_dict import add_dictionary_matches
            fl = np.zeros(dlen + real, np.int64)
            fd = np.zeros(dlen + real, np.int64)
            fs = np.zeros(dlen + real, np.int64)
            fi = np.zeros(dlen + real, bool)
            fw = np.zeros(dlen + real, np.int64)
            fl[dlen:] = bl; fd[dlen:] = bd; fs[dlen:] = bsc
            fw[dlen:] = bwire
            add_dictionary_matches(region, dlen, params.window_size,
                                   135, fl, fd, fs, fi, fw)
            bl, bd, bsc = fl[dlen:], fd[dlen:], fs[dlen:]
            isd, bwire = fi[dlen:], fw[dlen:]
            segs = greedy_parse(region, bl, bd, bsc, [real], dict_len=dlen,
                                pos0=0, initial_cache=tuple(cache),
                                best_isdict=isd,
                                window_size=params.window_size,
                                best_wire=bwire)
        ins, cps, dst, adv = segs[0]
        is_last = j == len(starts) - 1
        ctx_mode = choose_context_mode(row[halo:halo + real],
                                       params.quality, params.mode)
        if ctx_mode == C.CONTEXT_UTF8:
            nlc, smap = choose_literal_context_map(
                region, dlen, real, params.quality, n)
        else:
            nlc, smap = 1, np.zeros(64, dtype=np.int64)
        # literal block split planned ON THE DEVICE (ops/split.py: the
        # Lloyd loop's cost matrix is an MXU matmul); the native store
        # takes the assignment and computes command/distance splits
        ext_split = None
        try:
            from ..ops.split import split_symbols_device
            lit_stream = _extract_literals(region, dlen, ins, adv)
            if len(lit_stream) >= 128:
                sp = split_symbols_device(
                    lit_stream.astype(np.int64), 256, "literal")
                if sp.num_types > 1:
                    ext_split = (sp.types.astype(np.int32),
                                 sp.num_types)
        except Exception:
            ext_split = None  # device planning is best-effort
        if nb.available():
            res = nb.encode_metablock(
                region, dlen, real, is_last, ins, cps, dst, adv,
                cache, params.window_size, 0, 0,
                params.dist.alphabet_size, max(params.quality, 4),
                ctx_mode, nlc, smap, C.CONTEXT_LUT0[ctx_mode],
                C.CONTEXT_LUT1[ctx_mode], ext_lit_split=ext_split)
            if res is None or res[1] > 8 * real + 40:
                bs.store_uncompressed_meta_block(
                    w, raw[s0:s0 + real].tobytes())
                if is_last:
                    bs.write_empty_last_meta_block(w)
            else:
                words, nbits, cache = res
                w.append_packed(words, nbits)
        else:
            # pure-Python serializer fallback
            from .command import resolve_commands
            cmds, new_cache = resolve_commands(
                ins, cps, dst, params.dist, advance=adv,
                initial_cache=cache, pos_offset=dlen,
                window_size=params.window_size)
            state = w.save_state()
            before = w.bit_length()
            bs.store_meta_block_auto(w, region, dlen, real, cmds,
                                     params.dist, max(params.quality, 4),
                                     n, params.mode, is_last)
            if w.bit_length() - before > 8 * real + 40:
                w.restore_state(state)
                bs.store_uncompressed_meta_block(
                    w, raw[s0:s0 + real].tobytes())
                if is_last:
                    bs.write_empty_last_meta_block(w)
            else:
                cache = new_cache
    if stats is not None:
        wall = _time.perf_counter() - t_start
        stats["wall_s"] = wall
        stats["device_wait_s"] = device_wait
        stats["host_busy_s"] = wall - device_wait
        stats["device_fraction"] = device_wait / wall if wall else 0.0
    return w.getvalue()
