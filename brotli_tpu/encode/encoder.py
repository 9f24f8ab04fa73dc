"""Top-level Brotli encoder: quality dispatch and stream assembly.

One-shot `compress()` with capability parity targets from the reference's
encoder_compress / compress_stream (src/enc/encode.rs:1436, :2873):
stream shaping flags (catable / appendable / bare / byte_align / magic),
custom LZ77 dictionaries, per-metablock uncompressed fallback
(encode.rs:2141-2163), and whole-stream uncompressed fallback
(MakeUncompressedStream, encode.rs:1388).

Pipeline: batched match finding + greedy lazy parse (match.py, the TPU
shape) -> distance-cache resolution (command.py) -> metablock
optimization + serialization (metablock.py / bitstream.py).
"""

from __future__ import annotations

import os

import numpy as np

from ..core import constants as C
from ..core.bitio import BitWriter
from . import bitstream as bs
from .command import resolve_commands
from .match import find_best_matches, greedy_parse
from .metablock import build_meta_block
from .params import EncoderParams, max_compressed_size

# Catable streams poison the initial distance cache so no command can rely
# on the RFC's initial {4, 11, 15, 16} values, which would differ when the
# stream is appended after another (reference encode.rs:693-703).
POISONED_DISTANCE = 0x7FFFFFF0

# Default metablock span (1 << default auto lgblock): large enough to
# amortize header cost, small enough for histogram locality before block
# splitting cuts in.  The live span comes from params.lgblock
# (compute_lg_block honors an explicit -l, reference encode.rs:570-589).
METABLOCK_SIZE = 1 << 22


def compress(data, quality: int = 11, lgwin: int = 22, lgblock: int = 0,
             mode: int = 0, catable: bool = False, appendable: bool = False,
             bare: bool = False, byte_align: bool = False,
             magic_number: bool = False, large_window: bool = False,
             custom_dictionary: bytes = b"", q9_5: bool = False,
             q10_deep: bool = False,
             literal_byte_score: int = 540,
             avoid_distance_prefix_search: bool = False,
             disable_literal_context_modeling: bool = False,
             stream_offset: int = 0,
             metablock_callback=None,
             literal_probabilities=None) -> bytes:
    """One-shot compress (reference BrotliCompress, src/enc/mod.rs:142).

    metablock_callback: live IR side-channel (reference
    MetablockCallback threaded through every compress entry point,
    interface.rs:633): called once per emitted metablock with the list
    of IR commands (utils.ir vocabulary) for that block.
    """
    data = np.frombuffer(bytes(data), dtype=np.uint8)
    params = EncoderParams(
        quality=quality, lgwin=lgwin, lgblock=lgblock, mode=mode,
        catable=catable, appendable=appendable, bare=bare,
        byte_align=byte_align, magic_number=magic_number,
        large_window=large_window, q9_5=q9_5, q10_deep=q10_deep,
        literal_byte_score=literal_byte_score,
        avoid_distance_prefix_search=avoid_distance_prefix_search,
        disable_literal_context_modeling=disable_literal_context_modeling,
        stream_offset=stream_offset,
        log_meta_block=metablock_callback is not None,
    ).sanitize(len(data))
    if params.catable:
        custom_dictionary = b""  # catable forbids dictionaries (SanitizeParams)
    out = compress_with_params(data, params, custom_dictionary,
                               metablock_callback=metablock_callback,
                               literal_probabilities=literal_probabilities)
    # Whole-stream fallback: never exceed the uncompressed-stream bound
    # (reference encoder_compress, encode.rs:1522-1537).
    plain_flags = not (params.catable or params.appendable or params.bare
                       or params.magic_number or custom_dictionary)
    if plain_flags and len(out) > len(data) + 5:
        alt = make_uncompressed_stream(data, params)
        if len(alt) < len(out):
            return alt
    return out


def make_uncompressed_stream(data: np.ndarray,
                             params: EncoderParams) -> bytes:
    """Raw fallback stream (reference MakeUncompressedStream,
    encode.rs:1388-1433)."""
    w = BitWriter()
    bs.write_stream_header(w, params.lgwin, params.large_window)
    n = len(data)
    pos = 0
    while pos < n:
        chunk = min(n - pos, 1 << 24)
        bs.store_uncompressed_meta_block(
            w, data[pos:pos + chunk].tobytes())
        pos += chunk
    bs.write_empty_last_meta_block(w)
    return w.getvalue()


def _quality_knobs(params: EncoderParams):
    """Match-finder geometry per quality (the TPU analog of ChooseHasher,
    reference encode.rs:834-893: deeper candidate search and bigger
    tables at higher quality)."""
    q = params.quality
    if q <= 1:
        return dict(k=1, bucket_bits=15, k8=0)
    if q <= 3:
        # the native basic tier (reference H2/H3 BasicHasher shape:
        # direct-mapped 2^16 buckets, no counters, last-distance cache
        # probe only) with the reference's 5-byte hash — round-4 A/B
        # reversed the earlier 4-byte finding: at this geometry h5 is
        # smaller on BOTH text and the mixed corpus (alice q3 0.9765 ->
        # 0.9685 vs C) at equal speed; q2 sweeps 1 slot, q3 sweeps 2
        return dict(k=1 if q == 2 else 2, bucket_bits=16, k8=0,
                    n_cache=1, hash_len=5)
    if params.lgwin <= 16 and q >= 4:
        # small-window presets (the H40/H41/H42 'forgetful chain'
        # selection, reference ChooseHasher encode.rs:855-862): tiny
        # windows need small bank-sized tables with bounded-depth
        # chains — the ring table's fixed k IS the forgetting bound;
        # depth steps up with quality like the 40/41/42 bank counts
        if q < 7:
            return dict(k=4, bucket_bits=14, k8=2, bucket_bits8=14,
                        hash_len=4)
        if q < 9:
            return dict(k=8, bucket_bits=14, k8=4, bucket_bits8=14,
                        hash_len=4, n_cache=10)
        return dict(k=16, bucket_bits=15, k8=8, bucket_bits8=15,
                    hash_len=4, n_cache=16)
    if q <= 6:
        # 4-byte primary hash, 2^16 buckets x 8 slots: the speed-tier
        # search is LATENCY-bound on ring-row loads, so the table must
        # sit in the 2MB/core L2 — with the compact u32 ring entries
        # this geometry is 2.25MB and the round-4 interleaved A/B
        # moved q5 from 0.75x to ~0.89x C at size 0.9994 (the wider
        # 2^17 table's extra candidates bought only 0.02% size).
        # round-4 re-sweep: k=7 (one slot fewer, -12% row scan) paid
        # back with n_cache=4 short-code probes (cheap: one 4-byte
        # gate each) — size stays 0.9998x C on the mixed corpus; the
        # 8-byte table covers long matches
        return dict(k=7, bucket_bits=16, k8=2, bucket_bits8=16,
                    hash_len=4, n_cache=4)
    if q <= 9:
        # the full 16-candidate short-code probe set (reference H9
        # kNumLastDistancesToCheck=16, mod.rs:598); same
        # wide-and-shallow primary-table shift as the q<=6 tier
        # (1.0041 -> 0.9970 vs C on the mixed corpus)
        return dict(k=24, bucket_bits=17, k8=8, bucket_bits8=16,
                    hash_len=4, n_cache=16)
    return dict(k=24, bucket_bits=18, k8=12)


def _serial_segments(nb, full, params, boundaries, dlen, start,
                     cache, knobs):
    """In-thread form of _pipelined_segments (no prefetch worker)."""
    sess = nb.ParseSession(
        full, params.window_size, dict_len=dlen, pos0=start,
        initial_cache=cache,
        literal_byte_score=params.literal_byte_score,
        use_dictionary=not params.catable, **knobs)
    try:
        prev = start
        for b in boundaries:
            yield sess.next(b, (b - prev) // 2 + 2)
            prev = b
    finally:
        sess.close()


def _pipelined_segments(nb, full, params, boundaries, dlen, start,
                        cache, knobs):
    """Generator over parse segments, prefetched one boundary ahead on
    a single worker thread (see the call site for why this is exact)."""
    sess = nb.ParseSession(
        full, params.window_size, dict_len=dlen, pos0=start,
        initial_cache=cache,
        literal_byte_score=params.literal_byte_score,
        use_dictionary=not params.catable, **knobs)
    from concurrent.futures import ThreadPoolExecutor
    ex = ThreadPoolExecutor(max_workers=1)
    try:
        fut = ex.submit(sess.next, boundaries[0],
                        (boundaries[0] - start) // 2 + 2)
        for i in range(len(boundaries)):
            seg = fut.result()
            if i + 1 < len(boundaries):
                span = boundaries[i + 1] - boundaries[i]
                fut = ex.submit(sess.next, boundaries[i + 1],
                                span // 2 + 2)
            yield seg
    finally:
        ex.shutdown(wait=True)
        sess.close()


def _dual_parse_segments(nb, full, params, boundaries, dlen, start,
                         cache, knobs):
    """Two parse sessions over the same input, each metablock split at
    its midpoint: session A parses the first half while session B —
    whose rings were advanced over A's half by insert-only priming
    (parse_session_prime, ~30% of a parse) — parses the second, and
    the two command runs concatenate into the metablock's segment.
    Output differs slightly from the single-session parse (copies cap
    at the midpoint seam; the prime inserts positions the parse's
    spree-skip and long-match stride economies drop; each session's
    distance cache sees only its own halves — wire distances resolve
    against the TRUE rolling cache at store time, so streams stay
    valid), and the size is gated by the bench corpora.  Wall win on
    a 4-core host: each worker does parse(half) + prime(half) ~ 0.65
    of the full parse, beside the store thread.

    Reference analog: CompressMulti's prefix-primed shards
    (threading/mod.rs:354-366) applied INSIDE a stream, with ring
    priming standing in for the custom-dictionary prefix hash."""
    import numpy as np
    from concurrent.futures import ThreadPoolExecutor

    def mk():
        return nb.ParseSession(
            full, params.window_size, dict_len=dlen, pos0=start,
            initial_cache=cache,
            literal_byte_score=params.literal_byte_score,
            use_dictionary=not params.catable, **knobs)

    sa, sb = mk(), mk()
    ex_a = ThreadPoolExecutor(max_workers=1)
    ex_b = ThreadPoolExecutor(max_workers=1)
    from collections import deque
    futs = deque()
    bl = list(boundaries)

    def submit_one(gi):
        prev_b = start if gi == 0 else bl[gi - 1]
        b = bl[gi]
        span = b - prev_b
        if span < (1 << 19):
            # small metablock: A parses it whole, B just keeps up
            fa = ex_a.submit(sa.next, b, span // 2 + 2)
            fp = ex_b.submit(sb.prime, b)
            futs.append((fa, None, fp))
        else:
            mid = prev_b + span // 2
            fa = ex_a.submit(sa.next, mid, (mid - prev_b) // 2 + 2)
            ex_a.submit(sa.prime, b)
            ex_b.submit(sb.prime, mid)
            fb = ex_b.submit(sb.next, b, (b - mid) // 2 + 2)
            futs.append((fa, fb, None))

    # bounded lookahead: at most TWO metablocks in flight — the
    # parse workers must not run arbitrarily ahead of the store
    # thread (each undelivered segment retains its command arrays,
    # O(input) if unbounded; the round-4 pipeline bounded this to
    # one boundary ahead for the same reason)
    submitted = 0
    for submitted in range(min(2, len(bl))):
        submit_one(submitted)
    submitted = min(2, len(bl))
    try:
        while futs:
            fa, fb, fp = futs.popleft()
            if submitted < len(bl):
                submit_one(submitted)
                submitted += 1
            a = fa.result()
            if fp is not None:
                fp.result()
            if fb is None:
                yield a
            else:
                bseg = fb.result()
                ai, ac, ad, aa = a
                bi, bc, bd, ba = (x.copy() for x in bseg)
                if len(ai) and ac[-1] == 0 and aa[-1] == 0:
                    # A's trailing insert-only command is wire-legal
                    # only as a metablock's FINAL command (its dummy
                    # copy-4 is cut off by mlen); mid-block it must
                    # fold into B's first command's insert run
                    if len(bi):
                        bi[0] += ai[-1]
                        ai, ac, ad, aa = (ai[:-1], ac[:-1], ad[:-1],
                                          aa[:-1])
                    # else: B is a single trailing insert too and A's
                    # stays last-but-one... cannot happen — B always
                    # emits at least its own trailing command
                yield (np.concatenate([ai, bi]),
                       np.concatenate([ac, bc]),
                       np.concatenate([ad, bd]),
                       np.concatenate([aa, ba]))
    finally:
        ex_a.shutdown(wait=True)
        ex_b.shutdown(wait=True)
        sa.close()
        sb.close()


def _pipelined_fragment_segments(nb, full, params, boundaries, start):
    """Fragment-tier analog of _pipelined_segments: one
    fragment_parse_seg call per metablock, prefetched one boundary
    ahead on a single worker thread (the persistent direct-mapped
    table requires thread affinity)."""
    from concurrent.futures import ThreadPoolExecutor
    ex = ThreadPoolExecutor(max_workers=1)
    window = params.window_size
    try:
        fut = ex.submit(nb.fragment_parse_seg, full, window, start,
                        boundaries[0], True)
        prev = start
        for i in range(len(boundaries)):
            seg = fut.result()
            prev = boundaries[i]
            if i + 1 < len(boundaries):
                fut = ex.submit(nb.fragment_parse_seg, full, window,
                                prev, boundaries[i + 1], False)
            # cap = span/4 + 16 cannot overflow: every command but the
            # trailing insert advances by a >= 4-byte copy
            assert seg is not None
            yield seg
    finally:
        ex.shutdown(wait=True)


def compress_with_params(data: np.ndarray, params: EncoderParams,
                         custom_dictionary: bytes = b"",
                         metablock_callback=None,
                         literal_probabilities=None,
                         pipeline: bool = True) -> bytes:
    n = len(data)
    w = BitWriter()
    # only catable+bare streams omit the window header (reference
    # ensure_initialized, encode.rs:676)
    if not (params.bare and params.catable):
        bs.write_stream_header(w, params.lgwin, params.large_window)
    if params.magic_number:
        bs.write_magic_number(w, params.size_hint, catable=params.catable,
                              appendable=params.appendable)

    start = 0
    cache = list(C.INITIAL_DISTANCE_CACHE)
    if params.catable and n > 0:
        # First bytes stored raw so the stream's first compressed
        # metablock is byte-re-alignable by BroCatli and context seeding
        # is position-independent (reference encode.rs:2258-2333).
        cache = [POISONED_DISTANCE] * 4
        k = min(2, n)
        bs.store_uncompressed_meta_block(w, data[:k].tobytes())
        start = k

    if start >= n:
        _finish_stream(w, params)
        return w.getvalue()

    dict_arr = np.frombuffer(bytes(custom_dictionary), dtype=np.uint8)
    dlen = len(dict_arr)
    full = np.concatenate([dict_arr, data]) if dlen else data

    span = 1 << params.lgblock
    boundaries = list(range(start + span, n, span)) + [n]
    # Quality dispatch (reference WriteMetaBlockInternal tiers,
    # encode.rs:2026-2111): the whole 9.5/10/11 family runs the optimal
    # parser with full metablock optimization — 9.5 with a single
    # cost-model iteration (the fast tier), q10 with 2, q11 with the
    # refinement loop.
    use_zopfli = params.quality >= 10
    if not use_zopfli:
        from .. import native_bridge as nb
        knobs = _quality_knobs(params)
        if (params.quality <= 1 and nb.available() and dlen == 0
                and start == 0 and metablock_callback is None
                and params.stream_offset == 0):
            # q0/q1 fast tier (reference BrotliCompressFragmentFast,
            # compress_fragment.rs): one direct-mapped table, greedy
            # one-pass, miss-skip stride — no ring tables, no
            # dictionary, no distance-cache probes.  The whole
            # metablock loop (parse worker + trivial store + bit
            # assembly) runs in one native call.
            suppress = params.appendable or params.byte_align
            res = nb.compress_fragment_pipeline(
                full, params.window_size, span, params.quality,
                suppress, tuple(cache), bit_phase=w.bitpos)
            if res is not None:
                words, nbits, cache = res
                w.append_packed_phased(words, nbits, w.bitpos)
                if suppress:
                    _write_trailer(w, params)
                return w.getvalue()
            segments = _pipelined_fragment_segments(
                nb, full, params, boundaries, start)
        elif params.quality <= 1 and nb.available() and dlen == 0:
            segments = _pipelined_fragment_segments(
                nb, full, params, boundaries, start)
        elif (params.quality <= 3 and nb.available() and dlen == 0
                and start == 0 and metablock_callback is None
                and params.stream_offset == 0
                and not params.disable_literal_context_modeling):
            # q2/q3 basic tier: the whole metablock loop (basic-tier
            # parse worker + trivial store + bit assembly) runs in ONE
            # native call, like the q0/q1 fragment pipeline — the
            # Python-orchestrated loop paid per-metablock ctypes
            # marshalling + GIL handoffs
            suppress = params.appendable or params.byte_align
            res = nb.compress_session_pipeline(
                full, params.window_size, span, params.quality,
                suppress, tuple(cache), bit_phase=w.bitpos,
                use_dictionary=not params.catable, **knobs)
            if res is not None:
                words, nbits, cache = res
                w.append_packed_phased(words, nbits, w.bitpos)
                if suppress:
                    _write_trailer(w, params)
                return w.getvalue()
            segments = _pipelined_segments(
                nb, full, params, boundaries, dlen, start,
                tuple(cache), knobs)
        elif nb.available():
            # one-pass native search+parse (the reference's
            # CreateBackwardReferences shape: search only at parse
            # positions, bulk hash insertion over match bodies),
            # delivered one metablock at a time through a parse
            # session and prefetched one ahead on a worker thread:
            # parse(metablock g+1) overlaps serialization(g) — both
            # native calls release the GIL — with output byte-
            # identical to the single whole-input parse.
            if (pipeline and len(full) - dlen >= (1 << 21)
                    and knobs.get("n_cache", 1) > 1
                    and os.environ.get("BROTLI_TPU_DUAL_PARSE",
                                       "1") != "0"):
                # large inputs at the ring tiers: dual-session parse
                # (two parse workers + the store thread)
                segments = _dual_parse_segments(
                    nb, full, params, boundaries, dlen, start,
                    tuple(cache), knobs)
            elif pipeline:
                segments = _pipelined_segments(
                    nb, full, params, boundaries, dlen, start,
                    tuple(cache), knobs)
            else:
                # CompressMulti workers run unpipelined: every core
                # already carries one shard, and a prefetch thread per
                # worker would oversubscribe (reference workers are
                # single-threaded too, threading/mod.rs:337)
                segments = _serial_segments(
                    nb, full, params, boundaries, dlen, start,
                    tuple(cache), knobs)
        else:
            best_len, best_dist, best_score, best_isdict, best_wire = \
                find_best_matches(
                    full, params.window_size, dict_len=dlen,
                    literal_byte_score=params.literal_byte_score,
                    use_dictionary=not params.catable, **knobs)
            segments = greedy_parse(full, best_len, best_dist,
                                    best_score,
                                    boundaries, dict_len=dlen,
                                    pos0=start,
                                    initial_cache=tuple(cache),
                                    best_isdict=best_isdict,
                                    window_size=params.window_size,
                                    best_wire=best_wire)
    else:
        segments = [None] * len(boundaries)

    # q4-q9 production path: one fused native call per metablock
    # (resolve + plan + serialize, no per-metablock Python glue);
    # the IR callback needs the Python-side command arrays, so it runs
    # the unfused flow
    from .. import native_bridge as nb
    # q<4 runs the same fused call with context modeling and block
    # splits off — that wire shape IS the trivial store (single trees,
    # implicit all-zero context map), at native speed
    fused = (not use_zopfli and nb.available()
             and metablock_callback is None
             and params.stream_offset == 0)
    if fused:
        from .metablock import (choose_context_mode,
                                choose_literal_context_map)
        seg_start = start
        for i, (seg, boundary) in enumerate(zip(segments, boundaries)):
            ins, cps, dst, adv = seg
            mlen = boundary - seg_start
            is_final = i == len(boundaries) - 1
            suppress = params.appendable or params.byte_align
            is_last = is_final and not suppress
            abs_start = dlen + seg_start
            region = full[abs_start:abs_start + mlen]
            ctx_mode = choose_context_mode(region, params.quality,
                                           params.mode)
            if params.disable_literal_context_modeling:
                # one literal tree per block type: zero context LUTs
                # collapse every context to 0 in both the plan and the
                # clustering passes (reference param 4)
                nlc, smap = 1, np.zeros(64, dtype=np.int64)
                lut0 = lut1 = np.zeros(256, dtype=np.uint8)
                ctx_mode = 0
            elif ctx_mode == C.CONTEXT_UTF8:
                nlc, smap = choose_literal_context_map(
                    full, abs_start, mlen, params.quality,
                    params.size_hint)
                lut0 = C.CONTEXT_LUT0[ctx_mode]
                lut1 = C.CONTEXT_LUT1[ctx_mode]
            else:
                nlc, smap = 1, np.zeros(64, dtype=np.int64)
                lut0 = C.CONTEXT_LUT0[ctx_mode]
                lut1 = C.CONTEXT_LUT1[ctx_mode]
            res = nb.encode_metablock(
                full, abs_start, mlen, is_last, ins, cps, dst, adv,
                cache, params.window_size, params.dist.npostfix,
                params.dist.ndirect, params.dist.alphabet_size,
                params.quality, ctx_mode, nlc, smap, lut0, lut1,
                enable_splits=params.quality >= 4)
            # Per-metablock expansion fallback (encode.rs:2141-2163).
            if res is None or res[1] > 8 * mlen + 40:
                bs.store_uncompressed_meta_block(
                    w, data[seg_start:boundary].tobytes())
                if is_last:
                    bs.write_empty_last_meta_block(w)
            else:
                words, nbits, cache = res
                w.append_packed(words, nbits)
            seg_start = boundary
        if params.appendable or params.byte_align:
            _write_trailer(w, params)
        return w.getvalue()

    seg_start = start
    zex = zopfli_pending = None
    if use_zopfli and len(boundaries) > 1:
        # prefetch metablock g+1's candidate collection (deep rings,
        # dictionary probe, literal costs — all cache-independent)
        # while metablock g's DP + store run
        from concurrent.futures import ThreadPoolExecutor
        zex = ThreadPoolExecutor(max_workers=1)
    # refinement depth: the 9.5 family runs one iteration (two for
    # -q9.5y, quality 12 — a distinct deeper tier, bin/brotli.rs:658);
    # plain q10 defaults to one iteration too (the reference maps
    # one-shot q10 to 9.5, encode.rs:1470-1482) unless q10_deep asks
    # for the full 2-iteration refinement
    if params.q9_5:
        zopfli_iters = 2 if params.quality >= 12 else 1
    elif params.quality == 10 and not params.q10_deep:
        zopfli_iters = 1
    else:
        zopfli_iters = None

    def _zopfli_region(idx):
        s0 = start if idx == 0 else boundaries[idx - 1]
        region_start = dlen + s0
        keep = min(region_start, params.window_size)
        return full[region_start - keep:dlen + boundaries[idx]], keep

    # NOTE: collection results contain live views into a 2-slot
    # toggled scratch (_collect_candidates) — prefetch depth must stay
    # EXACTLY 1: one pending future, .result() before the next submit.
    # Deepening the prefetch silently corrupts candidate distances.
    if zex is not None:
        from .zopfli import zopfli_collect
        r0, k0 = _zopfli_region(0)
        zopfli_pending = zex.submit(zopfli_collect, r0, params, k0,
                                    zopfli_iters)
    for i, (seg, boundary) in enumerate(zip(segments, boundaries)):
        if use_zopfli:
            from .zopfli import zopfli_collect, zopfli_segment
            region, keep = _zopfli_region(i)
            if zopfli_pending is not None:
                col = zopfli_pending.result()
                if i + 1 < len(boundaries):
                    rn, kn = _zopfli_region(i + 1)
                    zopfli_pending = zex.submit(zopfli_collect, rn,
                                                params, kn, zopfli_iters)
            else:
                col = None
            seg = zopfli_segment(region, params, dict_len=keep,
                                 initial_cache=tuple(cache),
                                 iters=zopfli_iters, precollected=col)
        ins, cps, dst, adv = seg
        mlen = boundary - seg_start
        is_final = i == len(boundaries) - 1
        # appendable/byte_align streams never set ISLAST on content
        # blocks; the trailer is written separately (encode.rs:1973,
        # :2165)
        suppress = params.appendable or params.byte_align
        is_last = is_final and not suppress
        dist_params = params.dist
        cmds, new_cache = resolve_commands(
            ins, cps, dst, dist_params, advance=adv, initial_cache=cache,
            pos_offset=dlen + seg_start + params.stream_offset,
            window_size=params.window_size)
        if params.quality >= 10 and not params.avoid_distance_prefix_search:
            # per-metablock NPOSTFIX/NDIRECT search (reference
            # BrotliBuildMetaBlock, metablock.rs:158-208)
            from .metablock import choose_distance_params
            copy_mask = cmds.copy_len > 0
            better = choose_distance_params(
                cmds.distance, copy_mask, cmds.dist_code,
                large_window=params.large_window)
            if (better.npostfix, better.ndirect) != (
                    dist_params.npostfix, dist_params.ndirect):
                dist_params = better
                cmds, new_cache = resolve_commands(
                    ins, cps, dst, dist_params, advance=adv,
                    initial_cache=cache,
                    pos_offset=dlen + seg_start + params.stream_offset,
                    window_size=params.window_size)

        if metablock_callback is not None:
            # live IR side-channel (reference LogMetaBlock,
            # brotli_bit_stream.rs:420: the callback sees each
            # metablock's commands as they are emitted)
            from ..utils.ir import ir_from_commands
            probs_full = None
            if literal_probabilities is not None:
                # external-literal-probability feature (reference
                # interface.rs:378-420): per-literal probability slices
                # ride the IR alongside the literal bytes
                probs_full = np.concatenate([
                    np.zeros(dlen, np.uint8),
                    np.frombuffer(bytes(literal_probabilities),
                                  np.uint8)])
            ir_cmds = ir_from_commands(
                full, dlen + seg_start, cmds,
                pos_offset=dlen + seg_start + params.stream_offset,
                window_size=params.window_size,
                lit_probs=probs_full)
            metablock_callback(
                ir_cmds, bytes(full[dlen + seg_start:dlen + boundary]))
        state = w.save_state()
        before = w.bit_length()
        if params.quality >= 4:
            bs.store_meta_block_auto(
                w, full, dlen + seg_start, mlen, cmds, dist_params,
                params.quality, params.size_hint, params.mode, is_last,
                disable_literal_context_modeling=params.
                disable_literal_context_modeling)
        else:
            bs.store_meta_block_trivial(w, full, dlen + seg_start, mlen,
                                        is_last, cmds, dist_params)
        # Per-metablock expansion fallback (reference encode.rs:2141-2163).
        if w.bit_length() - before > 8 * mlen + 40:
            w.restore_state(state)
            bs.store_uncompressed_meta_block(
                w, data[seg_start:boundary].tobytes())
            if is_last:
                bs.write_empty_last_meta_block(w)
            # uncompressed block: decoder's distance cache is unchanged
        else:
            cache = new_cache
        seg_start = boundary

    if zex is not None:
        zex.shutdown(wait=True)
    if params.appendable or params.byte_align:
        _write_trailer(w, params)
    return w.getvalue()


def _write_trailer(w: BitWriter, params: EncoderParams):
    """Stream trailer when ISLAST was suppressed on content blocks
    (reference WriteEmptyLastBlocksInternal, encode.rs:1928): padding
    metablock for byte alignment, then the '11' empty-last metablock
    unless the stream is bare."""
    if params.byte_align:
        bs.write_padding_meta_block(w)
    if not params.bare:
        bs.write_empty_last_meta_block(w)


def _finish_stream(w: BitWriter, params: EncoderParams):
    if params.appendable or params.byte_align:
        _write_trailer(w, params)
    else:
        bs.write_empty_last_meta_block(w)
