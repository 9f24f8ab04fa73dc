"""LZ77 match finding: batched candidate search + greedy lazy parse.

TPU-first reformulation of the reference's hash-chain hashers
(reference src/enc/backward_references/mod.rs): instead of mutable
hash-chain walks, ALL positions are hashed in one vectorized pass and
each position's top-K most-recent same-hash predecessors are found with
a stable sort — a fixed-width, data-parallel shape (the same layout as
the AdvHasher's bucket×block table, mod.rs:932) that maps directly onto
the Pallas kernel in brotli_tpu/ops/.  Match lengths are computed by
vectorized 8-byte chunk comparison over a shrinking active set.

Scoring matches the reference: score = 135*len - 30*floor(log2(dist)),
accepted when > 100 (BackwardReferenceScore, mod.rs:1878-1889, with
kMinScore = base + 100); lazy matching defers when the next position
scores > cur + 175 (cost_diff_lazy, mod.rs:2438).
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C

HASH_MUL32 = 0x1E35A7BD
LITERAL_BYTE_SCORE = 540   # param-tunable (BROTLI_PARAM_LITERAL_BYTE_SCORE)
DISTANCE_BIT_PENALTY = 30
MIN_SCORE_DELTA = 100      # accept iff score - base > this
COST_DIFF_LAZY = 175
MATCH_CAP = 320            # vectorized length cap; longer matches are
#                            extended exactly during the greedy walk


HASH_MUL64 = 0x1FE35A7BD3579BD3


def _u32_values(data: np.ndarray) -> np.ndarray:
    """v[i] = little-endian u32 at byte i (tail positions zero-padded)."""
    n = len(data)
    d = np.concatenate([data, np.zeros(4, np.uint8)]).astype(np.uint32)
    return d[:n] | (d[1:n + 1] << 8) | (d[2:n + 2] << 16) | (d[3:n + 3] << 24)


def _u64_values(data: np.ndarray) -> np.ndarray:
    """v[i] = little-endian u64 at byte i (tail zero-padded)."""
    n = len(data)
    d = np.concatenate([data, np.zeros(8, np.uint8)]).astype(np.uint64)
    v = d[:n].copy()
    for j in range(1, 8):
        v |= d[j:n + j] << np.uint64(8 * j)
    return v


def hash_positions(data: np.ndarray, bucket_bits: int) -> np.ndarray:
    v = _u32_values(data)
    return ((v * np.uint32(HASH_MUL32)) >> np.uint32(32 - bucket_bits))


def hash_positions5(data: np.ndarray, bucket_bits: int) -> np.ndarray:
    """5-byte hash (reference AdvHasher hash_len=5, mod.rs:932): more
    selective buckets than the 4-byte hash on text; misses length-4
    table candidates (the distance cache still finds those)."""
    with np.errstate(over="ignore"):
        v = (_u64_values(data) << np.uint64(24)) * np.uint64(HASH_MUL64)
    return (v >> np.uint64(64 - bucket_bits)).astype(np.int64)


def hash_positions_u64(data: np.ndarray, bucket_bits: int) -> np.ndarray:
    """8-byte hash (reference H6's 64-bit hash, mod.rs H6Sub:1097):
    catches long matches that 4-byte buckets bury under short ones."""
    with np.errstate(over="ignore"):
        v = _u64_values(data) * np.uint64(HASH_MUL64)
    return (v >> np.uint64(64 - bucket_bits)).astype(np.int64)


def topk_candidates(h: np.ndarray, k: int):
    """For each position i, up to k most recent previous positions with the
    same hash.  Returns (cands[k, n], valid[k, n])."""
    n = len(h)
    order = np.argsort(h, kind="stable").astype(np.int64)
    h_sorted = h[order]
    cands = np.full((k, n), -1, dtype=np.int64)
    for j in range(1, k + 1):
        same = np.zeros(n, dtype=bool)
        same[j:] = h_sorted[j:] == h_sorted[:-j]
        prev = np.full(n, -1, dtype=np.int64)
        prev[j:] = order[:-j]
        cand_sorted = np.where(same, prev, -1)
        cands[j - 1, order] = cand_sorted
    return cands


def match_lengths(data: np.ndarray, a: np.ndarray, b: np.ndarray,
                  limit: np.ndarray, cap: int = MATCH_CAP) -> np.ndarray:
    """Vectorized match length between positions a[i] and b[i] (a < b),
    each capped by limit[i] and `cap`.  8-byte chunk compare over a
    shrinking active set (the vector analog of FindMatchLengthWithLimit,
    reference src/enc/static_dict.rs:125)."""
    m = len(a)
    out = np.zeros(m, dtype=np.int64)
    if m == 0:
        return out
    lim = np.minimum(limit, cap)
    pad = np.zeros(8, np.uint8)
    d = np.concatenate([data, pad])
    active = np.arange(m)
    off = np.zeros(m, dtype=np.int64)
    r8 = np.arange(8)
    while len(active):
        aa = a[active] + off[active]
        bb = b[active] + off[active]
        eq = d[aa[:, None] + r8] == d[bb[:, None] + r8]
        neq = ~eq
        first = np.where(neq.any(axis=1), neq.argmax(axis=1), 8)
        off[active] += first
        done = first < 8
        out[active] = np.minimum(off[active], lim[active])
        cont = (~done) & (off[active] < lim[active])
        active = active[cont]
    return np.minimum(out, lim)


def extend_match(data: np.ndarray, cand: int, pos: int, cur_len: int,
                 limit: int) -> int:
    """Scalar exact extension past the vectorized cap (rare)."""
    n = limit
    l = cur_len
    step = 4096
    while l < n:
        t = min(step, n - l)
        x = data[cand + l:cand + l + t]
        y = data[pos + l:pos + l + t]
        neq = x != y
        if neq.any():
            return l + int(neq.argmax())
        l += t
    return l


def find_best_matches(data: np.ndarray, window_size: int,
                      k: int = 8, bucket_bits: int = 17,
                      k8: int = 4, bucket_bits8: int = 18,
                      hash_len: int = 4, min_length: int = 4,
                      literal_byte_score: int = LITERAL_BYTE_SCORE,
                      dict_len: int = 0, use_dictionary: bool = True,
                      n_cache: int = 4, miss_economy: bool = False):
    """Best (length, distance, score) per position, vectorized.

    Two candidate tables, like the reference's tiered hashers: 4-byte
    hashes find short recent matches; 8-byte hashes (k8 > 0) find long
    matches that crowded 4-byte buckets miss.  Optionally unioned with
    static-dictionary candidates (reference SearchInStaticDictionary,
    mod.rs:1942).

    data includes a dict_len-byte custom-dictionary prefix; positions in
    the prefix produce no matches but serve as candidates.  Distances are
    measured in the concatenated space (valid across the seam).
    Returns (best_len, best_dist, best_score) for the data region only
    (index 0 == absolute position dict_len).
    """
    n = len(data)
    if n < 4:
        z = np.zeros(max(0, n - dict_len), dtype=np.int64)
        return (z, z.copy(), z.copy(), np.zeros(len(z), dtype=bool),
                z.copy())

    from .. import native_bridge as nb
    if nb.available():
        return nb.find_best_matches(
            data, window_size, k=k, bucket_bits=bucket_bits, k8=k8,
            bucket_bits8=bucket_bits8, hash_len=hash_len,
            min_length=min_length,
            literal_byte_score=literal_byte_score, dict_len=dict_len,
            use_dictionary=use_dictionary, match_cap=MATCH_CAP,
            miss_economy=miss_economy)

    best_len = np.zeros(n, dtype=np.int64)
    best_dist = np.zeros(n, dtype=np.int64)
    best_score = np.zeros(n, dtype=np.int64)
    best_isdict = np.zeros(n, dtype=bool)
    best_wire = np.zeros(n, dtype=np.int64)  # wire copy length (differs
    #                       from best_len only for dict cutoff matches)
    limit = n - np.arange(n)
    lbs = literal_byte_score // 4
    pos = np.arange(n, dtype=np.int64)

    def fold(cands, kk, vcheck):
        for j in range(kk):
            c = cands[j]
            dist = pos - c
            valid = (c >= 0) & (dist <= window_size) & \
                (vcheck[np.maximum(c, 0)] == vcheck)
            idx = np.nonzero(valid)[0]
            if len(idx) == 0:
                continue
            ml = match_lengths(data, c[idx], idx, limit[idx])
            ok = ml >= min_length
            idx = idx[ok]
            ml = ml[ok]
            if len(idx) == 0:
                continue
            sc = (lbs * ml - DISTANCE_BIT_PENALTY *
                  np.floor(np.log2(dist[idx])).astype(np.int64))
            upd = sc > best_score[idx]
            u = idx[upd]
            best_len[u] = ml[upd]
            best_dist[u] = dist[idx][upd]
            best_score[u] = sc[upd]
            best_isdict[u] = False
            best_wire[u] = ml[upd]

    v = _u32_values(data)
    h = (hash_positions5(data, bucket_bits) if hash_len == 5
         else hash_positions(data, bucket_bits))
    fold(topk_candidates(h, k), k, v)
    if k8 > 0 and n >= 8:
        fold(topk_candidates(hash_positions_u64(data, bucket_bits8), k8),
             k8, v)

    if use_dictionary:
        from .static_dict import add_dictionary_matches
        add_dictionary_matches(data, dict_len, window_size, lbs,
                               best_len, best_dist, best_score,
                               best_isdict, best_wire)

    if dict_len:
        return (best_len[dict_len:], best_dist[dict_len:],
                best_score[dict_len:], best_isdict[dict_len:],
                best_wire[dict_len:])
    return best_len, best_dist, best_score, best_isdict, best_wire


LAST_DISTANCE_BONUS = 15   # flat bonus for cache-hit matches
CACHE_PROBE_SPAN = 16      # positions after a copy probed for continuation


def _cache_penalty(i: int) -> int:
    """Reference BackwardReferencePenaltyUsingLastDistance
    (src/enc/backward_references/mod.rs:1151)."""
    return 39 + ((0x1CA10 >> (i & 0x0E)) & 0x0E)


def _probe_len(data: np.ndarray, src: int, dst: int, limit: int) -> int:
    """Cheap scalar match-length probe (short-biased)."""
    if limit <= 0 or data[src] != data[dst]:
        return 0
    step = 16
    l = 0
    while l < limit:
        t = min(step, limit - l)
        x = data[src + l:src + l + t]
        y = data[dst + l:dst + l + t]
        neq = x != y
        if neq.any():
            return l + int(neq.argmax())
        l += t
        step = min(step * 4, 4096)
    return l


def greedy_parse(data: np.ndarray, best_len, best_dist, best_score,
                 boundaries, dict_len: int = 0, pos0: int = 0,
                 initial_cache=(4, 11, 15, 16), best_isdict=None,
                 window_size: int = 1 << 62, best_wire=None):
    """Greedy walk dispatcher: native (C++) when available, else the
    Python reference implementation below (the oracle for tests).
    Segments are (insert[], wire_copy[], distance[], advance[]) where
    advance != wire_copy only for dictionary cutoff transforms."""
    from .. import native_bridge as nb
    if nb.available():
        return nb.greedy_parse(
            data, best_len, best_dist, best_score, boundaries,
            dict_len=dict_len, pos0=pos0, initial_cache=initial_cache,
            best_isdict=best_isdict, window_size=window_size,
            best_wire=best_wire)
    return greedy_parse_py(data, best_len, best_dist, best_score,
                           boundaries, dict_len=dict_len, pos0=pos0,
                           initial_cache=initial_cache,
                           best_isdict=best_isdict,
                           window_size=window_size, best_wire=best_wire)


def greedy_parse_py(data: np.ndarray, best_len, best_dist, best_score,
                    boundaries, dict_len: int = 0, pos0: int = 0,
                    initial_cache=(4, 11, 15, 16), best_isdict=None,
                    window_size: int = 1 << 62, best_wire=None):
    """Greedy scan with lazy matching and distance-cache reuse
    (reference CreateBackwardReferences,
    src/enc/backward_references/mod.rs:2376-2552; cache candidates scored
    with the flat last-distance bonus and short-code penalties,
    mod.rs:1720-1740, 1871-1876).

    The cache here mirrors RFC semantics exactly (push-front on any
    dist code != 0), so every cache hit resolves to a short code in
    command.resolve_commands.

    data: dict_prefix + input; best_* are indexed relative to the input
    (position 0 == absolute dict_len).  boundaries: sorted absolute input
    positions where commands must end (metablock limits + input end).
    Returns list per segment of (insert_len[], copy_len[], distance[]).
    """
    n = len(data) - dict_len
    bl, bd, bs = best_len, best_dist, best_score
    isd = best_isdict if best_isdict is not None \
        else np.zeros(len(bs), dtype=bool)
    bw = best_wire if best_wire is not None else bl
    mpos = np.nonzero(bs > MIN_SCORE_DELTA)[0]
    nm = len(mpos)
    mp = 0
    pos = pos0
    insert_start = pos0
    segments = []
    lbs = LITERAL_BYTE_SCORE // 4
    cache = list(initial_cache)

    # short-code candidate count (reference H9
    # kNumLastDistancesToCheck; native greedy_parse carries it in the
    # cache_probe_span slot, matching CACHE_PROBE_SPAN here)
    n_cache = max(1, min(CACHE_PROBE_SPAN, 16))

    def cached_match(q, boundary):
        """Best (len, dist, score) over the short-code distance
        candidates cache[idx]+delta (RFC 7932 4)."""
        limit = min(boundary, n) - q
        best = (0, 0, 0)
        for i in range(n_cache):
            d = cache[int(C.DISTANCE_SHORT_CODE_INDEX[i])] +                 int(C.DISTANCE_SHORT_CODE_DELTA[i])
            # the +-3 short-code deltas can push past the window; an
            # out-of-window distance would decode as a dictionary
            # reference (same clamp as the native search)
            if d <= 0 or d > dict_len + q or d > window_size:
                continue
            lc = _probe_len(data, dict_len + q - d, dict_len + q, limit)
            if lc >= 4:
                sc = lbs * lc + LAST_DISTANCE_BONUS
                if i != 0:
                    sc -= _cache_penalty(i)
                if sc > best[2]:
                    best = (lc, d, sc)
        return best

    def hash_score(q):
        return int(bs[q])

    for boundary in boundaries:
        ins, cps, dst, adv = [], [], [], []

        def emit(p, l, d, wire=None):
            nonlocal pos, insert_start
            ins.append(p - insert_start)
            cps.append(l if wire is None else wire)
            dst.append(d)
            adv.append(l)
            pos = p + l
            insert_start = pos
            # mirror resolve_commands: dictionary references (beyond
            # max_distance) and dist-code-0 leave the cache untouched
            max_distance = min(dict_len + p, window_size)
            if d <= max_distance and d != cache[0]:
                cache.pop()
                cache.insert(0, d)

        # same loop shape as the in-line-search walk
        # (combined_parse_native): at every position the candidate is
        # max(precomputed table best, live distance-cache probe) — the
        # cache is probed everywhere, not just near copies
        def candidate(q):
            lc, dc, csc = cached_match(q, boundary)
            tsc = hash_score(q)
            if csc >= tsc and csc > 0:
                return csc, lc, dc, lc, False
            return (tsc, int(bl[q]), int(bd[q]), int(bw[q]),
                    bool(isd[q]))

        misses = 0
        while pos + 2 <= boundary:
            s, l, d, wire, dict_ref = candidate(pos)
            if s <= MIN_SCORE_DELTA:
                step = 1
                if misses > 512:
                    step = 4
                elif misses > 64:
                    step = 2
                misses += 1
                pos += step
                continue
            defers = 0
            while defers < 4 and pos + 1 + 4 <= boundary:
                s2, l2, d2, w2, dr2 = candidate(pos + 1)
                if s2 > s + COST_DIFF_LAZY:
                    pos += 1
                    s, l, d, wire, dict_ref = s2, l2, d2, w2, dr2
                    defers += 1
                else:
                    break
            misses = 0
            if not dict_ref and l >= MATCH_CAP:
                l = extend_match(data, dict_len + pos - d, dict_len + pos,
                                 l, n - pos)
                wire = l
            if pos + l > boundary:
                if dict_ref:  # dictionary words cannot be truncated
                    pos += 1
                    continue
                l = boundary - pos
                wire = l
                if l < 2:
                    pos += 1
                    continue
            emit(pos, l, d, wire if dict_ref else l)

        if boundary > insert_start or not ins:
            ins.append(boundary - insert_start)
            cps.append(0)
            dst.append(0)
            adv.append(0)
        insert_start = boundary
        pos = max(pos, boundary)
        segments.append((ins, cps, dst, adv))
    return segments
