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

HASH_MUL32 = 0x1E35A7BD
LITERAL_BYTE_SCORE = 540   # param-tunable (BROTLI_PARAM_LITERAL_BYTE_SCORE)
DISTANCE_BIT_PENALTY = 30
MIN_SCORE_DELTA = 100      # accept iff score - base > this
COST_DIFF_LAZY = 175
MATCH_CAP = 320            # vectorized length cap; longer matches are
#                            extended exactly during the greedy walk


def _u32_values(data: np.ndarray) -> np.ndarray:
    """v[i] = little-endian u32 at byte i (tail positions zero-padded)."""
    n = len(data)
    d = np.concatenate([data, np.zeros(4, np.uint8)]).astype(np.uint32)
    return d[:n] | (d[1:n + 1] << 8) | (d[2:n + 2] << 16) | (d[3:n + 3] << 24)


def hash_positions(data: np.ndarray, bucket_bits: int) -> np.ndarray:
    v = _u32_values(data)
    return ((v * np.uint32(HASH_MUL32)) >> np.uint32(32 - bucket_bits))


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
                      min_length: int = 4,
                      literal_byte_score: int = LITERAL_BYTE_SCORE,
                      dict_len: int = 0):
    """Best (length, distance, score) per position, vectorized.

    data includes a dict_len-byte custom-dictionary prefix; positions in
    the prefix produce no matches but serve as candidates.  Distances are
    measured in the concatenated space (valid across the seam).
    Returns (best_len, best_dist, best_score) for the data region only
    (index 0 == absolute position dict_len).
    """
    n = len(data)
    if n < 4:
        z = np.zeros(max(0, n - dict_len), dtype=np.int64)
        return z, z.copy(), z.copy()
    h = hash_positions(data, bucket_bits)
    cands = topk_candidates(h, k)
    v = _u32_values(data)

    best_len = np.zeros(n, dtype=np.int64)
    best_dist = np.zeros(n, dtype=np.int64)
    best_score = np.zeros(n, dtype=np.int64)
    limit = n - np.arange(n)

    lbs = literal_byte_score // 4
    for j in range(k):
        c = cands[j]
        pos = np.arange(n, dtype=np.int64)
        dist = pos - c
        valid = (c >= 0) & (dist <= window_size) & (v[np.maximum(c, 0)] == v)
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

    if dict_len:
        return (best_len[dict_len:], best_dist[dict_len:],
                best_score[dict_len:])
    return best_len, best_dist, best_score


def greedy_parse(data: np.ndarray, best_len, best_dist, best_score,
                 boundaries, dict_len: int = 0, pos0: int = 0):
    """Greedy scan with lazy matching (reference CreateBackwardReferences,
    src/enc/backward_references/mod.rs:2376-2552).

    data: dict_prefix + input; best_* are indexed relative to the input
    (position 0 == absolute dict_len).  boundaries: sorted absolute input
    positions where commands must end (metablock limits + input end).
    Returns list per segment of (insert_len[], copy_len[], distance[]).
    """
    n = len(data) - dict_len
    bl, bd, bs = best_len, best_dist, best_score
    mpos = np.nonzero(bs > MIN_SCORE_DELTA)[0]
    nm = len(mpos)
    mp = 0
    pos = pos0
    insert_start = pos0
    segments = []

    for boundary in boundaries:
        ins, cps, dst = [], [], []
        while True:
            while mp < nm and mpos[mp] < pos:
                mp += 1
            if mp >= nm or mpos[mp] >= boundary:
                break
            p = int(mpos[mp])
            s = int(bs[p])
            # lazy matching: defer up to 4 times while the next position
            # scores substantially better
            defers = 0
            while (defers < 4 and mp + 1 < nm and mpos[mp + 1] == p + 1
                   and p + 1 < boundary and bs[p + 1] > s + COST_DIFF_LAZY):
                mp += 1
                p += 1
                s = int(bs[p])
                defers += 1
            l = int(bl[p])
            d = int(bd[p])
            if l >= MATCH_CAP:
                l = extend_match(data, dict_len + p - d, dict_len + p, l,
                                 n - p)
            if p + l > boundary:
                l = boundary - p
                if l < 2:
                    mp += 1
                    continue
            ins.append(p - insert_start)
            cps.append(l)
            dst.append(d)
            pos = p + l
            insert_start = pos

        if boundary > insert_start or not ins:
            ins.append(boundary - insert_start)
            cps.append(0)
            dst.append(0)
        insert_start = boundary
        pos = max(pos, boundary)
        segments.append((ins, cps, dst))
    return segments
