"""TPU (JAX/XLA) match-finding kernels.

The jit-compiled core of the encoder: hash every position, find each
position's top-K most-recent same-hash predecessors with one stable sort
(the fixed-width reformulation of the reference's hash chains,
src/enc/backward_references/mod.rs AdvHasher), compute capped match
lengths with u64 XOR + count-trailing-zeros, and score candidates with
the reference formula.  Everything is static-shape and branch-free, so
XLA tiles it onto the VPU; the sort dominates and runs on-chip.

Lengths are capped at LEN_CAP (4 u64 compare rounds); the host emission
path extends cap-hit matches exactly (match.extend_match).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

HASH_MUL32 = np.uint32(0x1E35A7BD)
HASH_MUL32B = np.uint32(0x9E3779B1)
LEN_CAP = 32                 # 8 rounds x 4 bytes
DISTANCE_BIT_PENALTY = 30
MIN_SCORE_DELTA = 100


def u32_values(data: jnp.ndarray) -> jnp.ndarray:
    """LE u32 at every byte position (tail zero-padded)."""
    n = data.shape[0]
    d = jnp.concatenate([data, jnp.zeros(4, jnp.uint8)]).astype(jnp.uint32)
    return (d[:n] | (d[1:n + 1] << 8) | (d[2:n + 2] << 16)
            | (d[3:n + 3] << 24))


def u32_values_at(data: jnp.ndarray, offset: int) -> jnp.ndarray:
    """LE u32 at byte position i + offset (tail zero-padded)."""
    n = data.shape[0]
    pad = jnp.zeros(offset + 4, jnp.uint8)
    d = jnp.concatenate([data, pad]).astype(jnp.uint32)
    o = offset
    return (d[o:n + o] | (d[o + 1:n + o + 1] << 8)
            | (d[o + 2:n + o + 2] << 16) | (d[o + 3:n + o + 3] << 24))


def topk_prev_same_hash(h: jnp.ndarray, k: int) -> jnp.ndarray:
    """cands[j, i] = (j+1)-th most recent previous position with the same
    hash as position i, or -1.  One stable sort + k shifted compares."""
    n = h.shape[0]
    order = jnp.argsort(h, stable=True)
    h_sorted = h[order]
    inv = jnp.zeros(n, dtype=jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    cands = []
    for j in range(1, k + 1):
        same = jnp.concatenate([
            jnp.zeros(j, dtype=bool), h_sorted[j:] == h_sorted[:-j]])
        prev = jnp.concatenate([
            jnp.full(j, -1, dtype=order.dtype), order[:-j]])
        cand_sorted = jnp.where(same, prev, -1)
        cands.append(cand_sorted[inv])
    return jnp.stack(cands)


def match_lengths_capped(v4: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                         limit: jnp.ndarray) -> jnp.ndarray:
    """min(matchlen(a, b), limit, LEN_CAP) via u32 XOR + ctz rounds.

    v4[i] = LE u32 at byte i (u32_values); rounds advance 4 bytes.
    """
    n4 = v4.shape[0]

    def word_match(off):
        ia = jnp.clip(a + off, 0, n4 - 1)
        ib = jnp.clip(b + off, 0, n4 - 1)
        x = v4[ia] ^ v4[ib]
        # count trailing zero BYTES: ctz(x) // 8; x == 0 -> 4
        nz = x != 0
        low = (x & (~x + np.uint32(1)))
        ctz = jax.lax.population_count(low - np.uint32(1))
        return jnp.where(nz, (ctz >> np.uint32(3)).astype(jnp.int32), 4)

    total = jnp.zeros(a.shape, jnp.int32)
    alive = jnp.ones(a.shape, bool)
    for r in range(LEN_CAP // 4):
        m = word_match(r * 4)
        total = total + jnp.where(alive, m, 0)
        alive = alive & (m == 4)
    return jnp.minimum(total, limit.astype(jnp.int32))


def _fold_sorted(h: jnp.ndarray, k: int, vs: list, pos: jnp.ndarray,
                 window_size: int, lbs: int, best, min_pos=0):
    """Candidate fold entirely in hash-sorted space.

    After the stable sort by hash, a position's k most-recent same-hash
    predecessors are its k left neighbors in sort order — so candidate
    compares become SHIFTED SLICE compares (pure vector ops).  The u32
    chunk values are gathered into sorted order ONCE per 4-byte round
    (len(vs) gathers total), instead of once per (candidate, round):
    the gather traffic drops by a factor of k.
    """
    n = h.shape[0]
    order = jnp.argsort(h, stable=True).astype(jnp.int32)
    h_s = h[order]
    vs_s = [v[order] for v in vs]
    limit_s = (n - order).astype(jnp.int32)

    s_len = jnp.zeros(n, jnp.int32)
    s_dist = jnp.zeros(n, jnp.int32)
    s_score = jnp.zeros(n, jnp.int32)
    for j in range(1, k + 1):
        zpad = jnp.zeros(j, dtype=h_s.dtype)
        same = jnp.concatenate([jnp.zeros(j, bool), h_s[j:] == h_s[:-j]])
        cand = jnp.concatenate(
            [jnp.zeros(j, jnp.int32), order[:-j]])
        dist = order - cand
        # match length via u32 XOR rounds on shifted slices
        total = jnp.zeros(n, jnp.int32)
        alive = same
        for v_s in vs_s:
            shifted = jnp.concatenate(
                [jnp.zeros(j, v_s.dtype), v_s[:-j]])
            x = v_s ^ shifted
            nz = x != 0
            low = x & (~x + np.uint32(1))
            ctz = jax.lax.population_count(low - np.uint32(1))
            m = jnp.where(nz, (ctz >> np.uint32(3)).astype(jnp.int32), 4)
            total = total + jnp.where(alive, m, 0)
            alive = alive & (m == 4)
        ml = jnp.minimum(total, limit_s)
        # min_pos masks candidates in a zero-filled context halo
        # (sharded pipeline): those positions are not real stream bytes
        valid = same & (dist <= window_size) & (ml >= 4) \
            & (cand >= min_pos)
        ml = jnp.where(valid, ml, 0)
        logd = 31 - jax.lax.clz(jnp.maximum(dist, 1))
        sc = jnp.where(ml > 0, lbs * ml - DISTANCE_BIT_PENALTY * logd, 0)
        upd = sc > s_score
        s_len = jnp.where(upd, ml, s_len)
        s_dist = jnp.where(upd, dist, s_dist)
        s_score = jnp.where(upd, sc, s_score)

    # scatter back to position space, keeping the running best
    best_len, best_dist, best_score = best
    p_len = jnp.zeros(n, jnp.int32).at[order].set(s_len)
    p_dist = jnp.zeros(n, jnp.int32).at[order].set(s_dist)
    p_score = jnp.zeros(n, jnp.int32).at[order].set(s_score)
    upd = p_score > best_score
    return (jnp.where(upd, p_len, best_len),
            jnp.where(upd, p_dist, best_dist),
            jnp.where(upd, p_score, best_score))


def _fold_sorted_packed(h, k, vs, window_size, lbs, best, min_pos=0):
    """Like _fold_sorted but carries (score<<6 | len) and dist as TWO
    int32 arrays: two scatters back to position space per fold instead
    of three (gathers and scatters are the kernel's real cost; int64
    is unavailable — jax x64 stays off on this platform)."""
    n = h.shape[0]
    order = jnp.argsort(h, stable=True).astype(jnp.int32)
    h_s = h[order]
    vs_s = [v[order] for v in vs]
    limit_s = (n - order).astype(jnp.int32)

    s_sl = jnp.zeros(n, jnp.int32)   # score<<6 | len
    s_dist = jnp.zeros(n, jnp.int32)
    for j in range(1, k + 1):
        same = jnp.concatenate([jnp.zeros(j, bool), h_s[j:] == h_s[:-j]])
        cand = jnp.concatenate([jnp.zeros(j, jnp.int32), order[:-j]])
        dist = order - cand
        total = jnp.zeros(n, jnp.int32)
        alive = same
        for v_s in vs_s:
            shifted = jnp.concatenate([jnp.zeros(j, v_s.dtype),
                                       v_s[:-j]])
            x = v_s ^ shifted
            nz = x != 0
            low = x & (~x + np.uint32(1))
            ctz = jax.lax.population_count(low - np.uint32(1))
            m = jnp.where(nz, (ctz >> np.uint32(3)).astype(jnp.int32), 4)
            total = total + jnp.where(alive, m, 0)
            alive = alive & (m == 4)
        ml = jnp.minimum(total, limit_s)
        valid = same & (dist <= window_size) & (ml >= 4) \
            & (cand >= min_pos)
        ml = jnp.where(valid, ml, 0)
        logd = 31 - jax.lax.clz(jnp.maximum(dist, 1))
        sc = jnp.where(ml > 0, lbs * ml - DISTANCE_BIT_PENALTY * logd, 0)
        sl = jnp.where(valid, (sc << 6) | ml, 0)
        upd = sl > s_sl
        s_sl = jnp.where(upd, sl, s_sl)
        s_dist = jnp.where(upd, dist, s_dist)

    best_sl, best_dist = best
    p_sl = jnp.zeros(n, jnp.int32).at[order].set(s_sl)
    p_dist = jnp.zeros(n, jnp.int32).at[order].set(s_dist)
    upd = p_sl > best_sl
    return (jnp.where(upd, p_sl, best_sl),
            jnp.where(upd, p_dist, best_dist))


def best_matches_packed(data: jnp.ndarray, window_size: int, k: int = 16,
                        k8: int = 8, rounds: int = 4,
                        literal_byte_score: int = 540, min_pos=0):
    """Device matcher with semi-packed output: int32 (score<<6 | len)
    plus int32 dist per position; lengths capped at 4*rounds (the host
    extends cap hits exactly).  Half the compare rounds and one fewer
    scatter per fold vs best_matches_block."""
    n = data.shape[0]
    v4 = u32_values(data)
    vs = [v4] + [u32_values_at(data, 4 * r) for r in range(1, rounds)]
    lbs = literal_byte_score // 4
    best = (jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32))
    h4 = v4 * HASH_MUL32 >> np.uint32(32 - 17)
    best = _fold_sorted_packed(h4, k, vs, window_size, lbs, best,
                               min_pos)
    if k8 > 0:
        h8 = ((v4 * HASH_MUL32) ^ (vs[1] * HASH_MUL32B)) \
            >> np.uint32(32 - 18)
        best = _fold_sorted_packed(h8, k8, vs, window_size, lbs, best,
                                   min_pos)
    return best


def _fold_fused(h: jnp.ndarray, k: int, vs: list, window_size: int,
                lbs: int, best_packed: jnp.ndarray, min_pos=0,
                len_shift: int = 26, base_len: int = 0,
                require_full: bool = False) -> jnp.ndarray:
    """One hash-table fold, fully fused: sort (hash, pos, chunk values)
    together with ONE multi-operand lax.sort (no gathers at all), then
    compare each position against its k left neighbors in sort order
    with static slices of once-padded arrays (a pure stencil XLA fuses
    into a single pass — the round-2 version's jnp.concatenate per
    (candidate, round) forced materialized copies), and scatter ONE
    packed int32 (len << len_shift | dist) back to position space.

    Reference functional bar: AdvHasher FindLongestMatch
    (src/enc/backward_references/mod.rs:932-1311) — fixed top-k recency
    candidates per bucket, reference scoring shape.
    """
    n = h.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    ops = jax.lax.sort((h, pos) + tuple(vs), num_keys=1, is_stable=True)
    h_s, pos_s = ops[0], ops[1]
    vs_s = ops[2:]

    # pad so neighbor j is a static slice; pad pos with a large
    # NEGATIVE so dist > window masks the fake candidates
    hp = jnp.pad(h_s, (k, 0))
    pp = jnp.pad(pos_s, (k, 0), constant_values=np.int32(-(1 << 30)))
    vps = [jnp.pad(v, (k, 0)) for v in vs_s]
    limit_s = n - pos_s

    s_score = jnp.zeros(n, jnp.int32)
    s_packed = jnp.zeros(n, jnp.int32)
    full_len = base_len + 4 * len(vs)
    for j in range(1, k + 1):
        same = hp[k - j:k - j + n] == h_s
        cand = pp[k - j:k - j + n]
        dist = pos_s - cand
        # base_len: length already attested by key equality (the
        # exact-content folds sort by the chunk value itself)
        total = jnp.where(same, np.int32(base_len), 0) \
            if base_len else jnp.zeros(n, jnp.int32)
        alive = same
        for v_s, v_p in zip(vs_s, vps):
            x = v_s ^ v_p[k - j:k - j + n]
            nz = x != 0
            low = x & (~x + np.uint32(1))
            ctz = jax.lax.population_count(low - np.uint32(1))
            m = jnp.where(nz, (ctz >> np.uint32(3)).astype(jnp.int32), 4)
            total = total + jnp.where(alive, m, 0)
            alive = alive & (m == 4)
        ml = jnp.minimum(total, limit_s)
        valid = same & (dist <= window_size) & (ml >= 4) \
            & (cand >= min_pos)
        if require_full:
            # hashed-key fold over partially-verified bytes: only a
            # full payload-chain match is meaningful
            valid = valid & (total == full_len)
        ml = jnp.where(valid, ml, 0)
        logd = 31 - jax.lax.clz(jnp.maximum(dist, 1))
        sc = jnp.where(ml > 0, lbs * ml - DISTANCE_BIT_PENALTY * logd,
                       0)
        upd = sc > s_score
        s_score = jnp.where(upd, sc, s_score)
        s_packed = jnp.where(upd, (ml << len_shift) | dist, s_packed)

    gate = s_score > MIN_SCORE_DELTA
    s_packed = jnp.where(gate, s_packed, 0)
    s_score = jnp.where(gate, s_score, 0)
    # one scatter back to position space; merge with the running best
    # by scattering (score, packed) and comparing — score rides in a
    # second scatter only when a previous fold exists
    if best_packed is None:
        return (jnp.zeros(n, jnp.int32).at[pos_s].set(s_packed),
                jnp.zeros(n, jnp.int32).at[pos_s].set(s_score))
    prev_packed, prev_score = best_packed
    p_packed = jnp.zeros(n, jnp.int32).at[pos_s].set(s_packed)
    p_score = jnp.zeros(n, jnp.int32).at[pos_s].set(s_score)
    upd = p_score > prev_score
    return (jnp.where(upd, p_packed, prev_packed),
            jnp.where(upd, p_score, prev_score))


def best_matches_fused(data: jnp.ndarray, window_size: int, k: int = 16,
                       k8: int = 8, rounds: int = 4,
                       literal_byte_score: int = 540, min_pos=0,
                       len_shift: int = 26) -> jnp.ndarray:
    """Device matcher, one fused XLA program: per-position packed int32
    (len << len_shift | dist), 0 where no candidate beats the score
    gate.  Lengths cap at 4*rounds; the host extends cap hits exactly.

    Two folds: the 17-bit 4-byte table (k candidates) and the 18-bit
    8-byte long-match table (k8); set k8=0 to skip the second sort.
    """
    if 4 * rounds >= (1 << (31 - len_shift)):
        raise ValueError("length cap overflows the int32 packing")
    n = data.shape[0]
    v4 = u32_values(data)
    vs = [v4] + [u32_values_at(data, 4 * r) for r in range(1, rounds)]
    lbs = literal_byte_score // 4
    h4 = (v4 * HASH_MUL32 >> np.uint32(32 - 17)).astype(jnp.int32)
    best = _fold_fused(h4, k, vs, window_size, lbs, None, min_pos,
                       len_shift)
    if k8 > 0:
        h8 = (((v4 * HASH_MUL32) ^ (vs[1] * HASH_MUL32B))
              >> np.uint32(32 - 18)).astype(jnp.int32)
        best = _fold_fused(h8, k8, vs, window_size, lbs, best, min_pos,
                           len_shift)
    return best[0]


def best_matches_exact(data: jnp.ndarray, window_size: int,
                       k: int = 16, k8: int = 0, rounds: int = 2,
                       literal_byte_score: int = 540, min_pos=0,
                       len_shift: int = 26) -> jnp.ndarray:
    """Content-sorted device matcher: sort by the 4-byte chunk VALUE
    itself (not a hash) — candidate groups are exact-prefix groups, so
    there are no bucket collisions and the sort carries one operand
    less than the hashed fold.  Candidates are the k most recent
    same-prefix positions (stable sort keeps position order inside a
    value group).  Lengths cap at 4*rounds; bytes 0-4 of every
    reported match are certain (key equality), so the host extends
    capped matches from base 4.

    The optional k8 fold groups by a full-width 32-bit hash of the
    first 8 bytes and carries the exact chunk values as payload, so
    its lengths are fully attested too — the hash is only a grouping
    key, never trusted for bytes.

    Every reported length is exact up to the cap; the host extends
    cap hits from the reported length, as with the host tables.

    Output: per-position packed int32 (len << len_shift | dist), 0
    where nothing beats the score gate.
    """
    if 4 * rounds >= (1 << (31 - len_shift)):
        raise ValueError("length cap overflows the int32 packing")
    n = data.shape[0]
    v4 = u32_values(data)
    vs = [v4] + [u32_values_at(data, 4 * r) for r in range(1, rounds)]
    lbs = literal_byte_score // 4
    # fold A: key is the content itself; equal key ⇒ first 4 bytes
    # match, the tail values refine the length up to the cap
    best = _fold_fused(v4.astype(jnp.int32), k, vs[1:], window_size,
                       lbs, None, min_pos, len_shift,
                       base_len=4)
    if k8 > 0:
        h8 = (((v4 * HASH_MUL32) ^ (vs[1] * HASH_MUL32B))
              .astype(jnp.int32))
        best = _fold_fused(h8, k8, vs, window_size, lbs, best,
                           min_pos, len_shift)
    return best[0]


def best_matches_exact8(data: jnp.ndarray, window_size: int,
                        k: int = 16, rounds: int = 4,
                        literal_byte_score: int = 540, min_pos=0,
                        len_shift: int = 26,
                        _with_score: bool = False):
    """Single-sort variant of best_matches_exact: ONE stable sort by
    the TWO leading chunk values (num_keys=2) replaces both tables.
    Within an exact 8-byte-prefix group, neighbors are position-
    ordered, so the k left neighbors are the k most recent 8-byte
    matches (the long-match table, exact instead of hashed); at group
    edges, same-v0/different-v1 neighbors contribute 4-7 byte matches
    ordered by (v1, pos) rather than recency, so both scan directions
    are checked and candidates require dist > 0 explicitly.

    One sort instead of two — ~1.7x the two-fold q9 tier's on-chip
    speed — at a small ratio cost on short (4-7 byte) matches, whose
    candidate set loses recency preference.
    """
    if 4 * rounds >= (1 << (31 - len_shift)):
        raise ValueError("length cap overflows the int32 packing")
    n = data.shape[0]
    v = [u32_values_at(data, 4 * r) for r in range(max(rounds, 2))]
    lbs = literal_byte_score // 4
    pos = jnp.arange(n, dtype=jnp.int32)
    ops = jax.lax.sort((v[0], v[1], pos) + tuple(v[2:rounds]),
                       num_keys=2, is_stable=True)
    v0s, v1s, pos_s = ops[0], ops[1], ops[2]
    vs_s = ops[3:]

    kpad = k
    p0 = jnp.pad(v0s, (kpad, kpad))
    p1 = jnp.pad(v1s, (kpad, kpad))
    pp = jnp.pad(pos_s, (kpad, kpad),
                 constant_values=np.int32(-(1 << 30)))
    vps = [jnp.pad(vv, (kpad, kpad)) for vv in vs_s]
    limit_s = n - pos_s

    s_score = jnp.zeros(n, jnp.int32)
    s_packed = jnp.zeros(n, jnp.int32)
    offs = [j for j in range(1, k + 1)] + \
        [-j for j in range(1, k // 2 + 1)]
    for j in offs:
        sl = kpad - j
        same4 = p0[sl:sl + n] == v0s
        same8 = same4 & (p1[sl:sl + n] == v1s)
        cand = pp[sl:sl + n]
        dist = pos_s - cand
        # length: 4 if only v0 matches (+ctz of the v1 diff), 8 +
        # tail-chunk ctz chain when v1 matches too
        x1 = v1s ^ p1[sl:sl + n]
        nz1 = x1 != 0
        low1 = x1 & (~x1 + np.uint32(1))
        ctz1 = jax.lax.population_count(low1 - np.uint32(1))
        m1 = jnp.where(nz1, (ctz1 >> np.uint32(3)).astype(jnp.int32),
                       4)
        total = jnp.where(same4, 4 + m1, 0)
        alive = same8
        for vv_s, vv_p in zip(vs_s, vps):
            x = vv_s ^ vv_p[sl:sl + n]
            nz = x != 0
            low = x & (~x + np.uint32(1))
            ctz = jax.lax.population_count(low - np.uint32(1))
            m = jnp.where(nz, (ctz >> np.uint32(3)).astype(jnp.int32),
                          4)
            total = total + jnp.where(alive, m, 0)
            alive = alive & (m == 4)
        ml = jnp.minimum(total, limit_s)
        valid = same4 & (dist > 0) & (dist <= window_size) \
            & (ml >= 4) & (cand >= min_pos)
        ml = jnp.where(valid, ml, 0)
        logd = 31 - jax.lax.clz(jnp.maximum(dist, 1))
        sc = jnp.where(ml > 0, lbs * ml - DISTANCE_BIT_PENALTY * logd,
                       0)
        upd = sc > s_score
        s_score = jnp.where(upd, sc, s_score)
        s_packed = jnp.where(upd, (ml << len_shift) | dist, s_packed)

    gate = s_score > MIN_SCORE_DELTA
    s_packed = jnp.where(gate, s_packed, 0)
    s_score = jnp.where(gate, s_score, 0)
    p_packed = jnp.zeros(n, jnp.int32).at[pos_s].set(s_packed)
    if not _with_score:
        return p_packed
    return p_packed, jnp.zeros(n, jnp.int32).at[pos_s].set(s_score)


def best_matches_exact9(data: jnp.ndarray, window_size: int,
                        k: int = 16, k_short: int = 16,
                        rounds: int = 4,
                        literal_byte_score: int = 540, min_pos=0,
                        len_shift: int = 26) -> jnp.ndarray:
    """Hybrid q9-tier matcher: the exact8 two-key sort (exact 8-byte
    recency — the long-match table, better than the hashed fold) merged
    with a 3-operand short-match fold (key = v0 itself, one tail
    value: exact 4-byte recency capped at 8, host-extended).  Same
    on-chip cost as the two-fold form (sorts carry a large fixed cost
    that payload width barely moves) at -0.16% size on the 3-corpus
    q9 mix (1.0006 vs 1.0022 of the host path)."""
    best = best_matches_exact8(data, window_size, k=k, rounds=rounds,
                               literal_byte_score=literal_byte_score,
                               min_pos=min_pos, len_shift=len_shift,
                               _with_score=True)
    v0 = u32_values(data)
    v1 = u32_values_at(data, 4)
    lbs = literal_byte_score // 4
    best = _fold_fused(v0.astype(jnp.int32), k_short, [v1],
                       window_size, lbs, best, min_pos, len_shift,
                       base_len=4)
    return best[0]


def best_matches_block(data: jnp.ndarray, window_size: int, k: int = 8,
                       bucket_bits: int = 17, k8: int = 4,
                       bucket_bits8: int = 18,
                       literal_byte_score: int = 540, min_pos=0,
                       rounds: int = LEN_CAP // 4):
    """Per-position best (len, dist, score) for one shard, jit-friendly.

    Semantics mirror match.find_best_matches (host oracle) up to the
    LEN_CAP length cap.  min_pos (scalar, may be traced) excludes
    candidates below it — used by the sharded pipeline to mask a
    zero-filled portion of the cross-shard context halo.
    """
    n = data.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    v4 = u32_values(data)
    vs = [v4] + [u32_values_at(data, 4 * r) for r in range(1, rounds)]
    lbs = literal_byte_score // 4

    best = (jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
            jnp.zeros(n, jnp.int32))
    h4 = v4 * HASH_MUL32 >> np.uint32(32 - bucket_bits)
    best = _fold_sorted(h4, k, vs, pos, window_size, lbs, best,
                        min_pos)
    if k8 > 0:
        # 8-byte hash from two u32 loads (long-match table)
        h8 = ((v4 * HASH_MUL32) ^ (vs[1] * HASH_MUL32B)) \
            >> np.uint32(32 - bucket_bits8)
        best = _fold_sorted(h8, k8, vs, pos, window_size, lbs, best,
                            min_pos)
    return best
