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


def best_matches_block(data: jnp.ndarray, window_size: int, k: int = 8,
                       bucket_bits: int = 17, k8: int = 4,
                       bucket_bits8: int = 18,
                       literal_byte_score: int = 540):
    """Per-position best (len, dist, score) for one shard, jit-friendly.

    Semantics mirror match.find_best_matches (host oracle) up to the
    LEN_CAP length cap.
    """
    n = data.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    v4 = u32_values(data)
    v4b = u32_values_at(data, 4)
    limit = (n - pos).astype(jnp.int32)
    lbs = literal_byte_score // 4

    best_len = jnp.zeros(n, jnp.int32)
    best_dist = jnp.zeros(n, jnp.int32)
    best_score = jnp.zeros(n, jnp.int32)

    def fold(cands, best):
        best_len, best_dist, best_score = best
        for j in range(cands.shape[0]):
            c = cands[j].astype(jnp.int32)
            dist = pos - c
            cc = jnp.maximum(c, 0)
            valid = (c >= 0) & (dist <= window_size) & (v4[cc] == v4)
            ml = match_lengths_capped(v4, cc, pos, limit)
            ml = jnp.where(valid & (ml >= 4), ml, 0)
            logd = 31 - jax.lax.clz(
                jnp.maximum(dist, 1).astype(jnp.int32))
            sc = lbs * ml - DISTANCE_BIT_PENALTY * logd
            sc = jnp.where(ml > 0, sc, 0)
            upd = sc > best_score
            best_len = jnp.where(upd, ml, best_len)
            best_dist = jnp.where(upd, dist, best_dist)
            best_score = jnp.where(upd, sc, best_score)
        return best_len, best_dist, best_score

    h4 = v4 * HASH_MUL32 >> np.uint32(32 - bucket_bits)
    best = fold(topk_prev_same_hash(h4, k),
                (best_len, best_dist, best_score))
    if k8 > 0:
        # 8-byte hash from two u32 loads (long-match table)
        h8 = ((v4 * HASH_MUL32) ^ (v4b * HASH_MUL32B)) \
            >> np.uint32(32 - bucket_bits8)
        best = fold(topk_prev_same_hash(h8, k8), best)
    return best
