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
HASH_MUL64 = np.uint64(0x1FE35A7BD3579BD3)
LEN_CAP = 32                 # 4 rounds x 8 bytes
DISTANCE_BIT_PENALTY = 30
MIN_SCORE_DELTA = 100


def u32_values(data: jnp.ndarray) -> jnp.ndarray:
    """LE u32 at every byte position (tail zero-padded)."""
    n = data.shape[0]
    d = jnp.concatenate([data, jnp.zeros(4, jnp.uint8)]).astype(jnp.uint32)
    return (d[:n] | (d[1:n + 1] << 8) | (d[2:n + 2] << 16)
            | (d[3:n + 3] << 24))


def u64_values(data: jnp.ndarray) -> jnp.ndarray:
    n = data.shape[0]
    d = jnp.concatenate([data, jnp.zeros(8, jnp.uint8)]).astype(jnp.uint64)
    v = d[:n]
    for j in range(1, 8):
        v = v | (d[j:n + j] << np.uint64(8 * j))
    return v


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


def match_lengths_capped(v8: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                         limit: jnp.ndarray) -> jnp.ndarray:
    """min(matchlen(a, b), limit, LEN_CAP) via u64 XOR + ctz rounds."""
    n8 = v8.shape[0]

    def word_match(off):
        ia = jnp.clip(a + off, 0, n8 - 1)
        ib = jnp.clip(b + off, 0, n8 - 1)
        x = v8[ia] ^ v8[ib]
        # count trailing zero BYTES: ctz(x) // 8; x == 0 -> 8
        nz = x != 0
        low = (x & (~x + np.uint64(1)))
        ctz = jax.lax.population_count(low - np.uint64(1))
        return jnp.where(nz, (ctz >> np.uint64(3)).astype(jnp.int32), 8)

    total = jnp.zeros(a.shape, jnp.int32)
    alive = jnp.ones(a.shape, bool)
    for r in range(LEN_CAP // 8):
        m = word_match(r * 8)
        total = total + jnp.where(alive, m, 0)
        alive = alive & (m == 8)
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
    v8 = u64_values(data)
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
            ml = match_lengths_capped(v8, cc, pos, limit)
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

    h4 = u32_values(data) * HASH_MUL32 >> np.uint32(32 - bucket_bits)
    best = fold(topk_prev_same_hash(h4, k),
                (best_len, best_dist, best_score))
    if k8 > 0:
        h8 = (v8 * HASH_MUL64 >> np.uint64(64 - bucket_bits8)) \
            .astype(jnp.uint32)
        best = fold(topk_prev_same_hash(h8, k8), best)
    return best
