"""Pallas TPU fold over content-sorted match candidates.

Round-4 on-chip profile (research/sort_profile.py, v5e): the matcher's
lax.sort is cheap (9 ms / 5M rows flat, 13.4 ms two-key) — the round-3
cost model was wrong.  What dominates the fused XLA matcher is (a) the
candidate FOLD, whose per-offset compare chains XLA materializes as
full HBM-width intermediates (~26 ms at k=32), and (b) the final
scatter back to position space (32 ms; a permutation-apply lax.sort
does the same job in 9 ms).

This module fixes (a): one Pallas kernel computes the entire
fold — all offsets, all compare rounds, scoring, and the running
best — on VMEM-resident tiles, writing one packed int32 per position.
HBM traffic drops from O(k·rounds) array passes to ~one read per
operand + one write.

Shifted-neighbor access inside a tile: operands arrive as (ROWS, 128)
blocks plus one-row halos fetched from the same HBM arrays via
separate (1, 128) BlockSpecs (index_map block row i·ROWS−1 / (i+1)·ROWS
— no padded copies, no extra HBM traffic).  A j-shifted view is two
lane-rolls + a select (pltpu.roll), built per offset.

Semantics are bit-identical to ops.matching._fold_fused /
best_matches_exact8 (tests assert equality in interpreter mode);
functional bar: reference AdvHasher FindLongestMatch
(/root/reference/src/enc/backward_references/mod.rs:932-1311).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .matching import (DISTANCE_BIT_PENALTY, MIN_SCORE_DELTA,
                       HASH_MUL32, HASH_MUL32B,  # noqa: F401 (re-export)
                       u32_values, u32_values_at)

ROWS = 128           # rows per grid step; tile = ROWS x 128 elements
TILE = ROWS * 128


def _resolve_interpret(interpret):
    """None -> interpreter mode everywhere but real TPU (the CPU/test
    backend has no Mosaic compiler)."""
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


def _shifted(x, xprev, xnext, j, lane):
    """value at flat index (i - j) of the tile, j static (may be <0);
    xprev/xnext are the tiles shifted one ROW down/up (row r holds
    original row r-1 / r+1)."""
    from jax.experimental.pallas import tpu as pltpu
    if j == 0:
        return x
    if j > 0:
        a = pltpu.roll(x, j, axis=1)
        b = pltpu.roll(xprev, j, axis=1)
        return jnp.where(lane >= j, a, b)
    # negative shift: roll is circular, so -j ≡ 128 - j on a 128 lane
    a = pltpu.roll(x, 128 + j, axis=1)
    b = pltpu.roll(xnext, 128 + j, axis=1)
    return jnp.where(lane < 128 + j, a, b)


def _row_shift_down(x, halo_prev):
    """rows moved down by one: out[r] = x[r-1], out[0] = halo row."""
    return jnp.concatenate([halo_prev, x[:-1, :]], axis=0)


def _row_shift_up(x, halo_next):
    return jnp.concatenate([x[1:, :], halo_next], axis=0)


def _ctz_bytes(x):
    """trailing zero BYTES of a u32 (4 when x == 0)."""
    nz = x != 0
    low = x & (~x + np.uint32(1))
    ctz = jax.lax.population_count(low - np.uint32(1))
    return jnp.where(nz, (ctz >> np.uint32(3)).astype(jnp.int32), 4)


def _make_kernel(n_keys: int, n_pay: int, k_fwd: int, k_back: int,
                 window: int, lbs: int, len_shift: int, n_real: int,
                 n_pad: int, fuse_short: bool = False):
    """Kernel over sorted operands: keys (1 or 2 u32 arrays), pos, and
    n_pay payload u32 arrays.  Key equality attests 4*n_keys bytes;
    payloads refine the length by 4 bytes per round."""

    import jax.experimental.pallas as pl

    def kernel(minpos_ref, *refs):
        # refs layout: for each operand o in [keys..., pos, payloads...]:
        #   block_o, prev_o, next_o ; then out_packed, out_score
        nops = n_keys + 1 + n_pay
        blocks = [refs[3 * o][...] for o in range(nops)]
        # halos come as 8-row blocks; only the edge row matters
        prevs = [refs[3 * o + 1][7:8, :] for o in range(nops)]
        nexts = [refs[3 * o + 2][0:1, :] for o in range(nops)]
        out_packed = refs[3 * nops]
        out_score = refs[3 * nops + 1]

        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0)
        g = (pl.program_id(0) * ROWS + row) * 128 + lane  # sorted idx

        downs = [_row_shift_down(b, p) for b, p in zip(blocks, prevs)]
        ups = [_row_shift_up(b, nx) for b, nx in zip(blocks, nexts)]

        keys = blocks[:n_keys]
        pos = blocks[n_keys].astype(jnp.int32)
        pays = blocks[n_keys + 1:]
        limit = jnp.int32(n_real) - pos
        minpos = minpos_ref[0, 0]

        best_score = jnp.zeros((ROWS, 128), jnp.int32)
        best_packed = jnp.zeros((ROWS, 128), jnp.int32)
        if fuse_short:
            # fused q9 short fold: v0-only gate, length 4 + ctz of the
            # v1 diff capped at 8 (the host extends len==8 winners).
            # Shares every roll/compare with the main fold; candidates
            # come from (v0,v1)-sorted adjacency instead of the
            # separate v0-recency sort (ratio validated end-to-end)
            short_score = jnp.zeros((ROWS, 128), jnp.int32)
            short_packed = jnp.zeros((ROWS, 128), jnp.int32)

        offs = [j for j in range(1, k_fwd + 1)] + \
            [-j for j in range(1, k_back + 1)]
        for j in offs:
            def sh(o):
                return _shifted(blocks[o], downs[o], ups[o], j, lane)
            # candidate sorted-index must be a real array slot
            in_range = (g - j >= 0) & (g - j < n_pad)
            same = keys[0] == sh(0)
            if n_keys == 2:
                samek = same & (keys[1] == sh(1))
                # partial second-key match: 4 + ctz of the v1 diff
                m1 = _ctz_bytes(keys[1] ^ sh(1))
                total = jnp.where(same, 4 + m1, 0)
                alive = samek
            else:
                total = jnp.where(same, jnp.int32(4 * n_keys), 0)
                alive = same
            cand = sh(n_keys).astype(jnp.int32)
            dist = pos - cand
            for p in range(n_pay):
                x = pays[p] ^ sh(n_keys + 1 + p)
                m = _ctz_bytes(x)
                total = total + jnp.where(alive, m, 0)
                alive = alive & (m == 4)
            ml = jnp.minimum(total, limit)
            base_ok = same & in_range & (dist > 0) \
                & (dist <= jnp.int32(window)) & (cand >= minpos)
            valid = base_ok & (ml >= 4)
            ml = jnp.where(valid, ml, 0)
            logd = 31 - jax.lax.clz(jnp.maximum(dist, 1))
            sc = jnp.where(
                ml > 0,
                jnp.int32(lbs) * ml - jnp.int32(DISTANCE_BIT_PENALTY)
                * logd, 0)
            upd = sc > best_score
            best_score = jnp.where(upd, sc, best_score)
            best_packed = jnp.where(
                upd, (ml << jnp.int32(len_shift)) | dist, best_packed)
            if fuse_short and j > 0:
                # v0-only candidate: same gate chain minus the v1 key
                # equality; length = 4 + ctz(v1 diff) capped at 8
                mls = jnp.minimum(jnp.minimum(total, 8), limit)
                valid_s = base_ok & (mls >= 4)
                mls = jnp.where(valid_s, mls, 0)
                scs = jnp.where(
                    mls > 0,
                    jnp.int32(lbs) * mls
                    - jnp.int32(DISTANCE_BIT_PENALTY) * logd, 0)
                upds = scs > short_score
                short_score = jnp.where(upds, scs, short_score)
                short_packed = jnp.where(
                    upds, (mls << jnp.int32(len_shift)) | dist,
                    short_packed)

        if fuse_short:
            # exact9 merge rule: the short candidate wins only when
            # strictly better (mirrors the host-side `ss > s8` merge)
            swin = short_score > best_score
            best_score = jnp.where(swin, short_score, best_score)
            best_packed = jnp.where(swin, short_packed, best_packed)
        gate = best_score > jnp.int32(MIN_SCORE_DELTA)
        out_packed[...] = jnp.where(gate, best_packed, 0)
        out_score[...] = jnp.where(gate, best_score, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_keys", "k_fwd", "k_back", "window", "lbs",
                     "len_shift", "n_real", "interpret", "fuse_short"))
def fold_sorted_pallas(ops_sorted, min_pos, n_keys: int, k_fwd: int,
                       k_back: int, window: int, lbs: int,
                       len_shift: int, n_real: int,
                       interpret: bool = False,
                       fuse_short: bool = False):
    """Fold over sorted operands [keys..., pos, payloads...]; returns
    (packed, score) in SORTED space, sliced to the input length.

    Operands may be any length; they are padded to a TILE multiple
    with pos = -2^30 (masked by the distance window)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = ops_sorted[0].shape[0]
    pad = (-n) % TILE
    n_pad = n + pad
    grid = n_pad // TILE
    nops = len(ops_sorted)
    n_pay = nops - n_keys - 1

    padded = []
    for o, x in enumerate(ops_sorted):
        fill = -(1 << 30) if o == n_keys else 0
        padded.append(jnp.pad(x, (0, pad), constant_values=fill))
    p2d = [x.reshape(n_pad // 128, 128) for x in padded]

    in_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)]
    inputs = [jnp.asarray(min_pos, jnp.int32).reshape(1, 1)]
    nrows = n_pad // 128
    # halo blocks must be (8, 128)-aligned: fetch the 8-row block
    # adjacent to the tile; the kernel uses its edge row only
    b8 = ROWS // 8
    n8 = nrows // 8
    for x in p2d:
        in_specs += [
            pl.BlockSpec((ROWS, 128), lambda i: (i, 0)),
            pl.BlockSpec((8, 128),
                         lambda i: (jnp.maximum(i * b8 - 1, 0), 0)),
            pl.BlockSpec((8, 128),
                         lambda i: (jnp.minimum((i + 1) * b8,
                                                n8 - 1), 0)),
        ]
        inputs += [x, x, x]

    kernel = _make_kernel(n_keys, n_pay, k_fwd, k_back, window, lbs,
                          len_shift, n_real, n_pad,
                          fuse_short=fuse_short)
    packed, score = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((ROWS, 128), lambda i: (i, 0)),
                   pl.BlockSpec((ROWS, 128), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((nrows, 128), jnp.int32),
                   jax.ShapeDtypeStruct((nrows, 128), jnp.int32)),
        interpret=interpret,
    )(*inputs)
    return packed.reshape(-1)[:n], score.reshape(-1)[:n]


def _invert(pos_s, packed_s, score_s=None):
    """sorted space -> position space via a permutation-apply sort
    (9 ms at 5M vs 32 ms for the equivalent scatter)."""
    ops = (pos_s, packed_s) if score_s is None \
        else (pos_s, packed_s, score_s)
    out = jax.lax.sort(ops, num_keys=1, is_stable=False)
    return out[1] if score_s is None else (out[1], out[2])


def best_matches_exact_p(data: jnp.ndarray, window_size: int,
                         k: int = 32, rounds: int = 2,
                         literal_byte_score: int = 540, min_pos=0,
                         len_shift: int = 26, invert: bool = True,
                         interpret: bool | None = None):
    """Greedy-tier matcher (ops.matching.best_matches_exact semantics,
    k8=0): content sort by v0 + Pallas fold + permutation-apply sort.

    invert=False returns (pos_s, packed_s) in sorted space — the host
    production path inverts for free inside its pull loop."""
    interpret = _resolve_interpret(interpret)
    n = data.shape[0]
    v = [u32_values_at(data, 4 * r) for r in range(rounds)]
    pos = jnp.arange(n, dtype=jnp.int32)
    # key order matches best_matches_exact exactly: int32-cast v0
    # (group ADJACENCY decides cross-group neighbors, so the sort
    # dtype is part of the semantics)
    ops = jax.lax.sort((v[0].astype(jnp.int32), pos) + tuple(v[1:]),
                       num_keys=1, is_stable=True)
    packed_s, _ = fold_sorted_pallas(
        ops, min_pos, n_keys=1, k_fwd=k, k_back=0, window=window_size,
        lbs=literal_byte_score // 4, len_shift=len_shift, n_real=n,
        interpret=interpret)
    if not invert:
        return ops[1], packed_s
    return _invert(ops[1], packed_s)


def best_matches_exact8_p(data: jnp.ndarray, window_size: int,
                          k: int = 16, rounds: int = 4,
                          literal_byte_score: int = 540, min_pos=0,
                          len_shift: int = 26, invert: bool = True,
                          interpret: bool | None = None,
                          _with_score: bool = False):
    """q7/q8-tier matcher (best_matches_exact8 semantics): one two-key
    content sort + bidirectional Pallas fold."""
    interpret = _resolve_interpret(interpret)
    n = data.shape[0]
    # exact8 sorts the raw u32 chunk values (UNSIGNED key order, like
    # best_matches_exact8 — the cross-group neighbor set depends on it)
    v = [u32_values_at(data, 4 * r) for r in range(max(rounds, 2))]
    pos = jnp.arange(n, dtype=jnp.int32)
    ops = jax.lax.sort((v[0], v[1], pos) + tuple(v[2:rounds]),
                       num_keys=2, is_stable=True)
    packed_s, score_s = fold_sorted_pallas(
        ops, min_pos, n_keys=2, k_fwd=k, k_back=k // 2,
        window=window_size, lbs=literal_byte_score // 4,
        len_shift=len_shift, n_real=n, interpret=interpret)
    if not invert:
        return ops[2], packed_s, score_s
    if _with_score:
        return _invert(ops[2], packed_s, score_s)
    return _invert(ops[2], packed_s)


def best_matches_exact9_p(data: jnp.ndarray, window_size: int,
                          k: int = 16, k_short: int = 16,
                          rounds: int = 4,
                          literal_byte_score: int = 540, min_pos=0,
                          len_shift: int = 26, invert: bool = True,
                          interpret: bool | None = None):
    """q9-tier matcher (best_matches_exact9 semantics): exact8 fold
    merged with an exact 4-byte-recency short fold (key = v0, one
    payload, capped at 8 — the host extends len==8 winners)."""
    interpret = _resolve_interpret(interpret)
    n = data.shape[0]
    if not invert:
        # sorted-space form: BOTH folds return (pos_s, packed_s,
        # score_s) and the HOST applies the two permutations and the
        # score merge (native invert_merge32 inside the offload pull
        # loop, where it overlaps the next shard's device work) — the
        # two on-chip inversion sorts (~9 ms each at 5M) disappear
        # from the device critical path
        pos8_s, packed8_s, score8_s = best_matches_exact8_p(
            data, window_size, k=k, rounds=rounds,
            literal_byte_score=literal_byte_score, min_pos=min_pos,
            len_shift=len_shift, invert=False, interpret=interpret)
        v0 = u32_values(data).astype(jnp.int32)
        v1 = u32_values_at(data, 4)
        pos = jnp.arange(n, dtype=jnp.int32)
        ops = jax.lax.sort((v0, pos, v1), num_keys=1, is_stable=True)
        packed_s, score_s = fold_sorted_pallas(
            ops, min_pos, n_keys=1, k_fwd=k_short, k_back=0,
            window=window_size, lbs=literal_byte_score // 4,
            len_shift=len_shift, n_real=n, interpret=interpret)
        return (pos8_s, packed8_s, score8_s,
                ops[1], packed_s, score_s)
    p8, s8 = best_matches_exact8_p(
        data, window_size, k=k, rounds=rounds,
        literal_byte_score=literal_byte_score, min_pos=min_pos,
        len_shift=len_shift, invert=True, interpret=interpret,
        _with_score=True)
    # short fold key order matches _fold_fused's int32-cast v0
    v0 = u32_values(data).astype(jnp.int32)
    v1 = u32_values_at(data, 4)
    pos = jnp.arange(n, dtype=jnp.int32)
    ops = jax.lax.sort((v0, pos, v1), num_keys=1, is_stable=True)
    packed_s, score_s = fold_sorted_pallas(
        ops, min_pos, n_keys=1, k_fwd=k_short, k_back=0,
        window=window_size, lbs=literal_byte_score // 4,
        len_shift=len_shift, n_real=n, interpret=interpret)
    ps, ss = _invert(ops[1], packed_s, score_s)
    upd = ss > s8
    merged = jnp.where(upd, ps, p8)
    return merged


def best_matches_exact9_fused(data: jnp.ndarray, window_size: int,
                              k: int = 16, rounds: int = 4,
                              literal_byte_score: int = 540, min_pos=0,
                              len_shift: int = 26, invert: bool = True,
                              interpret: bool | None = None):
    """q9-tier matcher, single-pass form: the cap-8 short fold runs
    INSIDE the exact8 kernel (fuse_short), sharing its sort, rolls and
    compares — one two-key sort + one fold + one inversion, ~exact8
    cost (the two-sort best_matches_exact9_p was ~2x slower on-chip).

    Semantics deviation vs best_matches_exact9_p: short-fold
    candidates come from (v0,v1)-sorted adjacency instead of the
    separate v0-recency sort.  Every reported length is still
    byte-attested (key equality + ctz of the v1 diff, capped at 8 —
    the host extends len==8 winners), so streams stay exact; the
    candidate-set drift is ratio-validated end-to-end
    (research/tpu_tier_sweep.py)."""
    interpret = _resolve_interpret(interpret)
    n = data.shape[0]
    v = [u32_values_at(data, 4 * r) for r in range(max(rounds, 2))]
    pos = jnp.arange(n, dtype=jnp.int32)
    ops = jax.lax.sort((v[0], v[1], pos) + tuple(v[2:rounds]),
                       num_keys=2, is_stable=True)
    packed_s, _ = fold_sorted_pallas(
        ops, min_pos, n_keys=2, k_fwd=k, k_back=k // 2,
        window=window_size, lbs=literal_byte_score // 4,
        len_shift=len_shift, n_real=n, interpret=interpret,
        fuse_short=True)
    if not invert:
        return ops[2], packed_s
    return _invert(ops[2], packed_s)
