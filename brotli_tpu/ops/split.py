"""Device block-split planning: chunked-entropy Lloyd iterations as
MXU matmuls.

The metablock planner's block splitter is the entropy-clustering loop
cost[chunk, type] = -hist_chunk . log2 p_type — one [nch, alpha] x
[alpha, k] matmul per iteration plus an argmin and a segment-sum
centroid update (reference SplitByteVector / FindBlocks,
src/enc/block_splitter.rs:223, reformulated; see
encode/metablock.split_symbols for the host oracle).  This module runs
the histogram build and the Lloyd loop on the device (jit; MXU-shaped
matmuls, one-hot segment sums), returning the per-chunk assignment and
cost matrix; the sequential run-hysteresis and the agglomerative
header-cost merge stay on the host (tiny [nch]-sized data).

Used by the TPU offload pipeline: after the host walk produces a
metablock's commands, the chip plans its literal split and the native
store takes the assignment (encode_metablock's ext_lit_types hook);
the device match kernel for later metablocks stays in flight
throughout via the offload loop's async dispatch.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..encode.metablock import (MIN_LENGTH_FOR_SPLITTING, SPLIT_PARAMS,
                                BlockSplit, _hysteresis, _merge_types,
                                _runs)


@partial(__import__("jax").jit,
         static_argnames=("alphabet_size", "k", "chunk", "iters"))
def _lloyd_device(padded, alphabet_size: int, k: int, chunk: int,
                  iters: int, switch_pen: float):
    """Chunk histograms + Lloyd iterations on the device.

    padded: int32[nch * chunk] symbol stream, -1 = padding.
    Returns (assign int32[nch], cost float32[nch, k])."""
    import jax
    import jax.numpy as jnp

    nch = padded.shape[0] // chunk
    syms = padded.reshape(nch, chunk)
    # [nch, alpha] histograms via one-hot accumulation (batched matmul
    # shape; XLA lowers this to vectorized scatter-free adds)
    onehot = jax.nn.one_hot(syms, alphabet_size, dtype=jnp.float32)
    hist = onehot.sum(axis=1)  # padding (-1) one-hots to all-zero

    # evenly spaced chunk-group seeds (the host oracle's init)
    seeds = jnp.linspace(0, nch, k + 1).astype(jnp.int32)
    group = jnp.clip(
        jnp.searchsorted(seeds[1:], jnp.arange(nch), side="right"),
        0, k - 1)
    ginit = jax.nn.one_hot(group, k, dtype=jnp.float32)  # [nch, k]
    cent0 = ginit.T @ hist                               # [k, alpha]

    def body(_, carry):
        cent, assign = carry
        tot = cent.sum(axis=1, keepdims=True) + alphabet_size * 0.25
        logp = jnp.log2((cent + 0.25) / tot)             # [k, alpha]
        cost = -(hist @ logp.T) + switch_pen             # [nch, k] MXU
        assign = jnp.argmin(cost, axis=1).astype(jnp.int32)
        oh = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        cent = oh.T @ hist
        return cent, assign

    cent, assign = jax.lax.fori_loop(
        0, iters, body, (cent0, jnp.zeros(nch, jnp.int32)))
    tot = cent.sum(axis=1, keepdims=True) + alphabet_size * 0.25
    logp = jnp.log2((cent + 0.25) / tot)
    cost = -(hist @ logp.T) + switch_pen
    return assign, cost


def split_symbols_device(syms: np.ndarray, alphabet_size: int,
                         category: str, iters: int = 3) -> BlockSplit:
    """Device analog of metablock.split_symbols: Lloyd loop on the
    chip, run-hysteresis + header-cost merge on the host."""
    import jax.numpy as jnp

    p = SPLIT_PARAMS[category]
    n = len(syms)
    if n < MIN_LENGTH_FOR_SPLITTING:
        return BlockSplit.trivial(n)
    chunk = p["chunk"]
    nch = (n + chunk - 1) // chunk
    k = int(min(p["max_types"], max(1, nch // 3), 256))
    if k <= 1:
        return BlockSplit.trivial(n)
    # round the chunk count up to the next power of two so the jitted
    # Lloyd kernel compiles once per bucket, not once per distinct
    # stream length (all-padding chunks histogram to zero rows and are
    # sliced off below)
    nch_pad = 1 << max(2, (nch - 1).bit_length())
    pad = nch_pad * chunk - n
    padded = np.concatenate(
        [np.asarray(syms, np.int32),
         np.full(pad, -1, np.int32)])
    switch_pen = p["switch_cost"] / max(1, chunk // 16)
    assign_d, cost_d = _lloyd_device(jnp.asarray(padded), alphabet_size,
                                     k, chunk, iters, switch_pen)
    assign = np.asarray(assign_d)[:nch].astype(np.int64)
    cost = np.asarray(cost_d)[:nch].astype(np.float64)

    assign = _hysteresis(assign, cost, p["min_run"])

    # histograms for the merge (host; [nch, alpha] bincount over the
    # real chunks only)
    real = padded[:nch * chunk]
    chunk_id = np.repeat(np.arange(nch), chunk)
    valid = real >= 0
    flat = chunk_id[valid] * alphabet_size + real[valid].astype(np.int64)
    hist = np.bincount(flat, minlength=nch * alphabet_size) \
        .reshape(nch, alphabet_size).astype(np.float64)
    assign = _merge_types(assign, hist, k, p["switch_cost"],
                          p["header_cost"])

    used, first_pos = np.unique(assign, return_index=True)
    order = used[np.argsort(first_pos)]
    remap = np.zeros(k, dtype=np.int64)
    remap[order] = np.arange(len(order))
    assign = remap[assign]
    num_types = len(order)
    if num_types == 1:
        return BlockSplit.trivial(n)
    types = np.repeat(assign, chunk)[:n]
    return BlockSplit(num_types, types, _runs(types))
