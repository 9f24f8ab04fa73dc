"""TPU block-local parallel parse: pointer doubling over match jumps.

The greedy LZ77 walk is inherently sequential; on TPU it is reformulated
as a reachability problem solved in O(log B) vectorized steps per
sub-block: next[i] = i + copy_len[i] (or +1 for a literal), and the
positions visited by the chain from the sub-block start are computed by
jump-table doubling with scatter-max marking.  Every sub-block parses
in parallel; matches may reference anywhere back in the shard (the
candidate tables span the shard), only the parse commitment is local.

This is the TPU analog of the reference's fragment-based fast paths
(compress_fragment.rs operates on independent <=128 KiB fragments) —
the parse seams differ from a sequential greedy but the command stream
is equally valid RFC 7932.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .matching import MIN_SCORE_DELTA


def committed_parse(best_len: jnp.ndarray, best_score: jnp.ndarray,
                    sub_block: int = 4096):
    """visited[i] = True if the block-local greedy chain lands on i.

    best_len/best_score: [n]; n must be a multiple of sub_block.
    Matches are truncated at sub-block ends (jit-safe static shapes).
    Returns (visited, trunc_len): the parse takes, at each visited i,
    a copy of trunc_len[i] (0 = literal).
    """
    n = best_len.shape[0]
    nb = n // sub_block
    pos_in = jnp.arange(n, dtype=jnp.int32) % sub_block
    room = sub_block - pos_in
    take = jnp.where(best_score > MIN_SCORE_DELTA,
                     jnp.minimum(best_len, room), 0)
    take = jnp.where(take >= 2, take, 0)
    step = jnp.maximum(take, 1)

    nxt = (pos_in + step).reshape(nb, sub_block)  # local jump targets
    nxt = jnp.minimum(nxt, sub_block)             # sentinel = sub_block

    visited = jnp.zeros((nb, sub_block + 1), bool).at[:, 0].set(True)
    jump = jnp.concatenate(
        [nxt, jnp.full((nb, 1), sub_block, jnp.int32)], axis=1)

    steps = int(np.ceil(np.log2(sub_block))) + 1
    for _ in range(steps):
        # mark nodes reachable in one more jump-table application
        reached = jnp.zeros_like(visited)
        reached = reached.at[
            jnp.arange(nb)[:, None], jump].max(visited)
        visited = visited | reached
        # double the jump table
        jump = jnp.take_along_axis(
            jnp.concatenate([jump, jnp.full((nb, 1), sub_block,
                                            jnp.int32)], axis=1),
            jump, axis=1)

    return visited[:, :sub_block].reshape(n), take
