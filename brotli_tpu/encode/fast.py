"""TPU fast encode path: fully vectorized, no per-command Python loops.

The analog of the reference's q0/q1 fragment compressors
(src/enc/compress_fragment.rs, compress_fragment_two_pass.rs): match
finding + parse run jit-compiled on the accelerator
(ops.matching.best_matches_block + ops.parse.committed_parse), command
extraction / entropy coding / bit packing are vectorized numpy on host.
Distance short codes are skipped (every distance explicit), which is
what makes the path loop-free; the q4+ host path trades speed for the
cache-resolution ratio win.

One metablock per <=4 MiB shard, trivial (single-histogram) layout.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

from ..core import constants as C
from ..core.bitio import BitWriter
from . import bitstream as bs
from .command import CommandArrays
from .params import EncoderParams

SUB_BLOCK = 4096
SHARD = 1 << 22  # one metablock per shard


@partial(jax.jit, static_argnames=("window_size", "k", "k8"))
def _tpu_match_parse(data, window_size: int, k: int = 4, k8: int = 2):
    """The jitted device pipeline: scores + committed parse + compaction.

    Commands are compacted ON DEVICE into fixed [n//8] buffers so only
    ~n/2 bytes cross the host link instead of 9n (the dense per-position
    arrays) — the host link, not HBM, is the fast path's bottleneck.
    Copies beyond the buffer cap are dropped (they decay to literals,
    still a valid parse).
    """
    import jax.numpy as jnp

    from ..ops.matching import best_matches_block
    from ..ops.parse import committed_parse
    n = data.shape[0]
    best_len, best_dist, best_score = best_matches_block(
        data, window_size, k=k, k8=k8)
    visited, take = committed_parse(best_len, best_score, SUB_BLOCK)
    is_copy = visited & (take >= 2)
    maxc = n // 8
    idx = jnp.cumsum(is_copy.astype(jnp.int32)) - 1
    tgt = jnp.where(is_copy, idx, maxc)
    pos = jnp.arange(n, dtype=jnp.int32)
    cpos = jnp.zeros(maxc, jnp.int32).at[tgt].set(pos, mode="drop")
    clen = jnp.zeros(maxc, jnp.int32).at[tgt].set(take, mode="drop")
    cdist = jnp.zeros(maxc, jnp.int32).at[tgt].set(best_dist,
                                                   mode="drop")
    count = jnp.minimum(jnp.sum(is_copy.astype(jnp.int32)), maxc)
    return cpos, clen, cdist, count


def _commands_from_parse(copy_pos: np.ndarray, copy_len: np.ndarray,
                         copy_dist: np.ndarray, start: int, end: int,
                         dist_params) -> CommandArrays:
    """Vectorized command extraction from compact copy arrays."""
    copy_pos = copy_pos.astype(np.int64)
    copy_len = copy_len.astype(np.int64)
    copy_dist = copy_dist.astype(np.int64)

    prev_end = np.concatenate([[start], copy_pos + copy_len])
    insert_len = copy_pos - prev_end[:-1]
    tail = end - (int(prev_end[-1]) if len(copy_pos) else start)

    if tail > 0 or len(copy_pos) == 0:
        insert_len = np.concatenate([insert_len, [tail]])
        copy_len = np.concatenate([copy_len, [0]])
        copy_dist = np.concatenate([copy_dist, [0]])

    n = len(insert_len)
    npostfix, ndirect = dist_params.npostfix, dist_params.ndirect
    dist_code = np.zeros(n, dtype=np.int64)
    dist_extra = np.zeros(n, dtype=np.int64)
    dist_extra_bits = np.zeros(n, dtype=np.int64)
    has_copy = copy_len > 0
    if has_copy.any():
        hc = np.nonzero(has_copy)[0]
        sym, extra, nbits = C.encode_distance(copy_dist[hc], npostfix,
                                              ndirect)
        dist_code[hc] = sym
        dist_extra[hc] = extra
        dist_extra_bits[hc] = nbits

    wire_copy = np.where(copy_len == 0, 4, copy_len)
    ins_code = C.get_insert_length_code(insert_len)
    copy_code = C.get_copy_length_code(wire_copy)
    # trailing insert-only command may use the implicit-dist0 cell
    use_last = (copy_len == 0) & (ins_code < 8) & (copy_code < 16)
    cmd_sym = C.combine_length_codes(ins_code, copy_code, use_last)
    return CommandArrays(insert_len, copy_len, copy_dist, dist_code,
                         dist_extra, dist_extra_bits, cmd_sym)


def compress_fast(data, lgwin: int = 22, quality: int = 1) -> bytes:
    """One-shot TPU-path compress (quality 0/1 analog)."""
    raw = np.frombuffer(bytes(data), dtype=np.uint8)
    params = EncoderParams(quality=quality, lgwin=lgwin).sanitize(len(raw))
    w = BitWriter()
    bs.write_stream_header(w, params.lgwin)
    n = len(raw)
    if n == 0:
        bs.write_empty_last_meta_block(w)
        return w.getvalue()

    for s0 in range(0, n, SHARD):
        s1 = min(s0 + SHARD, n)
        shard = raw[s0:s1]
        m = len(shard)
        m_main = (m // SUB_BLOCK) * SUB_BLOCK
        if m_main >= SUB_BLOCK:
            cpos, clen, cdist, count = _tpu_match_parse(
                shard[:m_main], params.window_size)
            count = int(count)
            cpos = np.asarray(cpos)[:count]
            clen = np.asarray(clen)[:count]
            cdist = np.asarray(cdist)[:count]
        else:
            cpos = np.zeros(0, np.int32)
            clen = np.zeros(0, np.int32)
            cdist = np.zeros(0, np.int32)
        cmds = _commands_from_parse(cpos, clen, cdist, 0, m, params.dist)
        is_last = s1 == n
        state = w.save_state()
        before = w.bit_length()
        bs.store_meta_block_trivial(w, shard, 0, m, is_last, cmds,
                                    params.dist)
        if w.bit_length() - before > 8 * m + 40:
            w.restore_state(state)
            bs.store_uncompressed_meta_block(w, shard.tobytes())
            if is_last:
                bs.write_empty_last_meta_block(w)
    return w.getvalue()
