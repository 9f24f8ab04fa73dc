"""TPU bit packing: (bits, nbits) items -> packed little-endian words.

The serialization hot loop as a data-parallel kernel: exclusive-scan the
bit lengths, shift each item to its bit offset, and scatter-accumulate
into u32 words.  Items occupy disjoint bit ranges, so OR == ADD and the
scatter uses jnp .at[].add (jit/TPU friendly, no x64 requirement).

Mirrors bitstream.pack_bits (the host/u64 oracle).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_bits_u32(bits: jnp.ndarray, nbits: jnp.ndarray, total_words: int):
    """Pack items (each < 2^31, nbits <= 31) into u32 words, LSB-first.

    total_words must be a static bound >= ceil(sum(nbits)/32) + 1.
    Returns (words[total_words], total_bits scalar).
    """
    bits = bits.astype(jnp.uint32)
    nbits = nbits.astype(jnp.int32)
    pos = jnp.cumsum(nbits) - nbits           # exclusive scan
    total_bits = pos[-1] + nbits[-1] if bits.shape[0] else jnp.int32(0)
    word = pos >> 5
    shift = (pos & 31).astype(jnp.uint32)
    lo = bits << shift
    hi = jnp.where(shift > 0, bits >> (np.uint32(32) - shift),
                   np.uint32(0))
    words = jnp.zeros(total_words, jnp.uint32)
    words = words.at[word].add(lo, mode="drop")
    words = words.at[word + 1].add(hi, mode="drop")
    return words, total_bits


def words_u32_to_bytes(words: np.ndarray, total_bits: int) -> np.ndarray:
    """Host: u32 word buffer -> byte array of ceil(total_bits/8)."""
    nbytes = (int(total_bits) + 7) >> 3
    raw = np.frombuffer(
        np.ascontiguousarray(words, dtype="<u4").tobytes()[:nbytes],
        dtype=np.uint8).copy()
    if total_bits & 7:
        raw[-1] &= (1 << (total_bits & 7)) - 1
    return raw
