"""Pallas TPU kernel for the match-length inner loop.

The candidate compare in the match pipeline is R rounds of
  x = va[r] ^ vb[r];  len += alive ? ctz_bytes(x) : 0;  alive &= x == 0
over u32 chunk values (ops/matching.py match_lengths_capped).  As plain
jax each round is an HBM-width elementwise op; this kernel keeps the
whole round chain for a block of candidates resident in VMEM, writing
only the final lengths (one store per candidate instead of R).

The operands are pre-gathered [R, M] arrays — gathers stay in XLA where
the compiler schedules them; Pallas TPU's strength is the fused
elementwise chain, not dynamic gathers (pallas_guide.md: let XLA fuse
what it fuses well; write kernels for what it cannot).

Reference analog: FindMatchLengthWithLimit
(reference src/enc/backward_references/mod.rs, 8-byte XOR + ctz loop).

Validated bit-exact against the jax reference both in interpreter
mode (CPU tests) and compiled on a real TPU v5e chip (the tunneled
axon chip takes ~10 minutes for the first pallas compile — run with a
generous timeout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 1024  # candidates per grid step (8 x 128 u32 tiles)


def _kernel(va_ref, vb_ref, out_ref):
    R = va_ref.shape[0]
    total = jnp.zeros(va_ref.shape[1:], jnp.int32)
    alive = jnp.ones(va_ref.shape[1:], bool)
    for r in range(R):
        x = va_ref[r] ^ vb_ref[r]
        nz = x != 0
        low = x & (~x + np.uint32(1))
        ctz = jax.lax.population_count(low - np.uint32(1))
        m = jnp.where(nz, (ctz >> np.uint32(3)).astype(jnp.int32), 4)
        total = total + jnp.where(alive, m, 0)
        alive = alive & ~nz
    out_ref[...] = total


@functools.partial(jax.jit, static_argnames=("interpret",))
def match_rounds_pallas(va: jnp.ndarray, vb: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """lengths[m] from pre-gathered round operands va/vb of shape
    [R, M] (M padded to a BLOCK multiple by the caller)."""
    from jax.experimental import pallas as pl

    R, M = va.shape
    rows = BLOCK // 128
    va2 = va.reshape(R, M // 128, 128)
    vb2 = vb.reshape(R, M // 128, 128)
    grid = (M // BLOCK,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, rows, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((R, rows, 128), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M // 128, 128), jnp.int32),
        interpret=interpret,
    )(va2, vb2)
    return out.reshape(M)


def match_lengths_blocked(v4: jnp.ndarray, a: jnp.ndarray,
                          b: jnp.ndarray, limit: jnp.ndarray,
                          rounds: int = 8,
                          interpret: bool = False) -> jnp.ndarray:
    """Drop-in variant of ops.matching.match_lengths_capped that runs
    the round chain as one Pallas kernel (gathers in XLA)."""
    n4 = v4.shape[0]
    m = a.shape[0]
    pad = (-m) % BLOCK
    ap = jnp.concatenate([a, jnp.zeros(pad, a.dtype)])
    bp = jnp.concatenate([b, jnp.zeros(pad, b.dtype)])
    offs = jnp.arange(rounds, dtype=a.dtype) * 4
    ia = jnp.clip(ap[None, :] + offs[:, None], 0, n4 - 1)
    ib = jnp.clip(bp[None, :] + offs[:, None], 0, n4 - 1)
    lens = match_rounds_pallas(v4[ia], v4[ib], interpret=interpret)
    return jnp.minimum(lens[:m], limit.astype(jnp.int32))
