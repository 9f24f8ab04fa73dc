"""Multi-chip sharded compression pipeline (jax.sharding Mesh).

The reference's CompressMulti (src/enc/threading/mod.rs:413) maps each
thread to one contiguous byte range compressed as an independent catable
stream.  The TPU analog: shard the input across a device mesh
(NamedSharding over axis "shard"), run the jit-compiled match+parse
pipeline per chip via shard_map, and gather per-shard command statistics
with XLA collectives over ICI.  Bit-level assembly (BroCatli merge)
happens on host, exactly like the reference joins worker outputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.matching import best_matches_block
from ..ops.parse import committed_parse

SUB_BLOCK = 4096


def make_mesh(n_devices: int | None = None) -> Mesh:
    """Mesh over the default backend; falls back to the (virtual) CPU
    devices when the default backend has too few chips — the dry-run
    path for multi-chip shardings on a single-chip host."""
    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_devices:
                devs = cpu
        except RuntimeError:
            pass
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("shard",))


def sharded_pipeline(mesh: Mesh, window_size: int = (1 << 22) - 16,
                     k: int = 4, k8: int = 2):
    """Build the jitted multi-chip step: [n_shards * shard_len] uint8 ->
    per-position (visited, take, dist) + replicated total command count.

    Each shard is matched and parsed entirely on its own chip (shard-
    local window, like CompressMulti's per-thread catable encode); the
    only cross-chip communication is the psum of command counts over ICI.
    """

    def per_shard(block):
        # block: [1, shard_len] local shard
        data = block[0]
        best_len, best_dist, best_score = best_matches_block(
            data, window_size, k=k, k8=k8)
        visited, take = committed_parse(best_len, best_score, SUB_BLOCK)
        n_cmds = jnp.sum((visited & (take >= 2)).astype(jnp.int32))
        n_cmds = jax.lax.psum(n_cmds, "shard")
        return (visited[None], take[None], best_dist[None], n_cmds)

    shmapped = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=P("shard", None),
        out_specs=(P("shard", None), P("shard", None), P("shard", None),
                   P()),
    )
    return jax.jit(shmapped)


def shard_input(data: np.ndarray, n_shards: int,
                sub_block: int = SUB_BLOCK) -> np.ndarray:
    """Pad + reshape a byte buffer to [n_shards, shard_len] with
    shard_len a multiple of sub_block (zero-padded tail)."""
    n = len(data)
    shard_len = -(-n // n_shards)
    shard_len = -(-shard_len // sub_block) * sub_block
    padded = np.zeros(n_shards * shard_len, dtype=np.uint8)
    padded[:n] = data
    return padded.reshape(n_shards, shard_len)
