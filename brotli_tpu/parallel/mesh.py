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


def match_pipeline(mesh: Mesh, window_size: int, k: int = 4,
                   k8: int = 2):
    """Jitted multi-chip match finding with on-device compaction:
    [n_shards, shard_len] uint8 -> compact (pos, len, dist) per shard
    plus a psum'd total-candidate count over ICI."""
    from ..ops.matching import MIN_SCORE_DELTA, best_matches_block

    def per_shard(block):
        import jax.numpy as jnp
        data = block[0]
        n = data.shape[0]
        best_len, best_dist, best_score = best_matches_block(
            data, window_size, k=k, k8=k8)
        keep = best_score > MIN_SCORE_DELTA
        maxc = n // 8
        idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
        tgt = jnp.where(keep, idx, maxc)
        pos = jnp.arange(n, dtype=jnp.int32)
        cpos = jnp.zeros(maxc, jnp.int32).at[tgt].set(pos, mode="drop")
        clen = jnp.zeros(maxc, jnp.int32).at[tgt].set(best_len,
                                                      mode="drop")
        cdist = jnp.zeros(maxc, jnp.int32).at[tgt].set(best_dist,
                                                       mode="drop")
        count = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), maxc)
        total = jax.lax.psum(count, "shard")
        return cpos[None], clen[None], cdist[None], count[None], total

    shmapped = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=P("shard", None),
        out_specs=(P("shard", None), P("shard", None),
                   P("shard", None), P("shard"), P()),
    )
    return jax.jit(shmapped)


def halo_pipeline(mesh: Mesh, window_size: int, halo: int, k: int = 8,
                  k8: int = 4, rounds: int = 2,
                  variant: str = "exact"):
    """Jitted multi-chip match finding over halo-extended shards.

    Each row is [halo + shard_len] bytes: the shard preceded by the
    true bytes before it (cross-shard context, the mesh analog of
    CompressMulti installing the prefix as an LZ77 dictionary,
    reference threading/mod.rs:354-366).  min_pos masks the zero-filled
    part of row 0's halo.  Compact candidates for the shard region only
    cross the link; counts psum over ICI.
    """
    # per-chip matchers are the production Pallas kernels.  Interpret
    # mode is resolved from the MESH's device platform, not
    # jax.default_backend(): with the axon plugin loaded a virtual
    # CPU mesh (the driver's multichip dryrun) still reports a TPU
    # default backend, and Mosaic cannot lower for CPU devices.
    from ..ops.fold_pallas import (best_matches_exact_p,
                                   best_matches_exact8_p,
                                   best_matches_exact9_p)
    interp = np.asarray(mesh.devices).ravel()[0].platform != "tpu"

    def per_shard(block, min_pos):
        data = block[0]
        n = data.shape[0]
        if variant == "exact9":
            packed = best_matches_exact9_p(data, window_size, k=k,
                                           k_short=max(k8, 8),
                                           rounds=rounds,
                                           min_pos=min_pos[0],
                                           interpret=interp)
        elif k8 > 0:
            # the greedy host matcher's k8 is an 8-byte long-match
            # secondary table; in sorted space that coverage comes
            # from the two-key 8-byte fold, so k8>0 routes here
            # (best_matches_exact_p alone is k8=0 semantics)
            packed = best_matches_exact8_p(data, window_size, k=k,
                                           rounds=max(rounds, 2),
                                           min_pos=min_pos[0],
                                           interpret=interp)
        else:
            packed = best_matches_exact_p(data, window_size, k=k,
                                          rounds=rounds,
                                          min_pos=min_pos[0],
                                          interpret=interp)
        best_len = packed >> 26
        best_dist = packed & ((1 << 26) - 1)
        pos = jnp.arange(n, dtype=jnp.int32)
        keep = (packed != 0) & (pos >= halo)
        maxc = n - halo  # every shard position may carry a match
        idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
        tgt = jnp.where(keep, idx, maxc)
        cpos = jnp.zeros(maxc, jnp.int32).at[tgt].set(pos, mode="drop")
        clen = jnp.zeros(maxc, jnp.int32).at[tgt].set(best_len,
                                                      mode="drop")
        cdist = jnp.zeros(maxc, jnp.int32).at[tgt].set(best_dist,
                                                       mode="drop")
        count = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), maxc)
        total = jax.lax.psum(count, "shard")
        return cpos[None], clen[None], cdist[None], count[None], total

    shmapped = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("shard", None), P("shard")),
        out_specs=(P("shard", None), P("shard", None),
                   P("shard", None), P("shard"), P()),
        # pallas_call outputs carry no vma annotation; the per-shard
        # kernel is trivially shard-varying
        check_vma=False,
    )
    return jax.jit(shmapped)


def compress_mesh(data, mesh: Mesh | None = None, n_shards: int = None,
                  quality: int = 9, lgwin: int = 22,
                  lgblock: int = 0) -> bytes:
    """End-to-end multi-chip compression: shard the input over the
    device mesh with cross-shard context halos, run batched match
    finding per chip (shard_map), serialize each shard on host as a
    catable stream at the full quality tier, and merge losslessly with
    BroCatli — the TPU-native CompressMulti (reference
    threading/mod.rs:413 semantics with chips as workers).

    Context parity: shard i's halo holds the min(window, shard_len)
    bytes preceding it, so every in-window cross-shard match is
    available when shard_len >= window (CompressMulti gives shards the
    whole prefix; a mesh replicates only the window-reachable part —
    distances beyond the window are unencodable anyway).
    """
    from ..core import constants as C
    from ..core.bitio import BitWriter
    from ..encode import bitstream as bstr
    from ..encode.command import resolve_commands
    from ..encode.encoder import POISONED_DISTANCE, _quality_knobs
    from ..encode.match import greedy_parse
    from ..encode.params import EncoderParams
    from .multi import _merge

    raw = np.frombuffer(bytes(data), dtype=np.uint8)
    if mesh is None:
        mesh = make_mesh(n_shards)
    n_dev = int(mesh.devices.size)
    if len(raw) < n_dev * SUB_BLOCK:
        from ..encode.encoder import compress
        return compress(bytes(data), quality=quality, lgwin=lgwin)
    params = EncoderParams(quality=quality, lgwin=lgwin,
                           lgblock=lgblock).sanitize(None)

    n = len(raw)
    shard_len = -(-n // n_dev)
    shard_len = -(-shard_len // SUB_BLOCK) * SUB_BLOCK
    # the halo covers the whole window: every cross-shard match
    # CompressMulti can encode is visible to the chip (distances beyond
    # the window are unencodable, so this IS full context parity)
    halo = -(-min(params.window_size, n) // SUB_BLOCK) * SUB_BLOCK
    rows = np.zeros((n_dev, halo + shard_len), dtype=np.uint8)
    min_pos = np.zeros(n_dev, dtype=np.int32)
    for i in range(n_dev):
        lo = i * shard_len
        hi = min(n, lo + shard_len)
        if hi > lo:
            rows[i, halo:halo + hi - lo] = raw[lo:hi]
        ctx_lo = max(0, lo - halo)
        fill = lo - ctx_lo
        if fill:
            rows[i, halo - fill:halo] = raw[ctx_lo:lo]
        min_pos[i] = halo - fill

    sharded = jax.device_put(rows, NamedSharding(mesh, P("shard", None)))
    mp = jax.device_put(min_pos, NamedSharding(mesh, P("shard")))
    kdev = dict(k=32, k8=0, rounds=4) if params.quality <= 6 \
        else dict(k=16, k8=16, rounds=4, variant="exact9")
    step = halo_pipeline(mesh, params.window_size, halo, **kdev)
    cpos, clen, cdist, counts, _total = step(sharded, mp)
    cpos = np.asarray(cpos)
    clen = np.asarray(clen)
    cdist = np.asarray(cdist)
    counts = np.asarray(counts)

    from .. import native_bridge as nb

    pieces = []
    for i in range(n_dev):
        lo = i * shard_len
        real = min(shard_len, n - lo)
        if real <= 0:
            break
        row = rows[i]
        cnt = int(counts[i])
        pos = cpos[i, :cnt].astype(np.int64) - halo  # shard-relative
        keep = (pos >= 0) & (pos < real)
        pos = pos[keep]
        lens = clen[i, :cnt][keep].astype(np.int64)
        dists = cdist[i, :cnt][keep].astype(np.int64)
        # exact extension of cap-hit matches
        if nb.available() and len(pos):
            capped = lens >= 4 * kdev["rounds"]
            if kdev.get("variant") == "exact9":
                # exact9's short-match fold caps lengths at 8; len==8
                # winners may be longer (see tpu_path.compress_tpu)
                capped |= lens == 8
            if capped.any():
                ext = nb.extend_caps(row[:halo + real], 0,
                                     pos[capped] + halo, dists[capped],
                                     lens[capped])
                lens = lens.copy()
                lens[capped] = ext
        bl = np.zeros(real, np.int64)
        bd = np.zeros(real, np.int64)
        bsc = np.zeros(real, np.int64)
        bl[pos] = lens
        bd[pos] = dists
        bsc[pos] = (135 * bl[pos] - 30 * np.floor(
            np.log2(np.maximum(bd[pos], 2))).astype(np.int64))
        isd = np.zeros(real, bool)
        bwire = bl.copy()
        if i == 0:
            # shard 0 is appendable and may reference the static
            # dictionary (catable shards must not — SanitizeParams);
            # union dict candidates on host like compress_part does.
            # Its halo is zero-fill (no real prefix), so probe the
            # shard region directly — dict pseudo-distances depend on
            # the true absolute position.
            from ..encode.static_dict import add_dictionary_matches
            add_dictionary_matches(row[halo:halo + real], 0,
                                   params.window_size, 135, bl, bd,
                                   bsc, isd, bwire)

        w = BitWriter()
        bstr.write_stream_header(w, params.lgwin)
        start = 0
        cache = list(C.INITIAL_DISTANCE_CACHE)
        if i > 0:
            cache = [POISONED_DISTANCE] * 4
            hk = min(2, real)
            bstr.store_uncompressed_meta_block(
                w, row[halo:halo + hk].tobytes())
            start = hk
        if real - start > 0:
            # shard 0's halo is zero-fill, not real prefix: parse it
            # without a dict region so absolute positions (and dict
            # pseudo-distance eligibility) are exact
            dlen = halo if i > 0 else 0
            region = row[:halo + real] if i > 0 \
                else row[halo:halo + real]
            _serialize_shard(w, region, row, halo, dlen, start, real,
                             bl, bd, bsc, isd, bwire, params, cache)
        bstr.write_empty_last_meta_block(w)
        pieces.append(w.getvalue())
    return _merge(pieces)


def _serialize_shard(w, region, row, halo, dlen, start, real, bl, bd,
                     bsc, isd, bwire, params, cache):
    """Serialize one shard's parse as lgblock-sized metablocks through
    the native store (shards of any size — the reference's
    CompressMulti handles arbitrary ranges, threading/mod.rs:413-661;
    a single metablock is capped at 2^24 by the format).  The distance
    cache rolls across metablocks; each block falls back to an
    uncompressed metablock independently if it expands."""
    from .. import native_bridge as nb
    from ..core import constants as C
    from ..encode import bitstream as bstr
    from ..encode.command import resolve_commands
    from ..encode.match import greedy_parse
    from ..encode.metablock import (choose_context_mode,
                                    choose_literal_context_map)

    span = 1 << params.lgblock
    bounds = list(range(start + span, real, span)) + [real]
    segs = greedy_parse(region, bl, bd, bsc, bounds,
                        dict_len=dlen, pos0=start,
                        initial_cache=tuple(cache),
                        best_isdict=isd,
                        window_size=params.window_size,
                        best_wire=bwire)
    mb_start = start
    for gi, (ins, cps, dst, adv) in enumerate(segs):
        mb_end = bounds[gi]
        mlen = mb_end - mb_start
        if mlen <= 0:
            continue
        ctx_mode = choose_context_mode(
            row[halo + mb_start:halo + mb_end], params.quality,
            params.mode)
        if ctx_mode == C.CONTEXT_UTF8:
            nlc, smap = choose_literal_context_map(
                region, dlen + mb_start, mlen, params.quality, real)
        else:
            nlc, smap = 1, np.zeros(64, dtype=np.int64)
        res = None
        if nb.available():
            res = nb.encode_metablock(
                region, dlen + mb_start, mlen, False, ins, cps, dst,
                adv, cache, params.window_size, 0, 0,
                params.dist.alphabet_size, max(params.quality, 4),
                ctx_mode, nlc, smap, C.CONTEXT_LUT0[ctx_mode],
                C.CONTEXT_LUT1[ctx_mode])
        if res is not None and res[1] <= 8 * mlen + 40:
            words, nbits, cache[:] = res[0], res[1], res[2]
        elif res is not None:
            bstr.store_uncompressed_meta_block(
                w, row[halo + mb_start:halo + mb_end].tobytes())
            mb_start = mb_end
            continue
        else:
            # pure-Python fallback (no native runtime)
            cmds, new_cache = resolve_commands(
                ins, cps, dst, params.dist, advance=adv,
                initial_cache=cache, pos_offset=dlen + mb_start,
                window_size=params.window_size)
            state = w.save_state()
            before = w.bit_length()
            if params.quality >= 4:
                bstr.store_meta_block_auto(
                    w, region, dlen + mb_start, mlen, cmds,
                    params.dist, params.quality, mlen, 0, False)
            else:
                bstr.store_meta_block_trivial(
                    w, region, dlen + mb_start, mlen, False, cmds,
                    params.dist)
            if w.bit_length() - before > 8 * mlen + 40:
                w.restore_state(state)
                bstr.store_uncompressed_meta_block(
                    w, row[halo + mb_start:halo + mb_end].tobytes())
            else:
                cache[:] = new_cache
            mb_start = mb_end
            continue
        w.append_packed(words, nbits)
        mb_start = mb_end


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
