"""CompressMulti: parallel single-file compression with lossless merge.

Reference semantics (src/enc/threading/mod.rs:413-661): the input is
split into num_parts contiguous ranges; part 0 is compressed appendable,
every later part is compressed catable with the ENTIRE preceding prefix
installed as its LZ77 custom dictionary — so cross-shard matches are
preserved and, after the BroCatli bit-merge, each shard's distances
resolve against the real preceding output.  Outputs are joined in order
and merged bit-exactly (concat.brocatli).

MAX_THREADS parity with the reference (fixed_queue.rs:1).  Worker
backends: "thread" (concurrent.futures, the WorkerPool analog),
"serial" (the SingleThreadedSpawner analog).  On TPU pod slices the
per-shard match+parse pipeline additionally fans out across chips via
parallel.mesh (shard_map over a Mesh).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..concat.brocatli import BroCatli, BroCatliResult
from ..encode.encoder import compress_with_params
from ..encode.params import EncoderParams

MAX_THREADS = 16


def _get_range(i: int, n_parts: int, n: int):
    return (i * n) // n_parts, ((i + 1) * n) // n_parts


def compress_part(data: np.ndarray, i: int, n_parts: int,
                  params: EncoderParams) -> bytes:
    """Per-worker shard compression (reference compress_part,
    threading/mod.rs:337)."""
    n = len(data)
    lo, hi = _get_range(i, n_parts, n)
    part = data[lo:hi]
    if i == 0:
        p = EncoderParams(
            quality=params.quality, lgwin=params.lgwin, mode=params.mode,
            appendable=True).sanitize(len(part))
        return compress_with_params(part, p, pipeline=False)
    p = EncoderParams(
        quality=params.quality, lgwin=params.lgwin, mode=params.mode,
        catable=True).sanitize(len(part))
    prefix = data[:lo].tobytes()
    return compress_with_params(part, p, custom_dictionary=prefix,
                                pipeline=False)


def _compress_part_shared(raw, i, n_parts, params, best):
    """Shard compression against a SHARED match table (the
    favor_cpu_efficiency analog, reference threading/mod.rs:456-542:
    one hasher built over the whole input and shared with every worker
    instead of each worker re-hashing its prefix)."""
    from ..core import constants as C
    from ..core.bitio import BitWriter
    from ..encode import bitstream as bs
    from ..encode.command import resolve_commands
    from ..encode.encoder import POISONED_DISTANCE
    from ..encode.match import greedy_parse
    from ..encode.metablock import build_meta_block

    bl, bd, bsc, isd, bw = best
    n = len(raw)
    lo, hi = _get_range(i, n_parts, n)
    w = BitWriter()
    p = EncoderParams(
        quality=params.quality, lgwin=params.lgwin, mode=params.mode,
        appendable=(i == 0), catable=(i > 0)).sanitize(hi - lo)

    bs.write_stream_header(w, p.lgwin, p.large_window)
    start = lo
    cache = list(C.INITIAL_DISTANCE_CACHE)
    if i > 0:
        cache = [POISONED_DISTANCE] * 4
        k = min(2, hi - lo)
        bs.store_uncompressed_meta_block(w, raw[lo:lo + k].tobytes())
        start = lo + k
    if start < hi:
        region = raw[:hi]
        segs = greedy_parse(region, bl[:hi], bd[:hi], bsc[:hi],
                            [hi], dict_len=0, pos0=start,
                            initial_cache=tuple(cache),
                            best_isdict=isd[:hi],
                            window_size=p.window_size,
                            best_wire=bw[:hi])
        ins, cps, dst, adv = segs[0]
        cmds, _ = resolve_commands(ins, cps, dst, p.dist, advance=adv,
                                   initial_cache=cache, pos_offset=start,
                                   window_size=p.window_size)
        mlen = hi - start
        state = w.save_state()
        before = w.bit_length()
        if p.quality >= 4:
            bs.store_meta_block_auto(w, region, start, mlen, cmds,
                                     p.dist, p.quality, mlen, p.mode,
                                     False)
        else:
            bs.store_meta_block_trivial(w, region, start, mlen, False,
                                        cmds, p.dist)
        if w.bit_length() - before > 8 * mlen + 40:
            w.restore_state(state)
            bs.store_uncompressed_meta_block(w, raw[start:hi].tobytes())
    bs.write_empty_last_meta_block(w)  # '11' trailer, stripped on merge
    return w.getvalue()


def compress_multi(data, num_parts: int, quality: int = 9,
                   lgwin: int = 22, mode: int = 0,
                   backend: str = "thread",
                   favor_cpu_efficiency: bool = False) -> bytes:
    """Parallel compress + lossless merge (reference CompressMulti,
    threading/mod.rs:413; enc/mod.rs compress_multi :95).

    favor_cpu_efficiency: compute ONE shared match table over the whole
    input and let every shard parse against it (reference's shared-
    hasher optimization); otherwise each worker hashes its own prefix.
    """
    raw = np.frombuffer(bytes(data), dtype=np.uint8)
    num_parts = max(1, min(num_parts, MAX_THREADS))
    if len(raw) < num_parts * 4096:
        num_parts = max(1, len(raw) // 4096)
    params = EncoderParams(quality=quality, lgwin=lgwin,
                           mode=mode).sanitize(None)

    if num_parts == 1:
        p = EncoderParams(quality=quality, lgwin=lgwin,
                          mode=mode).sanitize(len(raw))
        return compress_with_params(raw, p)

    if backend == "workpool" and not favor_cpu_efficiency:
        from .. import native_bridge as nb
        if nb.available():
            return _compress_multi_workpool(raw, num_parts, quality,
                                            lgwin, mode)
        backend = "thread"  # graceful degradation without the runtime

    if favor_cpu_efficiency and 2 <= params.quality <= 9:
        from ..encode.encoder import _quality_knobs
        from ..encode.match import find_best_matches
        knobs = _quality_knobs(params)
        # shards > 0 are catable: no static dictionary (SanitizeParams)
        best = find_best_matches(
            raw, params.window_size, dict_len=0,
            literal_byte_score=params.literal_byte_score,
            use_dictionary=False, **knobs)
        if backend == "thread":
            with ThreadPoolExecutor(max_workers=num_parts) as pool:
                futures = [pool.submit(_compress_part_shared, raw, i,
                                       num_parts, params, best)
                           for i in range(num_parts)]
                results, first_err = [], None
                for f in futures:
                    try:
                        results.append(f.result())
                    except Exception as e:  # noqa: BLE001
                        results.append(None)
                        if first_err is None:
                            first_err = e
                if first_err is not None:
                    raise first_err
        else:
            results = [_compress_part_shared(raw, i, num_parts, params,
                                             best)
                       for i in range(num_parts)]
        return _merge(results)

    if backend in ("thread", "process"):
        # "process" sidesteps GIL-serialized glue between the native
        # calls (the MultiThreadedSpawner analog with real parallelism;
        # shards and their prefixes are shipped as bytes)
        pool_cls = ThreadPoolExecutor
        if backend == "process":
            from concurrent.futures import ProcessPoolExecutor
            pool_cls = ProcessPoolExecutor
        with pool_cls(max_workers=num_parts) as pool:
            if backend == "process":
                futures = [pool.submit(_compress_part_bytes,
                                       raw.tobytes(), i, num_parts,
                                       quality, lgwin, mode)
                           for i in range(num_parts)]
            else:
                futures = [pool.submit(compress_part, raw, i, num_parts,
                                       params)
                           for i in range(num_parts)]
            # join ALL workers even if one fails (reference drains every
            # handle and reports the first error, threading/mod.rs:506)
            results, first_err = [], None
            for f in futures:
                try:
                    results.append(f.result())
                except Exception as e:  # noqa: BLE001
                    results.append(None)
                    if first_err is None:
                        first_err = e
            if first_err is not None:
                raise first_err
    else:
        results = [compress_part(raw, i, num_parts, params)
                   for i in range(num_parts)]
    return _merge(results)


_workpool = None


def _compress_multi_workpool(raw: np.ndarray, num_parts: int,
                             quality: int, lgwin: int,
                             mode: int) -> bytes:
    """Native persistent WorkerPool backend (reference worker_pool.rs:
    75-300 via ffi/multicompress): GIL-free pthread shards, byte-aligned
    catable parts, concatenation merge.  The pool persists across calls
    (new_work_pool parity) — no per-call thread spawn cost."""
    import ctypes

    from .. import native_bridge as nb
    global _workpool
    lib = nb.get_lib()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    if _workpool is None:
        _workpool = lib.BrotliEncoderCreateWorkPool(
            ctypes.c_size_t(MAX_THREADS - 1), None, None, None)
    # reference ids (parameters.rs / ffi.py): MODE=0, QUALITY=1, LGWIN=2
    keys = (ctypes.c_uint32 * 3)(0, 1, 2)
    vals = (ctypes.c_uint32 * 3)(mode, quality, lgwin)
    data = raw.tobytes()
    cap = int(lib.BrotliEncoderMaxCompressedSize(
        ctypes.c_size_t(len(data)))) + 64
    enc = ctypes.create_string_buffer(cap)
    esz = ctypes.c_size_t(cap)
    ok = lib.BrotliEncoderCompressWorkPool(
        _workpool, ctypes.c_size_t(3), keys, vals,
        ctypes.c_size_t(len(data)), data, ctypes.byref(esz), enc,
        ctypes.c_size_t(num_parts))
    if not ok:
        raise RuntimeError("workpool compression failed")
    return enc.raw[:esz.value]


def _compress_part_bytes(data: bytes, i: int, n_parts: int,
                         quality: int, lgwin: int, mode: int) -> bytes:
    """Picklable worker for the process backend."""
    raw = np.frombuffer(data, dtype=np.uint8)
    params = EncoderParams(quality=quality, lgwin=lgwin,
                           mode=mode).sanitize(None)
    return compress_part(raw, i, n_parts, params)


def _merge(results) -> bytes:
    bc = BroCatli()
    out = bytearray()
    for piece in results:
        bc.new_brotli_file()
        res = bc.stream(piece, out)
        if res not in (BroCatliResult.NeedsMoreInput,
                       BroCatliResult.Success):
            raise ValueError(f"merge failed: {res.name}")
    res = bc.finish(out)
    if res != BroCatliResult.Success:
        raise ValueError(f"merge finish failed: {res.name}")
    return bytes(out)
