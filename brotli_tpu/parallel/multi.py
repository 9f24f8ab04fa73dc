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
        return compress_with_params(part, p)
    p = EncoderParams(
        quality=params.quality, lgwin=params.lgwin, mode=params.mode,
        catable=True).sanitize(len(part))
    prefix = data[:lo].tobytes()
    return compress_with_params(part, p, custom_dictionary=prefix)


def compress_multi(data, num_parts: int, quality: int = 9,
                   lgwin: int = 22, mode: int = 0,
                   backend: str = "thread") -> bytes:
    """Parallel compress + lossless merge (reference CompressMulti,
    threading/mod.rs:413; enc/mod.rs compress_multi :95)."""
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

    if backend == "thread":
        with ThreadPoolExecutor(max_workers=num_parts) as pool:
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
