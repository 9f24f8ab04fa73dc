"""Batched encode for the serving path: many independent payloads
compressed concurrently.

The single-stream mirror of decode.batch.decompress_batch: one thread
per payload (the native parse/store calls release the GIL), results in
input order, join-all-drain-first-error semantics (reference
CompressMulti's error handling shape, threading/mod.rs:506-533 — but
across independent streams rather than shards of one)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor


def compress_batch(payloads, threads: int = 8, **params):
    """Compress a list of independent payloads concurrently.

    Returns a list of compressed streams in input order; `params` are
    forwarded to compress() (quality, lgwin, ...).  Raises the first
    error after every worker drains."""
    from .encoder import compress
    payloads = list(payloads)
    if threads <= 1 or len(payloads) <= 1:
        return [compress(p, **params) for p in payloads]
    results = [None] * len(payloads)
    first_err = None
    with ThreadPoolExecutor(max_workers=threads) as pool:
        futs = {pool.submit(compress, p, **params): i
                for i, p in enumerate(payloads)}
        for f, i in futs.items():
            try:
                results[i] = f.result()
            except Exception as e:  # noqa: BLE001
                if first_err is None:
                    first_err = e
    if first_err is not None:
        raise first_err
    return results
