"""Device-side tracing and kernel throughput counters.

The reference's observability is the `billing` bit-accounting feature
plus the IR callback (SURVEY.md §5); the TPU-native equivalents here
are (a) a JAX profiler trace scope (view in TensorBoard/Perfetto) and
(b) per-kernel effective-throughput counters: wall time via
block_until_ready around a warmed jitted call, bytes moved supplied by
the caller (the interesting number on TPU is HBM bytes per second —
the usual bottleneck — not FLOPs).

Used by the bench/offload tooling; see utils/billing.py for the
wire-format bit accounting.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass


@contextlib.contextmanager
def device_trace(logdir: str):
    """JAX profiler trace scope — open `logdir` in TensorBoard or
    Perfetto to see per-op device timelines."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class KernelStats:
    name: str
    wall_s: float        # best-of-N wall time of one call
    bytes_moved: int     # caller-declared HBM traffic per call
    calls: int

    @property
    def gbps(self) -> float:
        return self.bytes_moved / self.wall_s / 1e9 if self.wall_s else 0.0

    def __str__(self) -> str:
        return (f"[kernel] {self.name}: {self.wall_s * 1e3:.2f} ms, "
                f"{self.gbps:.2f} GB/s effective ({self.calls} calls)")


def measure_kernel(name: str, fn, args, bytes_moved: int,
                   warmup: int = 1, reps: int = 3) -> KernelStats:
    """Best-of-N wall time of a jitted call with device completion
    barriers (block_until_ready; a bare dispatch returns before the
    chip finishes)."""
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return KernelStats(name=name, wall_s=best, bytes_moved=bytes_moved,
                       calls=warmup + reps)
