"""Virtual-mesh scaling curve for the sharded match pipeline.

Measures the device portion of compress_mesh (halo_pipeline: shard_map
match kernels + ICI psum) at 1/2/4/8 shards over the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), holding total
input fixed — the strong-scaling shape the reference's thread pool is
measured by (worker_pool.rs).  On real chips the same program scales
with ICI instead of host cores; this curve validates the sharding
splits work, not absolute speed.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python research/mesh_scaling.py
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from brotli_tpu.parallel.mesh import halo_pipeline, make_mesh  # noqa: E402


def main(shard_mb: float = 2.0):
    """WEAK scaling: input grows with the shard count (fixed bytes per
    shard).  Caveat printed with the curve: on the virtual CPU mesh a
    single device runs ops on the whole host thread pool while N
    virtual devices serialize against the same cores, so wall-clock
    flatness here UNDERSTATES real multi-chip scaling; the curve
    validates that per-shard work divides and the collective executes,
    and gives the upper bound on host-side overheads."""
    return _run(shard_mb)


def _run(shard_mb: float):
    window = (1 << 19) - 16
    results = {}
    for nd in (1, 2, 4, 8):
        n = int(shard_mb * (1 << 20)) * nd
        rng = np.random.default_rng(0)
        raw = rng.integers(0, 64, n, dtype=np.uint8)
        raw[n // 2:] = raw[:n // 2]
        mesh = make_mesh(nd)
        shard_len = -(-n // nd)
        shard_len = -(-shard_len // 4096) * 4096
        halo = -(-min(window, n) // 4096) * 4096
        rows = np.zeros((nd, halo + shard_len), np.uint8)
        min_pos = np.zeros(nd, np.int32)
        for i in range(nd):
            lo = i * shard_len
            hi = min(n, lo + shard_len)
            rows[i, halo:halo + hi - lo] = raw[lo:hi]
            ctx = max(0, lo - halo)
            fill = lo - ctx
            if fill:
                rows[i, halo - fill:halo] = raw[ctx:lo]
            min_pos[i] = halo - fill
        sharded = jax.device_put(
            rows, NamedSharding(mesh, P("shard", None)))
        mp = jax.device_put(min_pos, NamedSharding(mesh, P("shard")))
        step = halo_pipeline(mesh, window, halo, k=8, k8=4, rounds=2)
        out = step(sharded, mp)  # compile + warm
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = step(sharded, mp)
            jax.block_until_ready(out)
            int(out[4])  # force: a scalar read through every shard
            ts.append(time.time() - t0)
        dt = min(ts)
        results[nd] = dt
        eff = results[1] / dt if 1 in results else 1.0
        print(f"shards={nd} ({shard_mb:.0f} MB/shard): device portion "
              f"{dt*1000:7.1f} ms ({nd*shard_mb/dt:6.1f} MB/s total, "
              f"weak-scaling efficiency {eff:.2f})",
              flush=True)
    print("caveat: virtual CPU devices share one host thread pool — "
          "a 1-device run parallelizes ops across all cores, so this "
          "curve lower-bounds real per-chip scaling")
    return results


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 8.0)
