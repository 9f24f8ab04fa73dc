"""Where does q5 encode time go?  Enables the native parse counters
(parse_stats_enable) and splits wall time into hash / insert / search
cycles vs everything else (store + glue), on the bench mixed corpus.

Run: python research/q5_profile.py [quality]
"""

import ctypes
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build_corpus            # noqa: E402
from brotli_tpu import native_bridge as nb  # noqa: E402
from brotli_tpu.encode.encoder import compress  # noqa: E402


def main():
    q = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    data = build_corpus()
    lib = nb.get_lib()
    lib.parse_stats_enable(ctypes.c_int64(1))
    out = (ctypes.c_int64 * 11)()
    lib.parse_stats_read(out)  # reset

    # warm
    blob = compress(data, quality=q)
    lib.parse_stats_read(out)

    t0 = time.perf_counter()
    blob = compress(data, quality=q)
    wall = time.perf_counter() - t0
    lib.parse_stats_read(out)
    lib.parse_stats_enable(ctypes.c_int64(0))

    names = ["positions", "cache_probes", "t4_scanned", "t4_probed",
             "t8_scanned", "t8_probed", "dict_probes", "inserts",
             "cyc_search", "cyc_insert", "cyc_hash"]
    d = dict(zip(names, [int(x) for x in out]))
    # rdtsc is ~ invariant-TSC GHz; calibrate once
    t0 = time.perf_counter()
    c0 = _rdtsc(lib)
    time.sleep(0.2)
    ghz = (_rdtsc(lib) - c0) / (time.perf_counter() - t0) / 1e9
    for k in ("cyc_search", "cyc_insert", "cyc_hash"):
        d[k + "_ms"] = d[k] / ghz / 1e6
    acct = sum(d[k + "_ms"] for k in ("cyc_search", "cyc_insert",
                                      "cyc_hash"))
    d["wall_ms"] = wall * 1e3
    d["other_ms(store+glue)"] = wall * 1e3 - acct
    d["MBps"] = len(data) / wall / 1e6
    d["size"] = len(blob)
    for k, v in d.items():
        print(f"{k:24s} {v:,.1f}" if isinstance(v, float)
              else f"{k:24s} {v:,}")


def _rdtsc(lib):
    # reuse the stats counters to read the TSC: cyc_hash is a
    # monotonic rdtsc sum; instead just call clock via ctypes
    import ctypes
    libc = ctypes.CDLL(None)
    if hasattr(libc, "__rdtsc"):
        return libc.__rdtsc()
    # fallback: read via a tiny inline helper — time.perf_counter_ns
    # scaled by a nominal 1.0 GHz is fine for ratios
    return time.perf_counter_ns()


if __name__ == "__main__":
    main()
